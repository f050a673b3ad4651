"""Host DPF correctness tests, mirroring dpf/dpf_test.go.

numTrials is reduced from the reference's 1000 (dpf/dpf_test.go:9) to keep
CI fast; the per-trial assertions are identical.
"""

import random

import numpy as np
import pytest

from pir_tpu.dpf import host as dpf
from pir_tpu.utils.bits import go_varint, go_varint_vec, num_bits_for_height

NUM_TRIALS = 30


def test_go_varint_vectorised_matches_scalar():
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 256, size=(5000, 8), dtype=np.uint8)
    # force some all-continuation rows (the ux=0 edge case)
    buf[:16] |= 0x80
    vec = go_varint_vec(buf)
    for i in range(buf.shape[0]):
        want, _ = go_varint(bytes(buf[i]))
        assert vec[i] == want, (i, bytes(buf[i]))


def _run_two_server_trials(n_trials, seed=1234):
    """dpf/dpf_test.go:11-39: shares sum to b at the point, 0 elsewhere."""
    rng = random.Random(seed)
    for _ in range(n_trials):
        num = rng.randrange(1 << 10) + 100
        special = rng.randrange(num)
        value = rng.randrange(num)

        client = dpf.client_initialize(num_bits_for_height(num))
        keys = dpf.generate_two_server(client, special, value)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)

        # full-domain vectorised eval must agree with per-point eval
        full0 = dpf.eval_full_domain(server, 0, keys[0])
        full1 = dpf.eval_full_domain(server, 1, keys[1])
        total = full0 + full1
        for i in rng.sample(range(num), 20) + [special]:
            ans0 = dpf.evaluate_2p(server, 0, keys[0], i)
            ans1 = dpf.evaluate_2p(server, 1, keys[1], i)
            assert ans0 == full0[i]
            assert ans1 == full1[i]
        assert total[special] == value
        mask = np.ones(num, dtype=bool)
        mask[special] = False
        assert (total[:num][mask] == 0).all()


def test_correct_two_server():
    _run_two_server_trials(NUM_TRIALS)


@pytest.mark.long
def test_correct_two_server_long():
    """Reference trial count (numTrials = 1000, dpf/dpf_test.go:9)."""
    _run_two_server_trials(1000)


def _run_point_function_trials(n_trials, seed=99):
    """dpf/dpf_test.go:41-73: parity shares XOR to 1 only at the point."""
    rng = random.Random(seed)
    for _ in range(n_trials):
        num = rng.randrange(1 << 10) + 100
        special = rng.randrange(num)

        client = dpf.client_initialize(num_bits_for_height(num))
        keys = dpf.generate_two_server(client, special, 1)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)

        bits0 = dpf.eval_full_domain_bits(server, 0, keys[0], num)
        bits1 = dpf.eval_full_domain_bits(server, 1, keys[1], num)
        sel = bits0 ^ bits1
        assert sel[special]
        assert sel.sum() == 1


def test_correct_point_function_two_server():
    _run_point_function_trials(NUM_TRIALS)


@pytest.mark.long
def test_correct_point_function_two_server_long():
    _run_point_function_trials(1000)


def _run_keyword_trials(n_trials, seed=7):
    """dpf/dpf_test.go:75-107: 64-bit domain point function."""
    rng = random.Random(seed)
    for _ in range(n_trials):
        num = rng.randrange(1 << 62)
        keyword = rng.randrange(num)
        value = rng.randrange(1 << 32)

        client = dpf.client_initialize(64)
        keys = dpf.generate_two_server(client, keyword, value)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)

        for i in range(20):
            test_kw = keyword if i == 0 else rng.randrange(num)
            ans0 = dpf.evaluate_2p(server, 0, keys[0], test_kw)
            ans1 = dpf.evaluate_2p(server, 1, keys[1], test_kw)
            if test_kw == keyword:
                assert ans0 + ans1 == value
            else:
                assert ans0 + ans1 == 0


def test_correct_two_server_keyword():
    _run_keyword_trials(6)


@pytest.mark.long
def test_correct_two_server_keyword_long():
    _run_keyword_trials(1000)


def test_multi_server_keygen_rejects_two_parties():
    """Keygen is implemented for p>=3 (completing the reference stub,
    dpf/client.go:152-156; see test_dpf_multiparty.py); 2 parties must
    use the tree-based scheme."""
    client = dpf.client_initialize(10)
    with pytest.raises(ValueError):
        dpf.generate_multi_server(client, 1, 1, 2)


def test_batch_keygen_compat_sum_shares():
    """generate_two_server_batch == per-query semantics: shares sum to b
    at the point and 0 elsewhere (the dpf_test.go:11-107 property)."""
    import random

    rng = random.Random(21)
    num_bits = 9
    client = dpf.client_initialize(num_bits)
    targets = [rng.randrange(1 << num_bits) for _ in range(7)]
    pairs = dpf.generate_two_server_batch(client, targets, 1)
    server = dpf.server_initialize(client.prf_keys, num_bits)
    for target, pair in zip(targets, pairs):
        for x in {target, 0, (target + 1) % (1 << num_bits)}:
            v0 = dpf.evaluate_2p(server, 0, pair[0], x)
            v1 = dpf.evaluate_2p(server, 1, pair[1], x)
            want = 1 if x == target else 0
            assert (v0 + v1) % (1 << 64) == want, (x, target, v0, v1)


def test_batch_keygen_compat_roundtrip():
    from pir_tpu import query as q
    from pir_tpu import server as srv
    from pir_tpu.database import generate_random_db
    import random

    rng = random.Random(22)
    db = generate_random_db(1 << 10, 8)
    idxs = [rng.randrange(db.db_size) for _ in range(9)]
    batches = q.new_index_query_shares_batch(db.metadata(), idxs, 1, 2)
    for idx, shares in zip(idxs, batches):
        res = q.recover([srv.private_secret_shared_query(db, s)
                         for s in shares])
        assert db.slot(idx).equal(res[0])


def test_batch_keygen_keyword_roundtrip():
    from pir_tpu import query as q
    from pir_tpu import server as srv
    from pir_tpu.database import generate_random_db
    import random

    rng = random.Random(23)
    db = generate_random_db(256, 8)
    kws = rng.sample(range(1 << 31), 256)
    db.set_keywords(kws)
    picks = rng.sample(range(256), 5)
    batches = q.new_keyword_query_shares_batch(
        db.metadata(), [kws[p] for p in picks], 1
    )
    for p, shares in zip(picks, batches):
        res = q.recover([srv.private_secret_shared_query(db, s)
                         for s in shares])
        assert db.slot(p).equal(res[0])
