"""Multi-party (>=3 servers) DPF — keygen completed beyond the reference
stub (dpf/client.go:152-156); eval semantics follow dpf/server.go:110-144."""

import random

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import host as dpf
from pir_tpu.utils.bits import num_bits_for_height


@pytest.mark.parametrize("num_parties", [3, 4, 5])
def test_mp_dpf_xor_shares_point_function(num_parties):
    rng = random.Random(num_parties)
    for _ in range(3):
        num = rng.randrange(1 << 8) + 50
        special = rng.randrange(num)
        value = rng.randrange(1, 1 << 32)

        client = dpf.client_initialize(num_bits_for_height(num))
        keys = dpf.generate_multi_server(client, special, value, num_parties)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)

        for x in rng.sample(range(num), 15) + [special]:
            acc = 0
            for j in range(num_parties):
                acc ^= dpf.evaluate_mp(server, keys[j], x)
            want = value if x == special else 0
            assert acc == want, (num_parties, x, special)


def test_mp_single_party_view_is_masked():
    """A single server's presence pattern has uniform marginals."""
    client = dpf.client_initialize(8)
    keys_a = dpf.generate_multi_server(client, 3, 1, 3)
    # sigma rows are byte strings; nonzero slots vary randomly per row
    nonzero_counts = []
    for g in range(len(keys_a[0].sigma)):
        row = np.frombuffer(keys_a[0].sigma[g], dtype=np.uint8).reshape(-1, 16)
        nonzero_counts.append(int(row.any(axis=1).sum()))
    # not all-zero and not all-full across rows (overwhelming probability)
    assert 0 < sum(nonzero_counts) < len(nonzero_counts) * 4


@pytest.mark.parametrize("num_shares", [3, 4])
def test_three_server_pir_end_to_end(num_shares):
    """>=3-server secret-shared PIR through the standard query API."""
    rng = random.Random(10 + num_shares)
    db = generate_random_db(1 << 9, 5)
    for _ in range(3):
        idx = rng.randrange(db.db_size)
        shares = q.new_index_query_shares(db.metadata(), idx, 1, num_shares)
        results = [srv.private_secret_shared_query(db, s) for s in shares]
        rec = q.recover(results)
        assert db.slot(idx).equal(rec[0]), idx


def test_three_server_pir_tpu_engine():
    """>=3-server queries through the TPU engine (host expand + device scan)."""
    from pir_tpu.server import TpuPirServer

    rng = random.Random(77)
    db = generate_random_db(1 << 8, 6)
    server = TpuPirServer(db)
    idx = rng.randrange(db.db_size)
    shares = q.new_index_query_shares(db.metadata(), idx, 1, 3)
    results = [server.private_secret_shared_query(s) for s in shares]
    rec = q.recover(results)
    assert db.slot(idx).equal(rec[0])


def test_eval_points_mp_matches_single_point_eval():
    """The vectorized full-domain MP eval (one AES dispatch over all
    unique rows) must agree with the per-point golden evaluate_mp."""
    import numpy as np

    from pir_tpu import query as q
    from pir_tpu.database import generate_random_db
    from pir_tpu.dpf import host as dpf_host
    from pir_tpu.utils.bits import num_bits_for_height

    db = generate_random_db(512, 4)
    for parties in (3, 4):
        shares = q.new_index_query_shares(db.metadata(), 77, 1, parties)
        for s in shares:
            pf = dpf_host.server_initialize(
                s.prf_keys, num_bits_for_height(512)
            )
            vec = dpf_host.eval_points_mp(pf, s.key_multi_party, np.arange(512))
            loop = np.array([
                dpf_host.evaluate_mp(pf, s.key_multi_party, x)
                for x in range(512)
            ])
            assert (vec == loop).all(), parties


def test_multiparty_native_engine_fallback():
    """NativePirServer answers >=3-party queries via the host expansion."""
    import random

    from pir_tpu import query as q
    from pir_tpu.database import generate_random_db
    from pir_tpu.server import NativePirServer

    rng = random.Random(51)
    db = generate_random_db(1 << 8, 8)
    servers = [NativePirServer(db) for _ in range(3)]
    idx = rng.randrange(db.db_size)
    shares = q.new_index_query_shares(db.metadata(), idx, 1, 3)
    res = q.recover([s.private_secret_shared_query(sh)
                     for s, sh in zip(servers, shares)])
    assert bytes(res[0].data) == db.data[idx].tobytes()


def test_device_mp_expansion_matches_host():
    """Device sigma-slot PRG walk == host eval (bit shares), all parties."""
    import numpy as np

    from pir_tpu.dpf import device as dev
    from pir_tpu.dpf import host as dpf

    for num_parties, nb, a, height in ((3, 8, 77, 256), (4, 9, 300, 500),
                                       (5, 7, 0, 128)):
        client = dpf.client_initialize(nb)
        keys = dpf.generate_multi_server(client, a, 1, num_parties)
        pts = np.arange(height, dtype=np.int64)
        acc = np.zeros(height, np.uint8)
        for k in keys:
            host_bits = ((dpf.eval_points_mp(client, k, pts) & 1) == 1)
            dev_bits = np.asarray(dev.expand_mp_full_domain_bits(client, k, height))
            assert (host_bits.astype(np.uint8) == dev_bits).all()
            acc ^= dev_bits
        want = np.zeros(height, np.uint8)
        if a < height:
            want[a] = 1
        assert (acc == want).all()


def test_tpu_engine_answers_mp_queries_on_device():
    """TpuPirServer answers >=3-party index queries with the device
    expansion (no host fallback) and recovery is bit-exact."""
    import random

    import numpy as np

    from pir_tpu import query as q
    from pir_tpu import server as srv
    from pir_tpu.database import generate_random_db

    rng = random.Random(13)
    db = generate_random_db(1 << 9, 16)
    engine = srv.TpuPirServer(db)
    for n_servers in (3, 4):
        idx = rng.randrange(db.db_size)
        shares = q.new_index_query_shares(db.metadata(), idx, 1, n_servers)
        # the engine expansion must equal the host engine's bits
        for s in shares:
            eng_bits = np.asarray(engine.expand_shared_query(s)).astype(bool)
            host_bits = srv.expand_shared_query(db, s)
            assert (eng_bits == host_bits).all()
        res = q.recover([engine.private_secret_shared_query(s) for s in shares])
        assert bytes(res[0].data) == db.data[idx].tobytes(), (n_servers, idx)


def test_device_mp_point_eval_matches_host():
    """Device arbitrary-point MP eval (one PRG block per sigma slot per
    row) == host eval bit shares, across domains and party counts."""
    import numpy as np

    from pir_tpu.dpf import device as dev
    from pir_tpu.dpf import host as dpf

    rng = random.Random(31)
    for num_parties, nb in ((3, 8), (4, 10), (3, 13), (5, 16)):
        client = dpf.client_initialize(nb)
        a = rng.randrange(1 << nb)
        keys = dpf.generate_multi_server(client, a, 1, num_parties)
        pts = np.array(
            [rng.randrange(1 << nb) for _ in range(201)] + [a], dtype=np.int64
        )
        acc = np.zeros(len(pts), np.uint8)
        for k in keys:
            host_bits = ((dpf.eval_points_mp(client, k, pts) & 1) == 1)
            dev_bits = np.asarray(dev.eval_points_mp_bits(client, k, pts))
            assert (host_bits.astype(np.uint8) == dev_bits).all(), (
                num_parties, nb)
            acc ^= dev_bits
        want = (pts == a).astype(np.uint8)
        assert (acc == want).all(), (num_parties, nb)


def test_block_sparse_eval_points_mp_keyword_domain():
    """The block-sparse host eval on the full 32-bit keyword domain
    (query.go:47-49 domain convention) agrees with the golden per-point
    evaluate_mp and with the device point eval."""
    import numpy as np

    from pir_tpu.dpf import device as dev
    from pir_tpu.dpf import host as dpf

    rng = random.Random(92)
    client = dpf.client_initialize(32)
    kws = np.array(rng.sample(range(1 << 32), 128), dtype=np.int64)
    target = int(kws[17])
    keys = dpf.generate_multi_server(client, target, 1, 3)
    acc = np.zeros(len(kws), np.uint8)
    spots = rng.sample(range(len(kws)), 2) + [17]
    for k in keys:
        vals = dpf.eval_points_mp(client, k, kws)
        for i in spots:  # golden per-point spot checks (full mu stream)
            assert int(vals[i]) == dpf.evaluate_mp(client, k, int(kws[i]))
        bits = np.asarray(dev.eval_points_mp_bits(client, k, kws))
        assert (((vals & 1) == 1).astype(np.uint8) == bits).all()
        acc ^= bits
    assert list(np.flatnonzero(acc)) == [17]


def test_tpu_engine_answers_keyword_mp_queries_on_device():
    """TpuPirServer answers keyword-based >=3-party queries with the
    device point eval (db.go:132-135 with multi-party shares)."""
    import numpy as np

    from pir_tpu import query as q
    from pir_tpu import server as srv
    from pir_tpu.database import generate_random_db

    rng = random.Random(47)
    db = generate_random_db(1 << 8, 6)
    kws = np.array(rng.sample(range(1 << 32), db.db_size), dtype=np.uint64)
    db.set_keywords(kws)
    engine = srv.TpuPirServer(db)
    row = rng.randrange(db.db_size)
    shares = q.new_keyword_query_shares(db.metadata(), int(kws[row]), 1, 3)
    for s in shares:
        eng_bits = np.asarray(engine.expand_shared_query(s)).astype(bool)
        host_bits = srv.expand_shared_query(db, s)
        assert (eng_bits == host_bits).all()
    res = q.recover([engine.private_secret_shared_query(s) for s in shares])
    assert bytes(res[0].data) == db.data[row].tobytes(), row
