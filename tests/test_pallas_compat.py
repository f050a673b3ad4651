"""Cascaded Pallas compat-mode expansion (reference-exact leaf semantics).

Runs the kernels in interpret mode on CPU (as test_pallas_expand.py does
for fast mode) and checks bit-for-bit equality of full answers against
the host golden engine (db.go:67-174 semantics), including the
left-child skip for power-of-two heights and multi-stage cascades.
"""

import random

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db
from pir_tpu.server import TpuPirServer


def _batch_roundtrip(db, server, idxs):
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2) for i in idxs]
    out0 = server.private_secret_shared_query_batch([x[0] for x in sh])
    out1 = server.private_secret_shared_query_batch([x[1] for x in sh])
    for k, i in enumerate(idxs):
        # each server's share must equal the host engine's bit-for-bit
        for snum, out in ((0, out0), (1, out1)):
            want = srv.private_secret_shared_query(db, sh[k][snum])
            assert want.shares[0].equal(out[k].shares[0]), (k, i, snum)
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


@pytest.mark.parametrize("height,w,max_tail", [
    (1 << 10, 8, 3),   # pow2: skip=1, device_bits=10, tails=(2,)
    (1 << 10, 4, 2),   # two stages: split=7, tails=(2,1)
    (1000, 8, 3),      # non-pow2: skip=0, device_bits=10
    (1 << 11, 8, 2),   # skip=1, device_bits=11, tails=(2,1)
])
def test_compat_pallas_batch_matches_host(height, w, max_tail):
    db = generate_random_db(height, 3)
    server = TpuPirServer(db, mxu_batch_threshold=2, use_pallas=True,
                          compat_pallas_w=w, compat_pallas_max_tail=max_tail,
                          compat_pallas_q_chunk=4)
    rng = random.Random(height + w)
    idxs = [rng.randrange(height) for _ in range(4)]
    idxs[0] = 0
    idxs[-1] = height - 1
    _batch_roundtrip(db, server, idxs)


def test_compat_pallas_qchunk_padding():
    """Batch size above and not divisible by q_chunk pads with repeats."""
    height = 1 << 10
    db = generate_random_db(height, 3)
    server = TpuPirServer(db, mxu_batch_threshold=2, use_pallas=True,
                          compat_pallas_w=8, compat_pallas_q_chunk=4)
    rng = random.Random(5)
    _batch_roundtrip(db, server, [rng.randrange(height) for _ in range(6)])


def test_compat_pallas_async_batch():
    height = 1 << 10
    db = generate_random_db(height, 3)
    server = TpuPirServer(db, mxu_batch_threshold=2, use_pallas=True,
                          compat_pallas_w=8, compat_pallas_q_chunk=4)
    rng = random.Random(6)
    idxs = [rng.randrange(height) for _ in range(4)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2) for i in idxs]
    f0 = server.private_secret_shared_query_batch_async([x[0] for x in sh])
    f1 = server.private_secret_shared_query_batch_async([x[1] for x in sh])
    out0, out1 = f0(), f1()
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


def test_compat_preplane_skip_matches_host():
    """The non-Pallas preplane path also uses the left-child skip
    (half-size plane table) and must stay bit-for-bit exact."""
    height = 1 << 10
    db = generate_random_db(height, 3)
    server = TpuPirServer(db, mxu_batch_threshold=2, use_pallas=False)
    rng = random.Random(7)
    idxs = [rng.randrange(height) for _ in range(4)]
    from pir_tpu.dpf.device import compat_skip_levels
    from pir_tpu.utils.bits import num_bits_for_height

    assert compat_skip_levels(num_bits_for_height(height), height) == 1
    _batch_roundtrip(db, server, idxs)


def test_compat_skip_levels():
    from pir_tpu.dpf.device import compat_skip_levels

    assert compat_skip_levels(11, 1 << 10) == 1
    assert compat_skip_levels(10, 1000) == 0
    assert compat_skip_levels(1, 1) == 0


def test_compat_perm_pallas_is_permutation():
    from pir_tpu.dpf.device import _compat_perm_pallas

    for nbd, h, w, tails in [(10, 1 << 10, 8, (2,)), (10, 1000, 4, (2, 1)),
                             (12, 4096, 8, (3, 1))]:
        p = _compat_perm_pallas(nbd, h, w, tails)
        assert p.shape == (h,)
        assert len(np.unique(p)) == h
        assert p.min() >= 0 and p.max() < (1 << nbd)
