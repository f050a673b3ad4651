"""Fused scan+expand kernel == the two split kernels, bit for bit.

The fused kernel (ops/pallas_fused.py) interleaves batch i's packed-bits
MXU scan with batch i+1's VPU AES tail walk inside one grid; its two
outputs must equal what ops/pallas_scan.mxu_batched_scan_packed_pallas
and ops/pallas_expand.fast_tail_expand_pallas produce on the same
operands. Runs in interpret mode on CPU (compiled-TPU behavior is
covered by the on-chip A/B in benchmarks_fused.py).
"""

import numpy as np
import pytest

from pir_tpu.ops.pallas_expand import fast_tail_expand_pallas
from pir_tpu.ops.pallas_fused import fused_scan_expand_pallas
from pir_tpu.ops.pallas_scan import mxu_batched_scan_packed_pallas


@pytest.mark.parametrize("levels,q_slice", [(0, None), (1, None), (2, None),
                                            (2, 8)])
def test_fused_matches_split(levels, q_slice):
    rng = np.random.default_rng(11)
    h, b, q = 1 << 15, 256, 16
    br, bc = 4096, 256
    nwf = (h // 128) // 32  # one leaf PRG block covers 128 rows
    nw0 = nwf >> levels
    qe = q

    table = rng.integers(0, 256, size=(h, b), dtype=np.uint8)
    words = rng.integers(0, 1 << 32, size=(h // 32, q), dtype=np.uint64
                         ).astype(np.uint32)
    u32 = lambda *s: rng.integers(0, 1 << 32, size=s, dtype=np.uint64
                                  ).astype(np.uint32)
    seeds = u32(qe, 8, 16, nw0)
    t = (rng.integers(0, 2, size=(qe, 1, nw0), dtype=np.uint64)
         * 0xFFFFFFFF).astype(np.uint32)
    lv = max(levels, 1)
    cw_s = u32(qe, lv, 8, 16, 1)
    cw_tl, cw_tr = u32(qe, lv), u32(qe, lv)
    rk = u32(11, 8, 3, 16, 1)
    fcw = u32(qe, 8, 16, 1)
    rk_leaf = u32(11, 8, 16, 1)

    want_scan = np.asarray(mxu_batched_scan_packed_pallas(
        table, words, block_rows=br, block_cols=bc, interpret=True))
    want_tail = np.asarray(fast_tail_expand_pallas(
        seeds, t, cw_s[:, :levels or 1], cw_tl[:, :levels or 1],
        cw_tr[:, :levels or 1], rk, fcw, rk_leaf,
        levels=levels, interpret=True))

    got_scan, got_tail = fused_scan_expand_pallas(
        table, words, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf,
        levels=levels, q_slice=q_slice, block_rows=br, block_cols=bc,
        interpret=True)

    np.testing.assert_array_equal(np.asarray(got_scan), want_scan)
    np.testing.assert_array_equal(np.asarray(got_tail), want_tail)


def test_fused_rejects_nondivisible_grid():
    rng = np.random.default_rng(1)
    h, b, q = 1 << 15, 256, 12  # 12 not divisible by the 8-step grid
    table = rng.integers(0, 256, size=(h, b), dtype=np.uint8)
    words = rng.integers(0, 1 << 32, size=(h // 32, q), dtype=np.uint64
                         ).astype(np.uint32)
    u32 = lambda *s: rng.integers(0, 1 << 32, size=s, dtype=np.uint64
                                  ).astype(np.uint32)
    with pytest.raises(AssertionError):
        fused_scan_expand_pallas(
            table, words, u32(q, 8, 16, 2), u32(q, 1, 2), u32(q, 2, 8, 16, 1),
            u32(q, 2), u32(q, 2), u32(11, 8, 3, 16, 1), u32(q, 8, 16, 1),
            u32(11, 8, 16, 1),
            levels=2, block_rows=4096, block_cols=256, interpret=True)


def _run_stream_vs_batch(eng, leaf_bits=None):
    import numpy as np

    from pir_tpu import query as q

    db = eng.db
    md = db.metadata()
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(3):
        idxs = [int(i) for i in rng.integers(0, db.db_size, size=16)]
        share_lists = q.new_index_query_shares_batch(
            md, idxs, 1, 2, fast=True, leaf_bits=leaf_bits)
        batches.append([s[0] for s in share_lists])
    stream = eng.fast_serving_stream()
    outs = []
    for batch in batches:
        r = stream.submit(batch)
        if r is not None:
            outs.append(r())
    outs.append(stream.flush()())
    assert len(outs) == len(batches)
    for batch, got in zip(batches, outs):
        want = eng.private_secret_shared_query_batch(batch)
        for w, g_ in zip(want, got):
            assert g_.shares[0].equal(w.shares[0])


def test_fast_serving_stream_matches_batch():
    """The default (stacked) serving stream — async one-batch lag over
    the stacked root dispatch — answers identically to the batch API,
    including at the wide-leaf default keys."""
    from pir_tpu.database import generate_random_db
    from pir_tpu.server import TpuPirServer

    db = generate_random_db(1 << 15, 8)
    _run_stream_vs_batch(TpuPirServer(db, use_pallas=True))


def test_fast_serving_stream_fused_ab():
    """fast_stacked=False keeps the r3 fused overlap kernel on the
    stream for A/B — 128-bit leaves, batch-shared keys only."""
    from pir_tpu.database import generate_random_db
    from pir_tpu.server import TpuPirServer

    db = generate_random_db(1 << 15, 8)
    eng = TpuPirServer(db, use_pallas=True, fast_stacked=False)
    _run_stream_vs_batch(eng, leaf_bits=128)
