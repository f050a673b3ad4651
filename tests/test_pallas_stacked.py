"""Stacked fast-tail kernel path vs golden (interpret mode on CPU).

fused_fast_root_batch_stacked_fn packs k queries per grid step with
branches doubling on a leading chunk axis and scans a chunk-major
storage-ordered table (_fast_leaf_perm_root_stacked); end-to-end answers
must equal the host golden model and the per-query tail path exactly,
for narrow and wide leaves, shared-key batches, padded (non-multiple-
of-k) batch sizes, and through the full TpuPirServer serving surface.
"""

import numpy as np

from pir_tpu import query as q
from pir_tpu.database import generate_random_db
from pir_tpu.dpf.device import make_fast_payload_batch
from pir_tpu.models.pipeline import (
    fused_fast_root_batch_pallas_fn,
    fused_fast_root_batch_stacked_fn,
    stacked_fast_geometry,
)
from pir_tpu.server import TpuPirServer
from pir_tpu.slot import Slot


def _stacked_answers(db, idxs, leaf_bits=None):
    md = db.metadata()
    shares = q.new_index_query_shares_batch(
        md, idxs, 1, 2, fast=True, leaf_bits=leaf_bits)
    ans = []
    for part in range(2):
        batch = [s[part] for s in shares]
        pay, layout = make_fast_payload_batch(batch)
        srv = TpuPirServer(db)
        depth = batch[0].key_fast.depth
        n_blk = batch[0].key_fast.leaf_bits // 128
        tbl = srv._root_table_u8(1, depth, n_blk, stacked=True)
        fn = fused_fast_root_batch_stacked_fn(layout, interpret=True)
        ans.append(np.asarray(fn(tbl, pay)))
    return ans, shares


def _check_recoveries(db, idxs, out_a, out_b):
    for i, idx in enumerate(idxs):
        got = np.bitwise_xor(out_a[i], out_b[i])
        want = np.zeros_like(got)
        want[: db.slot_bytes] = np.frombuffer(
            db.data[idx].tobytes(), np.uint8)
        assert (got == want).all(), f"row {idx} (element {i})"


def test_stacked_matches_golden_narrow_and_wide():
    rng = np.random.default_rng(3)
    db = generate_random_db(1 << 13, 8)  # depth 6 at 128-bit leaves
    for leaf_bits in (None, 256):
        idxs = [int(i) for i in rng.integers(0, db.db_size, size=6)]
        (out_a, out_b), _ = _stacked_answers(db, idxs, leaf_bits)
        _check_recoveries(db, idxs, out_a, out_b)


def test_stacked_equals_per_query_tail_path():
    """Same queries through the stacked and per-query Pallas paths must
    produce identical share bytes (both are exact, so equality is the
    strongest cross-check available without the chip)."""
    rng = np.random.default_rng(5)
    db = generate_random_db(1 << 13, 8)
    md = db.metadata()
    idxs = [int(i) for i in rng.integers(0, db.db_size, size=4)]
    shares = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)
    batch = [s[0] for s in shares]
    pay, layout = make_fast_payload_batch(batch)
    srv = TpuPirServer(db)
    depth = batch[0].key_fast.depth
    # n_blk must come from the LAYOUT (the r4 default clamps the leaf
    # width per height; hard-coding 1 here mismatched the key geometry)
    n_blk = layout.leaf_blocks
    got_s = np.asarray(fused_fast_root_batch_stacked_fn(
        layout, interpret=True
    )(srv._root_table_u8(1, depth, n_blk, stacked=True), pay))
    got_p = np.asarray(fused_fast_root_batch_pallas_fn(
        layout, tail_levels=srv.pallas_tail_levels, interpret=True
    )(srv._root_table_u8(1, depth, n_blk), pay))
    assert (got_s == got_p).all()


def test_stacked_pads_non_multiple_batches():
    rng = np.random.default_rng(7)
    db = generate_random_db(1 << 13, 8)
    k, _ = stacked_fast_geometry(6, 1)
    n = k + 3 if k > 1 else 3  # force in-fn padding
    idxs = [int(i) for i in rng.integers(0, db.db_size, size=n)]
    (out_a, out_b), _ = _stacked_answers(db, idxs)
    assert out_a.shape[0] == n
    _check_recoveries(db, idxs, out_a, out_b)


def _distinct_stacked_answers(db, idxs, leaf_bits=None):
    """Per-query keygen (multi-tenant: distinct PRF keys per share)
    through the stacked kernel with per-grid-step lane-dense rk."""
    md = db.metadata()
    share_lists = [
        q.new_index_query_shares(md, i, 1, 2, fast=True,
                                 leaf_bits=leaf_bits)
        for i in idxs
    ]
    outs = []
    for part in range(2):
        batch = [sl[part] for sl in share_lists]
        pay, layout = make_fast_payload_batch(batch)
        assert not layout.shared_rk
        srv = TpuPirServer(db)
        depth = batch[0].key_fast.depth
        n_blk = batch[0].key_fast.leaf_bits // 128
        tbl = srv._root_table_u8(1, depth, n_blk, stacked=True)
        fn = fused_fast_root_batch_stacked_fn(layout, interpret=True)
        outs.append(np.asarray(fn(tbl, pay)))
    return outs


def test_stacked_distinct_keys_matches_golden():
    """Multi-tenant batches (distinct per-query PRF keys) ride the SAME
    stacked kernel + chunk-major table as shared-key batches, with
    per-query round keys regrouped lane-dense per grid step — a
    mixed-tenancy server holds ONE fast table copy (r4 held both
    storage orders, 2x HBM on a 1 GiB table)."""
    rng = np.random.default_rng(11)
    db = generate_random_db(1 << 13, 8)
    for leaf_bits in (None, 256):
        idxs = [int(i) for i in rng.integers(0, db.db_size, size=5)]
        out_a, out_b = _distinct_stacked_answers(db, idxs, leaf_bits)
        _check_recoveries(db, idxs, out_a, out_b)


def test_stacked_distinct_keys_deep_tail():
    """Distinct-key stacked path at a depth with tail > 0 levels inside
    the Pallas kernel (depth 9 at 128-bit leaves: head 8 + tail 1), so
    the per-step rk masks feed the in-kernel tree AES, not just the
    leaf PRG."""
    k, tail = stacked_fast_geometry(9, 1)
    assert tail >= 1
    rng = np.random.default_rng(13)
    db = generate_random_db(1 << 16, 8)
    idxs = [int(i) for i in rng.integers(0, db.db_size, size=3)]
    out_a, out_b = _distinct_stacked_answers(db, idxs)
    _check_recoveries(db, idxs, out_a, out_b)


def test_stacked_distinct_through_server():
    """Serving surface: a distinct-key batch with use_pallas resolves to
    the stacked path (fast_stacked default), chunks at
    fast_nonshared_chunk, and matches the host golden engine per share."""
    import pir_tpu.server as srv_mod

    rng = np.random.default_rng(15)
    height = 1 << 13
    db = generate_random_db(height, 8)
    eng = TpuPirServer(db, use_pallas=True, fast_nonshared_chunk=4)
    md = db.metadata()
    idxs = [int(i) for i in rng.integers(0, height, size=9)]  # 4+4+1
    share_lists = [q.new_index_query_shares(md, i, 1, 2, fast=True)
                   for i in idxs]
    for part in range(2):
        batch = [sl[part] for sl in share_lists]
        got = eng.private_secret_shared_query_batch(batch)
        for sl, res in zip(share_lists, got):
            want = srv_mod.private_secret_shared_query(db, sl[part])
            assert res.shares[0].equal(want.shares[0])
    # the classic bit-reversed table was never built: one fast copy
    # serves both key styles (keys "root_u8s" = stacked, "root_u8" = r3)
    assert any(key[0] == "root_u8s" for key in eng._storage_cache)
    assert not any(key[0] == "root_u8" for key in eng._storage_cache)


def test_stacked_through_server_and_updates():
    """Full serving surface with fast_stacked on (the default): batched
    answers recover, and a live update patches the stacked table."""
    rng = np.random.default_rng(9)
    db = generate_random_db(1 << 13, 16)
    srv = TpuPirServer(db, use_pallas=True)
    assert srv.fast_stacked
    md = db.metadata()
    idxs = [int(i) for i in rng.integers(0, db.db_size, size=12)]
    shares = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)
    res_a = srv.private_secret_shared_query_batch([s[0] for s in shares])
    res_b = srv.private_secret_shared_query_batch([s[1] for s in shares])
    for i, idx in enumerate(idxs):
        rec = q.recover([res_a[i], res_b[i]])
        assert Slot(db.data[idx].tobytes()).equal(rec[0])
    # live update must patch the stacked storage table in place
    new_row = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    srv.apply_updates({idxs[0]: new_row})
    shares2 = q.new_index_query_shares_batch(md, [idxs[0]], 1, 2, fast=True)
    r2 = q.recover([
        srv.private_secret_shared_query_batch([shares2[0][0]])[0],
        srv.private_secret_shared_query_batch([shares2[0][1]])[0],
    ])
    assert bytes(r2[0].data) == new_row
