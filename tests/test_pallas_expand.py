"""Pallas tail-expansion kernel + fully-Pallas batch path vs golden."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from pir_tpu import query as q
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import host as dpf
from pir_tpu.dpf.bitslice import aes_encrypt_planes
from pir_tpu.dpf.device import (
    _expand_root_level,
    _fast_leaf_perm_root,
    make_fast_payload_batch,
    unpack_fast_root_payload,
)
from pir_tpu.models.pipeline import (
    fused_fast_root_batch_mxu_fn,
    fused_fast_root_batch_pallas_fn,
)


def _tail_reference(payloads, layout, tail):
    """Pure-XLA tail: level steps + packed leaf output."""
    from pir_tpu.dpf.device import _children, _prf_triple

    def one(p):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = (
            unpack_fast_root_payload(p, layout))
        for i in range(layout.depth - tail):
            seeds, t = _expand_root_level(
                seeds, t, cw_s[i], cw_tl[i], cw_tr[i], rk, i)
        for l in range(layout.depth - tail, layout.depth):
            out = _prf_triple(seeds, rk)
            s_l, t_l, s_r, t_r = _children(out, t, cw_s[l], cw_tl[l], cw_tr[l])
            seeds = jnp.concatenate([s_l, s_r], axis=-1)
            t = jnp.concatenate([t_l, t_r], axis=-1)
        enc = aes_encrypt_planes(seeds, rk_leaf)
        return (enc ^ seeds) ^ (t[None, None, :] & fcw)

    return np.asarray(jax.vmap(one)(payloads))


def test_tail_kernel_matches_xla():
    from pir_tpu.ops.pallas_expand import fast_tail_expand_pallas

    rng = random.Random(5)
    db = generate_random_db(1 << 13, 8)  # depth 6 at 128-bit leaves
    md = db.metadata()
    # pin the classic narrow leaf: this test's XLA reference is the
    # 128-bit leaf rule; wide leaves are covered by test_fast_wide_leaf
    shares = [q.new_index_query_shares(md, rng.randrange(db.db_size), 1, 2,
                                       fast=True, leaf_bits=128)[0]
              for _ in range(4)]
    pay, layout = make_fast_payload_batch(shares)
    for tail in (0, 1):
        want = _tail_reference(pay, layout, tail)

        def head(p):
            seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = (
                unpack_fast_root_payload(p, layout))
            for i in range(layout.depth - tail):
                seeds, t = _expand_root_level(
                    seeds, t, cw_s[i], cw_tl[i], cw_tr[i], rk, i)
            return (seeds, t[None, :], cw_s[layout.depth - tail:],
                    cw_tl[layout.depth - tail:], cw_tr[layout.depth - tail:],
                    rk, fcw, rk_leaf)

        seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf = jax.vmap(head)(pay)
        got = np.asarray(fast_tail_expand_pallas(
            seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf,
            levels=tail, interpret=True))
        assert (got == want).all(), tail


def test_pallas_batch_path_end_to_end():
    """Full Pallas pipeline (interpret) == XLA root-mxu path == truth."""
    from pir_tpu.ops.matmul_scan import pad_rows_u8
    from pir_tpu.dpf.device import scatter_rows_to_storage_order

    rng = random.Random(6)
    db = generate_random_db(1 << 13, 8)
    md = db.metadata()
    idxs = [rng.randrange(db.db_size) for _ in range(4)]
    sh = [q.new_index_query_shares(md, i, 1, 2, fast=True) for i in idxs]

    depth = sh[0][0].key_fast.depth
    n_blk = sh[0][0].key_fast.leaf_bits // 128  # default may widen leaves
    flat = (128 * n_blk) << depth
    perm = _fast_leaf_perm_root(depth, db.db_size, n_blk)
    rows = db.data.reshape(db.db_size, db.slot_bytes)
    tab = jnp.asarray(pad_rows_u8(
        scatter_rows_to_storage_order(rows, perm, flat), 512))

    outs = []
    for s in range(2):
        pay, layout = make_fast_payload_batch([x[s] for x in sh])
        want = np.asarray(
            fused_fast_root_batch_mxu_fn(layout, 512)(tab, pay))
        got = np.asarray(fused_fast_root_batch_pallas_fn(
            layout, 512, 8, 1, True)(tab, pay))
        assert (got == want).all(), s
        outs.append(got)
    rec = outs[0] ^ outs[1]
    for k, i in enumerate(idxs):
        assert rec[k].tobytes() == db.data[i].tobytes(), (k, i)


def test_pallas_batch_path_shared_prf_keys():
    """Batch-keygen shares carry ONE set of PRF keys; the fused path then
    expands round-key masks once for the whole batch (layout.shared_rk)
    instead of per query — the per-query masks were the batch-4096 HBM
    OOM. Must agree with the per-query-rk path bit-for-bit."""
    from pir_tpu.dpf.device import scatter_rows_to_storage_order
    from pir_tpu.ops.matmul_scan import pad_rows_u8

    rng = random.Random(8)
    db = generate_random_db(1 << 13, 8)
    md = db.metadata()
    idxs = [rng.randrange(db.db_size) for _ in range(4)]
    sh = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)

    depth = sh[0][0].key_fast.depth
    n_blk = sh[0][0].key_fast.leaf_bits // 128  # default may widen leaves
    flat = (128 * n_blk) << depth
    perm = _fast_leaf_perm_root(depth, db.db_size, n_blk)
    tab = jnp.asarray(pad_rows_u8(
        scatter_rows_to_storage_order(db.data, perm, flat), 512))

    outs = []
    for s in range(2):
        pay, layout = make_fast_payload_batch([x[s] for x in sh])
        assert layout.shared_rk  # batch keygen => one PRF key set
        got = np.asarray(fused_fast_root_batch_pallas_fn(
            layout, 512, 8, 1, True)(tab, pay))
        want = np.asarray(fused_fast_root_batch_mxu_fn(layout, 512)(tab, pay))
        assert (got == want).all(), s
        outs.append(got)
    rec = outs[0] ^ outs[1]
    for k, i in enumerate(idxs):
        assert rec[k].tobytes() == db.data[i].tobytes(), (k, i)


def test_all_xla_expand_matches_pallas_tail():
    """The all-XLA Q-in-lanes expansion (expand_fast_root_lanes_full:
    tree walk AND leaf PRG as lane-batched elementwise ops, no Pallas
    tail kernel) must agree with the Pallas-tail path bit-for-bit and
    recover the true slots."""
    from pir_tpu.dpf.device import scatter_rows_to_storage_order
    from pir_tpu.ops.matmul_scan import pad_rows_u8

    rng = random.Random(11)
    # 3000 rows: non-power-of-two height, depth > 0 with padded leaves
    db = generate_random_db(3000, 8)
    md = db.metadata()
    idxs = [rng.randrange(db.db_size) for _ in range(4)]
    sh = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)

    depth = sh[0][0].key_fast.depth
    n_blk = sh[0][0].key_fast.leaf_bits // 128  # default may widen leaves
    flat = (128 * n_blk) << depth
    perm = _fast_leaf_perm_root(depth, db.db_size, n_blk)
    tab = jnp.asarray(pad_rows_u8(
        scatter_rows_to_storage_order(db.data, perm, flat), 512))

    outs = []
    for s in range(2):
        pay, layout = make_fast_payload_batch([x[s] for x in sh])
        assert layout.shared_rk
        want = np.asarray(fused_fast_root_batch_pallas_fn(
            layout, 512, 8, 1, True)(tab, pay))
        got = np.asarray(fused_fast_root_batch_pallas_fn(
            layout, 512, 8, 1, True, all_xla_expand=True)(tab, pay))
        assert (got == want).all(), s
        outs.append(got)
    rec = outs[0] ^ outs[1]
    for k, i in enumerate(idxs):
        assert rec[k].tobytes() == db.data[i].tobytes(), (k, i)


def test_pallas_batch_q_slicing_matches_unsliced(monkeypatch):
    """Batches above _SCAN_Q_VMEM run the packed scan in Q-slices (the
    kernel's Q-scaled VMEM blocks OOM at 8192 on real hardware); sliced
    output must equal the one-dispatch result bit-for-bit, including a
    ragged final slice."""
    from pir_tpu.dpf.device import scatter_rows_to_storage_order
    from pir_tpu.models import pipeline
    from pir_tpu.ops.matmul_scan import pad_rows_u8

    rng = random.Random(11)
    db = generate_random_db(1 << 13, 8)
    md = db.metadata()
    idxs = [rng.randrange(db.db_size) for _ in range(6)]
    sh = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)

    depth = sh[0][0].key_fast.depth
    n_blk = sh[0][0].key_fast.leaf_bits // 128  # default may widen leaves
    flat = (128 * n_blk) << depth
    perm = _fast_leaf_perm_root(depth, db.db_size, n_blk)
    tab = jnp.asarray(pad_rows_u8(
        scatter_rows_to_storage_order(db.data, perm, flat), 512))

    outs = []
    for s in range(2):
        pay, layout = make_fast_payload_batch([x[s] for x in sh])
        want = np.asarray(fused_fast_root_batch_pallas_fn(
            layout, 512, 8, 1, True)(tab, pay))
        monkeypatch.setattr(pipeline, "_SCAN_Q_VMEM", 4)
        fused_fast_root_batch_pallas_fn.cache_clear()
        got = np.asarray(fused_fast_root_batch_pallas_fn(
            layout, 512, 8, 1, True)(tab, pay))  # slices of 4, 2
        monkeypatch.undo()
        fused_fast_root_batch_pallas_fn.cache_clear()
        assert (got == want).all(), s
        outs.append(got)
    rec = outs[0] ^ outs[1]
    for k, i in enumerate(idxs):
        assert rec[k].tobytes() == db.data[i].tobytes(), (k, i)
