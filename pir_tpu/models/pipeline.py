"""Flagship model: the fused 2-server PIR answer pipeline as pure functions.

``expand_bits_planes`` + ``answer_query`` express the full server-side
forward step (DPF full-domain expansion -> masked-XOR scan) over plain
arrays, so they can be jitted, vmapped over query batches, and shard_mapped
over device meshes (parallel/mesh.py). This is the call stack 3.1 hot path
of the reference (db.go:68-174) as one compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..dpf.device import _children, _leaf_select_bits, _prf_triple, _unpack_bits
from ..ops.scan import xor_reduce


def expand_bits_planes(
    seeds, t_plane, cw_seed_masks, cw_tl, cw_tr, rk_masks, fcw_mask, perm, *,
    d_levels: int,
):
    """Breadth-first expansion of packed seed planes into selection bits.

    seeds (8,16,NW0), t_plane (NW0,), cw_* (d,...), perm (rows,) ->
    (rows,) uint8 natural-order bits.
    """
    for i in range(d_levels):
        out = _prf_triple(seeds, rk_masks)
        s_l, t_l, s_r, t_r = _children(
            out, t_plane, cw_seed_masks[i], cw_tl[i], cw_tr[i]
        )
        seeds = jnp.concatenate([s_l, s_r], axis=-1)
        t_plane = jnp.concatenate([t_l, t_r], axis=-1)
    packed = _leaf_select_bits(seeds, t_plane, fcw_mask)
    bits = _unpack_bits(packed, packed.shape[0] * 32)
    return jnp.take(bits, perm, axis=0)


def answer_query(
    table, seeds, t_plane, cw_seed_masks, cw_tl, cw_tr, rk_masks, fcw_mask, perm, *,
    d_levels: int,
):
    """Full single-shard forward step: expand + masked-XOR scan.

    table (H, C) uint32 -> answer share (C,) uint32.
    """
    bits = expand_bits_planes(
        seeds, t_plane, cw_seed_masks, cw_tl, cw_tr, rk_masks, fcw_mask, perm,
        d_levels=d_levels,
    )
    mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
    return xor_reduce(table & mask, axis=0)


def make_answer_fn(d_levels: int):
    """Jittable flagship forward with the level count baked in."""
    return functools.partial(answer_query, d_levels=d_levels)


@functools.lru_cache(maxsize=64)
def fused_answer_fn(layout):
    """One-dispatch server answer: jit(table, payload, perm) -> (C,) uint32.

    `layout` is a dpf.device.PayloadLayout; the per-query key material
    arrives as a single packed uint32 vector (one host->device transfer).
    """
    from ..dpf.device import unpack_key_payload

    def fn(table, payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk = unpack_key_payload(payload, layout)
        return answer_query(
            table, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, perm,
            d_levels=layout.d_levels,
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_bits_fn(layout):
    """One-dispatch expansion: jit(payload, perm) -> (rows,) uint8 bits."""
    from ..dpf.device import unpack_key_payload

    def fn(payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk = unpack_key_payload(payload, layout)
        return expand_bits_planes(
            seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, perm, d_levels=layout.d_levels
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_answer_batch_fn(layout):
    """Batched one-dispatch answers: jit(table, payloads (Q, L), perm) -> (Q, C)."""
    from ..dpf.device import unpack_key_payload

    def one(table, payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk = unpack_key_payload(payload, layout)
        return answer_query(
            table, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, perm,
            d_levels=layout.d_levels,
        )

    def fn(table, payloads, perm):
        return jax.vmap(lambda p: one(table, p, perm))(payloads)

    return jax.jit(fn)


# Largest query-axis extent a single packed-scan dispatch may carry:
# the kernel's accumulator/output blocks scale with Q and blow the
# 16 MB scoped-VMEM stack at Q = 8192 (measured); larger batches
# are Q-sliced in fused_fast_root_batch_pallas_fn.
_SCAN_Q_VMEM = 4096


def scan_tile_sizes(q: int, rows: int, b: int,
                    max_br: int = 2048, max_bc: int = 512):
    """(block_rows, block_cols) for the Pallas batched scan.

    The bits operand (q, br) and the int32 dot/accumulator (q, bc) scale
    with the query count, so tiles halve at q > 512 and again at
    q > 1024 to stay inside the 16 MB scoped-VMEM budget. The q <= 512
    choices are frozen: cached executables' keys depend on them.
    """
    if q > 1024:
        max_br, max_bc = min(max_br, 512), min(max_bc, 128)
    elif q > 512:
        max_br, max_bc = min(max_br, 1024), min(max_bc, 256)
    br = next((x for x in (max_br, 2048, 1024, 512, 256, 128)
               if x <= max_br and rows % x == 0), rows)
    bc = max_bc if b % max_bc == 0 else b
    return br, bc


def _expand_planes_loop(seeds, t_plane, cw_s, cw_tl, cw_tr, rk, d_levels: int):
    from ..dpf.device import _children, _prf_triple

    for i in range(d_levels):
        out = _prf_triple(seeds, rk)
        s_l, t_l, s_r, t_r = _children(out, t_plane, cw_s[i], cw_tl[i], cw_tr[i])
        seeds = jnp.concatenate([s_l, s_r], axis=-1)
        t_plane = jnp.concatenate([t_l, t_r], axis=-1)
    return seeds, t_plane


@functools.lru_cache(maxsize=64)
def fused_fast_bits_fn(layout):
    """Fast-mode expansion: jit(payload, perm) -> (height,) uint8 bits."""
    from ..dpf.device import fast_leaf_bits, unpack_fast_payload

    def fn(payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        return fast_leaf_bits(seeds, t, fcw, rk_leaf, perm)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_answer_fn(layout):
    """Fast-mode one-dispatch answer: jit(table, payload, perm) -> (C,)."""
    from ..dpf.device import fast_leaf_bits, unpack_fast_payload

    def fn(table, payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        bits = fast_leaf_bits(seeds, t, fcw, rk_leaf, perm)
        mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
        return xor_reduce(table & mask, axis=0)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_answer_batch_fn(layout):
    """Batched fast answers: jit(table, payloads (Q, L), perm) -> (Q, C)."""
    from ..dpf.device import fast_leaf_bits, unpack_fast_payload

    def one(table, payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        bits = fast_leaf_bits(seeds, t, fcw, rk_leaf, perm)
        mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
        return xor_reduce(table & mask, axis=0)

    def fn(table, payloads, perm):
        return jax.vmap(lambda p: one(table, p, perm))(payloads)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_answer_batch_mxu_fn(layout, block: int = 2048):
    """Batched fast answers with the MXU bit-plane scan.

    jit(table_u8 (H_pad, B), payloads (Q, L), perm) -> (Q, B) uint8.
    The table is streamed once per batch (vs once per query on the VPU
    path); preferred for larger batches.
    """
    from ..dpf.device import fast_leaf_bits, unpack_fast_payload
    from ..ops.matmul_scan import mxu_batched_scan

    def bits_of(payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        return fast_leaf_bits(seeds, t, fcw, rk_leaf, perm)

    def fn(table_u8, payloads, perm):
        bits = jax.vmap(lambda p: bits_of(p, perm))(payloads)  # (Q, height)
        h_pad = table_u8.shape[0]
        pad = h_pad - bits.shape[1]
        if pad:
            bits = jnp.pad(bits, ((0, 0), (0, pad)))
        return mxu_batched_scan(table_u8, bits, block=block)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_answer_batch_storage_fn(layout):
    """Batched fast answers, storage-order: no per-query gather at all.

    jit(planes_i8 (flat, 8B), payloads (Q, L)) -> (Q, B) uint8, where the
    plane table rows were scattered into DPF storage order once at build
    (dpf.device.scatter_rows_to_storage_order)."""
    from ..dpf.device import fast_leaf_bits_flat, unpack_fast_payload
    from ..ops.matmul_scan import mxu_preplane_scan

    def bits_of(payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        return fast_leaf_bits_flat(seeds, t, fcw, rk_leaf)

    def fn(planes_i8, payloads):
        bits = jax.vmap(bits_of)(payloads)  # (Q, flat)
        return mxu_preplane_scan(planes_i8, bits)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_answer_storage_fn(layout):
    """Single-query fast answer, storage-order masked-XOR scan:
    jit(table_u32 (flat, C), payload) -> (C,) uint32."""
    from ..dpf.device import fast_leaf_bits_flat, unpack_fast_payload

    def fn(table, payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        bits = fast_leaf_bits_flat(seeds, t, fcw, rk_leaf)
        mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
        return xor_reduce(table & mask, axis=0)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_root_batch_fn(layout):
    """Root-start batched fast answers (v2): the entire DPF tree expands
    on device and the host builds payloads with batch vector ops.

    jit(planes_i8 (flat, 8B), payloads (Q, L)) -> (Q, B) uint8 against a
    storage-ordered plane table (leaf position = bit_reverse(leaf)).
    """
    from ..dpf.device import (
        expand_planes_from_root,
        fast_leaf_bits_flat,
        unpack_fast_root_payload,
    )
    from ..ops.matmul_scan import mxu_preplane_scan

    def bits_of(payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = (
            unpack_fast_root_payload(payload, layout)
        )
        seeds, t = expand_planes_from_root(
            seeds, t, cw_s, cw_tl, cw_tr, rk, layout.depth
        )
        return fast_leaf_bits_flat(seeds, t, fcw, rk_leaf)

    def fn(planes_i8, payloads):
        bits = jax.vmap(bits_of)(payloads)  # (Q, flat)
        return mxu_preplane_scan(planes_i8, bits)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_root_batch_mxu_fn(layout, block: int = 8192):
    """Root-start batched fast answers, streaming MXU scan, gather-free.

    jit(table_u8 (flat_pad, B), payloads (Q, L)) -> (Q, B) uint8 against a
    STORAGE-ORDERED u8 table (rows scattered by _fast_leaf_perm_root at
    build). Used when the storage-ordered plane table exceeds the HBM
    budget (e.g. 1 GiB+ tables): the raw u8 table is 8x smaller than the
    plane table and is unpacked block-wise inside the scan; expanded bits
    are consumed in flat storage order so no per-query gather runs.
    """
    from ..dpf.device import (
        expand_planes_from_root,
        fast_leaf_bits_flat,
        unpack_fast_root_payload,
    )
    from ..ops.matmul_scan import mxu_batched_scan

    def bits_of(payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = (
            unpack_fast_root_payload(payload, layout)
        )
        seeds, t = expand_planes_from_root(
            seeds, t, cw_s, cw_tl, cw_tr, rk, layout.depth
        )
        return fast_leaf_bits_flat(seeds, t, fcw, rk_leaf)

    def fn(table_u8, payloads):
        bits = jax.vmap(bits_of)(payloads)  # (Q, flat)
        pad = table_u8.shape[0] - bits.shape[1]
        if pad:
            bits = jnp.pad(bits, ((0, 0), (0, pad)))
        return mxu_batched_scan(table_u8, bits, block=block)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_root_batch_pallas_fn(layout, block_rows: int = 2048,
                                    block_cols: int = 512,
                                    tail_levels: int = 2,
                                    interpret: bool = False,
                                    all_xla_expand: bool = False):
    """Root-start batched fast answers with Pallas kernels on both hot
    stages: the AES tail walk + leaf PRG run per-query in VMEM
    (ops/pallas_expand.py) and the scan is the fused unpack+matmul
    kernel (ops/pallas_scan.py). Table is the storage-ordered u8 table.

    all_xla_expand (batch-shared-key layouts only): skip the Pallas tail
    and run the ENTIRE expansion — tree walk and leaf PRG — as XLA
    elementwise ops with Q in the lane axis (device.py
    expand_fast_root_lanes_full); bit-exact vs the tail kernel.

    jit(table_u8 (flat_pad, B), payloads (Q, L)) -> (Q, B) uint8.
    """
    from ..dpf.device import (
        _expand_root_level,
        expand_fast_root_lanes_full,
        expand_root_head_lanes,
        unpack_fast_root_payload,
    )
    from ..ops.pallas_expand import fast_tail_expand_pallas
    from ..ops.pallas_scan import mxu_batched_scan_packed_pallas

    depth = layout.depth
    tail = max(0, min(tail_levels, depth - 5))
    head_levels = depth - tail

    shared_rk = getattr(layout, "shared_rk", False)

    def head(payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = (
            unpack_fast_root_payload(payload, layout)
        )
        for i in range(head_levels):
            seeds, t = _expand_root_level(
                seeds, t, cw_s[i], cw_tl[i], cw_tr[i], rk, i
            )
        return (seeds, t[None, :], cw_s[head_levels:], cw_tl[head_levels:],
                cw_tr[head_levels:], rk, fcw, rk_leaf)

    if all_xla_expand and not shared_rk:
        raise ValueError("all_xla_expand needs the batch-shared key layout")

    def fn(table_u8, payloads):
        if shared_rk:
            # one mask expansion for the whole batch (per-query masks pad
            # to ~2 MiB/query under (8,128) tiling — the batch-4096 OOM),
            # and the head walks with Q in the LANE axis: the vmapped
            # per-query head leaves the word axis (1 word for the first
            # five levels) in lanes, ~128x pad waste that measured as
            # ~2/3 of expansion time (benchmarks_fast_roof.py).
            _, _, _, _, _, _, rk, rk_leaf = unpack_fast_root_payload(
                payloads[0], layout
            )
            if all_xla_expand:
                packed = expand_fast_root_lanes_full(
                    payloads, layout, rk, rk_leaf
                )
            else:
                seeds, t, cw_s, cw_tl, cw_tr, fcw = expand_root_head_lanes(
                    payloads, layout, rk, head_levels
                )
                packed = fast_tail_expand_pallas(
                    seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf,
                    levels=tail, interpret=interpret,
                )
        else:
            seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf = jax.vmap(head)(
                payloads
            )
            packed = fast_tail_expand_pallas(
                seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf,
                levels=tail, interpret=interpret,
            )  # (Q,8,16,NWf): word (k*16+i)*NWf+w bit j = table row 32w'+j
        q = packed.shape[0]
        words = packed.reshape(q, -1)  # (Q, flat // 32), free reshape
        rows, b = table_u8.shape
        flat = words.shape[1] * 32
        if rows > flat:  # zero bits for XOR-neutral padded table rows
            words = jnp.pad(words, ((0, 0), (0, (rows - flat) // 32)))
        # bits stay bit-packed all the way into the kernel: the (Q, flat)
        # byte matrix (8x the packed form; the HBM cap on batch > 1024 and
        # ~half the scan's HBM traffic) never materialises. Transposed so
        # queries sit in the lane dim (Mosaic block-shape rule).
        q_vmem = _SCAN_Q_VMEM
        if q <= q_vmem:  # trace identical to pre-slicing code: the
            # cached executables for the q <= 4096 shapes stay valid
            br, bc = scan_tile_sizes(q, rows, b,
                                     max_br=block_rows, max_bc=block_cols)
            return mxu_batched_scan_packed_pallas(
                table_u8, words.T, block_rows=br, block_cols=bc,
                interpret=interpret,
            )
        # The scan's accumulator/output blocks scale with Q, so batches
        # beyond 4096 run in Q-slices (the kernel's scoped-VMEM stack
        # exceeds the 16 MB limit at Q = 8192); the extra table passes
        # cost ~nothing — total HBM traffic here is ~2 GiB against a
        # ~0.5 s batch, two orders of magnitude under the HBM roof.
        outs = []
        for s in range(0, q, q_vmem):
            wc = words[s:s + q_vmem]
            br, bc = scan_tile_sizes(wc.shape[0], rows, b,
                                     max_br=block_rows, max_bc=block_cols)
            outs.append(mxu_batched_scan_packed_pallas(
                table_u8, wc.T, block_rows=br, block_cols=bc,
                interpret=interpret,
            ))
        return jnp.concatenate(outs, axis=0)

    return jax.jit(fn)


def stacked_fast_geometry(depth: int, n_blk: int) -> tuple[int, int]:
    """(k queries per grid step, tail levels) for the stacked fast tail
    (ops/pallas_expand.fast_tail_expand_stacked_pallas).

    k is the largest power of two <= the cap keeping the per-step leaf
    state (k * flat_rows bits, ~k * flat_rows/8 bytes each for the x/out
    blocks) at a few MB of VMEM; the head/tail split then targets
    W = k * NW0 = 128 lane words — full (16, 128) tiles at every kernel
    level, which is the whole point of the stacked scheme.

    The cap default is 32 (r5 sweep: k=32 measured 254.9 ms vs 262.3 ms
    per 4096-batch at the 1 GiB serving shape — expansion per-step
    overhead amortizes over twice the queries; small batches pad to k,
    so the Q=8 latency dispatch carries 32 padded queries' work, ~2% of
    a full batch). PIR_STACKED_K_MAX overrides it for sweeps; the VMEM
    budget scales with the cap (k_cap << 20 stacked bits per block, one
    more tail level and 2x per-step VMEM per doubling), so the knob
    engages even at the headline 2^20-leaf-bit geometry. It must be set
    identically for table build and kernel dispatch — both derive the
    chunk-major storage order from this geometry.
    """
    import os

    k_cap = int(os.environ.get("PIR_STACKED_K_MAX", 32))
    flat_rows = (128 * n_blk) << depth
    k = max(1, min(k_cap, (k_cap << 20) // flat_rows))
    k = 1 << (k.bit_length() - 1)
    head = min(depth, 5 + max(0, (128 // k).bit_length() - 1))
    return k, depth - head


@functools.lru_cache(maxsize=64)
def fused_fast_root_batch_stacked_fn(layout, block_rows: int = 2048,
                                     block_cols: int = 512,
                                     interpret: bool = False):
    """Root-start batched fast answers via the STACKED tail kernel: k
    lane-packed queries per grid step with branches doubling on a
    leading chunk axis — work-proportional (full-tile) AES at every tree
    level, unlike the per-query tail whose sub-128-word levels are
    tile-bound (the r4 sweep measured depth 13/10/9 within 6% despite a
    3x AES spread; see ops/pallas_expand._fast_stack_kernel).

    Requires the batch-shared key layout and a STACKED storage-ordered
    table (server._root_table_u8 with stacked=True — the chunk-major
    flat order differs from the classic bit-reversal one).

    jit(table_u8 (flat_pad, B), payloads (Q, L)) -> (Q, B) uint8.

    Works for BOTH key styles against the SAME stacked table: batch-
    shared keys (layout.shared_rk, one (11,8,3,16,1) rk mask set) and
    distinct-key multi-tenant batches (per-query rk unpacked lane-dense
    and regrouped to per-grid-step (S,11,8,3,16,W) operands — full-tile,
    no per-query mask padding, unlike the vmapped path's batch-4096
    OOM). Callers bound distinct-key batch size (server.
    fast_nonshared_chunk) to cap the regrouped rk HBM footprint
    (~3.7 MB per 16-query grid step).
    """
    from ..dpf.device import (
        _leaf_ctr_masks,
        expand_root_head_grouped,
        regroup_rk_stacked,
        unpack_fast_root_payload,
        unpack_fast_root_payload_lanes_rk,
    )
    from ..ops.pallas_expand import fast_tail_expand_stacked_pallas
    from ..ops.pallas_scan import mxu_batched_scan_packed_pallas

    shared = bool(getattr(layout, "shared_rk", False))
    depth = layout.depth
    n_blk = layout.leaf_blocks
    k, tail = stacked_fast_geometry(depth, n_blk)
    head_levels = depth - tail
    nw0 = max(1, (1 << head_levels) // 32)

    def fn(table_u8, payloads):
        q = payloads.shape[0]
        qp = -(-q // k) * k
        if qp != q:  # pad to the step group; sliced back before return
            payloads = jnp.concatenate(
                [payloads, jnp.tile(payloads[:1], (qp - q, 1))])
        if shared:
            _, _, _, _, _, _, rk, rk_leaf = unpack_fast_root_payload(
                payloads[0], layout)
            rk_head = rk
        else:
            rk_head, rkl_lanes = unpack_fast_root_payload_lanes_rk(
                payloads, layout)
            rk = regroup_rk_stacked(rk_head, k, nw0)
            rk_leaf = regroup_rk_stacked(rkl_lanes, k, nw0)
        seeds, t, cw_s, cw_tl, cw_tr, fcw = expand_root_head_grouped(
            payloads, layout, rk_head, head_levels, k)
        packed = fast_tail_expand_stacked_pallas(
            seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf,
            jnp.asarray(_leaf_ctr_masks(n_blk)),
            tail=tail, n_blk=n_blk, shared_rk=shared, interpret=interpret,
        )  # (S, 8, BN, 16, W); lanes query-major (j*NW0 + w)
        s_n, _, bn, _, _ = packed.shape
        words = packed.reshape(s_n, 8, bn, 16, k, nw0)
        words = words.transpose(0, 4, 1, 2, 3, 5).reshape(qp, -1)
        rows, b = table_u8.shape
        flat = words.shape[1] * 32
        if rows > flat:
            words = jnp.pad(words, ((0, 0), (0, (rows - flat) // 32)))
        q_vmem = _SCAN_Q_VMEM
        outs = []
        for s in range(0, qp, q_vmem):
            wc = words[s:s + q_vmem]
            br, bc = scan_tile_sizes(wc.shape[0], rows, b,
                                     max_br=block_rows, max_bc=block_cols)
            outs.append(mxu_batched_scan_packed_pallas(
                table_u8, wc.T, block_rows=br, block_cols=bc,
                interpret=interpret,
            ))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return out[:q]

    return jax.jit(fn)


def _compat_skip_walk(seeds, t, cw_s, cw_tl, cw_tr, rk, skip: int):
    """Walk `skip` dead leading levels keeping only the left child.

    Operates on root-shaped (8, 16, 1) planes whose lane bit 0 holds the
    seed; high lane bits carry garbage that the first in-word packing
    level of expand_planes_from_root masks away (see CompatRootLayout)."""
    for k in range(skip):
        out = _prf_triple(seeds, rk)
        s_l, t_l, _, _ = _children(out, t, cw_s[k], cw_tl[k], cw_tr[k])
        seeds, t = s_l, t_l
    return seeds, t


@functools.lru_cache(maxsize=64)
def fused_compat_root_batch_fn(layout):
    """Root-start batched COMPAT answers (reference-exact leaf semantics)
    against a bit-reversed-row plane table:
    jit(planes_i8 (2^device_bits, 8B), payloads (Q, L)) -> (Q, B) uint8."""
    from ..dpf.device import (
        _leaf_select_bits,
        _unpack_bits,
        expand_planes_from_root,
        unpack_compat_root_payload,
    )
    from ..ops.matmul_scan import mxu_preplane_scan

    nbd, sk = layout.device_bits, layout.skip

    def bits_of(payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk = unpack_compat_root_payload(
            payload, layout
        )
        seeds, t = _compat_skip_walk(seeds, t, cw_s, cw_tl, cw_tr, rk, sk)
        seeds, t = expand_planes_from_root(
            seeds, t, cw_s[sk:], cw_tl[sk:], cw_tr[sk:], rk, nbd
        )
        packed = _leaf_select_bits(seeds, t, fcw)
        if nbd < 5:
            packed = packed & jnp.uint32((1 << (1 << nbd)) - 1)
        return _unpack_bits(packed, packed.shape[0] * 32)

    def fn(planes_i8, payloads):
        bits = jax.vmap(bits_of)(payloads)  # (Q, 2^nbd)
        return mxu_preplane_scan(planes_i8, bits)

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_compat_root_batch_pallas_fn(layout, w: int = 128,
                                      max_tail: int = 3,
                                      q_chunk: int = 16,
                                      interpret: bool = False):
    """Batched COMPAT answers with the cascaded Pallas expansion + fused
    unpack/matmul scan, against a STORAGE-ORDERED u8 table (rows
    scattered by dpf.device._compat_perm_pallas at build).

    jit(table_u8 (flat_pad, B), payloads (Q, L)) -> (Q, B) uint8.
    Queries are processed in chunks of `q_chunk` under lax.map so the
    cascade's intermediate seed planes (~0.5 MB/query/stage boundary)
    stay bounded; Q must be a multiple of q_chunk (or <= q_chunk).
    """
    from ..dpf.device import (
        compat_stage_plan,
        expand_planes_from_root,
        unpack_compat_root_payload,
    )
    from ..ops.pallas_expand import compat_stage_pallas
    from ..ops.pallas_scan import mxu_batched_scan_packed_pallas

    nbd, sk = layout.device_bits, layout.skip
    split, tails = compat_stage_plan(nbd, w, max_tail)

    def head(payload):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk = unpack_compat_root_payload(
            payload, layout
        )
        seeds, t = _compat_skip_walk(seeds, t, cw_s, cw_tl, cw_tr, rk, sk)
        seeds, t = expand_planes_from_root(
            seeds, t, cw_s[sk:sk + split], cw_tl[sk:sk + split],
            cw_tr[sk:sk + split], rk, split
        )
        return (seeds[:, None], t.reshape(1, 1, w), cw_s[sk + split:],
                cw_tl[sk + split:], cw_tr[sk + split:], rk, fcw)

    def bits_chunk(payloads_c):
        seeds, t, cw_s, cw_tl, cw_tr, rk, fcw = jax.vmap(head)(payloads_c)
        off = 0
        for si, tl in enumerate(tails):
            res = compat_stage_pallas(
                seeds, t, cw_s[:, off:off + tl], cw_tl[:, off:off + tl],
                cw_tr[:, off:off + tl], rk, fcw,
                tail=tl, emit_bits=(si == len(tails) - 1),
                interpret=interpret,
            )
            if si == len(tails) - 1:
                packed = res
            else:
                seeds, t = res
            off += tl
        return packed.reshape(packed.shape[0], -1)  # (qc, NWf) bit words

    def fn(table_u8, payloads):
        qn = payloads.shape[0]
        if qn <= q_chunk:
            words = bits_chunk(payloads)
        else:
            assert qn % q_chunk == 0, (qn, q_chunk)
            words = jax.lax.map(
                bits_chunk, payloads.reshape(-1, q_chunk, payloads.shape[1])
            ).reshape(qn, -1)
        rows, b = table_u8.shape
        pad = rows - words.shape[1] * 32
        if pad:  # zero bits for XOR-neutral padded table rows
            words = jnp.pad(words, ((0, 0), (0, pad // 32)))
        br, bc = scan_tile_sizes(qn, rows, b)
        # bit-packed all the way into the scan kernel: the (Q, 2^nbd) u8
        # matrix (2 MB/query on the 1 GiB table) never materialises
        return mxu_batched_scan_packed_pallas(
            table_u8, words.T, block_rows=br, block_cols=bc,
            interpret=interpret
        )

    return jax.jit(fn)


@functools.lru_cache(maxsize=64)
def fused_fast_answer_batch_preplane_fn(layout):
    """Batched fast answers against a precomputed bit-plane table:
    jit(planes_i8 (H, 8B), payloads (Q, L), perm) -> (Q, B) uint8.
    One MXU matmul per batch — the highest-throughput serving path."""
    from ..dpf.device import fast_leaf_bits, unpack_fast_payload
    from ..ops.matmul_scan import mxu_preplane_scan

    def bits_of(payload, perm):
        seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = unpack_fast_payload(
            payload, layout
        )
        seeds, t = _expand_planes_loop(seeds, t, cw_s, cw_tl, cw_tr, rk,
                                       layout.d_levels)
        return fast_leaf_bits(seeds, t, fcw, rk_leaf, perm)

    def fn(planes_i8, payloads, perm):
        bits = jax.vmap(lambda p: bits_of(p, perm))(payloads)
        return mxu_preplane_scan(planes_i8, bits)

    return jax.jit(fn)


def batched_answer(table, keys, *, d_levels: int):
    """vmap over a batch of queries sharing one table.

    keys is a tuple of arrays with a leading query axis:
    (seeds (Q,8,16,NW0), t (Q,NW0), cw_seed (Q,d,8,16,1), cw_tl (Q,d),
     cw_tr (Q,d), rk (Q,11,8,16,3,1), fcw (Q,), perm (rows,)).
    Returns (Q, C) uint32 answer shares.
    """
    seeds, t_plane, cw_s, cw_tl, cw_tr, rk, fcw, perm = keys

    def one(s, t, cs, ctl, ctr, r, f):
        return answer_query(
            table, s, t, cs, ctl, ctr, r, f, perm, d_levels=d_levels
        )

    return jax.vmap(one)(seeds, t_plane, cw_s, cw_tl, cw_tr, rk, fcw)


@functools.lru_cache(maxsize=16)
def fused_fast_overlap_step_fn(layout, tail_levels: int = 2,
                               interpret: bool = False):
    """Steady-state overlap step: scan batch i's packed selection bits
    while expanding batch i+1 in ONE Pallas kernel (ops/pallas_fused.py),
    so the MXU matmul stream and the VPU AES stream can co-issue.
    Requires the batch-shared PRF-key layout (batch keygen).

    jit(table_u8 (flat_pad, B), words_prev_t (flat_pad // 32, Q),
        payloads (Q, L)) -> (out_prev (Q, B) uint8,
                             words_next_t (flat_pad // 32, Q) uint32).
    Feed words_next_t back as words_prev_t of the next call; the first
    call takes zeros (its out is garbage, discarded) and the last batch
    drains with a zero payload (its tail output is discarded).
    """
    from ..dpf.device import (
        expand_root_head_lanes,
        unpack_fast_root_payload,
    )
    from ..ops.pallas_fused import fused_geometry, fused_scan_expand_pallas

    if not getattr(layout, "shared_rk", False):
        raise ValueError("overlap serving needs the batch-shared key layout")
    if getattr(layout, "leaf_blocks", 1) > 1:
        # the fused kernel's leaf stage is 128-bit only so far; the TCP
        # service shell falls back to lag emulation on this refusal
        raise ValueError("overlap serving does not support wide-leaf keys")
    depth = layout.depth
    tail = max(0, min(tail_levels, depth - 5))
    head_levels = depth - tail

    def fn(table_u8, words_prev_t, payloads):
        _, _, _, _, _, _, rk, rk_leaf = unpack_fast_root_payload(
            payloads[0], layout
        )
        # Q-in-lanes head (full VPU tiles at every level; see the pallas
        # batch path above for the measured rationale)
        seeds, t, cw_s, cw_tl, cw_tr, fcw = expand_root_head_lanes(
            payloads, layout, rk, head_levels
        )
        q = seeds.shape[0]
        rows, b = table_u8.shape
        geo = fused_geometry(rows, b, q, q)
        if geo is None:
            raise ValueError(f"no fused geometry for {(rows, b, q)}")
        q_slice, br, bc = geo
        out_prev, packed = fused_scan_expand_pallas(
            table_u8, words_prev_t, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw,
            rk_leaf, levels=tail, q_slice=q_slice, block_rows=br,
            block_cols=bc, interpret=interpret,
        )
        words = packed.reshape(q, -1)  # free reshape, see pallas path above
        flat = words.shape[1] * 32
        if rows > flat:
            words = jnp.pad(words, ((0, 0), (0, (rows - flat) // 32)))
        return out_prev, words.T

    return jax.jit(fn)
