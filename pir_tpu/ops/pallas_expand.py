"""Pallas TPU kernel for the tail of the fast-mode DPF expansion.

The bitsliced AES tree walk (dpf/device.py) is HBM-bound under XLA: the
~1500-gate-per-AES circuit materialises intermediates between fusions,
and the last two levels plus the leaf PRG hold ~90% of the work. This
kernel walks the last `levels` doubling levels AND the leaf output AES
for one query entirely in VMEM — per query it reads ~100 KB of seeds and
key material and writes the packed leaf bits, with every gate temporary
staying on-chip.

Grid is (Q,); early levels (lane width < 128 words) stay in XLA where
padding waste doesn't matter. Used by models/pipeline.py's fused fast
root-start batch path; bit-for-bit equal to the pure-XLA walk
(tests/test_pallas_expand.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dpf.bitslice import sub_bytes

# Mosaic cannot concatenate vectors whose sublane offsets differ on a
# non-concat dimension, so every byte(-axis) rearrangement below is a
# pltpu.roll + masked select instead of slice-and-concat.


def _byte_mod4(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis) % 4


def _shift_rows_roll(state):
    """ShiftRows: out[4c+r] = in[(4c+4r+r) mod 16] = roll(in, -4r)[4c+r]."""
    ax = state.ndim - 2
    r_ids = _byte_mod4(state.shape, ax)
    out = jnp.where(r_ids == 0, state, 0)
    for r in range(1, 4):
        rolled = pltpu.roll(state, shift=16 - 4 * r, axis=ax)
        out = out | jnp.where(r_ids == r, rolled, 0)
    return out


def _intra_column_rot(state, k):
    """rot_k[4c+r] = in[4c + (r+k)%4] via two rolls + select."""
    ax = state.ndim - 2
    r_ids = _byte_mod4(state.shape, ax)
    down = pltpu.roll(state, shift=16 - k, axis=ax)  # in[b+k]
    up = pltpu.roll(state, shift=4 - k, axis=ax)  # in[b+k-4]
    return jnp.where(r_ids <= 3 - k, down, up)


def _xtime(b):
    """GF(2^8) doubling along the bit axis (axis 0)."""
    return jnp.stack(
        [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7], b[3] ^ b[7], b[4], b[5], b[6]],
        axis=0,
    )


def _mix_columns_roll(state):
    rot1 = _intra_column_rot(state, 1)
    rot2 = _intra_column_rot(state, 2)
    rot3 = _intra_column_rot(state, 3)
    return _xtime(state) ^ _xtime(rot1) ^ rot1 ^ rot2 ^ rot3


def _aes_encrypt_roll(x, rk_masks):
    """Bitsliced AES-128 with Mosaic-legal data movement."""
    state = x ^ rk_masks[0]
    for r in range(1, 10):
        state = sub_bytes(state)
        state = _shift_rows_roll(state)
        state = _mix_columns_roll(state)
        state = state ^ rk_masks[r]
    state = sub_bytes(state)
    state = _shift_rows_roll(state)
    return state ^ rk_masks[10]


def _tail_kernel(levels: int, shared_rk: bool = False, leaf_blocks: int = 1):
    def kernel(seeds_ref, t_ref, cw_s_ref, cw_tl_ref, cw_tr_ref, rk_ref,
               fcw_ref, rkl_ref, *rest):
        if leaf_blocks > 1:
            ctr_ref, out_ref = rest
        else:
            (out_ref,) = rest
        seeds = seeds_ref[0]  # (8, 16, NW0)
        t = t_ref[0]  # (1, NW0)
        # shared_rk: one (11,8,3,16,1) mask set for the whole batch
        rk = rk_ref[...] if shared_rk else rk_ref[0]
        for l in range(levels):
            x = seeds[:, None, :, :]  # (8, 1, 16, NW)
            prg = _aes_encrypt_roll(x, rk) ^ x  # (8, 3, 16, NW) MMO
            s_l = prg[:, 0]
            t_l = prg[0, 1, 0:1, :]  # (1, NW), sublane offset 0
            # sR = block1 bytes 1..15 ++ block2 byte 0 (dpf/client.go:99-116)
            byte_ids = jax.lax.broadcasted_iota(jnp.int32, prg.shape[2:], 0)
            b1 = pltpu.roll(prg[:, 1], shift=15, axis=1)  # byte i+1 -> i
            b2 = pltpu.roll(prg[:, 2], shift=15, axis=1)  # byte 0 -> 15
            s_r = jnp.where(byte_ids == 15, b2, b1)
            # tR = block2 byte 1 bit plane 0 -> roll byte 1 to sublane 0
            t_r = pltpu.roll(prg[0, 2], shift=15, axis=0)[0:1, :]
            corr = t[None] & cw_s_ref[0, l]  # (1,1,NW) & (8,16,1)
            s_l = s_l ^ corr
            s_r = s_r ^ corr
            t_l = t_l ^ (t & cw_tl_ref[0, l])  # (1,NW) & (1,1) tile
            t_r = t_r ^ (t & cw_tr_ref[0, l])
            seeds = jnp.concatenate([s_l, s_r], axis=-1)
            t = jnp.concatenate([t_l, t_r], axis=-1)
        rkl = rkl_ref[...] if shared_rk else rkl_ref[0]
        if leaf_blocks > 1:
            # wide leaf, block-MAJOR lanes: CTR block b of every leaf sits
            # at lane range [b*NW, (b+1)*NW), so the ONE bitsliced AES
            # runs on an (8, 16, n_blk*NW) state with full 128-lane tiles.
            # (The first cut stacked blocks on their own axis, keeping the
            # lane extent at NW = leaves/32 — which SHRINKS with leaf
            # width; the r4 on-chip sweep measured that layout slower
            # than 128-bit leaves despite 3x less AES.)
            nw = seeds.shape[-1]
            x = jnp.concatenate(
                [seeds ^ ctr_ref[:, b] for b in range(leaf_blocks)],
                axis=-1)  # (8, 16, n_blk*NW)
            prg = _aes_encrypt_roll(x, rkl) ^ x
            tt = jnp.concatenate([t] * leaf_blocks, axis=-1)
            fcw = jnp.concatenate(
                [jnp.broadcast_to(fcw_ref[0, :, b], (8, 16, nw))
                 for b in range(leaf_blocks)], axis=-1)
            out_ref[0] = prg ^ (tt[None] & fcw)
        else:
            prg = _aes_encrypt_roll(seeds, rkl) ^ seeds  # leaf MMO
            out_ref[0] = prg ^ (t[None] & fcw_ref[0])

    return kernel


# --------------------------------------------------------------------------
# Compat-mode (reference-exact leaf semantics) stage kernel
# --------------------------------------------------------------------------
# Fast mode terminates the tree early (128 rows per leaf), so one query's
# whole tail fits in VMEM. Compat mode (db.go:128-171 semantics: one tree
# leaf per row, Go-Varint parity leaves) has 32x more nodes; a single
# query's final level alone is ~32 MB of seed planes. The walk is instead
# CASCADED: the canonical state between stages is
#     seeds (Q, 8, NC, 16, W)   t (Q, NC, 1, W)
# i.e. NC chunks of W lane words (W*32 nodes per chunk). Each stage walks
# `tail` doubling levels for one chunk per grid step, entirely in VMEM,
# with the chunk count (a LEADING axis) doubling per level instead of the
# lane axis — so every AES gate op runs on full (byte=16, lane=W) tiles
# even in the first levels of a stage, unlike lane-concat doubling which
# runs half-empty below W words. Stage output chunk order is
# new_chunk = parent_chunk * 2^tail + branches (first level = MSB); the
# table scatter permutation replays this (dpf.device._compat_perm_pallas).
# The final stage ends with the Go-Varint parity leaf select
# (dpf/client.go:141 parity only — see utils.bits.varint_parity_planes)
# and emits packed selection-bit words instead of seeds.


def _stack_level(seeds, t, cw_s_l, cw_tl_l, cw_tr_l, rk):
    """One doubling level in the stacked-chunk scheme.

    seeds (8, B, 16, W), t (B, 1, W) -> (8, 2B, 16, W), (2B, 1, W).
    cw_s_l (8, 16, 1) masks; cw_tl_l/cw_tr_l (1, 1) mask words;
    rk (11, 8, 1, 3, 16, 1).
    """
    x = seeds[:, :, None]  # (8, B, 1, 16, W)
    prg = _aes_encrypt_roll(x, rk) ^ x  # (8, B, 3, 16, W)
    s_l = prg[:, :, 0]  # (8, B, 16, W)
    t_l = prg[0, :, 1, 0:1, :]  # (B, 1, W)
    # sR = block1 bytes 1..15 ++ block2 byte 0 (dpf/client.go:99-116)
    b1 = pltpu.roll(prg[:, :, 1], shift=15, axis=2)
    b2 = pltpu.roll(prg[:, :, 2], shift=15, axis=2)
    byte_ids = jax.lax.broadcasted_iota(jnp.int32, b1.shape, 2)
    s_r = jnp.where(byte_ids == 15, b2, b1)
    t_r = pltpu.roll(prg[0, :, 2], shift=15, axis=1)[:, 0:1, :]
    corr = t[None] & cw_s_l[:, None]  # (1,B,1,W) & (8,1,16,1) -> (8,B,16,W)
    s_l = s_l ^ corr
    s_r = s_r ^ corr
    t_l = t_l ^ (t & cw_tl_l)
    t_r = t_r ^ (t & cw_tr_l)
    b = seeds.shape[1]
    seeds = jnp.stack([s_l, s_r], axis=2).reshape(8, 2 * b, 16, seeds.shape[-1])
    t = jnp.stack([t_l, t_r], axis=1).reshape(2 * b, 1, seeds.shape[-1])
    return seeds, t


def _varint_parity_packed(seeds, t, fcw_mask):
    """Packed compat selection bits from stacked leaf seeds.

    seeds (8, B, 16, W), t (B, 1, W) -> (B, 1, W) packed words with
    bit = (leaf value % 2 == 0) (inverted convention, db.go:142).
    Varint parity = byte0.bit0 ^ byte0.bit1 unless all 8 continuation
    bits (bit 7 of bytes 0..7) are set (utils.bits.varint_parity_planes).
    """
    x7 = seeds[7]  # (B, 16, W) continuation-bit plane
    ids = jax.lax.broadcasted_iota(jnp.int32, x7.shape, 1)
    x7 = jnp.where(ids < 8, x7, jnp.uint32(0xFFFFFFFF))
    for sh in (1, 2, 4, 8):  # cyclic log-AND over the byte axis
        x7 = x7 & pltpu.roll(x7, shift=sh, axis=1)
    allcont = x7[:, 0:1, :]  # (B, 1, W)
    parity = seeds[0][:, 0:1, :] ^ seeds[1][:, 0:1, :]
    return ~((parity & ~allcont) ^ (t & fcw_mask))


def _fast_stack_kernel(tail: int, n_blk: int, shared_rk: bool = True):
    """Stacked fast tail: k lane-packed queries per grid step.

    The per-query tail kernel above is TILE-bound below 128 lane words:
    a tree level at NW words costs one full (16, 128) tile per gate op
    regardless of NW, so cutting tree AES (wide leaves) bought nothing —
    the r4 sweep measured depth 13 / 10 / 9 within 6% of each other.
    This kernel adopts the compat cascade's stacking scheme for the fast
    tail: branches double on a LEADING chunk axis while the lane axis
    holds k queries' words (W = k*NW0, sized to full tiles), so every
    gate op is work-proportional at every level and per-grid-step
    overhead amortizes over k queries.

    Chunk order is new_chunk = parent*2 + branch (MSB-first walk), so a
    final chunk index c equals the leaf's low `tail` bits — the storage
    perm (_fast_leaf_perm_root_stacked) stays a closed form.

    The leaf CTR blocks stack on the same leading axis (block-minor:
    chunk = c*n_blk + b); n_blk = 1 degenerates to the classic leaf with
    a zero CTR mask, so both widths share this one code path.
    """
    def kernel(seeds_ref, t_ref, cw_s_ref, cw_tl_ref, cw_tr_ref, rk_ref,
               fcw_ref, rkl_ref, ctr_ref, out_ref):
        seeds = seeds_ref[0]  # (8, 1, 16, W)
        t = t_ref[0]  # (1, 1, W)
        # shared: (11,8,3,16,1) broadcast over chunks AND lanes; distinct
        # (multi-tenant): per-step (11,8,3,16,W) lane-dense masks, each
        # query's keys repeated across its NW0 lane words
        rk_raw = rk_ref[...] if shared_rk else rk_ref[0]
        rk = rk_raw[:, :, None]  # (11, 8, 1, 3, 16, 1|W)
        for l in range(tail):
            seeds, t = _stack_level(
                seeds, t, cw_s_ref[0, l], cw_tl_ref[0, l], cw_tr_ref[0, l],
                rk,
            )
        b_ch, w = seeds.shape[1], seeds.shape[-1]
        ctr = ctr_ref[...]
        x = seeds[:, :, None] ^ ctr[:, None]  # (8, B, n_blk, 16, W)
        x = x.reshape(8, b_ch * n_blk, 16, w)
        rkl = rkl_ref[...] if shared_rk else rkl_ref[0]
        prg = _aes_encrypt_roll(x, rkl[:, :, None]) ^ x
        fcw = jnp.broadcast_to(
            fcw_ref[0][:, None], (8, b_ch, n_blk, 16, w)
        ).reshape(8, b_ch * n_blk, 16, w)
        tb = jnp.broadcast_to(
            t[:, None], (b_ch, n_blk, 1, w)
        ).reshape(b_ch * n_blk, 1, w)
        out_ref[0] = prg ^ (tb[None] & fcw)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tail", "n_blk", "shared_rk", "interpret")
)
def fast_tail_expand_stacked_pallas(
    seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf, ctr, *,
    tail: int, n_blk: int, shared_rk: bool = True,
    interpret: bool = False,
):
    """Stacked tail walk + leaf PRG, k queries per grid step.

    seeds (S,8,1,16,W), t (S,1,1,W), cw_s (S,tail,8,16,W),
    cw_tl/cw_tr (S,tail,1,W), rk (11,8,3,16,1) batch-shared — or, for
    multi-tenant batches (shared_rk=False), per-step lane-dense rk
    (S,11,8,3,16,W) / rk_leaf (S,11,8,16,W) (dpf.device
    regroup_rk_stacked) — fcw (S,8,n_blk,16,W), rk_leaf (11,8,16,1),
    ctr (8,n_blk,16,1)
    -> (S, 8, 2^tail * n_blk, 16, W) leaf-output words; per query j
    (lane group j*NW0..) flat word order = (bit, chunk, byte, word),
    chunk = (leaf low bits)*n_blk + CTR block.
    """
    s_n, _, _, _, w = seeds.shape
    lv = max(tail, 1)
    if tail == 0:
        cw_s = jnp.zeros((s_n, 1, 8, 16, w), jnp.uint32)
        cw_tl = jnp.zeros((s_n, 1, 1, w), jnp.uint32)
        cw_tr = jnp.zeros((s_n, 1, 1, w), jnp.uint32)
    bn = (1 << tail) * n_blk
    if shared_rk:
        rk_spec = pl.BlockSpec((11, 8, 3, 16, 1), lambda i: (0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        rkl_spec = pl.BlockSpec((11, 8, 16, 1), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        rk_spec = pl.BlockSpec((1, 11, 8, 3, 16, w),
                               lambda i: (i, 0, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        rkl_spec = pl.BlockSpec((1, 11, 8, 16, w),
                                lambda i: (i, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 8, 1, 16, w), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, w), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lv, 8, 16, w), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lv, 1, w), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lv, 1, w), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        rk_spec,
        pl.BlockSpec((1, 8, n_blk, 16, w), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        rkl_spec,
        pl.BlockSpec((8, n_blk, 16, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _fast_stack_kernel(tail, n_blk, shared_rk),
        grid=(s_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, bn, 16, w),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_n, 8, bn, 16, w), jnp.uint32),
        # the leaf AES holds several (8, BN, 16, W) temporaries (~2 MB
        # each at k=16 on a 1 GiB table) — Mosaic's default 16 MB scoped
        # budget rejects the measured 22.7 MB stack; v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf, ctr)


def _compat_stage_kernel(tail: int, emit_bits: bool):
    def kernel(seeds_ref, t_ref, cw_s_ref, cw_tl_ref, cw_tr_ref, rk_ref,
               *rest):
        if emit_bits:
            fcw_ref, out_ref = rest
        else:
            out_s_ref, out_t_ref = rest
        seeds = seeds_ref[0]  # (8, 1, 16, W)
        t = t_ref[0]  # (1, 1, W)
        rk = rk_ref[0][:, :, None]  # (11, 8, 1, 3, 16, 1)
        for l in range(tail):
            seeds, t = _stack_level(
                seeds, t, cw_s_ref[0, l], cw_tl_ref[0, l], cw_tr_ref[0, l], rk
            )
        if emit_bits:
            out_ref[0] = _varint_parity_packed(seeds, t, fcw_ref[0])
        else:
            out_s_ref[0] = seeds
            out_t_ref[0] = t

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tail", "emit_bits", "interpret")
)
def compat_stage_pallas(
    seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, *,
    tail: int, emit_bits: bool, interpret: bool = False,
):
    """One cascade stage: walk `tail` levels for every (query, chunk).

    seeds (Q, 8, NC, 16, W), t (Q, NC, 1, W), cw_s (Q, tail, 8, 16, 1),
    cw_tl/cw_tr (Q, tail) mask words, rk (Q, 11, 8, 3, 16, 1),
    fcw (Q,) mask words (used only when emit_bits).
    Returns (seeds', t') with NC' = NC << tail, or packed selection-bit
    words (Q, NC << tail, 1, W) when emit_bits.
    """
    q, _, nc, _, w = seeds.shape
    b_out = 1 << tail
    cw_tl = cw_tl.reshape(q, tail, 1, 1)
    cw_tr = cw_tr.reshape(q, tail, 1, 1)
    in_specs = [
        pl.BlockSpec((1, 8, 1, 16, w), lambda q_, s: (q_, 0, s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, w), lambda q_, s: (q_, s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tail, 8, 16, 1), lambda q_, s: (q_, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tail, 1, 1), lambda q_, s: (q_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tail, 1, 1), lambda q_, s: (q_, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 11, 8, 3, 16, 1), lambda q_, s: (q_, 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [seeds, t, cw_s, cw_tl, cw_tr, rk]
    if emit_bits:
        in_specs.append(
            pl.BlockSpec((1, 1, 1), lambda q_, s: (q_, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(fcw.reshape(q, 1, 1))
        out_specs = pl.BlockSpec((1, b_out, 1, w), lambda q_, s: (q_, s, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((q, nc * b_out, 1, w), jnp.uint32)
    else:
        out_specs = [
            pl.BlockSpec((1, 8, b_out, 16, w), lambda q_, s: (q_, 0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_out, 1, w), lambda q_, s: (q_, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((q, 8, nc * b_out, 16, w), jnp.uint32),
            jax.ShapeDtypeStruct((q, nc * b_out, 1, w), jnp.uint32),
        ]
    return pl.pallas_call(
        _compat_stage_kernel(tail, emit_bits),
        grid=(q, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("levels", "interpret")
)
def fast_tail_expand_pallas(
    seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf, *,
    levels: int, interpret: bool = False,
):
    """Batched tail walk + leaf PRG, one grid step per query.

    seeds (Q,8,16,NW0), t (Q,1,NW0), cw_s (Q,levels,8,16,1),
    cw_tl/cw_tr (Q,levels) mask words, rk (Q,11,8,3,16,1) — or
    (11,8,3,16,1) shared across the batch — fcw (Q,8,16,1), or
    (Q,8,n_blk,16,1) for wide leaves (leaf_bits = 128*n_blk),
    rk_leaf (Q,11,8,16,1) or (11,8,16,1)
    -> (Q,8,16,NW0 << levels) packed leaf-output words (storage order,
    same convention as dpf.device.fast_leaf_bits_flat pre-unpack), or
    (Q,8,16,n_blk * (NW0 << levels)) for wide leaves (block-major
    lanes: lane = blk * NWf + word).
    """
    shared_rk = rk.ndim == 5
    n_blk = fcw.shape[2] if fcw.ndim == 5 else 1
    q, _, _, nw0 = seeds.shape
    nwf = nw0 << levels
    lv = max(levels, 1)  # zero-size blocks are not allowed
    if levels == 0:
        cw_s = jnp.zeros((q, 1, 8, 16, 1), jnp.uint32)
        cw_tl = jnp.zeros((q, 1), jnp.uint32)
        cw_tr = jnp.zeros((q, 1), jnp.uint32)
    # (Q, L) t-bit CW masks -> (Q, L, 1, 1): Mosaic block shapes must end
    # in dims that are full or (8, 128)-divisible, so ship them as (1, 1)
    # tiles and let the kernel broadcast.
    cw_tl = cw_tl.reshape(q, lv, 1, 1)
    cw_tr = cw_tr.reshape(q, lv, 1, 1)
    rk_spec = (
        pl.BlockSpec((11, 8, 3, 16, 1), lambda i: (0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if shared_rk else
        pl.BlockSpec((1, 11, 8, 3, 16, 1), lambda i: (i, 0, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    rkl_spec = (
        pl.BlockSpec((11, 8, 16, 1), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if shared_rk else
        pl.BlockSpec((1, 11, 8, 16, 1), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    fcw_spec = (
        pl.BlockSpec((1, 8, n_blk, 16, 1), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if n_blk > 1 else
        pl.BlockSpec((1, 8, 16, 1), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec((1, 8, 16, nw0), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, nw0), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lv, 8, 16, 1), lambda i: (i, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lv, 1, 1), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lv, 1, 1), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        rk_spec,
        fcw_spec,
        rkl_spec,
    ]
    args = [seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf]
    if n_blk > 1:
        from ..dpf.device import _leaf_ctr_masks

        in_specs.append(
            pl.BlockSpec((8, n_blk, 16, 1), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.asarray(_leaf_ctr_masks(n_blk)))
        # block-major lanes: lane = blk * nwf + word (see _tail_kernel)
        out_specs = pl.BlockSpec((1, 8, 16, n_blk * nwf),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((q, 8, 16, n_blk * nwf), jnp.uint32)
    else:
        out_specs = pl.BlockSpec((1, 8, 16, nwf), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((q, 8, 16, nwf), jnp.uint32)
    return pl.pallas_call(
        _tail_kernel(levels, shared_rk, n_blk),
        grid=(q,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
