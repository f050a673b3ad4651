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


def _tail_kernel(levels: int):
    def kernel(seeds_ref, t_ref, cw_s_ref, cw_tl_ref, cw_tr_ref, rk_ref,
               fcw_ref, rkl_ref, out_ref):
        seeds = seeds_ref[0]  # (8, 16, NW0)
        t = t_ref[0]  # (1, NW0)
        rk = rk_ref[0]  # (11, 8, 3, 16, 1)
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
        prg = _aes_encrypt_roll(seeds, rkl_ref[0]) ^ seeds  # leaf MMO
        out_ref[0] = prg ^ (t[None] & fcw_ref[0])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("levels", "interpret")
)
def fast_tail_expand_pallas(
    seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf, *,
    levels: int, interpret: bool = False,
):
    """Batched tail walk + leaf PRG, one grid step per query.

    seeds (Q,8,16,NW0), t (Q,1,NW0), cw_s (Q,levels,8,16,1),
    cw_tl/cw_tr (Q,levels) mask words, rk (Q,11,8,3,16,1),
    fcw (Q,8,16,1), rk_leaf (Q,11,8,16,1)
    -> (Q,8,16,NW0 << levels) packed leaf-output words (storage order,
    same convention as dpf.device.fast_leaf_bits_flat pre-unpack).
    """
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
    return pl.pallas_call(
        _tail_kernel(levels),
        grid=(q,),
        in_specs=[
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
            pl.BlockSpec((1, 11, 8, 3, 16, 1), lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 16, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 11, 8, 16, 1), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 16, nwf), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, 8, 16, nwf), jnp.uint32),
        interpret=interpret,
    )(seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf)
