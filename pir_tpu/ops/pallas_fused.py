"""Fused scan+expand Pallas kernel: overlap the VPU and the MXU.

The serving pipeline's device time is ~55% DPF tail expansion (bitsliced
AES — pure VPU ALU work, measured at its roof) and ~45% batched scan
(int8 MXU matmuls at ~77% of their roof). XLA runs the two stages
sequentially, leaving each unit idle ~half the time. This kernel runs
BOTH in every grid step — one query-slice of batch i's packed-bits scan
against a table tile, and one slice of batch i+1's tail expansion — so
the Mosaic scheduler can co-issue MXU matmuls with the AES gate stream.
Ceiling if the units overlap fully: ~1.7x end-to-end (the XLA head and
glue stay serial). Measured (r3, docs/PERFORMANCE.md): the overlap does
NOT beat the default async pipeline at the serving shape (7,024 vs
7,850 GB/s same-window) — this kernel is the serving-stream backend
(one dispatch per batch, bounded memory), not the throughput headline.

Geometry: grid (n_qslices, n_cols, n_rows), rows innermost. The scan
processes the Q query bits in `q_slice`-wide slices (the bits block
(BR, q_slice) and the accumulator (q_slice, BC) bound VMEM, exactly like
the split kernel's Q-slicing); the QE expansion queries are distributed
one slice per grid step over ALL steps, so per-step VPU work (~one
query's tail walk) balances per-step MXU work at the serving shape
(Q=QE=4096, q_slice=2048, BR=2048, BC=256 -> 4096 steps). Scan semantics
match ops/pallas_scan.mxu_batched_scan_packed_pallas and expansion
matches ops/pallas_expand.fast_tail_expand_pallas with batch-shared PRF
round keys, bit for bit (tests/test_pallas_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_expand import _aes_encrypt_roll


def _fused_kernel(levels: int):
    def kernel(words_ref, table_ref, seeds_ref, t_ref, cw_s_ref, cw_tl_ref,
               cw_tr_ref, rk_ref, fcw_ref, rkl_ref, o_ref, tail_out_ref,
               acc_ref):
        i = pl.program_id(2)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # ---- expansion slice of batch i+1 (VPU: bitsliced AES walk) ----
        # per-query body is verbatim pallas_expand._tail_kernel (the bit
        # axis must stay leading for the AES circuit), unrolled over the
        # small static per-step slice.
        rk = rk_ref[...]  # (11, 8, 3, 16, 1) batch-shared
        rkl = rkl_ref[...]  # (11, 8, 16, 1)
        for sq in range(seeds_ref.shape[0]):
            seeds = seeds_ref[sq]  # (8, 16, NW0)
            t = t_ref[sq]  # (1, NW0)
            for l in range(levels):
                x = seeds[:, None, :, :]  # (8, 1, 16, NW)
                prg = _aes_encrypt_roll(x, rk) ^ x  # (8, 3, 16, NW) MMO
                s_l = prg[:, 0]
                t_l = prg[0, 1, 0:1, :]  # (1, NW)
                byte_ids = jax.lax.broadcasted_iota(
                    jnp.int32, prg.shape[2:], 0)
                b1 = pltpu.roll(prg[:, 1], shift=15, axis=1)
                b2 = pltpu.roll(prg[:, 2], shift=15, axis=1)
                s_r = jnp.where(byte_ids == 15, b2, b1)
                t_r = pltpu.roll(prg[0, 2], shift=15, axis=0)[0:1, :]
                corr = t[None] & cw_s_ref[sq, l]  # (1,1,NW) & (8,16,1)
                s_l = s_l ^ corr
                s_r = s_r ^ corr
                t_l = t_l ^ (t & cw_tl_ref[sq, l])
                t_r = t_r ^ (t & cw_tr_ref[sq, l])
                seeds = jnp.concatenate([s_l, s_r], axis=-1)
                t = jnp.concatenate([t_l, t_r], axis=-1)
            prg = _aes_encrypt_roll(seeds, rkl) ^ seeds  # leaf MMO
            tail_out_ref[sq] = prg ^ (t[None] & fcw_ref[sq])

        # ---- scan step of batch i (MXU: packed bits x table planes) ----
        # The unpack runs in 8-word (256-row) chunks: a monolithic
        # (wpb, 32, q_slice) u32 shift intermediate is 16.8 MB at the
        # serving geometry (br=2048, q_slice=2048) and blows the 16 MB
        # scoped-VMEM stack (measured on chip); chunking caps the live
        # intermediate at ~2 MB. Parity of a sum = XOR of parities, so
        # each chunk's folded bytes XOR straight into the accumulator —
        # bit-for-bit the same answer as the one-shot contraction.
        rows = table_ref[...]  # (BR, BC) uint8
        wpb = words_ref.shape[0]
        shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
        contract = (((0,), (0,)), ((), ()))
        wc = 8  # words (x32 rows) per chunk
        for c in range(0, wpb, wc):
            words = words_ref[c:c + wc]  # (wc, q_slice) uint32
            qsl = words.shape[1]
            bits_t = ((words[:, None, :] >> shifts) & jnp.uint32(1)).astype(
                jnp.int8
            ).reshape(wc * 32, qsl)
            rows_c = rows[c * 32:(c + wc) * 32]
            folded = jnp.zeros(acc_ref.shape, jnp.int32)
            for p in range(8):
                plane = (rows_c & np.uint8(1 << p) != 0).astype(jnp.int8)
                d = jax.lax.dot_general(bits_t, plane, contract,
                                        preferred_element_type=jnp.int32)
                folded = folded | ((d & 1) << p)
            acc_ref[...] ^= folded

        @pl.when(i == pl.num_programs(2) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "levels", "q_slice", "block_rows", "block_cols", "interpret"))
def fused_scan_expand_pallas(
    table_u8: jnp.ndarray,
    packed_bits_t: jnp.ndarray,
    seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf, *,
    levels: int,
    q_slice: int | None = None,
    block_rows: int = 2048,
    block_cols: int = 512,
    interpret: bool = False,
):
    """Scan batch i while expanding batch i+1 in one kernel.

    Scan operands (as mxu_batched_scan_packed_pallas):
      table_u8 (H, B) uint8, packed_bits_t (H // 32, Q) uint32.
    Expansion operands (as fast_tail_expand_pallas, batch-shared keys):
      seeds (QE, 8, 16, NW0), t (QE, 1, NW0), cw_s (QE, levels, 8, 16, 1),
      cw_tl/cw_tr (QE, levels) mask words, rk (11, 8, 3, 16, 1),
      fcw (QE, 8, 16, 1), rk_leaf (11, 8, 16, 1).
    Returns (answers (Q, B) uint8, tail_out (QE, 8, 16, NW0 << levels)).

    QE must be divisible by the grid step count
    (Q // q_slice) * (B // block_cols) * (H // block_rows);
    the caller picks the geometry (see fused_geometry).
    """
    h, b = table_u8.shape
    q = packed_bits_t.shape[1]
    if q_slice is None:
        q_slice = q
    qe, _, _, nw0 = seeds.shape
    nwf = nw0 << levels
    assert h % block_rows == 0 and b % block_cols == 0, (h, b)
    assert block_rows % 256 == 0 and packed_bits_t.shape[0] == h // 32
    assert q % q_slice == 0, (q, q_slice)
    n_sl, n_cols, n_rows = q // q_slice, b // block_cols, h // block_rows
    n_steps = n_sl * n_cols * n_rows
    assert qe % n_steps == 0, (qe, n_steps)
    qs = qe // n_steps  # expansion queries per grid step
    lv = max(levels, 1)
    if levels == 0:
        cw_s = jnp.zeros((qe, 1, 8, 16, 1), jnp.uint32)
        cw_tl = jnp.zeros((qe, 1), jnp.uint32)
        cw_tr = jnp.zeros((qe, 1), jnp.uint32)
    cw_tl = cw_tl.reshape(qe, lv, 1, 1)
    cw_tr = cw_tr.reshape(qe, lv, 1, 1)
    wpb = block_rows // 32

    def qblk(s, j, i):  # linear step id -> expansion query-slice block
        return (s * n_cols + j) * n_rows + i

    return pl.pallas_call(
        _fused_kernel(levels),
        grid=(n_sl, n_cols, n_rows),
        in_specs=[
            pl.BlockSpec((wpb, q_slice), lambda s, j, i: (i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, block_cols), lambda s, j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, 8, 16, nw0),
                         lambda s, j, i: (qblk(s, j, i), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, 1, nw0), lambda s, j, i: (qblk(s, j, i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, lv, 8, 16, 1),
                         lambda s, j, i: (qblk(s, j, i), 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, lv, 1, 1),
                         lambda s, j, i: (qblk(s, j, i), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, lv, 1, 1),
                         lambda s, j, i: (qblk(s, j, i), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((11, 8, 3, 16, 1), lambda s, j, i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, 8, 16, 1),
                         lambda s, j, i: (qblk(s, j, i), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((11, 8, 16, 1), lambda s, j, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_slice, block_cols), lambda s, j, i: (s, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, 8, 16, nwf),
                         lambda s, j, i: (qblk(s, j, i), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, b), jnp.uint8),
            jax.ShapeDtypeStruct((qe, 8, 16, nwf), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((q_slice, block_cols), jnp.int32)],
        interpret=interpret,
    )(packed_bits_t, table_u8, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf)


def fused_geometry(h: int, b: int, q: int, qe: int):
    """Pick (q_slice, block_rows, block_cols) so per-step MXU and VPU
    work balance (one expansion query per step) within the VMEM budget,
    or None when no geometry divides the shapes."""
    cands = [(2048, 256), (2048, 128), (1024, 256), (1024, 128),
             (512, 128), (4096, 256)]
    if b <= 256:  # narrow tables: full-width column blocks
        cands += [(4096, b), (2048, b), (1024, b), (512, b), (256, b)]
    for q_slice in (2048, 1024, 512, q):
        if q_slice > q or q % q_slice:
            continue
        for br, bc in cands:
            if h % br or b % bc or br % 256:
                continue
            steps = (q // q_slice) * (b // bc) * (h // br)
            if steps and qe % steps == 0 and qe // steps <= 8:
                return q_slice, br, bc
    return None
