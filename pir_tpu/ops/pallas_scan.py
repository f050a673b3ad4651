"""Pallas TPU kernel for the masked-XOR database scan.

Streams the table HBM->VMEM in (BR, BC) tiles on a (cols, rows) grid —
rows innermost so each column-block's accumulator tile stays resident in
VMEM across the whole row sweep — masks each row tile with its selection
bits and folds it into the accumulator with a log2 XOR tree. This is the
hand-scheduled form of ops/scan.masked_xor_scan (bit-for-bit identical;
see tests/test_pallas_scan.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(bits_ref, table_ref, o_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    mask = jnp.uint32(0) - bits_ref[...]  # (BR, 1) 0/~0
    x = table_ref[...] & mask
    n = x.shape[0]
    while n > 1:  # log2 fold over the row axis
        n //= 2
        x = x[:n] ^ x[n:2 * n]
    o_ref[...] ^= x


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
def masked_xor_scan_pallas(
    table: jnp.ndarray,
    bits: jnp.ndarray,
    block_rows: int = 1024,
    block_cols: int = 512,
    interpret: bool = False,
):
    """table (H, C) uint32, bits (H,) {0,1} -> (C,) uint32.

    H must be a multiple of block_rows and C of block_cols (pad the table
    with zero rows / the bits with zeros; zero rows never affect XOR).
    """
    h, c = table.shape
    assert h % block_rows == 0 and c % block_cols == 0, (h, c)
    grid = (c // block_cols, h // block_rows)
    out = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, block_cols), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_cols), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.uint32),
        interpret=interpret,
    )(bits.astype(jnp.uint32)[:, None], table)
    return out[0]
