"""Batched XOR scan on the MXU via bit-plane decomposition.

XOR of selected rows = per-bit parity of a sum: decompose the table into
8 bit-planes, compute (Q,H)x(H,B) int8 matmuls per plane with int32
accumulation (exact: H < 2^31), take each accumulator mod 2, recombine
bytes. The table is streamed once per *batch* (vs once per query for the
VPU masked-XOR path), so large query batches become MXU-bound:
8·Q·H·B int8 MACs against the v5e MXU's ~197 T MAC/s roof (394 int8
TOPS, counting a MAC as two ops).

Used by TpuPirServer for batches above a threshold; bit-for-bit equal to
the masked-XOR scan (tests/test_matmul_scan.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("block",))
def mxu_batched_scan(table_u8: jnp.ndarray, bits: jnp.ndarray, block: int = 2048):
    """table (H, B) uint8, bits (Q, H) {0,1} -> (Q, B) uint8 XOR-scan.

    H must be a multiple of `block` (pad rows with zeros; zero rows never
    affect the XOR).
    """
    h, b = table_u8.shape
    q = bits.shape[0]
    nblk = h // block
    bits_i8 = bits.astype(jnp.int8)

    def body(i, acc):
        rows = jax.lax.dynamic_slice(table_u8, (i * block, 0), (block, b))
        bblk = jax.lax.dynamic_slice(bits_i8, (0, i * block), (q, block))
        for p in range(8):
            plane = ((rows >> np.uint8(p)) & np.uint8(1)).astype(jnp.int8)
            acc = acc.at[p].add(
                jnp.dot(bblk, plane, preferred_element_type=jnp.int32)
            )
        return acc

    acc = jax.lax.fori_loop(
        0, nblk, body, jnp.zeros((8, q, b), dtype=jnp.int32)
    )
    parity = (acc & 1).astype(jnp.uint8)
    out = parity[0]
    for p in range(1, 8):
        out = out | (parity[p] << np.uint8(p))
    return out


def make_plane_table(table_u8: np.ndarray, chunk: int = 1 << 16) -> np.ndarray:
    """Precompute the bit-plane table: (H, B) uint8 -> (H, B*8) int8.

    Column index = byte*8 + bit. 8x the table memory; turns the batched
    scan into a single (Q,H)x(H,8B) int8 MXU matmul per batch (the table
    is then read once per batch with zero unpacking work).
    """
    h, b = table_u8.shape
    out = np.empty((h, b * 8), dtype=np.int8)
    shifts = np.arange(8, dtype=np.uint8)
    for s in range(0, h, chunk):
        e = min(h, s + chunk)
        bits = (table_u8[s:e, :, None] >> shifts) & np.uint8(1)
        out[s:e] = bits.reshape(e - s, b * 8)
    return out


@jax.jit
def mxu_preplane_scan(planes_i8: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """planes (H, 8B) int8 (from make_plane_table), bits (Q, H) {0,1}
    -> (Q, B) uint8 XOR-scan. Exact: int32 accumulation, H < 2^31."""
    acc = jnp.dot(
        bits.astype(jnp.int8), planes_i8, preferred_element_type=jnp.int32
    )  # (Q, 8B)
    q = acc.shape[0]
    acc = acc.reshape(q, -1, 8) & 1  # (Q, B, 8)
    shifts = np.arange(8, dtype=np.uint8)
    return (acc.astype(jnp.uint8) << shifts).sum(axis=-1, dtype=jnp.uint8)


def pad_rows_u8(table_u8: np.ndarray, block: int) -> np.ndarray:
    h = table_u8.shape[0]
    pad = (-h) % block
    if not pad:
        return table_u8
    return np.concatenate(
        [table_u8, np.zeros((pad, table_u8.shape[1]), dtype=np.uint8)]
    )
