"""Masked-XOR database scan kernels.

The 2-server PIR answer is ``XOR over rows r with bit[r]=1 of row r`` —
the reference's hot loop 2 (db.go:74-107). On TPU this is a VPU-bound
streaming op: mask each uint32 row word with (0 - bit) and XOR-reduce
over the row axis. HBM bandwidth is the ceiling; the arithmetic is 2 ops
per word.

Batched variants (many queries against one table) move to the MXU via
bit-plane decomposition in ``matmul_scan.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xor_reduce(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.lax.reduce(x, jnp.zeros((), x.dtype), jax.lax.bitwise_xor,
                          (axis,))


@jax.jit
def masked_xor_scan(table: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """table (H, C) uint32, bits (H,) uint8/uint32 {0,1} -> (C,) uint32."""
    mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, None]
    return xor_reduce(table & mask, axis=0)


@jax.jit
def masked_xor_scan_batched(table: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """table (H, C) uint32, bits (Q, H) -> (Q, C) uint32 (VPU path)."""
    mask = (jnp.uint32(0) - bits.astype(jnp.uint32))[:, :, None]
    return xor_reduce(table[None, :, :] & mask, axis=1)


def pack_table_u32(data: np.ndarray, height: int, group_size: int) -> np.ndarray:
    """(db_size, slot_bytes) uint8 -> (height, group_size * words) uint32.

    Rows cover slots [r*G, (r+1)*G); each slot is zero-padded to a whole
    number of little-endian uint32 words so slot boundaries stay aligned.
    """
    db_size, slot_bytes = data.shape
    words = max(1, -(-slot_bytes // 4))
    arr = np.zeros((height, group_size, words * 4), dtype=np.uint8)
    used = height * group_size
    arr[:, :, :slot_bytes] = data[:used].reshape(height, group_size, slot_bytes)
    return arr.view("<u4").reshape(height, group_size * words)


def pack_rows_u32(data: np.ndarray, rows: np.ndarray, group_size: int,
                  slot_bytes: int) -> np.ndarray:
    """pack_table_u32's row layout for just the given grid rows — the
    live-update patch values (engines scatter these over cached word
    tables, server.py/mesh.py apply_updates)."""
    words = max(1, -(-slot_bytes // 4))
    h = data.shape[0] // group_size
    arr = np.zeros((len(rows), group_size, words * 4), dtype=np.uint8)
    arr[:, :, :slot_bytes] = data[: h * group_size].reshape(
        h, group_size, slot_bytes
    )[rows]
    return arr.view("<u4").reshape(len(rows), group_size * words)


def unpack_result_u32(res: np.ndarray, group_size: int, slot_bytes: int) -> np.ndarray:
    """(G*words,) uint32 -> (G, slot_bytes) uint8."""
    words = max(1, -(-slot_bytes // 4))
    # ascontiguousarray: some backends (the axon relay) hand back host
    # views with a strided minor axis, on which .view() would raise
    b = np.ascontiguousarray(
        np.asarray(res, dtype="<u4").reshape(group_size, words)
    ).view(np.uint8)
    return b.reshape(group_size, words * 4)[:, :slot_bytes]
