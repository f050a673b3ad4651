"""Bit-manipulation utilities shared by the DPF and scan layers.

These replicate, exactly, the low-level conventions of the reference Go
implementation (see /root/reference):

* ``get_bit`` — MSB-first 1-indexed bit extraction (dpf/common.go:53-58).
* ``go_uvarint`` / ``go_varint`` — Go ``encoding/binary`` varint decoding,
  used by the reference to turn the final DPF seed into a signed integer
  (dpf/client.go:141, dpf/server.go:96).
* vectorised numpy variants used by the host full-domain evaluator.
"""

from __future__ import annotations

import numpy as np

GO_UINT_BITS = 64  # Go `uint` is 64-bit on all relevant platforms.


def get_bit(n: int, pos: int, nbits: int = GO_UINT_BITS) -> int:
    """0th position is the most significant bit; 1-indexed from MSB.

    Mirrors dpf/common.go:53-58: ``(n & (1 << (N - pos))) >> (N - pos)``.
    """
    return (n >> (nbits - pos)) & 1


def go_uvarint(buf: bytes) -> tuple[int, int]:
    """Go encoding/binary.Uvarint semantics for a short buffer.

    Returns (value, n). n == 0 means the buffer was exhausted without a
    terminating byte (value 0). Overflow cases (10+ byte varints) cannot
    occur for the 8-byte buffers the DPF uses.
    """
    x = 0
    s = 0
    for i, b in enumerate(buf):
        if b < 0x80:
            return x | (b << s), i + 1
        x |= (b & 0x7F) << s
        s += 7
    return 0, 0


def go_varint(buf: bytes) -> tuple[int, int]:
    """Go encoding/binary.Varint (zigzag-decoded signed varint)."""
    ux, n = go_uvarint(buf)
    x = ux >> 1
    if ux & 1:
        x = -(x + 1)  # Go: x = ^x for int64
    return x, n


def go_varint_vec(buf: np.ndarray) -> np.ndarray:
    """Vectorised Go Varint over rows of an (n, 8) uint8 array.

    Returns int64 values with identical semantics to ``go_varint`` applied
    per row (including the all-continuation-bytes => 0 edge case).
    """
    assert buf.ndim == 2 and buf.shape[1] == 8
    b = buf.astype(np.uint64)
    is_term = buf < 0x80  # (n, 8)
    has_term = is_term.any(axis=1)
    first = np.argmax(is_term, axis=1)  # index of terminator (0 if none)
    j = np.arange(8, dtype=np.uint64)
    contrib = (b & np.uint64(0x7F)) << (np.uint64(7) * j)[None, :]
    mask = j[None, :] <= first[:, None].astype(np.uint64)
    ux = np.where(mask, contrib, np.uint64(0)).sum(axis=1, dtype=np.uint64)
    ux = np.where(has_term, ux, np.uint64(0))
    val = (ux >> np.uint64(1)).astype(np.int64)
    neg = (ux & np.uint64(1)).astype(bool)
    val = np.where(neg, -(val + 1), val)
    return val


def varint_parity_planes(byte_planes_lo2: np.ndarray, cont_planes: np.ndarray) -> np.ndarray:
    """Parity (LSB) of the Go-Varint decoding, computed from bit planes.

    The parity of the decoded signed value depends only on the two lowest
    bits of byte 0 — parity = bit1 ^ bit0 — unless *all* 8 bytes have their
    continuation (MSB) bit set, in which case the value is 0 (parity 0).

    Args:
      byte_planes_lo2: (2, ...) planes of byte0 bit0 and byte0 bit1.
      cont_planes: (8, ...) planes of the MSBs of bytes 0..7.
    Returns packed parity plane (uint array of same trailing shape).
    """
    allcont = cont_planes[0]
    for k in range(1, 8):
        allcont = allcont & cont_planes[k]
    return (byte_planes_lo2[0] ^ byte_planes_lo2[1]) & ~allcont


def num_bits_for_height(height: int) -> int:
    """DPF domain size used by the reference: uint(log2(h) + 1).

    Mirrors query.go:61 / db.go:117: float log2 then +1 then uint-truncate.
    For exact powers of two this yields one *extra* bit (h=1024 -> 11).
    """
    import math

    if height <= 0:
        raise ValueError("height must be positive")
    return int(math.log2(height) + 1)


def bitrev_permutation(num_bits: int) -> np.ndarray:
    """Index array P with P[i] = bit_reverse(i, num_bits).

    The breadth-first device expansion stores leaf x at position
    bit_reverse(x); gathering with this permutation restores natural order.
    """
    n = 1 << num_bits
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros(n, dtype=np.uint64)
    for b in range(num_bits):
        rev |= ((idx >> np.uint64(b)) & np.uint64(1)) << np.uint64(num_bits - 1 - b)
    return rev.astype(np.int64)


def pack_bits_u32(bits: np.ndarray) -> np.ndarray:
    """Pack a (..., n) array of {0,1} into (..., ceil(n/32)) uint32, LSB-first."""
    n = bits.shape[-1]
    pad = (-n) % 32
    if pad:
        bits = np.concatenate(
            [bits, np.zeros(bits.shape[:-1] + (pad,), dtype=bits.dtype)], axis=-1
        )
    b = bits.astype(np.uint32).reshape(bits.shape[:-1] + (-1, 32))
    shifts = np.arange(32, dtype=np.uint32)
    return (b << shifts).sum(axis=-1, dtype=np.uint32)


def unpack_bits_u32(words: np.ndarray, n: int) -> np.ndarray:
    """Inverse of pack_bits_u32: (..., nw) uint32 -> (..., n) uint8."""
    shifts = np.arange(32, dtype=np.uint32)
    bits = (words[..., :, None] >> shifts) & np.uint32(1)
    return bits.reshape(words.shape[:-1] + (-1,))[..., :n].astype(np.uint8)
