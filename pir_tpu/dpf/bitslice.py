"""Bitsliced AES-128 over uint32 lanes — the TPU DPF PRG kernel core.

TPUs have no AES hardware, so the fixed-key MMO PRG of the reference DPF
(dpf/common.go:60-75) is evaluated *bitsliced*: the state of 32·NW AES
blocks is held as 128 bit-planes (8 bits x 16 byte positions) of uint32
words, one bit per block per plane. All AES steps become XOR/AND/select
ops on whole planes, which map directly onto the TPU VPU (and vectorise on
any XLA backend). SubBytes is computed algebraically — GF(2^8) inversion
via an Itoh–Tsujii addition chain (4 multiplications, squarings folded
into precomputed GF(2)-linear maps) followed by the affine map — and is
machine-verified against the FIPS-197 table in tests.

Layout convention: ``state[bit, byte, ...]`` with bit 0 = LSB, byte index
= position in the 16-byte block. Trailing axes are free (lanes / PRF-slot
axes); all functions broadcast over them.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Host-side GF(2^8) helpers used only to precompute constant linear maps.
# --------------------------------------------------------------------------

_AES_POLY = 0x11B


def _gf_mul_int(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= _AES_POLY
        b >>= 1
    return r


def _gf_pow_int(a: int, e: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _gf_mul_int(r, a)
        a = _gf_mul_int(a, a)
        e >>= 1
    return r


def _linear_map_matrix(f) -> list[list[int]]:
    """8x8 GF(2) matrix of a linear byte map, as per-output input-bit lists."""
    cols = [f(1 << k) for k in range(8)]
    return [[k for k in range(8) if (cols[k] >> j) & 1] for j in range(8)]


# x -> x^2, x -> x^4, x -> x^16 (all linear over GF(2))
_SQ1 = _linear_map_matrix(lambda x: _gf_pow_int(x, 2))
_SQ2 = _linear_map_matrix(lambda x: _gf_pow_int(x, 4))
_SQ4 = _linear_map_matrix(lambda x: _gf_pow_int(x, 16))

# S-box affine layer: out_j = x_j ^ x_{j+4} ^ x_{j+5} ^ x_{j+6} ^ x_{j+7} (mod 8)
_AFFINE = [[j, (j + 4) % 8, (j + 5) % 8, (j + 6) % 8, (j + 7) % 8] for j in range(8)]
_AFFINE_CONST_BITS = (0, 1, 5, 6)  # 0x63

# ShiftRows as a byte-index permutation: new[r+4c] = old[r+4((c+r)%4)]
SHIFT_ROWS_PERM = np.array(
    [(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)], dtype=np.int32
)

_FULL = np.uint32(0xFFFFFFFF)


# --------------------------------------------------------------------------
# Bitsliced circuit (operates on jnp arrays; axis 0 = bit plane)
# --------------------------------------------------------------------------

def _linmap(planes, mat):
    out = []
    for cols in mat:
        acc = planes[cols[0]]
        for k in cols[1:]:
            acc = acc ^ planes[k]
        out.append(acc)
    return out


def gf_mul_planes(a, b):
    """Bitsliced GF(2^8) multiply: two lists of 8 planes -> 8 planes."""
    t = [None] * 15
    for i in range(8):
        for j in range(8):
            p = a[i] & b[j]
            k = i + j
            t[k] = p if t[k] is None else t[k] ^ p
    # reduce x^k for k=14..8 via x^8 = x^4 + x^3 + x + 1
    for k in range(14, 7, -1):
        r = k - 8
        t[r] = t[r] ^ t[k]
        t[r + 1] = t[r + 1] ^ t[k]
        t[r + 3] = t[r + 3] ^ t[k]
        t[r + 4] = t[r + 4] ^ t[k]
    return t[:8]


def gf_inv_planes(x):
    """Bitsliced GF(2^8) inversion x^254 (Itoh–Tsujii; 0 -> 0)."""
    x2 = _linmap(x, _SQ1)
    x3 = gf_mul_planes(x2, x)
    x12 = _linmap(x3, _SQ2)
    x15 = gf_mul_planes(x12, x3)
    x240 = _linmap(x15, _SQ4)
    x252 = gf_mul_planes(x240, x12)
    return gf_mul_planes(x252, x2)


def sub_bytes_algebraic(state):
    """Bitsliced SubBytes via GF(2^8) inversion (reference implementation).

    Kept as an independently-derived cross-check for the Boyar–Peralta
    circuit below; ~5x more gates.
    """
    x = [state[k] for k in range(8)]
    inv = gf_inv_planes(x)
    out = _linmap(inv, _AFFINE)
    out = [o ^ _FULL if j in _AFFINE_CONST_BITS else o for j, o in enumerate(out)]
    return jnp.stack(out, axis=0)


def sub_bytes(state):
    """Bitsliced SubBytes: Boyar–Peralta 113-gate S-box circuit.

    (Boyar & Peralta, "A new combinational logic minimization technique
    with applications to cryptology", depth-16 forward S-box.) The
    circuit's U0..U7 / S0..S7 are MSB-first; our planes are LSB-first,
    hence the reversed indexing. Verified exhaustively against the
    FIPS-197 table in tests/test_bitslice.py.
    """
    U0, U1, U2, U3, U4, U5, U6, U7 = (state[7 - i] for i in range(8))
    y14 = U3 ^ U5
    y13 = U0 ^ U6
    y9 = U0 ^ U3
    y8 = U0 ^ U5
    t0 = U1 ^ U2
    y1 = t0 ^ U7
    y4 = y1 ^ U3
    y12 = y13 ^ y14
    y2 = y1 ^ U0
    y5 = y1 ^ U6
    y3 = y5 ^ y8
    t1 = U4 ^ y12
    y15 = t1 ^ U5
    y20 = t1 ^ U1
    y6 = y15 ^ U7
    y10 = y15 ^ t0
    y11 = y20 ^ y9
    y7 = U7 ^ y11
    y17 = y10 ^ y11
    y19 = y10 ^ y8
    y16 = t0 ^ y11
    y21 = y13 ^ y16
    y18 = U0 ^ y16
    t2 = y12 & y15
    t3 = y3 & y6
    t4 = t3 ^ t2
    t5 = y4 & U7
    t6 = t5 ^ t2
    t7 = y13 & y16
    t8 = y5 & y1
    t9 = t8 ^ t7
    t10 = y2 & y7
    t11 = t10 ^ t7
    t12 = y9 & y11
    t13 = y14 & y17
    t14 = t13 ^ t12
    t15 = y8 & y10
    t16 = t15 ^ t12
    t17 = t4 ^ t14
    t18 = t6 ^ t16
    t19 = t9 ^ t14
    t20 = t11 ^ t16
    t21 = t17 ^ y20
    t22 = t18 ^ y19
    t23 = t19 ^ y21
    t24 = t20 ^ y18
    t25 = t21 ^ t22
    t26 = t21 & t23
    t27 = t24 ^ t26
    t28 = t25 & t27
    t29 = t28 ^ t22
    t30 = t23 ^ t24
    t31 = t22 ^ t26
    t32 = t31 & t30
    t33 = t32 ^ t24
    t34 = t23 ^ t33
    t35 = t27 ^ t33
    t36 = t24 & t35
    t37 = t36 ^ t34
    t38 = t27 ^ t36
    t39 = t29 & t38
    t40 = t25 ^ t39
    t41 = t40 ^ t37
    t42 = t29 ^ t33
    t43 = t29 ^ t40
    t44 = t33 ^ t37
    t45 = t42 ^ t41
    z0 = t44 & y15
    z1 = t37 & y6
    z2 = t33 & U7
    z3 = t43 & y16
    z4 = t40 & y1
    z5 = t29 & y7
    z6 = t42 & y11
    z7 = t45 & y17
    z8 = t41 & y10
    z9 = t44 & y12
    z10 = t37 & y3
    z11 = t33 & y4
    z12 = t43 & y13
    z13 = t40 & y5
    z14 = t29 & y2
    z15 = t42 & y9
    z16 = t45 & y14
    z17 = t41 & y8
    t46 = z15 ^ z16
    t47 = z10 ^ z11
    t48 = z5 ^ z13
    t49 = z9 ^ z10
    t50 = z2 ^ z12
    t51 = z2 ^ z5
    t52 = z7 ^ z8
    t53 = z0 ^ z3
    t54 = z6 ^ z7
    t55 = z16 ^ z17
    t56 = z12 ^ t48
    t57 = t50 ^ t53
    t58 = z4 ^ t46
    t59 = z3 ^ t54
    t60 = t46 ^ t57
    t61 = z14 ^ t57
    t62 = t52 ^ t58
    t63 = t49 ^ t58
    t64 = z4 ^ t59
    t65 = t61 ^ t62
    t66 = z1 ^ t63
    S0 = t59 ^ t63
    S6 = (t56 ^ t62) ^ _FULL
    S7 = (t48 ^ t60) ^ _FULL
    t67 = t64 ^ t65
    S3 = t53 ^ t66
    S4 = t51 ^ t66
    S5 = t47 ^ t65
    S1 = (t64 ^ S3) ^ _FULL
    S2 = (t55 ^ t67) ^ _FULL
    out = [S7, S6, S5, S4, S3, S2, S1, S0]  # back to LSB-first planes
    return jnp.stack(out, axis=0)


def shift_rows(state):
    return jnp.take(state, SHIFT_ROWS_PERM, axis=-2)


def _xtime(b):
    """GF doubling on a list of 8 planes."""
    return [b[7], b[0] ^ b[7], b[1], b[2] ^ b[7], b[3] ^ b[7], b[4], b[5], b[6]]


def mix_columns(state):
    # byte axis (-2) viewed as (col, row); bytes i = 4c + r per FIPS-197
    lead = state.shape[:-2]
    s4 = state.reshape(lead + (4, 4) + state.shape[-1:])  # (..., col, row, NW)
    b = [[s4[k, ..., r, :] for k in range(8)] for r in range(4)]  # b[r][bit]
    xt = [_xtime(b[r]) for r in range(4)]
    out_rows = []
    for r in range(4):
        o = [
            xt[r][k]
            ^ xt[(r + 1) % 4][k] ^ b[(r + 1) % 4][k]
            ^ b[(r + 2) % 4][k]
            ^ b[(r + 3) % 4][k]
            for k in range(8)
        ]
        out_rows.append(jnp.stack(o, axis=0))  # (8, ..., col, NW)
    out = jnp.stack(out_rows, axis=-2)  # (8, ..., col, row, NW)
    return out.reshape(state.shape)


def aes_encrypt_planes(x, rk_masks):
    """Bitsliced AES-128 encryption.

    Args:
      x: (8, ..., 16, NW) uint32 plaintext planes — bit axis first, byte
        axis second-to-last (so it lands in TPU sublanes), lanes last;
        middle axes are free (PRF-slot, query-batch, ...).
      rk_masks: (11, 8, ..., 16, 1-or-NW) uint32 round-key masks
        (0 / 0xFFFFFFFF), broadcast-compatible with x.
    Returns ciphertext planes, shape = broadcast(x, rk_masks[0]).
    """
    state = x ^ rk_masks[0]
    for r in range(1, 10):
        state = sub_bytes(state)
        state = shift_rows(state)
        state = mix_columns(state)
        state = state ^ rk_masks[r]
    state = sub_bytes(state)
    state = shift_rows(state)
    return state ^ rk_masks[10]


# --------------------------------------------------------------------------
# Host <-> plane packing helpers (numpy)
# --------------------------------------------------------------------------

def blocks_to_planes(blocks: np.ndarray) -> np.ndarray:
    """(n, 16) uint8 blocks -> (8, 16, ceil(n/32)) uint32 bit planes.

    Bit j of word w in plane (k, i) is bit k of byte i of block 32w+j.
    """
    n = blocks.shape[0]
    nw = -(-n // 32)
    padded = np.zeros((nw * 32, 16), dtype=np.uint8)
    padded[:n] = blocks
    bits = (padded[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1  # (N,16,8)
    bits = bits.transpose(2, 1, 0).astype(np.uint32)  # (8,16,N)
    bits = bits.reshape(8, 16, nw, 32)
    shifts = np.arange(32, dtype=np.uint32)
    return (bits << shifts).sum(axis=-1, dtype=np.uint32)


def planes_to_blocks(planes: np.ndarray, n: int) -> np.ndarray:
    """Inverse of blocks_to_planes -> (n, 16) uint8."""
    planes = np.asarray(planes)
    shifts = np.arange(32, dtype=np.uint32)
    bits = (planes[..., None] >> shifts) & np.uint32(1)  # (8,16,nw,32)
    bits = bits.reshape(8, 16, -1)[:, :, :n]  # (8,16,n)
    bytes_ = (bits.astype(np.uint8) << np.arange(8, dtype=np.uint8)[:, None, None]).sum(
        axis=0, dtype=np.uint8
    )
    return bytes_.T.copy()  # (16, n) -> (n, 16)


def key_masks(round_keys: np.ndarray) -> np.ndarray:
    """Round keys (..., 11, 16) uint8 -> masks (11, 8, 16, ...) uint32.

    Leading axes of the input (e.g. a PRF-slot axis) become trailing axes
    of the output so they broadcast against lane dimensions.
    """
    rks = np.asarray(round_keys, dtype=np.uint8)
    lead = rks.shape[:-2]
    bits = (rks[..., None] >> np.arange(8, dtype=np.uint8)) & 1  # (..., 11, 16, 8)
    bits = np.moveaxis(bits, [-3, -1, -2], [0, 1, 2])  # (11, 8, 16, ...)
    return (bits.astype(np.uint32) * _FULL).reshape((11, 8, 16) + lead)
