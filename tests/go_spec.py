"""Independent transcription of the reference Go DPF 2-party semantics.

This module is the AUDIT side of the golden-vector fixtures: a second,
from-scratch implementation of the reference's two-party DPF evaluation,
written directly from the Go sources (cited per function) and sharing NO
code with ``pir_tpu`` — AES here is pure Python with the S-box derived
algebraically from GF(2^8) inversion (FIPS-197 §5.1.1), not OpenSSL, and
the varint/getBit/parity helpers are re-derived from the Go stdlib spec
rather than imported from ``pir_tpu.utils``.

Agreement between this module, ``pir_tpu.dpf.host``, and the frozen
vector files in tests/vectors/ is what pins the "bit-for-bit vs Go"
claim: a refactor that silently moves the spec in host.py now has to
get past two independently written implementations plus frozen data.

Deliberately slow (pure-Python AES): use on small domains / few points.
"""

from __future__ import annotations

import math

BLOCK_SIZE = 16
INIT_PRF_LEN = 4  # dpf/common.go:10


# ---------------------------------------------------------------------------
# AES-128 from FIPS-197, S-box derived algebraically (§5.1.1)
# ---------------------------------------------------------------------------

def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B  # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return p


def _gf_inv(a: int) -> int:
    if a == 0:
        return 0
    # a^(2^8 - 2) by square-and-multiply
    r, e = 1, 254
    base = a
    while e:
        if e & 1:
            r = _gf_mul(r, base)
        base = _gf_mul(base, base)
        e >>= 1
    return r


def _affine(x: int) -> int:
    out = 0
    for i in range(8):
        bit = (
            (x >> i) & 1
        ) ^ ((x >> ((i + 4) % 8)) & 1) ^ ((x >> ((i + 5) % 8)) & 1) ^ (
            (x >> ((i + 6) % 8)) & 1
        ) ^ ((x >> ((i + 7) % 8)) & 1) ^ ((0x63 >> i) & 1)
        out |= bit << i
    return out


SBOX = [_affine(_gf_inv(x)) for x in range(256)]


def _key_expansion(key: bytes) -> list[list[int]]:
    assert len(key) == 16
    rcon = 1
    w = [list(key[4 * i:4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        temp = list(w[i - 1])
        if i % 4 == 0:
            temp = temp[1:] + temp[:1]  # RotWord
            temp = [SBOX[b] for b in temp]  # SubWord
            temp[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        w.append([a ^ b for a, b in zip(w[i - 4], temp)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(11)]


def _sub_bytes(s):
    return [SBOX[b] for b in s]


def _shift_rows(s):
    # column-major state: byte r + 4c
    out = [0] * 16
    for c in range(4):
        for r in range(4):
            out[r + 4 * c] = s[r + 4 * ((c + r) % 4)]
    return out


def _mix_columns(s):
    out = [0] * 16
    for c in range(4):
        col = s[4 * c:4 * c + 4]
        out[4 * c + 0] = _gf_mul(col[0], 2) ^ _gf_mul(col[1], 3) ^ col[2] ^ col[3]
        out[4 * c + 1] = col[0] ^ _gf_mul(col[1], 2) ^ _gf_mul(col[2], 3) ^ col[3]
        out[4 * c + 2] = col[0] ^ col[1] ^ _gf_mul(col[2], 2) ^ _gf_mul(col[3], 3)
        out[4 * c + 3] = _gf_mul(col[0], 3) ^ col[1] ^ col[2] ^ _gf_mul(col[3], 2)
    return out


def aes128_encrypt_block(round_keys: list[list[int]], block: bytes) -> bytes:
    s = [b ^ k for b, k in zip(block, round_keys[0])]
    for rnd in range(1, 10):
        s = _mix_columns(_shift_rows(_sub_bytes(s)))
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
    s = _shift_rows(_sub_bytes(s))
    return bytes(b ^ k for b, k in zip(s, round_keys[10]))


# ---------------------------------------------------------------------------
# Go stdlib pieces the reference leans on
# ---------------------------------------------------------------------------

def go_varint(buf: bytes) -> int:
    """encoding/binary.Varint over buf: Uvarint then zigzag decode.

    Mirrors the stdlib: stop at the first byte < 0x80; if no terminator
    within the buffer, Uvarint returns (0, 0) — the reference ignores the
    n return (dpf/server.go:96), so the value is 0 in that case.
    """
    ux, shift = 0, 0
    terminated = False
    for b in buf:
        if b < 0x80:
            ux |= b << shift
            terminated = True
            break
        ux |= (b & 0x7F) << shift
        shift += 7
    if not terminated:
        ux = 0
    x = ux >> 1
    if ux & 1:
        x = ~x  # Go: x = ^x (two's complement on int64; Python ~ matches)
    return x


def get_bit(n: int, pos: int, nbits: int = 64) -> int:
    """dpf/common.go:53-58: 0th position is the MSB, pos is 1-indexed."""
    return (n & (1 << (nbits - pos))) >> (nbits - pos)


# ---------------------------------------------------------------------------
# The DPF itself (dpf/common.go, dpf/server.go)
# ---------------------------------------------------------------------------

class SpecDpf:
    """Party state: fixed AES round keys + domain size (dpf/common.go:17-27)."""

    def __init__(self, prf_keys: list[bytes], num_bits: int):
        assert len(prf_keys) == INIT_PRF_LEN
        self.round_keys = [_key_expansion(k) for k in prf_keys]
        self.num_bits = num_bits
        self.n = 64  # Go uint is 64-bit on the reference platforms


def prf(dpf: SpecDpf, x: bytes, num_blocks: int = 3) -> bytes:
    """Fixed-key MMO PRG: out_i = AES_{k_i}(x) ^ x (dpf/common.go:60-75)."""
    out = bytearray()
    for i in range(num_blocks):
        ct = aes128_encrypt_block(dpf.round_keys[i], x)
        out += bytes(c ^ p for c, p in zip(ct, x))
    return bytes(out)


def evaluate_2p(dpf: SpecDpf, server_num: int, s_init: bytes, t_init: int,
                cw: list[bytes], final_cw: int, x: int) -> int:
    """Transcription of Evaluate2P (dpf/server.go:55-101), byte-for-byte,
    including the count-reset overlay that applies sCW to both child
    seeds and the per-child t-bit CWs at offsets 16 and 33."""
    s_curr = bytearray(s_init)
    t_curr = t_init
    for i in range(dpf.num_bits):
        x_bit = 0 if i == dpf.n else get_bit(x, dpf.n - dpf.num_bits + i + 1, dpf.n)
        f_out = bytearray(prf(dpf, bytes(s_curr), 3))
        count = 0
        for j in range(BLOCK_SIZE * 2 + 2):
            if j == BLOCK_SIZE + 1:
                count = 0
            elif j == BLOCK_SIZE * 2 + 1:
                count = BLOCK_SIZE + 1
            f_out[j] ^= t_curr * cw[i][count]
            count += 1
        if x_bit == 0:
            s_curr[:] = f_out[:BLOCK_SIZE]
            t_curr = f_out[BLOCK_SIZE] % 2
        else:
            s_curr[:] = f_out[BLOCK_SIZE + 1:BLOCK_SIZE * 2 + 1]
            t_curr = f_out[BLOCK_SIZE * 2 + 1] % 2
    s_final = go_varint(bytes(s_curr[:8]))
    res = s_final + t_curr * final_cw
    return res if server_num == 0 else -res


def prf_extended(dpf: SpecDpf, x: bytes, num_blocks: int) -> bytes:
    """MMO PRG with the framework's documented CTR extension.

    The reference's prf is broken past initPRFLen blocks: it would index
    cipher i >= 4 out of FixedBlocks (dpf/common.go:62-67 never grows the
    cipher list) and its grown `out` is a local that the caller's f.Out
    never sees (dpf/common.go:63 with dpf/server.go:131-136). The
    framework's documented divergence (pir_tpu/dpf/aes_host.py
    prf_blocks) extends the PRG as

        out_i = AES_{k_{i mod 4}}(x ^ ctr_i) ^ (x ^ ctr_i),
        ctr_i = little-endian uint64(i // 4) in bytes 0..7,

    identical to the reference for i < 4. Re-derived here from that
    statement alone (memoized per SpecDpf: the value is a pure function
    of (x, num_blocks), and MP full-domain audits revisit the same seed
    for every point of a row).
    """
    memo = getattr(dpf, "_prf_memo", None)
    if memo is None:
        memo = dpf._prf_memo = {}
    got = memo.get((x, num_blocks))
    if got is not None:
        return got
    out = bytearray()
    for i in range(num_blocks):
        if i < INIT_PRF_LEN:
            xi = x
        else:
            ctr = (i // INIT_PRF_LEN).to_bytes(8, "little") + bytes(8)
            xi = bytes(a ^ c for a, c in zip(x, ctr))
        ct = aes128_encrypt_block(dpf.round_keys[i % INIT_PRF_LEN], xi)
        out += bytes(c ^ p for c, p in zip(ct, xi))
    res = bytes(out)
    memo[(x, num_blocks)] = res
    return res


M_BYTES = 4  # f.M: MP output word size in bytes (dpf/client.go:43)


def mp_mu(num_bits: int, num_parties: int) -> int:
    """µ = ceil(2^(numBits/2) * 2^((p-1)/2)) (dpf/server.go:113), in the
    FLOAT arithmetic of the Go source — quirk included.

    The float product overshoots exact powers of two when both exponents
    are half-integers: e.g. numBits=7, p=4 gives 2^3.5 * 2^1.5 =
    32.00000000000001 in IEEE doubles, so µ = 33 where exact math says
    32 (verified against the exact integer form ceil(sqrt(2^(nb+p-1)))
    during development). The artifact is harmless — δ < 2^(numBits/2) ≤
    either µ, so the extra words are padding — but key shapes (CW width,
    PRG block count) follow the float value, and pir_tpu.dpf.host
    replicates it, so the spec must too. Python math.pow and Go math.Pow
    are both C-libm doubles; the MP path is dead code in Go (keygen
    panics), so host-vs-spec agreement is the operative contract.
    """
    return int(math.ceil(
        math.pow(2, num_bits / 2) * math.pow(2, (num_parties - 1) / 2)
    ))


def evaluate_mp(dpf: SpecDpf, num_parties: int, sigma: list[bytes],
                cw: list[list[int]], x: int) -> int:
    """Transcription of EvaluateMP (dpf/server.go:110-144) with the
    framework's two documented divergences applied:

    * γ/δ split by INTENDED precedence — δ = low numBits/2 bits,
      γ = the remaining high bits (dpf/server.go:116-117 as written
      degenerates under Go operator precedence: `<<` binds like `*`, so
      `(mask << numBits / 2)` parses as `(mask << numBits) / 2` and γ is
      always 0; the path is dead code in Go, keygen panics at
      dpf/client.go:152-156);
    * the CTR PRG extension of prf_extended above (the literal Go prf
      cannot produce more than 4 blocks).

    Everything else — the all-zero-seed slot skip, per-slot XOR of the
    PRG words then the correction words, little-endian uint32 word reads,
    the final y[δ] select — follows the Go source line by line
    (dpf/server.go:119-143).
    """
    p2 = 1 << (num_parties - 1)
    mu = mp_mu(dpf.num_bits, num_parties)
    num_bits = dpf.num_bits

    delta_bits = num_bits // 2  # Go integer division, numBits/2
    delta = x & ((1 << delta_bits) - 1)
    gamma = (x >> delta_bits) & ((1 << (num_bits - delta_bits)) - 1)
    m_bytes = M_BYTES * mu

    y = [0] * mu
    for i in range(p2):
        s = sigma[gamma][i * BLOCK_SIZE:(i + 1) * BLOCK_SIZE]
        if not any(s):  # all-zero seed slot is skipped (server.go:124-131)
            continue
        num_blocks = (m_bytes + BLOCK_SIZE - 1) // BLOCK_SIZE  # ceil
        out = prf_extended(dpf, bytes(s), num_blocks)
        for k in range(mu):
            word = int.from_bytes(out[M_BYTES * k:M_BYTES * (k + 1)], "little")
            y[k] ^= word
        for j in range(mu):
            y[j] ^= cw[i][j]
    return y[delta]


def selection_bit(value: int) -> int:
    """db.go:140-146: inverted parity — row selected when eval is EVEN.

    The Go code takes ``uint(result) % 2`` before any float conversion
    (the IMPORTANT comments at db.go:141,145); for negative results
    uint64 conversion preserves the low bit, so plain ``value & 1`` in
    Python (which is always the nonnegative low bit) matches.
    """
    return 1 if (value & 1) == 0 else 0


def num_bits_for_height(height: int) -> int:
    """query.go:54-61 / db.go:113-117: uint(log2(h)) + 1 via float log2."""
    import math

    return int(math.log2(height)) + 1
