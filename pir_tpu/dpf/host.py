"""Exact host (client-side / golden) implementation of the reference DPF.

Semantics are replicated bit-for-bit from the reference Go package
``pir/dpf`` (BGI'16 two-party DPF with a fixed-key MMO AES PRG):

* ``client_initialize`` / ``server_initialize`` — dpf/client.go:17-48,
  dpf/server.go:16-46.
* ``generate_two_server``  — dpf/client.go:56-150.
* ``evaluate_2p``          — dpf/server.go:55-101 (single point).
* ``eval_full_domain``     — vectorised breadth-first evaluation producing
  the same values as per-point ``evaluate_2p`` over the whole domain; this
  is the host golden model for the TPU expansion kernel (the reference
  instead re-walks the tree per row: db.go:128-171, O(N log N) AES calls).
* ``evaluate_mp``          — dpf/server.go:110-144 (multi-party XOR-
  homomorphic eval). Multi-party *keygen* (``generate_multi_server``) is
  COMPLETED here: the reference's is a panic stub (dpf/client.go:152-156),
  so this implements the sqrt-grid construction its eval implies, with a
  documented 1-privacy PRG-extension divergence (see the function's
  docstring and server.py's XOR parity convention note).
"""

from __future__ import annotations

import math
import os
import secrets
from dataclasses import dataclass, field

import numpy as np

from ..utils.bits import GO_UINT_BITS, get_bit, go_varint, go_varint_vec
from .aes_host import BLOCK_SIZE, INIT_PRF_LEN, EcbCipher, prf_blocks


@dataclass
class PrfKey:
    """16-byte AES key; the PRG seed keys (dpf/common.go:13-15)."""

    bytes: bytes


@dataclass
class Key2P:
    """Two-party DPF key (dpf/common.go:29-35)."""

    s_init: bytes  # 16 bytes
    t_init: int  # 0/1
    cw: list[bytes]  # num_bits entries of 18 bytes: 16B seed CW + tL + tR
    final_cw: int


@dataclass
class KeyMP:
    """Multi-party DPF key (dpf/common.go:37-42)."""

    num_parties: int
    cw: list[np.ndarray]  # uint32 arrays
    sigma: list[bytes]


@dataclass
class Dpf:
    """Party state (dpf/common.go:17-27)."""

    num_bits: int
    prf_keys: list[PrfKey]
    ciphers: list[EcbCipher] = field(repr=False)
    n: int = GO_UINT_BITS
    m: int = 4  # multiparty word size


def client_initialize(num_bits: int, rng: secrets.SystemRandom | None = None) -> Dpf:
    """Sample the 4 fixed PRF keys (dpf/client.go:17-48)."""
    keys = [os.urandom(BLOCK_SIZE) for _ in range(INIT_PRF_LEN)]
    return Dpf(
        num_bits=num_bits,
        prf_keys=[PrfKey(k) for k in keys],
        ciphers=[EcbCipher(k) for k in keys],
    )


def server_initialize(prf_keys: list[PrfKey], num_bits: int) -> Dpf:
    """Rebuild the fixed ciphers from client-provided keys (dpf/server.go:16-46)."""
    return Dpf(
        num_bits=num_bits,
        prf_keys=list(prf_keys),
        ciphers=[EcbCipher(k.bytes) for k in prf_keys],
    )


def _prf1(dpf: Dpf, x: bytes, num_blocks: int = 3) -> bytes:
    out = prf_blocks(np.frombuffer(x, dtype=np.uint8)[None, :], dpf.ciphers, num_blocks)
    return out[0].tobytes()


def generate_two_server(dpf: Dpf, a: int, b: int) -> list[Key2P]:
    """BGI'16 two-party keygen for f(a)=b (dpf/client.go:56-150)."""
    nb = dpf.num_bits
    temp_rand = os.urandom(BLOCK_SIZE + 1)
    s_init0 = temp_rand[:BLOCK_SIZE]
    t_init0 = temp_rand[BLOCK_SIZE] % 2
    s_init1 = os.urandom(BLOCK_SIZE)
    t_init1 = t_init0 ^ 1

    s_curr0 = bytearray(s_init0)
    s_curr1 = bytearray(s_init1)
    t_curr0, t_curr1 = t_init0, t_init1

    cw = []
    left, right = 0, BLOCK_SIZE + 1
    for i in range(nb):
        out0 = _prf1(dpf, bytes(s_curr0))
        out1 = _prf1(dpf, bytes(s_curr1))
        t0l = out0[BLOCK_SIZE] % 2
        t0r = out0[BLOCK_SIZE * 2 + 1] % 2
        t1l = out1[BLOCK_SIZE] % 2
        t1r = out1[BLOCK_SIZE * 2 + 1] % 2
        a_bit = get_bit(a, dpf.n - nb + i + 1, dpf.n)

        keep, lose = (left, right) if a_bit == 0 else (right, left)

        cw_i = bytearray(BLOCK_SIZE + 2)
        for j in range(BLOCK_SIZE):
            cw_i[j] = out0[lose + j] ^ out1[lose + j]
        cw_i[BLOCK_SIZE] = t0l ^ t1l ^ a_bit ^ 1
        cw_i[BLOCK_SIZE + 1] = t0r ^ t1r ^ a_bit
        cw.append(bytes(cw_i))

        for j in range(BLOCK_SIZE):
            s_curr0[j] = out0[keep + j] ^ (t_curr0 * cw_i[j])
            s_curr1[j] = out1[keep + j] ^ (t_curr1 * cw_i[j])
        t_cw_keep = cw_i[BLOCK_SIZE] if keep == left else cw_i[BLOCK_SIZE + 1]
        t_curr0 = (out0[keep + BLOCK_SIZE] % 2) ^ (t_cw_keep * t_curr0)
        t_curr1 = (out1[keep + BLOCK_SIZE] % 2) ^ (t_cw_keep * t_curr1)

    s_final0, _ = go_varint(bytes(s_curr0[:8]))
    s_final1, _ = go_varint(bytes(s_curr1[:8]))
    final_cw = b - s_final0 + s_final1
    if t_curr1 == 1:
        final_cw = -final_cw

    return [
        Key2P(s_init0, t_init0, list(cw), final_cw),
        Key2P(s_init1, t_init1, list(cw), final_cw),
    ]


def generate_two_server_batch(
    dpf: Dpf, points: "list[int]", b: int
) -> "list[list[Key2P]]":
    """Vectorised reference-semantics keygen: Q keys in one tree walk.

    Identical per-key semantics to generate_two_server (dpf/client.go:
    56-150 incl. the signed-Varint FinalCW); numpy replaces the
    per-byte Python loops and each level's 2Q PRG expansions run as two
    AES-NI ECB dispatches. All Q keys share the caller's ``dpf`` PRF
    keys — those are public (sent to every server with the share), so
    security rests on the fresh per-query seeds.
    """
    nb = dpf.num_bits
    q = len(points)
    pts = np.asarray(points, dtype=np.uint64)

    rnd = np.frombuffer(os.urandom(q * 33), np.uint8).reshape(q, 33)
    s0 = rnd[:, :16].copy()
    t0 = (rnd[:, 32] & 1).astype(np.uint8)
    s1 = rnd[:, 16:32].copy()
    t1 = t0 ^ 1

    s_curr0, s_curr1 = s0.copy(), s1.copy()
    t_curr0, t_curr1 = t0.copy(), t1.copy()
    cw = np.zeros((q, nb, 18), np.uint8)
    cols = np.arange(16)
    for i in range(nb):
        out0 = prf_blocks(s_curr0, dpf.ciphers, 3).reshape(q, 48)
        out1 = prf_blocks(s_curr1, dpf.ciphers, 3).reshape(q, 48)
        a_bit = ((pts >> np.uint64(nb - 1 - i)) & np.uint64(1)).astype(
            np.uint8
        )
        keep = np.where(a_bit == 0, 0, 17).astype(np.int64)[:, None]
        lose = 17 - keep
        cw_seed = (np.take_along_axis(out0, lose + cols, 1)
                   ^ np.take_along_axis(out1, lose + cols, 1))
        cw_tl = (out0[:, 16] & 1) ^ (out1[:, 16] & 1) ^ a_bit ^ 1
        cw_tr = (out0[:, 33] & 1) ^ (out1[:, 33] & 1) ^ a_bit
        cw[:, i, :16] = cw_seed
        cw[:, i, 16] = cw_tl
        cw[:, i, 17] = cw_tr
        s_curr0 = (np.take_along_axis(out0, keep + cols, 1)
                   ^ (t_curr0[:, None] * cw_seed))
        s_curr1 = (np.take_along_axis(out1, keep + cols, 1)
                   ^ (t_curr1[:, None] * cw_seed))
        t_cw_keep = np.where(a_bit == 0, cw_tl, cw_tr)
        t_curr0 = ((np.take_along_axis(out0, keep + 16, 1)[:, 0] & 1)
                   ^ (t_cw_keep * t_curr0))
        t_curr1 = ((np.take_along_axis(out1, keep + 16, 1)[:, 0] & 1)
                   ^ (t_cw_keep * t_curr1))

    s_finals0 = go_varint_vec(s_curr0[:, :8]) if q else []
    s_finals1 = go_varint_vec(s_curr1[:, :8]) if q else []
    out = []
    for j in range(q):
        final_cw = b - int(s_finals0[j]) + int(s_finals1[j])
        if t_curr1[j] == 1:
            final_cw = -final_cw
        cws = [cw[j, i].tobytes() for i in range(nb)]
        out.append([
            Key2P(s0[j].tobytes(), int(t0[j]), cws, final_cw),
            Key2P(s1[j].tobytes(), int(t1[j]), cws, final_cw),
        ])
    return out


def _mp_params(num_bits: int, num_parties: int):
    """Derived exactly from the eval's arithmetic (dpf/server.go:119-124)."""
    p2 = 1 << (num_parties - 1)
    mu = int(
        math.ceil(math.pow(2, num_bits / 2) * math.pow(2, (num_parties - 1) / 2))
    )
    gamma_bits = (num_bits + 1) // 2
    delta_bits = num_bits // 2
    return p2, mu, gamma_bits, delta_bits


def generate_multi_server(dpf: Dpf, a: int, b: int, num_parties: int) -> list[KeyMP]:
    """p-party (>=3) DPF keygen for f(a)=b, XOR-output shares.

    The reference scaffolds the multi-party *eval* (dpf/server.go:110-144)
    but leaves keygen as a panic stub (dpf/client.go:152-156); this
    completes it with the classic seed-sharing construction the eval
    implies (BGI'15-style, 1-out-of-2^{p-1} presence patterns):

    * per row gamma there are 2^{p-1} seed slots; all parties holding a
      slot share the same seed, and presence vectors v_j are random
      subject to XOR_j v_j = 0 for gamma != gamma_a and = all-ones at
      gamma_a, so expansions cancel pairwise except at the target row;
    * correction words satisfy XOR_i CW_i = XOR_i G(s_{gamma_a, i}) ^
      b*e_{delta_a}, making the surviving row sum to the point value.

    Security (1-private, matching the non-colluding-servers threat model
    the reference states for its multi-server setting): a single server's
    view — its presence vectors plus the seeds on their support — is
    independent of (a, b). Presence vectors are sampled subject to the
    XOR constraint *and* re-sampled per row so no single party ever holds
    ALL slots of a row: a party covering every slot of the target row
    could otherwise detect it by checking XOR_i(G(s_i) ^ CW_i) for
    sparsity. With the rejection step each party's per-row marginal is
    identical for every row. Coalitions are not protected against (the
    2-party DPF is likewise only 1-private).
    """
    if num_parties < 3:
        raise ValueError("use generate_two_server for 2 parties")
    nb = dpf.num_bits
    p2, mu, gamma_bits, delta_bits = _mp_params(nb, num_parties)
    n_gamma = 1 << gamma_bits
    gamma_a = (a >> delta_bits) & (n_gamma - 1)
    delta_a = a & ((1 << delta_bits) - 1)
    num_blocks = -(-dpf.m * mu // BLOCK_SIZE)

    # shared seeds per (row, slot); the target row's slot expansions
    seeds = np.frombuffer(os.urandom(n_gamma * p2 * 16), dtype=np.uint8).reshape(
        n_gamma, p2, 16
    ).copy()
    # avoid the eval's all-zero-seed skip (dpf/server.go:127-136)
    zero_rows = ~seeds.any(axis=2)
    seeds[zero_rows, 0] = 1

    g_out = prf_blocks(seeds[gamma_a], dpf.ciphers, num_blocks)  # (p2, nbl, 16)
    g_words = (
        g_out.reshape(p2, -1)[:, : dpf.m * mu].copy().view("<u4").reshape(p2, mu)
    )

    cw = np.frombuffer(os.urandom(p2 * mu * 4), dtype="<u4").reshape(p2, mu).copy()
    target = np.zeros(mu, dtype=np.uint32)
    target[delta_a] = np.uint32(b & 0xFFFFFFFF)
    # XOR_i cw[i] = XOR_i G(s_i) ^ target
    acc = np.bitwise_xor.reduce(cw[:-1], axis=0) if p2 > 1 else np.zeros(
        mu, np.uint32
    )
    cw[-1] = acc ^ np.bitwise_xor.reduce(g_words, axis=0) ^ target

    # presence vectors: XOR_j v_j = all-ones at gamma_a else all-zeros,
    # rejection-sampled so no single party holds ALL slots of any row
    # (see the privacy note in the docstring)
    v = np.frombuffer(
        os.urandom(n_gamma * (num_parties - 1) * p2), dtype=np.uint8
    ).reshape(num_parties - 1, n_gamma, p2) & 1
    v_last = np.bitwise_xor.reduce(v, axis=0)
    v_last[gamma_a] ^= 1
    v = np.concatenate([v, v_last[None]], axis=0)  # (p, n_gamma, p2)
    for _ in range(64):
        full = v.all(axis=2).any(axis=0)  # (n_gamma,) any party all-ones
        if not full.any():
            break
        k = int(full.sum())
        fresh = np.frombuffer(
            os.urandom(k * (num_parties - 1) * p2), dtype=np.uint8
        ).reshape(num_parties - 1, k, p2) & 1
        v[:-1, full] = fresh
        vl = np.bitwise_xor.reduce(fresh, axis=0)
        rows = np.flatnonzero(full)
        vl[rows == gamma_a] ^= 1
        v[-1, full] = vl
    else:  # pragma: no cover
        raise RuntimeError("presence-vector sampling failed to converge")

    keys = []
    cw_list = [cw[i] for i in range(p2)]
    for j in range(num_parties):
        sigma = []
        for g in range(n_gamma):
            row = seeds[g] * v[j, g][:, None]  # zero seed when absent
            sigma.append(row.reshape(-1).tobytes())
        keys.append(KeyMP(num_parties, [c.copy() for c in cw_list], sigma))
    return keys


def evaluate_2p(dpf: Dpf, server_num: int, key: Key2P, x: int) -> int:
    """Single-point two-party eval (dpf/server.go:55-101)."""
    nb = dpf.num_bits
    s_curr = bytearray(key.s_init)
    t_curr = key.t_init
    for i in range(nb):
        x_bit = 0 if i == dpf.n else get_bit(x, dpf.n - nb + i + 1, dpf.n)
        out = bytearray(_prf1(dpf, bytes(s_curr)))
        cw_i = key.cw[i]
        # G(s) ^ (t * [sCW || tLCW || sCW || tRCW]) (dpf/server.go:70-85)
        count = 0
        for j in range(BLOCK_SIZE * 2 + 2):
            if j == BLOCK_SIZE + 1:
                count = 0
            elif j == BLOCK_SIZE * 2 + 1:
                count = BLOCK_SIZE + 1
            out[j] ^= t_curr * cw_i[count]
            count += 1
        if x_bit == 0:
            s_curr[:] = out[:BLOCK_SIZE]
            t_curr = out[BLOCK_SIZE] % 2
        else:
            s_curr[:] = out[BLOCK_SIZE + 1:BLOCK_SIZE * 2 + 1]
            t_curr = out[BLOCK_SIZE * 2 + 1] % 2
    s_final, _ = go_varint(bytes(s_curr[:8]))
    res = s_final + t_curr * key.final_cw
    return res if server_num == 0 else -res


def expand_seeds_one_level(
    dpf: Dpf,
    seeds: np.ndarray,
    t_bits: np.ndarray,
    cw_i: bytes,
) -> tuple[np.ndarray, np.ndarray]:
    """One breadth-first level: (n,16)+(n,) -> (2n,16)+(2n,).

    Children are stored [all left | all right], i.e. the storage order of
    the final leaves is the bit-reversal of the natural domain order.
    """
    out = prf_blocks(seeds, dpf.ciphers, 3)  # (n, 3, 16)
    flat = out.reshape(out.shape[0], 48)
    s_l = flat[:, 0:16].copy()
    t_l = flat[:, 16] & 1
    s_r = flat[:, 17:33].copy()
    t_r = flat[:, 33] & 1

    cw_seed = np.frombuffer(cw_i[:16], dtype=np.uint8)
    t_mask = t_bits.astype(np.uint8)[:, None]
    s_l ^= cw_seed[None, :] * t_mask
    s_r ^= cw_seed[None, :] * t_mask
    t_l = t_l ^ (t_bits & cw_i[16])
    t_r = t_r ^ (t_bits & cw_i[17])

    return (
        np.concatenate([s_l, s_r], axis=0),
        np.concatenate([t_l, t_r], axis=0).astype(np.uint8),
    )


def eval_full_domain(dpf: Dpf, server_num: int, key: Key2P) -> np.ndarray:
    """Evaluate the DPF share on every point of the 2^num_bits domain.

    Returns int64 values, natural domain order; matches per-point
    ``evaluate_2p``. O(N) AES calls total (vs O(N log N) in db.go:128-171).
    """
    nb = dpf.num_bits
    seeds = np.frombuffer(key.s_init, dtype=np.uint8)[None, :].copy()
    t_bits = np.array([key.t_init], dtype=np.uint8)
    for i in range(nb):
        seeds, t_bits = expand_seeds_one_level(dpf, seeds, t_bits, key.cw[i])

    s_final = go_varint_vec(seeds[:, :8])
    res = s_final + t_bits.astype(np.int64) * key.final_cw
    if server_num != 0:
        res = -res
    # storage order is bit-reversed; restore natural order
    from ..utils.bits import bitrev_permutation

    return res[bitrev_permutation(nb)]


def eval_full_domain_bits(dpf: Dpf, server_num: int, key: Key2P, height: int) -> np.ndarray:
    """PIR selection bits for rows [0, height): bit = (eval % 2 == 0).

    Mirrors the inverted-parity convention of db.go:140-146.
    """
    vals = eval_full_domain(dpf, server_num, key)
    return ((vals & 1) == 0)[:height]


def eval_points(dpf: Dpf, server_num: int, key: Key2P, xs: np.ndarray) -> np.ndarray:
    """Vectorised multi-point ``evaluate_2p`` (host golden for keyword mode).

    All points walk the tree together; per level each point follows its
    own branch (dpf/server.go:55-94 semantics, batched).
    """
    nb = dpf.num_bits
    xs = np.asarray(xs, dtype=np.uint64)
    n = len(xs)
    seeds = np.tile(np.frombuffer(key.s_init, dtype=np.uint8), (n, 1))
    t_bits = np.full(n, key.t_init, dtype=np.uint8)
    for i in range(nb):
        out = prf_blocks(seeds, dpf.ciphers, 3).reshape(n, 48)
        cw_i = key.cw[i]
        cw_seed = np.frombuffer(cw_i[:16], dtype=np.uint8)
        t_mask = t_bits[:, None]
        s_l = out[:, 0:16] ^ cw_seed[None, :] * t_mask
        s_r = out[:, 17:33] ^ cw_seed[None, :] * t_mask
        t_l = (out[:, 16] & 1) ^ (t_bits & cw_i[16])
        t_r = (out[:, 33] & 1) ^ (t_bits & cw_i[17])
        x_bit = ((xs >> np.uint64(nb - 1 - i)) & np.uint64(1)).astype(bool)
        seeds = np.where(x_bit[:, None], s_r, s_l)
        t_bits = np.where(x_bit, t_r, t_l).astype(np.uint8)
    s_final = go_varint_vec(np.ascontiguousarray(seeds[:, :8]))
    res = s_final + t_bits.astype(np.int64) * key.final_cw
    return res if server_num == 0 else -res


# ---------------------------------------------------------------------------
# Fast mode: early-termination DPF (BGI'16 §3.2.1)
# ---------------------------------------------------------------------------
# The reference walks the tree all the way down and derives ONE selection
# bit per leaf from a 128-bit seed (via the Go-varint parity). For
# bit-output PIR the tree can stop 7 levels early: each leaf seed is
# expanded once more with the 4th PRF key (unused by the 2P tree walk)
# into a 128-bit block that *is* 128 selection bits, with a 128-bit final
# correction word. 32x fewer AES calls; XOR-share semantics
# (bits0 ^ bits1 = one-hot at the target row) are preserved, so answers
# recover identically. This is the framework's native mode; the
# reference-exact mode remains for bit-for-bit parity.
#
# WIDE LEAVES (leaf_bits > 128): the tree can terminate even earlier —
# each leaf seed CTR-extends (the prf_blocks counter convention) into
# leaf_bits/128 MMO blocks = leaf_bits selection bits, with a leaf_bits
# final correction word. The per-query leaf AES total is fixed at
# height/128 blocks regardless of depth, while tree AES (3 blocks per
# parent) shrinks geometrically with every level cut, so wide leaves
# reduce total AES ~3x at leaf_bits=1024 on a 2^20-row table (32.8K ->
# 11.3K blocks/query). leaf_bits is encoded in the key itself
# (len(final_cw_block) * 8), so servers need no out-of-band signal.

LEAF_BITS = 128

# client-side default for fast-mode keygen (power of two >= 128); wide
# leaves cut server expansion AES ~3x (see above). Clamped per height by
# fast_leaf_bits_for_height so shallow trees keep >= 5 device levels.
# 1024 measured fastest end-to-end on the 1 GiB serving shape with the
# stacked tail kernel (r4 sweep: 14,673 GB/s pipelined vs 11,986 at 128;
# device 265 vs 332 ms/4096-batch; 2048 was device-par but keygen-
# heavier and pipelined slower). Before the stacked kernel the per-query
# tail was tile-bound and wide leaves measured NO faster — the width
# only pays with work-proportional expansion (docs/PERFORMANCE.md r4).
DEFAULT_FAST_LEAF_BITS = 1024


@dataclass
class FastKey2P:
    """Early-termination two-party DPF key (bit output)."""

    s_init: bytes
    t_init: int
    cw: list[bytes]  # depth entries of 18 bytes
    final_cw_block: bytes  # 16*n bytes: leaf_bits-wide output correction
    depth: int
    height: int

    @property
    def leaf_bits(self) -> int:
        return len(self.final_cw_block) * 8


def fast_depth_for_height(height: int, leaf_bits: int = LEAF_BITS) -> int:
    leaves = -(-height // leaf_bits)
    return max(0, (leaves - 1).bit_length())


def _check_leaf_bits(leaf_bits: int) -> int:
    if leaf_bits < 128 or leaf_bits & (leaf_bits - 1):
        raise ValueError(f"leaf_bits must be a power of two >= 128, got {leaf_bits}")
    return leaf_bits // 128


def fast_leaf_bits_for_height(height: int, leaf_bits: int) -> int:
    """Clamp a requested leaf width so the tree keeps >= 5 levels (the
    device root-start serving path needs them); never below 128."""
    _check_leaf_bits(leaf_bits)
    while leaf_bits > LEAF_BITS and fast_depth_for_height(height, leaf_bits) < 5:
        leaf_bits >>= 1
    return leaf_bits


def _leaf_block(dpf: Dpf, seeds: np.ndarray) -> np.ndarray:
    """(n,16) leaf seeds -> (n,16) output blocks via PRF key 3."""
    out = prf_blocks(seeds, [dpf.ciphers[3]], 1)
    return out[:, 0, :]


def _leaf_blocks_wide(dpf: Dpf, seeds: np.ndarray, n_blk: int) -> np.ndarray:
    """(n,16) leaf seeds -> (n, 16*n_blk) leaf output bytes.

    Block b = AES_{k3}(seed ^ LE64(b)) ^ (seed ^ LE64(b)) — prf_blocks'
    CTR extension with a single cipher, so n_blk=1 equals _leaf_block."""
    out = prf_blocks(seeds, [dpf.ciphers[3]], n_blk)
    return out.reshape(seeds.shape[0], 16 * n_blk)


def generate_two_server_fast(
    dpf: Dpf, a: int, height: int, leaf_bits: int = LEAF_BITS
) -> list[FastKey2P]:
    """Keygen for f(a)=1 over [0, height) with early termination."""
    if not 0 <= a < height:
        raise ValueError("requesting key outside of domain")
    n_blk = _check_leaf_bits(leaf_bits)
    depth = fast_depth_for_height(height, leaf_bits)
    saved_bits = dpf.num_bits
    dpf.num_bits = depth

    # reuse the tree walk of generate_two_server, but stop at `depth` and
    # replace the varint FinalCW with a leaf_bits-wide block correction
    leaf_index = a // leaf_bits
    temp = os.urandom(BLOCK_SIZE + 1)
    s0 = bytearray(temp[:BLOCK_SIZE])
    t0 = temp[BLOCK_SIZE] % 2
    s1 = bytearray(os.urandom(BLOCK_SIZE))
    t1 = t0 ^ 1
    key0 = Key2P(bytes(s0), t0, [], 0)
    key1 = Key2P(bytes(s1), t1, [], 0)

    s_curr0, s_curr1 = bytearray(s0), bytearray(s1)
    t_curr0, t_curr1 = t0, t1
    cw = []
    for i in range(depth):
        out0 = _prf1(dpf, bytes(s_curr0))
        out1 = _prf1(dpf, bytes(s_curr1))
        t0l, t0r = out0[BLOCK_SIZE] % 2, out0[BLOCK_SIZE * 2 + 1] % 2
        t1l, t1r = out1[BLOCK_SIZE] % 2, out1[BLOCK_SIZE * 2 + 1] % 2
        a_bit = (leaf_index >> (depth - 1 - i)) & 1
        keep, lose = (0, BLOCK_SIZE + 1) if a_bit == 0 else (BLOCK_SIZE + 1, 0)
        cw_i = bytearray(BLOCK_SIZE + 2)
        for j in range(BLOCK_SIZE):
            cw_i[j] = out0[lose + j] ^ out1[lose + j]
        cw_i[BLOCK_SIZE] = t0l ^ t1l ^ a_bit ^ 1
        cw_i[BLOCK_SIZE + 1] = t0r ^ t1r ^ a_bit
        cw.append(bytes(cw_i))
        for j in range(BLOCK_SIZE):
            s_curr0[j] = out0[keep + j] ^ (t_curr0 * cw_i[j])
            s_curr1[j] = out1[keep + j] ^ (t_curr1 * cw_i[j])
        t_cw_keep = cw_i[BLOCK_SIZE] if keep == 0 else cw_i[BLOCK_SIZE + 1]
        t_curr0 = (out0[keep + BLOCK_SIZE] % 2) ^ (t_cw_keep * t_curr0)
        t_curr1 = (out1[keep + BLOCK_SIZE] % 2) ^ (t_cw_keep * t_curr1)

    dpf.num_bits = saved_bits

    blk0 = _leaf_blocks_wide(
        dpf, np.frombuffer(bytes(s_curr0), np.uint8)[None, :], n_blk)[0]
    blk1 = _leaf_blocks_wide(
        dpf, np.frombuffer(bytes(s_curr1), np.uint8)[None, :], n_blk)[0]
    within = a % leaf_bits
    e_a = np.zeros(16 * n_blk, dtype=np.uint8)
    e_a[within >> 3] = 1 << (within & 7)
    fcw = (blk0 ^ blk1 ^ e_a).tobytes()
    # exactly one of t_curr0/t_curr1 is 1 at the target leaf, so
    # bits0 ^ bits1 = blk0 ^ blk1 ^ fcw = e_a there, and 0 elsewhere.
    return [
        FastKey2P(bytes(s0), t0, list(cw), fcw, depth, height),
        FastKey2P(bytes(s1), t1, list(cw), fcw, depth, height),
    ]


def generate_two_server_fast_batch(
    dpf: Dpf, indices: "list[int]", height: int, leaf_bits: int = LEAF_BITS
) -> "list[list[FastKey2P]]":
    """Vectorised fast-mode keygen: one tree walk for Q queries at once.

    Semantically identical to Q calls of generate_two_server_fast (same
    per-query randomness model; numpy replaces the per-byte Python
    loops, and each level's 2Q PRG expansions run as two AES-NI ECB
    dispatches). All Q keys share the caller's ``dpf`` PRF keys — the
    PRF keys are public (every server receives them with the share,
    query.go:83-98), so sharing them across a client's batch does not
    weaken the DPF: security rests on the fresh per-query seeds.
    ~100x the per-query python keygen on the 1-core rig at batch 1024.

    Returns [ [key_server0, key_server1] for each index ].
    """
    n_blk = _check_leaf_bits(leaf_bits)
    depth = fast_depth_for_height(height, leaf_bits)
    q = len(indices)
    idx = np.asarray(indices, dtype=np.uint64)
    if q and (idx >= height).any():
        raise ValueError("requesting key outside of domain")
    leaf = (idx // np.uint64(leaf_bits)).astype(np.uint64)

    rnd = np.frombuffer(os.urandom(q * 33), np.uint8).reshape(q, 33)
    s0 = rnd[:, :16].copy()
    t0 = (rnd[:, 32] & 1).astype(np.uint8)
    s1 = rnd[:, 16:32].copy()
    t1 = t0 ^ 1

    s_curr0, s_curr1 = s0.copy(), s1.copy()
    t_curr0, t_curr1 = t0.copy(), t1.copy()
    cw = np.zeros((q, depth, 18), np.uint8)
    cols = np.arange(16)
    for i in range(depth):
        out0 = prf_blocks(s_curr0, dpf.ciphers, 3).reshape(q, 48)
        out1 = prf_blocks(s_curr1, dpf.ciphers, 3).reshape(q, 48)
        a_bit = ((leaf >> np.uint64(depth - 1 - i)) & np.uint64(1)).astype(
            np.uint8
        )
        # keep/lose offsets into the 48-byte PRG output: left expansion
        # at byte 0, right at byte 17 (dpf/client.go:99-116 layout)
        keep = np.where(a_bit == 0, 0, 17).astype(np.int64)[:, None]
        lose = 17 - keep
        cw_seed = (np.take_along_axis(out0, lose + cols, 1)
                   ^ np.take_along_axis(out1, lose + cols, 1))
        cw_tl = (out0[:, 16] & 1) ^ (out1[:, 16] & 1) ^ a_bit ^ 1
        cw_tr = (out0[:, 33] & 1) ^ (out1[:, 33] & 1) ^ a_bit
        cw[:, i, :16] = cw_seed
        cw[:, i, 16] = cw_tl
        cw[:, i, 17] = cw_tr
        s_curr0 = (np.take_along_axis(out0, keep + cols, 1)
                   ^ (t_curr0[:, None] * cw_seed))
        s_curr1 = (np.take_along_axis(out1, keep + cols, 1)
                   ^ (t_curr1[:, None] * cw_seed))
        t_cw_keep = np.where(a_bit == 0, cw_tl, cw_tr)
        t_next0 = np.take_along_axis(out0, keep + 16, 1)[:, 0] & 1
        t_next1 = np.take_along_axis(out1, keep + 16, 1)[:, 0] & 1
        t_curr0 = t_next0 ^ (t_cw_keep * t_curr0)
        t_curr1 = t_next1 ^ (t_cw_keep * t_curr1)

    blk0 = _leaf_blocks_wide(dpf, s_curr0, n_blk)
    blk1 = _leaf_blocks_wide(dpf, s_curr1, n_blk)
    within = (idx % np.uint64(leaf_bits)).astype(np.int64)
    e_a = np.zeros((q, 16 * n_blk), np.uint8)
    e_a[np.arange(q), within >> 3] = (1 << (within & 7)).astype(np.uint8)
    fcw = blk0 ^ blk1 ^ e_a

    return [
        [
            FastKey2P(s0[j].tobytes(), int(t0[j]),
                      [cw[j, i].tobytes() for i in range(depth)],
                      fcw[j].tobytes(), depth, height),
            FastKey2P(s1[j].tobytes(), int(t1[j]),
                      [cw[j, i].tobytes() for i in range(depth)],
                      fcw[j].tobytes(), depth, height),
        ]
        for j in range(q)
    ]


def eval_full_domain_fast_bits(dpf: Dpf, key: FastKey2P) -> np.ndarray:
    """(height,) bool selection-bit share, natural row order (host golden)."""
    saved = dpf.num_bits
    dpf.num_bits = key.depth
    seeds = np.frombuffer(key.s_init, dtype=np.uint8)[None, :].copy()
    t_bits = np.array([key.t_init], dtype=np.uint8)
    n_leaves = -(-key.height // key.leaf_bits)
    for i in range(key.depth):
        out = prf_blocks(seeds, dpf.ciphers, 3)
        flat = out.reshape(out.shape[0], 48)
        cw_i = key.cw[i]
        cw_seed = np.frombuffer(cw_i[:16], dtype=np.uint8)
        t_mask = t_bits.astype(np.uint8)[:, None]
        s_l = flat[:, 0:16] ^ cw_seed[None, :] * t_mask
        s_r = flat[:, 17:33] ^ cw_seed[None, :] * t_mask
        t_l = (flat[:, 16] & 1) ^ (t_bits & cw_i[16])
        t_r = (flat[:, 33] & 1) ^ (t_bits & cw_i[17])
        seeds = np.stack([s_l, s_r], axis=1).reshape(-1, 16)
        t_bits = np.stack([t_l, t_r], axis=1).reshape(-1).astype(np.uint8)
    del n_leaves  # host golden keeps the full 2^depth frontier
    dpf.num_bits = saved

    n_blk = key.leaf_bits // 128
    blocks = _leaf_blocks_wide(dpf, seeds, n_blk)  # (2^depth, 16*n_blk)
    fcw = np.frombuffer(key.final_cw_block, dtype=np.uint8)
    blocks = blocks ^ fcw[None, :] * t_bits[:, None]
    bits = np.unpackbits(blocks, axis=1, bitorder="little").reshape(-1)
    return bits[: key.height].astype(bool)


def eval_points_mp(dpf: Dpf, key: KeyMP, xs) -> np.ndarray:
    """Vectorized multi-party eval at many points (dpf/server.go:110-144).

    Semantically identical to ``evaluate_mp`` per point but amortized AND
    block-sparse: output word ``delta`` of the CTR-extended MMO PRG
    stream depends only on its own 16-byte block (``prf_blocks``: block
    b = AES_{k_{b%4}}(seed ^ LE64(b//4)) ^ (seed ^ LE64(b//4)), with no
    counter XOR for b < 4 where b//4 = 0 anyway), so only the unique
    (gamma, block) pairs the points actually address are computed —
    instead of the full mu-word stream per unique row, which for the
    32-bit keyword domain is ~23k blocks/row. Returns (len(xs),) int64
    of y values (the caller derives XOR bit shares as ``y & 1``).
    """
    p2, mu, gamma_bits, delta_bits = _mp_params(dpf.num_bits, key.num_parties)
    xs = np.asarray(xs, dtype=np.int64)
    deltas = xs & ((1 << delta_bits) - 1)
    gammas = (xs >> delta_bits) & ((1 << gamma_bits) - 1)
    blocks = deltas >> 2  # u32 word delta lives in 16-byte block delta//4

    num_blocks = -(-dpf.m * mu // BLOCK_SIZE)
    code = gammas * num_blocks + blocks
    uniq, inv = np.unique(code, return_inverse=True)
    ug = uniq // num_blocks
    ub = uniq % num_blocks

    sigma_arr = np.frombuffer(b"".join(key.sigma), dtype=np.uint8).reshape(
        -1, p2, BLOCK_SIZE
    )
    seeds = sigma_arr[ug]  # (m, p2, 16)
    present = seeds.any(axis=2)  # zero-seed slots skip G AND cw (go:127-136)
    xin = seeds.copy()
    xin[:, :, :8] ^= (ub >> 2).astype("<u8").view(np.uint8).reshape(
        -1, 8
    )[:, None, :]
    flat_x = xin.reshape(-1, BLOCK_SIZE)
    flat_k = np.repeat(ub & 3, p2)  # fixed-key index: ciphers[b % 4]
    out = np.empty_like(flat_x)
    for k in range(4):
        sel = flat_k == k
        if sel.any():
            out[sel] = dpf.ciphers[k].encrypt_blocks(flat_x[sel]) ^ flat_x[sel]
    words = (
        np.ascontiguousarray(out).view("<u4").reshape(len(uniq), p2, 4)
    )  # the 4 u32 words of each computed block

    w_pt = words[inv, :, deltas & 3]  # (n, p2)
    cw_pt = np.stack(
        [np.asarray(key.cw[i], dtype=np.uint32)[deltas] for i in range(p2)],
        axis=1,
    )  # (n, p2)
    y = np.bitwise_xor.reduce(
        np.where(present[inv], w_pt ^ cw_pt, np.uint32(0)), axis=1
    )
    return y.astype(np.int64)


def evaluate_mp(dpf: Dpf, key: KeyMP, x: int) -> int:
    """Multi-party XOR-homomorphic eval (dpf/server.go:110-144)."""
    p2 = int(math.pow(2, key.num_parties - 1))
    mu = int(
        math.ceil(
            math.pow(2, dpf.num_bits / 2) * math.pow(2, (key.num_parties - 1) / 2)
        )
    )
    nb = dpf.num_bits
    delta = x & ((1 << (nb // 2)) - 1)
    gamma = (x & (((1 << ((nb + 1) // 2)) - 1) << (nb // 2))) >> (nb // 2)
    m_bytes = dpf.m * mu

    y = np.zeros(mu, dtype=np.uint32)
    for i in range(p2):
        s = key.sigma[gamma][i * BLOCK_SIZE:(i + 1) * BLOCK_SIZE]
        if all(b == 0 for b in s):
            continue
        num_blocks = int(math.ceil(m_bytes / BLOCK_SIZE))
        out = prf_blocks(
            np.frombuffer(s, dtype=np.uint8)[None, :], dpf.ciphers, num_blocks
        )[0].reshape(-1)
        words = out[: dpf.m * mu].view("<u4")[:mu]
        y ^= words
        y ^= np.asarray(key.cw[i][:mu], dtype=np.uint32)
    return int(y[delta])
