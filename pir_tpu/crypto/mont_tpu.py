"""Batched Montgomery big-integer arithmetic on TPU (JAX/XLA).

The single-server cPIR hot loop is a batched multi-exponentiation:
per column chunk, answer = prod_row Enc(bit_row)^{chunk(row,col)} mod N^k
(db.go:176-271 — `sel = pk.ConstMult(EBits[row], chunk)` accumulated with
`pk.Add`, i.e. modexp then modmul). The reference bottoms out in GMP C
via ncw/gmp (SURVEY.md §2.9); our host engines use CPython ints and the
native Montgomery ladder (native/bigmod.cpp). This module maps the SAME
scan onto the TPU: thousands of independent 2-3k-bit modexps vectorized
across VPU lanes, bit-exact against the host engines.

Design (TPU-first, integer-only):

* **Radix-2^15 limbs in uint32 lanes.** A number mod M lives in
  L = ceil((bits(M)+2)/15) limbs so that R = 2^(15L) >= 4M (the classic
  bound that lets Montgomery products chain without conditional
  subtractions: inputs < 2M give outputs < 2M). 15-bit limbs keep every
  intermediate of the CIOS step strictly below 2^32:
  T[j] + a_i*b[j] + m_i*n[j] <= 2^17 + 2*2^30 < 2^32.
* **Lazy-carry CIOS.** The per-limb iteration keeps the running state T
  in a redundant form (limbs <= 2^17). The down-shift by one limb is the
  value-exact rewrite T'[j] = (U[j] >> 15) + (U[j+1] & 0x7fff), valid
  because m_i is chosen so U[0] === 0 mod 2^15 *as a uint32* (the sum is
  computed exactly). No carry chain ever serializes across limbs inside
  the loop; two O(1)-depth local-carry passes re-canonicalize limbs to
  <= 2^15 between multiplications. The top limb never carries out:
  every intermediate value is < 3M <= (3/4)*2^(15L), so in any
  non-negative limb form the top limb is < 2^15 (asserted in tests).
* **Batched square-and-multiply** with a masked select per exponent bit
  (constant-shape, data-oblivious — exponent bits only drive a lane-wise
  `where`), then a log2(rows) tree of batched Montgomery products for
  the row reduction (the reference's Add-accumulation, db.go:245-246).
* Row chunks of a fixed power-of-two keep the compiled executable set
  small (each distinct shape costs a multi-minute remote compile on the
  dev rig); chunk partials are merged mod M on the host (a handful of
  CPython bigint ops per query).

The result is exact: the same ciphertext bytes as the CPython/native
paths, tested limb-for-limb (tests/test_mont_tpu.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

RADIX = 15
MASK = (1 << RADIX) - 1


# --------------------------------------------------------------------------
# host-side limb packing
# --------------------------------------------------------------------------

def limbs_for_modulus(m: int) -> int:
    """L such that R = 2^(15L) >= 4*m (two bits of slack), rounded up to
    a multiple of 16 so the compiled-shape space stays coarse: served
    scans see client-chosen moduli, and every distinct L would otherwise
    compile a fresh executable (minutes on a remote-compile rig). The
    extra limbs only enlarge R — all Montgomery bounds get slack."""
    exact = (m.bit_length() + 2 + RADIX - 1) // RADIX
    return -(-exact // 16) * 16


def ints_to_limbs(xs, L: int) -> np.ndarray:
    """(len(xs), L) uint32 little-endian radix-2^15 limbs."""
    out = np.zeros((len(xs), L), dtype=np.uint32)
    for i, x in enumerate(xs):
        j = 0
        while x:
            out[i, j] = x & MASK
            x >>= RADIX
            j += 1
    return out


def limbs_to_int(arr) -> int:
    """Value of one (possibly redundant) limb vector."""
    x = 0
    for j in range(len(arr) - 1, -1, -1):
        x = (x << RADIX) + int(arr[j])
    return x


def pack_exponents(xs, e_max: int) -> np.ndarray:
    """(len(xs), ceil(e_max/32)) uint32 little-endian exponent words.

    Exponents wider than e_max fail loudly (IndexError / OverflowError /
    ValueError) rather than truncating silently."""
    ew = max(1, (e_max + 31) // 32)
    if e_max <= 64:
        # vectorized fast path: cPIR level-1 exponents are slot chunks
        # (a few bytes each), and big scans pack millions of them
        arr = np.asarray(xs, dtype=np.uint64)  # raises on >= 2^64
        if len(xs) and e_max < 64 and int(arr.max()) >> e_max:
            # mont_exp scans only e_max bits — wider exponents would be
            # silently truncated here (the word-count IndexError of the
            # slow path cannot catch widths inside the last word)
            raise ValueError("exponent exceeds e_max bits")
        out = np.zeros((len(xs), ew), dtype=np.uint32)
        out[:, 0] = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        if ew > 1:
            out[:, 1] = (arr >> np.uint64(32)).astype(np.uint32)
        return out
    out = np.zeros((len(xs), ew), dtype=np.uint32)
    for i, x in enumerate(xs):
        j = 0
        while x:
            out[i, j] = x & 0xFFFFFFFF
            x >>= 32
            j += 1
    return out


@dataclass(frozen=True)
class MontCtx:
    """Precomputed per-modulus constants (host ints + limb arrays)."""

    m: int
    L: int
    n_limbs: np.ndarray   # (L,) canonical limbs of m
    n_inv: int            # -m^{-1} mod 2^15
    r2_limbs: np.ndarray  # R^2 mod m
    one_limbs: np.ndarray  # R mod m (Montgomery form of 1)


@functools.lru_cache(maxsize=64)
def mont_ctx(m: int) -> MontCtx:
    if m % 2 == 0 or m <= 1:
        raise ValueError("Montgomery arithmetic needs an odd modulus > 1")
    L = limbs_for_modulus(m)
    r = 1 << (RADIX * L)
    n_inv = (-pow(m, -1, 1 << RADIX)) & MASK
    return MontCtx(
        m=m,
        L=L,
        n_limbs=ints_to_limbs([m], L)[0],
        n_inv=n_inv,
        r2_limbs=ints_to_limbs([r * r % m], L)[0],
        one_limbs=ints_to_limbs([r % m], L)[0],
    )


# --------------------------------------------------------------------------
# traced kernels
# --------------------------------------------------------------------------

def _canon(t):
    """Two local-carry passes: limbs <= 2^17 -> limbs <= 2^15 (the top
    limb provably never carries out; see module docstring)."""
    for _ in range(2):
        hi = t >> RADIX
        lo = t & MASK
        t = lo + jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1
        )
    return t


def mont_mul(a, b, n, n_inv):
    """Montgomery product a*b/R mod m (value < 2m for inputs < 2m).

    a, b: uint32 (..., L) canonical limbs (<= 2^15), broadcastable;
    n: (L,) canonical modulus limbs; n_inv: uint32 scalar.
    Returns canonical (..., L) limbs.
    """
    L = n.shape[-1]
    shape = jnp.broadcast_shapes(a.shape, b.shape)

    def body(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=True)
        u0 = t[..., :1] + ai * b[..., :1]
        mi = ((u0 & MASK) * n_inv) & MASK
        u = t + ai * b + mi * n
        hi = u >> RADIX
        lo = u & MASK
        return hi + jnp.concatenate(
            [lo[..., 1:], jnp.zeros_like(lo[..., :1])], axis=-1
        )

    t0 = jnp.zeros(shape, jnp.uint32)
    return _canon(jax.lax.fori_loop(0, L, body, t0))


def mont_exp(base, e, e_max: int, n, n_inv, one_mont):
    """Batched base^e — Montgomery-domain modexp (constant shape;
    exponent bits only drive lane-wise selects).

    base: (..., L) canonical Montgomery-domain limbs; e: (..., EW) packed
    uint32 exponent words (little-endian); e_max: static bit bound.
    Dispatches to a 4-bit fixed-window ladder when the exponent is long
    enough to amortize the 15-entry power table (5 products per 4 bits
    + 15 setup vs 8 — ~1.6x fewer for 1-3k-bit exponents) and the table
    fits comfortably; binary square-and-multiply otherwise.
    """
    out_shape = jnp.broadcast_shapes(
        base.shape, e.shape[:-1] + (n.shape[-1],)
    )
    table_bytes = 16 * 4 * int(np.prod(out_shape, dtype=np.int64))
    if e_max >= 64 and table_bytes <= 256 * 1024 * 1024:
        return _mont_exp_win4(base, e, e_max, n, n_inv, one_mont, out_shape)
    return _mont_exp_bin(base, e, e_max, n, n_inv, one_mont, out_shape)


def _mont_exp_bin(base, e, e_max: int, n, n_inv, one_mont, out_shape):
    """MSB-first square-and-always-multiply, bit-selected lanes."""
    acc0 = jnp.broadcast_to(one_mont, out_shape)

    def body(k, acc):
        kk = e_max - 1 - k
        acc = mont_mul(acc, acc, n, n_inv)
        word = jax.lax.dynamic_index_in_dim(
            e, kk // 32, axis=-1, keepdims=True
        )
        bit = (word >> jnp.uint32(kk % 32)) & jnp.uint32(1)
        mul = mont_mul(acc, base, n, n_inv)
        return jnp.where(bit.astype(bool), mul, acc)

    return jax.lax.fori_loop(0, e_max, body, acc0)


def _mont_exp_win4(base, e, e_max: int, n, n_inv, one_mont, out_shape):
    """MSB-first 4-bit fixed-window ladder. Windows never straddle the
    packed 32-bit exponent words (4 | 32); the window digit selects from
    the 16-entry power table by a one-hot sum (no gathers — exact in
    uint32 since exactly one term is live per lane)."""
    g = jnp.broadcast_to(one_mont, out_shape)
    table = [g]
    for _ in range(15):
        table.append(mont_mul(table[-1], base, n, n_inv))
    tbl = jnp.stack(table, axis=-2)  # (..., 16, L)
    ks = jnp.arange(16, dtype=jnp.uint32)
    nwin = (e_max + 3) // 4

    def body(w, acc):
        bitpos = (nwin - 1 - w) * 4
        for _ in range(4):
            acc = mont_mul(acc, acc, n, n_inv)
        word = jax.lax.dynamic_index_in_dim(
            e, bitpos // 32, axis=-1, keepdims=False
        )
        digit = (word >> jnp.uint32(bitpos % 32)) & jnp.uint32(15)
        onehot = (digit[..., None] == ks).astype(jnp.uint32)  # (..., 16)
        sel = jnp.sum(tbl * onehot[..., None], axis=-2, dtype=jnp.uint32)
        return mont_mul(acc, sel, n, n_inv)

    return jax.lax.fori_loop(0, nwin, body, g)


def _tree_product(x, n, n_inv):
    """Montgomery product over axis 0 (power-of-two length)."""
    r = x.shape[0]
    if r & (r - 1):
        # an odd split would BROADCAST the halves and silently drop
        # rows' factors — a wrong ciphertext, not an error
        raise ValueError(f"tree reduction needs a power-of-two rows, got {r}")
    while r > 1:
        r //= 2
        x = mont_mul(x[:r], x[r:], n, n_inv)
    return x[0]


def _scan_chunk(bases, exps, n, n_inv, one_mont, r2, e_max: int):
    """One row chunk of the cPIR scan.

    bases (RC, L) canonical < m; exps (RC, W, EW) packed exponents.
    Returns (W, L) NORMAL-domain limbs of prod_r bases[r]^exps[r, w]
    (value < 2m; the caller reduces mod m on the host).
    """
    L = n.shape[-1]
    base_m = mont_mul(bases, r2, n, n_inv)[:, None, :]  # (RC, 1, L)
    pows = mont_exp(base_m, exps, e_max, n, n_inv, one_mont)  # (RC, W, L)
    prod = _tree_product(pows, n, n_inv)  # (W, L)
    one_int = jnp.zeros((L,), jnp.uint32).at[0].set(1)
    return mont_mul(prod, one_int, n, n_inv)  # leave Montgomery domain


@functools.lru_cache(maxsize=32)
def _scan_chunk_jit(e_max: int):
    return jax.jit(
        functools.partial(_scan_chunk, e_max=e_max),
        static_argnames=(),
    )


# --------------------------------------------------------------------------
# public entry points (signature mirrors native.paillier_scan)
# --------------------------------------------------------------------------

def _pow2ceil(x: int) -> int:
    return 1 << max(0, x - 1).bit_length() if x > 1 else 1


def tpu_paillier_scan(
    ebits: list, vals: list, width_cts: int, mod: int,
    e_max: int | None = None, row_chunk: int = 2048, col_chunk: int = 128,
) -> list:
    """out[j] = prod_row ebits[row]^vals[row*width_cts+j] mod mod.

    Drop-in for native.paillier_scan (db.go:193-261 semantics: exponent 0
    contributes the multiplicative identity — the reference's
    out-of-range `continue`), computed on the default JAX backend.

    `e_max` should be a protocol-level bound on exponent bits (message
    space for level-1 scans, bits(N^2) for level-2) so compiled shapes
    never depend on query data; it defaults to the batch's own maximum.
    All shape parameters are bucketed (power-of-two e_max and chunk
    sizes, 16-limb L steps) so a client cannot force an unbounded stream
    of fresh multi-minute compiles on a serving host.
    """
    height = len(ebits)
    if len(vals) != height * width_cts:
        raise ValueError("vals must be a (height, width_cts) matrix")
    if row_chunk & (row_chunk - 1) or col_chunk & (col_chunk - 1):
        raise ValueError("row_chunk and col_chunk must be powers of two")
    if height == 0 or width_cts == 0:
        return [1] * width_cts  # empty product = multiplicative identity
    ctx = mont_ctx(mod)
    if e_max is None:
        e_max = max((v.bit_length() for v in vals), default=1)
    e_max = max(32, _pow2ceil(e_max))

    rc = min(_pow2ceil(height), row_chunk)
    wc = min(_pow2ceil(width_cts), col_chunk)
    n = jnp.asarray(ctx.n_limbs)
    n_inv = jnp.uint32(ctx.n_inv)
    one_mont = jnp.asarray(ctx.one_limbs)
    r2 = jnp.asarray(ctx.r2_limbs)
    fn = _scan_chunk_jit(e_max)

    futures = []  # (col_lo, cols, device (wc, L) partial)
    for lo in range(0, height, rc):
        rows = min(rc, height - lo)
        chunk_bases = [ebits[lo + r] % mod for r in range(rows)]
        if rows < rc:  # pad: base 1 with exponent 0 is the identity
            chunk_bases += [1] * (rc - rows)
        bases = jnp.asarray(ints_to_limbs(chunk_bases, ctx.L))
        emat = pack_exponents(
            vals[lo * width_cts:(lo + rows) * width_cts], e_max
        ).reshape(rows, width_cts, -1)
        if rows < rc:
            emat = np.concatenate(
                [emat, np.zeros((rc - rows,) + emat.shape[1:], emat.dtype)]
            )
        for cl in range(0, width_cts, wc):
            cols = min(wc, width_cts - cl)
            esl = emat[:, cl:cl + cols]
            if cols < wc:  # pad columns with exponent 0 (identity)
                esl = np.concatenate(
                    [esl, np.zeros((rc, wc - cols, esl.shape[2]), esl.dtype)],
                    axis=1,
                )
            futures.append(
                (cl, cols, fn(bases, jnp.asarray(esl), n, n_inv, one_mont, r2))
            )

    res = [1] * width_cts
    for cl, cols, fut in futures:  # one device sync per dispatch, amortized
        out = np.asarray(fut)
        for w in range(cols):
            res[cl + w] = res[cl + w] * limbs_to_int(out[w]) % mod
    return res


def tpu_powmod_batch(
    bases: list, exps: list, mod: int, e_max: int | None = None,
    batch_chunk: int = 4096,
) -> list:
    """Batched pow(base, exp, mod) on the default JAX backend (the TPU
    analogue of native.mg_powmod_batch)."""
    if len(bases) != len(exps):
        raise ValueError("bases and exps must have equal length")
    if batch_chunk & (batch_chunk - 1):
        raise ValueError("batch_chunk must be a power of two")
    if not bases:
        return []
    ctx = mont_ctx(mod)
    if e_max is None:
        e_max = max((e.bit_length() for e in exps), default=1)
    e_max = max(32, _pow2ceil(e_max))

    n = jnp.asarray(ctx.n_limbs)
    n_inv = jnp.uint32(ctx.n_inv)
    one_mont = jnp.asarray(ctx.one_limbs)
    r2 = jnp.asarray(ctx.r2_limbs)
    fn = _powmod_batch_jit(e_max)

    out: list = []
    bc = min(_pow2ceil(len(bases)), batch_chunk)
    for lo in range(0, len(bases), bc):
        rows = min(bc, len(bases) - lo)
        cb = [bases[lo + i] % mod for i in range(rows)] + [1] * (bc - rows)
        ce = list(exps[lo:lo + rows]) + [0] * (bc - rows)
        b = jnp.asarray(ints_to_limbs(cb, ctx.L))
        e = jnp.asarray(pack_exponents(ce, e_max))
        res = np.asarray(fn(b, e, n, n_inv, one_mont, r2))
        out.extend(limbs_to_int(res[i]) % mod for i in range(rows))
    return out


def tpu_powmod_batch_multi(
    bases: list, exps: list, mods: list, e_max: int | None = None,
    batch_chunk: int = 4096,
) -> list:
    """Batched pow(base, exp, mod) with a PER-ROW modulus, one device
    dispatch per chunk.

    Every kernel above broadcasts the modulus limbs, so carrying n as
    (B, L) rows (with n_inv as (B, 1)) reuses the exact same traced
    CIOS/ladder code as the single-modulus path — this is what lets the
    secret-key CRT split (mod p^s rows next to mod q^s rows, see
    paillier.SecretKey._powmod_batch_sk) run as ONE dispatch instead of
    two half-empty ones. All moduli must share one limb count L
    (limbs_for_modulus rounds to multiples of 16, so balanced CRT halves
    always do)."""
    if not (len(bases) == len(exps) == len(mods)):
        raise ValueError("bases, exps and mods must have equal length")
    if batch_chunk & (batch_chunk - 1):
        raise ValueError("batch_chunk must be a power of two")
    if not bases:
        return []
    ctxs = {m: mont_ctx(m) for m in set(mods)}
    Ls = {c.L for c in ctxs.values()}
    if len(Ls) != 1:
        raise ValueError(f"moduli must share one limb count, got {sorted(Ls)}")
    L = Ls.pop()
    if e_max is None:
        e_max = max((e.bit_length() for e in exps), default=1)
    # 256-bit granularity (not pow2): the sk path's φ-reduced exponents
    # land just past a power of two (e.g. ~1535 bits), and rounding them
    # to 2048 would forfeit a quarter of the ladder cut
    e_max = max(32, -(-e_max // 256) * 256) if e_max > 32 else 32
    fn = _powmod_batch_jit(e_max)

    out: list = []
    bc = min(_pow2ceil(len(bases)), batch_chunk)
    for lo in range(0, len(bases), bc):
        rows = min(bc, len(bases) - lo)
        pad = bc - rows
        cm = list(mods[lo:lo + rows]) + [mods[lo]] * pad
        cb = [bases[lo + i] % mods[lo + i] for i in range(rows)] + [1] * pad
        ce = list(exps[lo:lo + rows]) + [0] * pad
        b = jnp.asarray(ints_to_limbs(cb, L))
        e = jnp.asarray(pack_exponents(ce, e_max))
        n = jnp.asarray(np.stack([ctxs[m].n_limbs for m in cm]))
        n_inv = jnp.asarray(
            np.array([[ctxs[m].n_inv] for m in cm], np.uint32))
        one_m = jnp.asarray(np.stack([ctxs[m].one_limbs for m in cm]))
        r2 = jnp.asarray(np.stack([ctxs[m].r2_limbs for m in cm]))
        res = np.asarray(fn(b, e, n, n_inv, one_m, r2))
        out.extend(limbs_to_int(res[i]) % mods[lo + i] for i in range(rows))
    return out


def _powmod_core(bases, exps, n, n_inv, one_mont, r2, e_max: int):
    L = n.shape[-1]
    base_m = mont_mul(bases, r2, n, n_inv)
    pows = mont_exp(base_m, exps, e_max, n, n_inv, one_mont)
    one_int = jnp.zeros((L,), jnp.uint32).at[0].set(1)
    return mont_mul(pows, one_int, n, n_inv)


@functools.lru_cache(maxsize=32)
def _powmod_batch_jit(e_max: int):
    return jax.jit(functools.partial(_powmod_core, e_max=e_max))
