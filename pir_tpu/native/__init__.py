"""ctypes loader (with on-demand build) for the native CPU PIR engine."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpirnative.so")
_SRC = os.path.join(_DIR, "pir_native.cpp")
_BIGMOD_SO = os.path.join(_DIR, "libbigmod.so")
_BIGMOD_SRC = os.path.join(_DIR, "bigmod.cpp")
_lock = threading.Lock()
_lib = None
_bigmod = None


def build(force: bool = False) -> str:
    """Compile the native library if needed; returns the .so path."""
    with _lock:
        if force or not os.path.exists(_SO) or (
            os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            subprocess.run(
                ["g++", "-O3", "-maes", "-mavx2", "-shared", "-fPIC",
                 _SRC, "-o", _SO + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(_SO + ".tmp", _SO)
    return _SO


def available() -> bool:
    try:
        return load() is not None
    except Exception:
        return False


def load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    lib.pir_expand_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint8,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_void_p,
    ]
    lib.pir_eval_point_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint8,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    lib.pir_expand_fast_bits.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint8,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
        ctypes.c_void_p,
    ]
    lib.pir_scan_xor.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.pir_scan_xor_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def load_bigmod():
    """Montgomery modexp accelerator (Paillier hot path)."""
    global _bigmod
    if _bigmod is not None:
        return _bigmod
    with _lock:
        if not os.path.exists(_BIGMOD_SO) or (
            os.path.getmtime(_BIGMOD_SRC) > os.path.getmtime(_BIGMOD_SO)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", _BIGMOD_SRC,
                 "-o", _BIGMOD_SO + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(_BIGMOD_SO + ".tmp", _BIGMOD_SO)
    lib = ctypes.CDLL(_BIGMOD_SO)
    lib.mg_powmod.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
    ]
    lib.mg_powmod_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.paillier_scan.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.c_void_p,
    ]
    _bigmod = lib
    return lib


def _ints_to_limbs(vals, limbs: int) -> np.ndarray:
    """list[int] -> contiguous little-endian u64 limb matrix."""
    w = limbs * 8
    buf = bytearray(len(vals) * w)
    for i, v in enumerate(vals):
        buf[i * w:i * w + w] = v.to_bytes(w, "little")
    return np.frombuffer(bytes(buf), dtype=np.uint64)


def _limbs_to_ints(arr: np.ndarray, limbs: int) -> list[int]:
    raw = arr.tobytes()
    w = limbs * 8
    return [int.from_bytes(raw[i:i + w], "little")
            for i in range(0, len(raw), w)]


def powmod(base: int, exp: int, mod: int) -> int:
    """base^exp mod mod via the native Montgomery engine (odd mod only)."""
    lib = load_bigmod()
    n = (mod.bit_length() + 63) // 64
    exp_n = max(1, (exp.bit_length() + 63) // 64)
    b = np.frombuffer((base % mod).to_bytes(n * 8, "little"), dtype=np.uint64)
    e = np.frombuffer(exp.to_bytes(exp_n * 8, "little"), dtype=np.uint64)
    m = np.frombuffer(mod.to_bytes(n * 8, "little"), dtype=np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    lib.mg_powmod(
        b.ctypes.data_as(ctypes.c_void_p), e.ctypes.data_as(ctypes.c_void_p),
        exp_n, m.ctypes.data_as(ctypes.c_void_p), n,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return int.from_bytes(out.tobytes(), "little")


def powmod_batch(bases, exps, mod: int, common_base: bool = False,
                 nthreads: int = 0) -> list[int]:
    """out[i] = bases[i]^exps[i] mod mod (odd mod), threaded across cores.

    common_base=True: `bases` is ONE int whose Montgomery window table is
    shared across the whole batch (the DDLEQ ct^e_i pattern)."""
    lib = load_bigmod()
    n = (mod.bit_length() + 63) // 64
    count = len(exps)
    exp_n = max(1, (max((e.bit_length() for e in exps), default=1) + 63) // 64)
    if common_base:
        b = _ints_to_limbs([bases % mod], n)
    else:
        b = _ints_to_limbs([v % mod for v in bases], n)
    e = _ints_to_limbs(exps, exp_n)
    m = _ints_to_limbs([mod], n)
    out = np.zeros(count * n, dtype=np.uint64)
    lib.mg_powmod_batch(
        b.ctypes.data_as(ctypes.c_void_p), e.ctypes.data_as(ctypes.c_void_p),
        exp_n, m.ctypes.data_as(ctypes.c_void_p), n, count,
        1 if common_base else 0, nthreads,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return _limbs_to_ints(out, n)


def paillier_scan(ebits: list[int], vals: list[int], width_cts: int,
                  mod: int, nthreads: int = 0) -> list[int]:
    """out[j] = prod_row ebits[row]^vals[row*width_cts+j] mod mod.

    The native analogue of the reference's nprocs-partitioned AHE scan
    with partial-product merge (db.go:193-261). `vals` is the flattened
    (height, width_cts) exponent matrix; exponent 0 contributes the
    multiplicative identity (== the reference's out-of-range `continue`).
    """
    lib = load_bigmod()
    height = len(ebits)
    assert len(vals) == height * width_cts
    n = (mod.bit_length() + 63) // 64
    exp_n = max(1, (max((v.bit_length() for v in vals), default=1) + 63) // 64)
    eb = _ints_to_limbs([v % mod for v in ebits], n)
    vl = _ints_to_limbs(vals, exp_n)
    m = _ints_to_limbs([mod], n)
    out = np.zeros(width_cts * n, dtype=np.uint64)
    lib.paillier_scan(
        eb.ctypes.data_as(ctypes.c_void_p), height,
        vl.ctypes.data_as(ctypes.c_void_p), exp_n, width_cts,
        m.ctypes.data_as(ctypes.c_void_p), n, nthreads,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return _limbs_to_ints(out, n)


def bigmod_available() -> bool:
    try:
        return load_bigmod() is not None
    except Exception:
        return False


def _key_blobs(query_share):
    key = query_share.key_two_party
    prf = b"".join(bytes(k.bytes) for k in query_share.prf_keys)
    cw = b"".join(bytes(c) for c in key.cw)
    return prf, key, cw


def expand_bits(query_share, num_bits: int, height: int) -> np.ndarray:
    """Native full-domain expansion -> (height,) uint8 selection bits."""
    lib = load()
    prf, key, cw = _key_blobs(query_share)
    out = np.empty(height, dtype=np.uint8)
    lib.pir_expand_bits(
        prf, num_bits, key.s_init, key.t_init, cw, key.final_cw,
        height, out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def eval_point_bits(query_share, num_bits: int, points: np.ndarray) -> np.ndarray:
    lib = load()
    prf, key, cw = _key_blobs(query_share)
    pts = np.ascontiguousarray(points, dtype=np.uint64)
    out = np.empty(len(pts), dtype=np.uint8)
    lib.pir_eval_point_bits(
        prf, num_bits, key.s_init, key.t_init, cw, key.final_cw,
        pts.ctypes.data_as(ctypes.c_void_p), len(pts),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def expand_fast_bits(query_share) -> np.ndarray:
    """Native early-termination expansion -> (height,) uint8 bits."""
    lib = load()
    key = query_share.key_fast
    prf = b"".join(bytes(k.bytes) for k in query_share.prf_keys)
    cw = b"".join(bytes(c) for c in key.cw)
    out = np.empty(key.height, dtype=np.uint8)
    lib.pir_expand_fast_bits(
        prf, key.depth, key.s_init, key.t_init, cw, key.final_cw_block,
        key.height, len(key.final_cw_block) // 16,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def scan_xor(db_rows: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """db_rows (H, row_bytes) uint8, bits (H,) uint8 -> (row_bytes,) uint8."""
    lib = load()
    db_rows = np.ascontiguousarray(db_rows)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    out = np.empty(db_rows.shape[1], dtype=np.uint8)
    lib.pir_scan_xor(
        db_rows.ctypes.data_as(ctypes.c_void_p), db_rows.shape[0],
        db_rows.shape[1], bits.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def scan_xor_batch(db_rows: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """db_rows (H, row_bytes) u8, bits (Q, H) u8 -> (Q, row_bytes) u8.

    One cache-blocked pass over the table answers all Q queries (the
    reference scans per query, db.go:74-107; see pir_scan_xor_batch)."""
    lib = load()
    db_rows = np.ascontiguousarray(db_rows)
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    assert bits.shape[1] == db_rows.shape[0]
    out = np.empty((bits.shape[0], db_rows.shape[1]), dtype=np.uint8)
    lib.pir_scan_xor_batch(
        db_rows.ctypes.data_as(ctypes.c_void_p), db_rows.shape[0],
        db_rows.shape[1], bits.ctypes.data_as(ctypes.c_void_p),
        bits.shape[0], out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
