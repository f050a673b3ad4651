"""Probe: does Mosaic co-issue VPU (bitwise/AES-style) and MXU (matmul)
work inside one Pallas kernel on this chip?

Motivation: the serving pipeline's device time is ~55% DPF expansion
(bitsliced AES on the VPU, measured at its ALU roof) and ~45% scan
(int8 MXU matmul at ~77% of its roof). XLA executes the two stages
sequentially, so if a single kernel can overlap the units, a
double-buffered megakernel (scan batch i while expanding batch i+1)
would buy up to ~1.7x end-to-end. This probe times

  A: N iterations of a dependent u32 bitwise chain   (VPU only)
  B: N iterations of a dependent int8 matmul chain   (MXU only)
  C: both chains interleaved in ONE kernel body      (independent data)

If t_C ~= max(t_A, t_B): the units overlap -> megakernel is worth
building.  If t_C ~= t_A + t_B: Mosaic serializes -> record the
negative result and stop chasing it.

Run on the real chip: python benchmarks_overlap.py
(env: OVERLAP_ITERS, OVERLAP_REPS)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ITERS = int(os.environ.get("OVERLAP_ITERS", 256))
REPS = int(os.environ.get("OVERLAP_REPS", 30))

# VPU operand: u32 planes, roughly one AES-state's bitsliced tile shape
# scaled up so one iteration is ~a few us of pure ALU work.
VSHAPE = (64, 512)        # 32K u32 lanes
# MXU operand: int8 matmul with K large enough to keep the systolic
# array busy; (128, 2048) @ (2048, 256) ~ 67M MACs / iteration.
M, K, N = 128, 4096, 256
# ~16 ALU ops per u32 element per iteration (mimics the AES gate mix:
# xor/and/or/shift with a carried dependency so nothing hoists).
V_OPS = 16


def _vpu_round(v, c):
    for _ in range(V_OPS // 4):
        v = v ^ (v << 1)
        v = v | (v >> 3)
        v = (v & c) ^ (v << 2)
        v = v + c
    return v


def vpu_kernel(v_ref, o_ref):
    c = jnp.uint32(0x9E3779B9)

    def body(_, v):
        return _vpu_round(v, c)

    o_ref[...] = jax.lax.fori_loop(0, ITERS, body, v_ref[...])


def mxu_kernel(a_ref, b_ref, o_ref):
    def body(_, acc):
        # acc feeds back via a cheap cast so the dot chain is dependent
        # (not hoistable) but stays MXU-resident
        a = (acc[:, :1] & 1).astype(jnp.int8) + a_ref[:, :]
        return jax.lax.dot_general(
            a, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    o_ref[...] = jax.lax.fori_loop(
        0, ITERS, body, jnp.zeros((M, N), jnp.int32)
    )


def mixed_kernel(v_ref, a_ref, b_ref, vo_ref, mo_ref):
    c = jnp.uint32(0x9E3779B9)

    def body(_, carry):
        v, acc = carry
        a = (acc[:, :1] & 1).astype(jnp.int8) + a_ref[:, :]
        acc = jax.lax.dot_general(
            a, b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        v = _vpu_round(v, c)
        return v, acc

    v, acc = jax.lax.fori_loop(
        0, ITERS, body, (v_ref[...], jnp.zeros((M, N), jnp.int32))
    )
    vo_ref[...] = v
    mo_ref[...] = acc


@functools.lru_cache(maxsize=None)
def fns():
    interp = os.environ.get("OVERLAP_INTERPRET") == "1"
    fa = jax.jit(pl.pallas_call(
        vpu_kernel, out_shape=jax.ShapeDtypeStruct(VSHAPE, jnp.uint32),
        interpret=interp))
    fb = jax.jit(pl.pallas_call(
        mxu_kernel, out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        interpret=interp))
    fc = jax.jit(pl.pallas_call(
        mixed_kernel,
        out_shape=(jax.ShapeDtypeStruct(VSHAPE, jnp.uint32),
                   jax.ShapeDtypeStruct((M, N), jnp.int32)),
        interpret=interp))
    return fa, fb, fc


def bench(f, args, name):
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    log(f"{name}: compile+first {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    log(f"{name}: {dt*1e3:.3f} ms/dispatch ({REPS} reps)")
    return dt


def main():
    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()
    log(f"devices: {jax.devices()}  iters={ITERS}")
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 32, size=VSHAPE, dtype=np.uint32)
    a = rng.integers(-64, 64, size=(M, K), dtype=np.int8)
    b = rng.integers(-64, 64, size=(K, N), dtype=np.int8)

    # relay warmup
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))

    fa, fb, fc = fns()
    ta = bench(fa, (v,), "A vpu-only ")
    tb = bench(fb, (a, b), "B mxu-only ")
    tc = bench(fc, (v, a, b), "C mixed    ")

    overlap = (ta + tb - tc) / min(ta, tb) if min(ta, tb) > 0 else 0.0
    log(f"serial sum {1e3*(ta+tb):.3f} ms, max {1e3*max(ta,tb):.3f} ms, "
        f"mixed {1e3*tc:.3f} ms")
    log(f"overlap fraction (1.0 = full co-issue of the smaller unit's "
        f"work, <=0 = fully serialized): {overlap:.2f}")
    print(f"{{\"vpu_ms\": {ta*1e3:.3f}, \"mxu_ms\": {tb*1e3:.3f}, "
          f"\"mixed_ms\": {tc*1e3:.3f}, \"overlap\": {overlap:.3f}}}")


if __name__ == "__main__":
    main()
