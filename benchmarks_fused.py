"""On-chip A/B: fused scan+expand kernel vs the two split kernels.

Answers the question the synthetic probe (benchmarks_overlap.py) asks,
but on the REAL serving workload: if the Mosaic scheduler co-issues the
scan's MXU matmuls with the expansion's VPU AES stream, the fused
kernel's time approaches max(scan, expand) instead of their sum, and
the steady-state pipeline gains up to ~1.7x end-to-end.

Prints one JSON line: {"scan_ms", "expand_ms", "fused_ms", "overlap"}
where overlap = (scan + expand - fused) / min(scan, expand)
(1.0 = the smaller stage fully hidden; <= 0 = serialized).

Run: python benchmarks_fused.py  (env: FUSED_HEIGHT, FUSED_BATCH,
FUSED_SLOT_BYTES, FUSED_REPS, FUSED_LEVELS)
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pir_tpu.config import enable_compile_cache
    from pir_tpu.ops.pallas_expand import fast_tail_expand_pallas
    from pir_tpu.ops.pallas_fused import fused_geometry, fused_scan_expand_pallas
    from pir_tpu.ops.pallas_scan import mxu_batched_scan_packed_pallas

    enable_compile_cache()

    h = int(os.environ.get("FUSED_HEIGHT", 1 << 20))
    b = int(os.environ.get("FUSED_SLOT_BYTES", 1024))
    q = int(os.environ.get("FUSED_BATCH", 4096))
    reps = int(os.environ.get("FUSED_REPS", 8))
    levels = int(os.environ.get("FUSED_LEVELS", 2))
    geo = fused_geometry(h, b, q, q)
    if geo is None:
        log(f"no fused geometry for shape {(h, b, q)}")
        print('{"error": "no geometry"}')
        return
    q_slice, br, bc = geo
    nwf = (h // 128) // 32
    nw0 = nwf >> levels
    log(f"shape: table {h}x{b}B ({h*b/2**30:.2f} GiB), Q={q}, levels={levels}, "
        f"geometry q_slice={q_slice} block=({br},{bc}), NW0={nw0}")

    rng = np.random.default_rng(0)
    u32 = lambda *s: rng.integers(0, 1 << 32, size=s, dtype=np.uint64
                                  ).astype(np.uint32)
    table = rng.integers(0, 256, size=(h, b), dtype=np.uint8)
    words = u32(h // 32, q)
    seeds = u32(q, 8, 16, nw0)
    t = (rng.integers(0, 2, size=(q, 1, nw0), dtype=np.uint64)
         * 0xFFFFFFFF).astype(np.uint32)
    cw_s = u32(q, levels, 8, 16, 1)
    cw_tl, cw_tr = u32(q, levels), u32(q, levels)
    rk = u32(11, 8, 3, 16, 1)
    fcw = u32(q, 8, 16, 1)
    rk_leaf = u32(11, 8, 16, 1)

    # relay warmup
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))
    t0 = time.perf_counter()
    table_d = jax.device_put(table)
    jax.block_until_ready(table_d)
    log(f"table upload: {time.perf_counter()-t0:.1f}s")

    # the split scan at the pipeline's production tile sizes
    from pir_tpu.models.pipeline import scan_tile_sizes

    sbr, sbc = scan_tile_sizes(min(q, 4096), h, b)

    def run_scan():
        return mxu_batched_scan_packed_pallas(
            table_d, words, block_rows=sbr, block_cols=sbc)

    def run_expand():
        return fast_tail_expand_pallas(
            seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf, levels=levels)

    def run_fused():
        return fused_scan_expand_pallas(
            table_d, words, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, rk_leaf,
            levels=levels, q_slice=q_slice, block_rows=br, block_cols=bc)

    def bench(fn, name):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        log(f"{name}: compile+first {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        log(f"{name}: {dt*1e3:.2f} ms/dispatch")
        return out, dt

    out_scan, t_scan = bench(run_scan, "split scan  ")
    out_exp, t_exp = bench(run_expand, "split expand")
    (fused_scan, fused_tail), t_fused = bench(run_fused, "fused       ")

    ok_scan = bool(np.array_equal(np.asarray(out_scan), np.asarray(fused_scan)))
    ok_tail = bool(np.array_equal(np.asarray(out_exp), np.asarray(fused_tail)))
    log(f"equality on chip: scan={ok_scan} tail={ok_tail}")

    overlap = (t_scan + t_exp - t_fused) / min(t_scan, t_exp)
    log(f"split sum {1e3*(t_scan+t_exp):.2f} ms, max {1e3*max(t_scan,t_exp):.2f} "
        f"ms, fused {1e3*t_fused:.2f} ms -> overlap {overlap:.2f}")
    print(f'{{"scan_ms": {t_scan*1e3:.2f}, "expand_ms": {t_exp*1e3:.2f}, '
          f'"fused_ms": {t_fused*1e3:.2f}, "overlap": {overlap:.3f}, '
          f'"equal": {str(ok_scan and ok_tail).lower()}}}')


if __name__ == "__main__":
    main()
