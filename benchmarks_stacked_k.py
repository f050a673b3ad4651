"""Device-only A/B of the stacked-geometry k (queries per grid step).

bench.py's latency-phase methodology at the full serving shape: time the
stacked root-dispatch executable blocking WITHOUT fetching, subtract the
null-op sync floor (the relay adds ~30-70 ms per synchronous roundtrip),
report the median of several reps. Run once per k value IN SEPARATE
PROCESSES — stacked_fast_geometry reads PIR_STACKED_K_MAX at trace time
and the per-shape jits are lru-cached, so an in-process flip would reuse
the old executable:

    PIR_STACKED_K_MAX=32 python benchmarks_stacked_k.py   # warm (default)
    PIR_STACKED_K_MAX=64 python benchmarks_stacked_k.py   # compiles fresh

A recovery check runs before timing (correctness first, as everywhere).
Env: ROOF_HEIGHT / ROOF_SLOT_BYTES / ROOF_BATCH (default 2^20 x 1024 B,
batch 4096 — the 1 GiB serving shape); BENCH_PLATFORM=cpu for a tiny
interpret-mode harness check.

History: r5 adopted k=32 after a 254.9 vs 262.3 ms same-window win over
k=16 (docs/PERFORMANCE.md); this harness exists to extend the sweep
(k=64 doubles per-step VMEM again — pipeline.stacked_fast_geometry
scales the Mosaic scoped-VMEM budget with the cap).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.dpf.device import make_fast_payload_batch
    from pir_tpu.models.pipeline import (
        fused_fast_root_batch_stacked_fn,
        stacked_fast_geometry,
    )
    from pir_tpu.server import TpuPirServer

    interp = os.environ.get("BENCH_PLATFORM") == "cpu"
    height = int(os.environ.get("ROOF_HEIGHT", 1 << (14 if interp else 20)))
    slot_bytes = int(os.environ.get("ROOF_SLOT_BYTES", 64 if interp else 1024))
    batch = int(os.environ.get("ROOF_BATCH", 64 if interp else 4096))

    # relay warmup: first fetch in a process is minutes on a bad window
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))
    log(f"first-fetch warmup: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    md = db.metadata()
    server = TpuPirServer(db)

    idxs = [int(i) for i in rng.integers(0, height, size=batch)]
    shares = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)
    pay_a, lay = make_fast_payload_batch([s[0] for s in shares])
    pay_b, _ = make_fast_payload_batch([s[1] for s in shares])
    k, tail = stacked_fast_geometry(lay.depth, lay.leaf_blocks)
    log(f"shape {height}x{slot_bytes}B batch {batch}: depth {lay.depth}, "
        f"leaf_blocks {lay.leaf_blocks}, stacked k={k} tail={tail} "
        f"(PIR_STACKED_K_MAX={os.environ.get('PIR_STACKED_K_MAX', 'unset')})")

    dfn = fused_fast_root_batch_stacked_fn(lay, interpret=interp)
    tbl = server._root_table_u8(1, lay.depth, lay.leaf_blocks, stacked=True)
    pa, pb = jnp.asarray(pay_a), jnp.asarray(pay_b)

    t0 = time.perf_counter()
    ra = np.asarray(dfn(tbl, pa))
    log(f"first dispatch (incl. any compile): {time.perf_counter()-t0:.1f}s")
    rb = np.asarray(dfn(tbl, pb))
    ok = sum(bytes((ra[i] ^ rb[i])[:slot_bytes]) == db.data[idxs[i]].tobytes()
             for i in range(batch))
    log(f"recovery check: {ok}/{batch} rows OK")
    assert ok == batch

    def stopwatch(fn, *a):
        t0 = time.perf_counter()
        fn(*a).block_until_ready()
        return time.perf_counter() - t0

    nul = jax.jit(lambda t: t[:8, :8] + jnp.uint8(1))
    t_null = min(stopwatch(nul, tbl) for _ in range(5))
    ts = sorted(stopwatch(dfn, tbl, pa) for _ in range(7))
    dev_ms = (ts[len(ts) // 2] - t_null) * 1e3
    log(f"null floor {t_null*1e3:.1f} ms; raw medians "
        f"{[f'{t*1e3:.1f}' for t in ts]}")
    print(f'{{"k": {k}, "device_ms_per_batch": {dev_ms:.1f}, '
          f'"batch": {batch}}}')


if __name__ == "__main__":
    main()
