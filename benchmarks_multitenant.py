"""Multi-tenant (distinct-key) fast serving A/B on the real TPU.

VERDICT r4 #4: distinct per-client PRF keys used to keep the r3
per-query tail kernel (25% of the AES roof, tile-bound) and forced a
server handling both key styles to hold BOTH fast storage orders (2x
HBM on a 1 GiB table). r5 routes distinct-key batches through the SAME
stacked kernel + chunk-major table as shared-key batches, with
per-query round keys regrouped into per-grid-step lane-dense
(S,11,8,3,16,W) operands (dpf.device.regroup_rk_stacked).

This script measures, on one table shape:
  1. shared-key batch   — stacked kernel, broadcast rk   (the headline)
  2. distinct-key batch — stacked kernel, per-step rk    (the r5 path)
  3. distinct-key batch — r3 per-query tail              (the r4 path)
device-only (block_until_ready minus null-op sync floor), plus the
fast-table HBM footprint each configuration holds.

Env: MT_HEIGHT (2^20), MT_SLOT_BYTES (1024), MT_BATCH (1024 — the
fast_nonshared_chunk cap, so one chunk = one dispatch), MT_REPS (5).
Run on the TPU rig: `python benchmarks_multitenant.py` (details on
stderr, one summary JSON line on stdout).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.dpf.device import make_fast_payload_batch
    from pir_tpu.models.pipeline import (
        fused_fast_root_batch_pallas_fn,
        fused_fast_root_batch_stacked_fn,
    )
    from pir_tpu.server import TpuPirServer

    height = int(os.environ.get("MT_HEIGHT", 1 << 20))
    slot_bytes = int(os.environ.get("MT_SLOT_BYTES", 1024))
    batch = int(os.environ.get("MT_BATCH", 1024))
    reps = int(os.environ.get("MT_REPS", 5))
    interp = jax.default_backend() != "tpu"

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    md = db.metadata()
    server = TpuPirServer(db)
    table_bytes = height * (-(-slot_bytes // 4) * 4)
    log(f"devices: {jax.devices()}")
    log(f"db: {height} rows x {slot_bytes} B, batch {batch}, reps {reps}")

    # relay warmup (first fetch is minutes on the tunnel)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))
    log(f"first-fetch warmup: {time.perf_counter() - t0:.1f}s")

    idxs = [int(i) for i in rng.integers(0, height, size=batch)]
    # shared: one batch keygen -> every share carries the same PRF keys
    shared = [s[0] for s in q.new_index_query_shares_batch(md, idxs, 1, 2,
                                                           fast=True)]
    t0 = time.perf_counter()
    # distinct: one keygen per query (multi-tenant)
    distinct = [q.new_index_query_shares(md, i, 1, 2, fast=True)[0]
                for i in idxs]
    log(f"distinct keygen: {(time.perf_counter() - t0) / batch * 1e3:.2f} "
        f"ms/query host")

    pay_s, lay_s = make_fast_payload_batch(shared)
    pay_d, lay_d = make_fast_payload_batch(distinct)
    assert lay_s.shared_rk and not lay_d.shared_rk
    depth, n_blk = lay_s.depth, lay_s.leaf_blocks

    tbl_stacked = server._root_table_u8(1, depth, n_blk, stacked=True)
    tbl_classic = server._root_table_u8(1, depth, n_blk)
    gib = lambda t: t.size * t.dtype.itemsize / 2**30
    log(f"fast-table HBM: stacked {gib(tbl_stacked):.2f} GiB, classic "
        f"{gib(tbl_classic):.2f} GiB (r5 serves both key styles from the "
        f"stacked copy; r4 multi-tenant needed both)")

    nul = jax.jit(lambda t: t[:8, :8] + jnp.uint8(1))

    def dev_time(fn, tbl, pay):
        pay_dev = jnp.asarray(pay)
        t0 = time.perf_counter()
        fn(tbl, pay_dev).block_until_ready()
        log(f"  warmup (incl. compile): {time.perf_counter() - t0:.1f}s")
        t_null = min(_stopwatch(nul, tbl) for _ in range(5))
        ts = sorted(_stopwatch(fn, tbl, pay_dev) for _ in range(reps))
        return ts[len(ts) // 2] - t_null

    def _stopwatch(fn, *a):
        t0 = time.perf_counter()
        fn(*a).block_until_ready()
        return time.perf_counter() - t0

    results = {}
    log("1) shared-key batch, stacked kernel (headline config)")
    t_shared = dev_time(
        fused_fast_root_batch_stacked_fn(lay_s, interpret=interp),
        tbl_stacked, pay_s)
    results["shared_stacked_ms"] = round(t_shared * 1e3, 1)
    log(f"  device {t_shared * 1e3:.1f} ms/batch = "
        f"{batch * table_bytes / t_shared / 1e9:.0f} GB/s")

    log("2) distinct-key batch, stacked kernel + per-step rk (r5)")
    t_dist = dev_time(
        fused_fast_root_batch_stacked_fn(lay_d, interpret=interp),
        tbl_stacked, pay_d)
    results["distinct_stacked_ms"] = round(t_dist * 1e3, 1)
    log(f"  device {t_dist * 1e3:.1f} ms/batch = "
        f"{batch * table_bytes / t_dist / 1e9:.0f} GB/s "
        f"({t_dist / t_shared:.2f}x shared)")

    log("3) distinct-key batch, r3 per-query tail (the r4 path)")
    t_pq = dev_time(
        fused_fast_root_batch_pallas_fn(
            lay_d, tail_levels=server.pallas_tail_levels, interpret=interp),
        tbl_classic, pay_d)
    results["distinct_perquery_ms"] = round(t_pq * 1e3, 1)
    log(f"  device {t_pq * 1e3:.1f} ms/batch = "
        f"{batch * table_bytes / t_pq / 1e9:.0f} GB/s "
        f"({t_pq / t_shared:.2f}x shared)")

    # recovery sanity on the r5 distinct path (both servers' shares)
    n_chk = 8
    chk = [q.new_index_query_shares(md, i, 1, 2, fast=True)
           for i in idxs[:n_chk]]
    outs = []
    for part in range(2):
        p, l = make_fast_payload_batch([c[part] for c in chk])
        outs.append(np.asarray(fused_fast_root_batch_stacked_fn(
            l, interpret=interp)(tbl_stacked, jnp.asarray(p))))
    for i in range(n_chk):
        got = np.bitwise_xor(outs[0][i], outs[1][i])[:slot_bytes]
        assert (got == db.data[idxs[i]]).all(), f"recovery mismatch at {i}"
    log(f"distinct-stacked recovery check: {n_chk}/{n_chk} OK")

    results.update({
        "batch": batch,
        "height": height,
        "slot_bytes": slot_bytes,
        "distinct_vs_shared": round(t_dist / t_shared, 2),
        "perquery_vs_shared": round(t_pq / t_shared, 2),
    })
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
