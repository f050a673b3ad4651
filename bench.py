"""Headline benchmark: effective DB scan throughput of a full PIR answer.

Runs on whatever accelerator JAX provides (real TPU under the driver).
Prints exactly ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is the ratio against the 50 GB/s/chip north-star target
(BASELINE.md); the reference publishes no numbers of its own.

Breakdown details go to stderr.
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
    import jax

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.server import TpuPirServer
    from pir_tpu.slot import Slot

    height = int(os.environ.get("BENCH_HEIGHT", 1 << 20))
    slot_bytes = int(os.environ.get("BENCH_SLOT_BYTES", 256))
    n_queries = int(os.environ.get("BENCH_QUERIES", 16))

    log(f"devices: {jax.devices()}")
    log(f"db: {height} rows x {slot_bytes} B = {height*slot_bytes/2**20:.0f} MiB")

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)

    server = TpuPirServer(db)
    md = db.metadata()

    # warm-up: compiles the per-width level steps + scan
    t0 = time.perf_counter()
    shares = q.new_index_query_shares(md, 123, 1, 2)
    res = server.private_secret_shared_query(shares[0])
    log(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s")

    # correctness spot check (both servers + recover)
    res_b = server.private_secret_shared_query(shares[1])
    rec = q.recover([res, res_b])
    assert Slot(db.data[123].tobytes()).equal(rec[0]), "recovery mismatch"

    # timed end-to-end server answers (keygen excluded: client-side cost)
    idxs = rng.integers(0, height, size=n_queries)
    all_shares = [q.new_index_query_shares(md, int(i), 1, 2)[0] for i in idxs]

    times = []
    for s in all_shares:
        t0 = time.perf_counter()
        out = server.private_secret_shared_query(s)
        times.append(time.perf_counter() - t0)
        del out
    times = np.array(times)

    # expansion-only timing
    t0 = time.perf_counter()
    for s in all_shares:
        bits = server.expand_shared_query(s)
    jax.block_until_ready(bits)
    expand_t = (time.perf_counter() - t0) / n_queries

    table_bytes = height * (-(-slot_bytes // 4) * 4)
    p50 = float(np.percentile(times, 50))
    gbps = table_bytes / p50 / 1e9
    qps = 1.0 / p50

    log(f"p50 answer latency: {p50*1000:.2f} ms  (mean {times.mean()*1000:.2f} ms)")
    log(f"expand-only: {expand_t*1000:.2f} ms/query")
    log(f"effective scan: {gbps:.2f} GB/s   queries/sec: {qps:.1f}")

    print(json.dumps({
        "metric": "pir_effective_scan_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
