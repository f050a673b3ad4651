"""Headline benchmark: effective DB scan throughput of full PIR answers.

Runs on whatever accelerator JAX provides (real TPU under the driver).
Prints exactly ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
vs_baseline is the ratio against the 50 GB/s/chip north-star target
(BASELINE.md); the reference publishes no numbers of its own.

Methodology: queries are answered in batches of BENCH_BATCH through the
single-dispatch fused expand+scan pipeline (production serving shape).
Effective throughput = batch_size * table_bytes / batch_time. Single-query
latency is also measured and reported on stderr; note the dev rig reaches
the TPU through a relay with ~50-70 ms fixed per-roundtrip latency, which
bounds single-query latency but not batched throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def enable_compile_cache():
    """Persistent XLA compile cache: first runs pay minutes of remote
    compile per jit shape; subsequent processes reuse executables."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/pir_tpu_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    import jax

    enable_compile_cache()

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.server import TpuPirServer
    from pir_tpu.slot import Slot

    height = int(os.environ.get("BENCH_HEIGHT", 1 << 20))
    slot_bytes = int(os.environ.get("BENCH_SLOT_BYTES", 1024))
    batch = int(os.environ.get("BENCH_BATCH", 512))
    reps = int(os.environ.get("BENCH_REPS", 4))
    fast = os.environ.get("BENCH_MODE", "fast") == "fast"

    log(f"devices: {jax.devices()}")
    log(f"db: {height} rows x {slot_bytes} B = {height*slot_bytes/2**20:.0f} MiB, "
        f"batch {batch} x {reps} reps")

    # one-time relay warmup: the first device->host fetch in a process is
    # pathologically slow on the tunnel; do a tiny one before timing anything
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))
    log(f"first-fetch warmup: {time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)

    server = TpuPirServer(db)
    md = db.metadata()

    # compile warm-up + correctness spot check
    t0 = time.perf_counter()
    shares = q.new_index_query_shares(md, 123, 1, 2, fast=fast)
    res_a = server.private_secret_shared_query(shares[0])
    res_b = server.private_secret_shared_query(shares[1])
    rec = q.recover([res_a, res_b])
    assert Slot(db.data[123].tobytes()).equal(rec[0]), "recovery mismatch"
    log(f"single-query warmup+check (incl. compile): {time.perf_counter()-t0:.1f}s "
        f"(mode={'fast' if fast else 'compat'})")

    # single-query latency
    singles = [q.new_index_query_shares(md, int(i), 1, 2, fast=fast)[0]
               for i in rng.integers(0, height, size=4)]
    lat = []
    for s in singles:
        t0 = time.perf_counter()
        server.private_secret_shared_query(s)
        lat.append(time.perf_counter() - t0)
    log(f"single-query p50 latency: {1e3*float(np.percentile(lat,50)):.1f} ms "
        f"(relay-bound; see header)")

    # batched throughput
    def make_batch():
        idxs = rng.integers(0, height, size=batch)
        return [q.new_index_query_shares(md, int(i), 1, 2, fast=fast)[0]
                for i in idxs], idxs

    bs, idxs = make_batch()
    t0 = time.perf_counter()
    out = server.private_secret_shared_query_batch(bs)  # compiles batch fn
    log(f"batch warmup (incl. compile): {time.perf_counter()-t0:.1f}s")

    times = []
    for _ in range(reps):
        bs, idxs = make_batch()
        t0 = time.perf_counter()
        out = server.private_secret_shared_query_batch(bs)
        times.append(time.perf_counter() - t0)
    bt = float(np.min(times))

    # steady-state pipelined throughput (the serving configuration): the
    # async batch API keeps the device busy while the host builds the
    # next batch's payloads and fetches the previous results.
    pipe_reps = int(os.environ.get("BENCH_PIPE_REPS", max(8, reps)))
    pipe_depth = int(os.environ.get("BENCH_PIPE_DEPTH", 3))
    pipe_batches = [make_batch()[0] for _ in range(pipe_reps)]
    t0 = time.perf_counter()
    fins, n_out = [], 0
    for bs in pipe_batches:
        fins.append(server.private_secret_shared_query_batch_async(bs))
        if len(fins) > pipe_depth:
            n_out += len(fins.pop(0)())
    for f in fins:
        n_out += len(f())
    pipe_t = time.perf_counter() - t0
    assert n_out == pipe_reps * batch

    table_bytes = height * (-(-slot_bytes // 4) * 4)
    t0 = time.perf_counter()
    for _ in range(8):
        q.new_index_query_shares(md, 7, 1, 2, fast=fast)
    keygen_t = (time.perf_counter() - t0) / 8

    gbps_b = batch * table_bytes / bt / 1e9
    gbps = n_out * table_bytes / pipe_t / 1e9
    qps = n_out / pipe_t
    log(f"batch time (best of {reps}): {bt*1e3:.1f} ms -> "
        f"{1e3*bt/batch:.2f} ms/query amortized; {gbps_b:.2f} GB/s unpipelined")
    log(f"client keygen: {keygen_t*1e3:.2f} ms/query")
    log(f"pipelined ({pipe_reps} batches, depth {pipe_depth}): "
        f"effective scan {gbps:.2f} GB/s   queries/sec: {qps:.1f}")

    print(json.dumps({
        "metric": "pir_effective_scan_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
