"""Pre-warm the persistent XLA cache for the bench/serving shapes.

Run on the real chip after any change to traced serving code (the
Mosaic-stabilized cache keys survive source moves but NOT computation
changes — CLAUDE.md). Exercises, at the headline shape (2^20 x 1024 B,
batch 4096, the bench.py defaults):

  - the async batched fast path (fused_fast_root_batch_pallas_fn at the
    server's default tail split),
  - the single-query fast path,
  - the fused overlap serving stream (fast_serving_stream),

each with a recovery check, then prints the .xla_cache files touched.
Env: WARM_HEIGHT / WARM_SLOT_BYTES / WARM_BATCH to override.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.server import TpuPirServer

    height = int(os.environ.get("WARM_HEIGHT", 1 << 20))
    slot_bytes = int(os.environ.get("WARM_SLOT_BYTES", 1024))
    batch = int(os.environ.get("WARM_BATCH", 4096))
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".xla_cache")
    before = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    md = db.metadata()
    server = TpuPirServer(db)
    log(f"warming {height}x{slot_bytes}B batch {batch} on "
        f"{jax.default_backend()}")

    idxs = [int(i) for i in rng.integers(0, height, size=batch)]
    share_lists = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)

    def check(res_a, res_b, n, label):
        ok = sum(
            bytes(q.recover([res_a[k], res_b[k]])[0].data)
            == db.data[idxs[k]].tobytes()
            for k in range(n)
        )
        log(f"{label}: {ok}/{n} recoveries OK")
        assert ok == n, label

    # async batched path
    t0 = time.perf_counter()
    fin = [server.private_secret_shared_query_batch_async(
        [sl[s] for sl in share_lists]) for s in range(2)]
    res_a, res_b = fin[0](), fin[1]()
    log(f"batched fast path: {time.perf_counter()-t0:.1f}s incl. compile")
    check(res_a, res_b, batch, "batched")

    # single-query path
    t0 = time.perf_counter()
    single = [server.private_secret_shared_query(sh)
              for sh in share_lists[0]]
    log(f"single-query path: {time.perf_counter()-t0:.1f}s incl. compile")
    check([single[0]], [single[1]], 1, "single")

    # fused overlap serving stream
    t0 = time.perf_counter()
    ws = server.fast_serving_stream()
    ws.submit([sl[0] for sl in share_lists])
    outs0 = ws.flush()()
    ws2 = server.fast_serving_stream()
    ws2.submit([sl[1] for sl in share_lists])
    outs1 = ws2.flush()()
    log(f"overlap stream: {time.perf_counter()-t0:.1f}s incl. compile")
    check(outs0, outs1, batch, "stream")

    after = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    for f in sorted(after - before):
        print(f)


if __name__ == "__main__":
    main()
