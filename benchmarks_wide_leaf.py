"""Wide-leaf fast-key sweep on the real chip (VERDICT r3 item 1).

Fast-mode keys can CTR-extend each leaf seed into leaf_bits/128 MMO
blocks (dpf/host.py wide-leaf note): leaf AES is fixed at height/128
blocks per query regardless of width, while tree AES (3 blocks/parent)
shrinks geometrically with every level the wider leaf cuts. On the
2^20-row table the per-query AES totals are

  leaf_bits  depth  tree AES  leaf AES  total
       128     13     24573      8192   32.8K
       256     12     12285      8192   20.5K
       512     11      6141      8192   14.3K
      1024     10      3069      8192   11.3K
      2048      9      1533      8192    9.7K

This harness measures what that buys END TO END, through the exact
serving path bench.py uses (TpuPirServer.private_secret_shared_query_
batch -> _dispatch_fast_root -> fused_fast_root_batch_pallas_fn), so
every executable it compiles lands in .xla_cache and is a direct hit
for bench.py at the same (leaf_bits, tail) config. Per config it
asserts full-batch recovery (share_a ^ share_b == true rows) before
timing. One TpuPirServer per config: each (depth, n_blk) scatters its
own storage-ordered copy of the table, and two resident 1 GiB tables
would crowd HBM.

Env: WL_HEIGHT (2^20), WL_SLOT_BYTES (1024), WL_BATCH (4096),
WL_SWEEP ("128,512,1024" leaf widths), WL_TAILS ("5" pallas tail levels,
crossed with every width), WL_REPS (3), WL_CHECK ("1" recovery check),
BENCH_PLATFORM=cpu for interpret-mode smoke testing.

Writes per-config JSON lines to stderr as they complete (relay-crash
safe) and one summary JSON line to stdout at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timeonce(fn, *args) -> float:
    t0 = time.perf_counter()
    fn(*args).block_until_ready()
    return time.perf_counter() - t0


def main():
    import jax

    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.dpf import host as dpf_host
    from pir_tpu.server import TpuPirServer

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        height = int(os.environ.get("WL_HEIGHT", 1 << 20))
        slot_bytes = int(os.environ.get("WL_SLOT_BYTES", 1024))
        batch = int(os.environ.get("WL_BATCH", 4096))
    else:  # interpret-mode smoke shapes
        height = int(os.environ.get("WL_HEIGHT", 1 << 14))
        slot_bytes = int(os.environ.get("WL_SLOT_BYTES", 64))
        batch = int(os.environ.get("WL_BATCH", 16))
    sweep = [int(x) for x in
             os.environ.get("WL_SWEEP", "128,512,1024").split(",")]
    tails = [int(x) for x in os.environ.get("WL_TAILS", "5").split(",")]
    reps = int(os.environ.get("WL_REPS", 3))
    check = os.environ.get("WL_CHECK", "1") == "1"

    log(f"devices: {jax.devices()}; table {height}x{slot_bytes}B, "
        f"batch {batch}; sweep {sweep} x tails {tails}")

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    md = db.metadata()
    table_bytes = height * (-(-slot_bytes // 4) * 4)

    # relay warmup: the first device->host fetch can take minutes
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))
    log(f"first-fetch warmup: {time.perf_counter() - t0:.1f}s")

    results = []
    for lb in sweep:
        eff_lb = dpf_host.fast_leaf_bits_for_height(height, lb)
        if eff_lb != lb:
            log(f"leaf_bits={lb}: clamped to {eff_lb} for height {height}")
            if any(r["leaf_bits"] == eff_lb for r in results):
                continue
            lb = eff_lb
        depth = dpf_host.fast_depth_for_height(height, lb)
        idxs = rng.integers(0, height, size=batch)
        t0 = time.perf_counter()
        shares = q.new_index_query_shares_batch(
            md, [int(i) for i in idxs], 1, 2, fast=True, leaf_bits=lb)
        keygen_t = time.perf_counter() - t0
        sa = [s[0] for s in shares]
        sb = [s[1] for s in shares]
        for tail in tails:
            if depth < tail:
                log(f"leaf_bits={lb}: depth {depth} < tail {tail}; skipping")
                continue
            server = TpuPirServer(db, use_pallas=on_tpu or None,
                                  pallas_tail_levels=tail)
            t0 = time.perf_counter()
            res_a = server.private_secret_shared_query_batch(sa)
            warm_t = time.perf_counter() - t0
            log(f"leaf_bits={lb} tail={tail} depth={depth}: warmup "
                f"(scatter+upload+compile+run) {warm_t:.1f}s")
            times = []
            t0 = time.perf_counter()
            res_b = server.private_secret_shared_query_batch(sb)
            times.append(time.perf_counter() - t0)
            if check:
                from pir_tpu.slot import Slot

                for i in range(batch):
                    rec = q.recover([res_a[i], res_b[i]])
                    assert Slot(db.data[idxs[i]].tobytes()).equal(rec[0]), \
                        f"recovery mismatch: leaf_bits={lb} element {i}"
                log(f"  recovery check: {batch}/{batch} rows OK")
            for _ in range(max(0, reps - 1)):
                t0 = time.perf_counter()
                server.private_secret_shared_query_batch(sa)
                times.append(time.perf_counter() - t0)
            best = float(np.min(times))
            gbps = batch * table_bytes / best / 1e9
            row = {
                "leaf_bits": lb,
                "tail": tail,
                "depth": depth,
                "batch_ms": round(best * 1e3, 1),
                "gbps": round(gbps, 1),
                "qps": round(batch / best, 1),
                "keygen_us_per_query": round(keygen_t / batch * 1e6, 1),
                "aes_per_query": 3 * ((1 << depth) - 1) + (height // 128),
            }

            # device-only timing (relay-adjusted, benchmarks_fast_roof
            # methodology): the exact serving executable on a prebuilt
            # payload, block-without-fetch, null-op subtracted — the
            # number the pipelined serving configuration is bounded by.
            if os.environ.get("WL_DEVICE", "1") == "1":
                import jax.numpy as jnp

                from pir_tpu.dpf.device import make_fast_payload_batch
                from pir_tpu.models.pipeline import (
                    fused_fast_root_batch_pallas_fn,
                    fused_fast_root_batch_stacked_fn,
                )

                pay, layout = make_fast_payload_batch(sa)
                if server.fast_stacked and getattr(layout, "shared_rk",
                                                   False):
                    # the serving path since r4: stacked tail kernel
                    table = server._root_table_u8(1, depth, lb // 128,
                                                  stacked=True)
                    fn = fused_fast_root_batch_stacked_fn(
                        layout, interpret=not on_tpu)
                else:
                    table = server._root_table_u8(1, depth, lb // 128)
                    fn = fused_fast_root_batch_pallas_fn(
                        layout, tail_levels=tail, interpret=not on_tpu)
                pay_dev = jnp.asarray(pay)
                null_fn = jax.jit(lambda t: t[:8, :8] + jnp.uint8(1))
                t_null = min(
                    _timeonce(null_fn, table) for _ in range(5))
                t_dev = min(
                    _timeonce(fn, table, pay_dev) for _ in range(reps))
                row["device_ms"] = round((t_dev - t_null) * 1e3, 1)
                row["null_ms"] = round(t_null * 1e3, 1)
                row["device_gbps"] = round(
                    batch * table_bytes / max(t_dev - t_null, 1e-9) / 1e9, 1)

            # pipelined mini-run (the serving configuration): async
            # submits with payload builds overlapped against device
            # compute, bench.py methodology.
            pipe_reps = int(os.environ.get("WL_PIPE", 8))
            if pipe_reps:
                pbs = [
                    [s[0] for s in q.new_index_query_shares_batch(
                        md, [int(i) for i in
                             rng.integers(0, height, size=batch)],
                        1, 2, fast=True, leaf_bits=lb)]
                    for _ in range(pipe_reps)
                ]
                t0 = time.perf_counter()
                fins, n_out = [], 0
                for bs in pbs:
                    fins.append(
                        server.private_secret_shared_query_batch_async(bs))
                    if len(fins) > 6:
                        n_out += len(fins.pop(0)())
                for f in fins:
                    n_out += len(f())
                pt = time.perf_counter() - t0
                assert n_out == pipe_reps * batch
                row["pipelined_gbps"] = round(
                    n_out * table_bytes / pt / 1e9, 1)
                row["pipelined_qps"] = round(n_out / pt, 1)

            results.append(row)
            log(f"  -> {json.dumps(row)}")
            del server  # free the storage-ordered table before the next config

    best = max(results,
               key=lambda r: r.get("pipelined_gbps") or r["gbps"])
    print(json.dumps({
        "metric": "wide_leaf_sweep_best",
        "value": best["gbps"],
        "unit": "GB/s",
        "leaf_bits": best["leaf_bits"],
        "tail": best["tail"],
        "results": results,
    }), flush=True)


if __name__ == "__main__":
    main()
