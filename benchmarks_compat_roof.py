"""Compat roof analysis, phase-split at the SERVING shape.

Times, on the real chip, at the production compat configuration
(1 GiB-class table, cascaded Pallas expansion, q_chunk batching):

  1. expansion-only — the bits_chunk cascade jitted with a tiny XOR
     reduction output (so the (Q, flat/32) words never leave the device
     and fetch latency cannot pollute the timing);
  2. full answer    — expansion + packed-bits Pallas scan;
  3. scan-only      — the same scan kernel fed precomputed words.

From (1) it derives achieved AES blocks/s against the per-query AES
count of the device tree (after the dead-level skip), i.e. how far the
expansion kernel is from turning all device time into AES work; (2)-(1)
vs (3) shows the fusion overhead. Writes stderr detail + one JSON line.

Smaller default table (2^18 rows x 256 B) keeps compile time sane; the
AES-per-query count scales exactly with device_bits so the blocks/s
number transfers to the 1 GiB shape. Env: ROOF_HEIGHT, ROOF_SLOT_BYTES,
ROOF_BATCH, BENCH_PLATFORM=cpu (interpret) for harness testing.
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

    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.server import TpuPirServer

    on_tpu = jax.default_backend() == "tpu"
    height = int(os.environ.get("ROOF_HEIGHT", 1 << 18))
    slot_bytes = int(os.environ.get("ROOF_SLOT_BYTES", 256))
    batch = int(os.environ.get("ROOF_BATCH", 64))
    log(f"devices: {jax.devices()}; table {height}x{slot_bytes}B, batch {batch}")

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    server = TpuPirServer(db, use_pallas=on_tpu or None)

    idxs = [int(i) for i in rng.integers(0, height, size=batch)]
    shares = [s[0] for s in
              q.new_index_query_shares_batch(db.metadata(), idxs, 1, 2,
                                             fast=False)]

    # geometry of the device tree
    from pir_tpu.dpf.device import compat_stage_plan, make_compat_payload_batch
    from pir_tpu.models.pipeline import fused_compat_root_batch_pallas_fn

    nbd = server._compat_device_bits(1)
    w, mt, qc = (server.compat_pallas_w, server.compat_pallas_max_tail,
                 server.compat_pallas_q_chunk)
    _, tails = compat_stage_plan(nbd, w, mt)
    table = server._compat_root_table_u8(1, nbd, w, tails)
    pay, lo = make_compat_payload_batch(shares, height=height)
    # AES blocks per query on the device: 3 per parent node of the
    # nbd-level device tree (+ skip-walk nodes, negligible)
    aes_per_query = 3 * ((1 << nbd) - 1)

    full_fn = fused_compat_root_batch_pallas_fn(
        lo, w=w, max_tail=mt, q_chunk=qc, interpret=not on_tpu)

    # expansion-dominated timing: the same fn against a 128-column table
    # (the narrowest supported tile) — the scan cost collapses to ~1/8th
    # of the real column count while the cascade is unchanged, so this
    # upper-bounds the expansion cost tightly.
    tiny = jnp.zeros((table.shape[0], 128), dtype=jnp.uint8)

    def timeit(fn, *args, reps=3, label=""):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        compile_t = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        log(f"{label}: best {best*1e3:.1f} ms (compile+first {compile_t:.1f}s)")
        return best

    t_full = timeit(full_fn, table, pay, label="full answer (expand+scan)")
    t_exp = timeit(full_fn, tiny, pay, label="expansion + 128B-wide scan")

    aes_total = batch * aes_per_query
    bps = aes_total / t_exp
    table_bytes = height * slot_bytes
    floor_ms = aes_per_query / bps * 1e3
    eff_full = batch * table_bytes / t_full / 1e9
    eff_exp_only = batch * table_bytes / t_exp / 1e9
    log(f"device tree: {nbd} levels -> {aes_per_query/1e6:.2f} M AES/query; "
        f"achieved {bps/1e9:.2f} G AES blocks/s in the cascade")
    log(f"full {batch}-batch: {t_full*1e3:.1f} ms -> {eff_full:.0f} GB/s eff; "
        f"expansion-bound ceiling at this AES rate: {eff_exp_only:.0f} GB/s")
    print(json.dumps({
        "metric": "compat_expansion_share",
        "value": round(t_exp / t_full, 3),
        "unit": "fraction",
        "aes_gblocks_per_s": round(bps / 1e9, 2),
        "aes_per_query_M": round(aes_per_query / 1e6, 2),
        "full_ms": round(t_full * 1e3, 1),
        "expansion_ms": round(t_exp * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
