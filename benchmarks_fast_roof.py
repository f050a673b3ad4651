"""Fast-mode roof analysis, phase-split at the SERVING shape.

The compat analysis (benchmarks_compat_roof.py) showed compat is AT the
bitsliced-AES ALU roof. Fast mode's device time splits across two units
with different roofs, so this harness times, on the real chip, at the
production fast configuration (storage-ordered u8 table, root-start
expansion with the Pallas AES tail, bit-packed Pallas scan):

  1. full answer     — fused_fast_root_batch_pallas_fn on the real table;
  2. expansion proxy — the same compiled pipeline against a 128-column
     table (narrowest supported tile): the scan collapses to 128/B of
     its real cost while head+tail+leaf expansion is unchanged;
  3. scan only       — mxu_batched_scan_packed_pallas fed random packed
     words of the serving shape (the scan is data-independent).

Every timing blocks on completion WITHOUT fetching the result (the relay
adds ~30-70 ms per synchronous roundtrip; a trivial-op "null" timing is
measured and subtracted so component times are relay-adjusted). From (2)
it derives achieved AES blocks/s against the per-query AES count of the
early-termination tree — 3 blocks per parent (_prf_triple, the MMO
triple of dpf/client.go:99-116 semantics) + 1 leaf PRG block per
128-row leaf — vs the ~1.27 G blocks/s bitsliced-AES VPU roof
established by the compat analysis. From (3) it derives achieved int8
MAC/s in the XOR-via-matmul scan vs the ~197 T MAC/s MXU roof (394 int8
TOPS counts multiply and add as two ops per MAC). Writes
stderr detail + one JSON line.

Defaults to the 1 GiB serving shape (2^20 x 1024 B, batch 4096) whose
full-path executable ships pre-warmed in .xla_cache; the 128-wide and
scan-only variants compile fresh once (cache them after). Env:
ROOF_HEIGHT, ROOF_SLOT_BYTES, ROOF_BATCH, BENCH_PLATFORM=cpu (interpret,
small shapes) for harness testing.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

AES_ROOF_BPS = 1.27e9  # bitsliced-AES VPU roof (docs/PERFORMANCE.md, compat)
# v5e peak is 394 int8 TOPS, but TOPS counts multiply and add as TWO ops;
# a matmul's M*K*N MACs are 2*M*K*N "ops", so the MAC roof is half that.
# Dividing achieved MAC/s by 394e12 (the r3 bug this constant replaces)
# understated MXU utilization by exactly 2x.
MXU_ROOF_MACS = 197e12  # v5e int8 MAC/s roof (= 394 TOPS / 2 ops per MAC)


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
    if on_tpu:
        height = int(os.environ.get("ROOF_HEIGHT", 1 << 20))
        slot_bytes = int(os.environ.get("ROOF_SLOT_BYTES", 1024))
        batch = int(os.environ.get("ROOF_BATCH", 4096))
    else:  # interpret-mode smoke shapes
        height = int(os.environ.get("ROOF_HEIGHT", 1 << 14))
        slot_bytes = int(os.environ.get("ROOF_SLOT_BYTES", 64))
        batch = int(os.environ.get("ROOF_BATCH", 16))
    log(f"devices: {jax.devices()}; table {height}x{slot_bytes}B, batch {batch}")

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    server = TpuPirServer(db, use_pallas=on_tpu or None)

    idxs = [int(i) for i in rng.integers(0, height, size=batch)]
    shares = [s[0] for s in
              q.new_index_query_shares_batch(db.metadata(), idxs, 1, 2,
                                             fast=True)]

    from pir_tpu.dpf.device import make_fast_payload_batch
    from pir_tpu.models.pipeline import (
        _SCAN_Q_VMEM,
        fused_fast_root_batch_pallas_fn,
        scan_tile_sizes,
    )
    from pir_tpu.ops.pallas_scan import mxu_batched_scan_packed_pallas

    pay, layout = make_fast_payload_batch(shares)
    d = layout.depth
    n_blk = layout.leaf_blocks  # leaf width in 128-bit CTR blocks
    table = server._root_table_u8(1, d, n_blk)
    rows, b = table.shape
    # 3 PRF blocks per parent of the 2^d-leaf tree + n_blk leaf PRG
    # blocks per (128*n_blk)-row leaf (wide-leaf CTR extension)
    aes_per_query = 3 * ((1 << d) - 1) + n_blk * (1 << d)

    full_fn = fused_fast_root_batch_pallas_fn(
        layout, tail_levels=server.pallas_tail_levels, interpret=not on_tpu)
    tiny = jnp.zeros((rows, 128), dtype=jnp.uint8)

    # scan-only: the serving kernel at the serving tiles, data-independent
    flat_words = rows // 32
    words_t = jnp.asarray(
        rng.integers(0, 1 << 32, size=(flat_words, batch), dtype=np.uint32))
    qv = min(batch, _SCAN_Q_VMEM)
    br, bc = scan_tile_sizes(qv, rows, b, max_br=2048, max_bc=512)
    scan_fn = jax.jit(lambda t, w: mxu_batched_scan_packed_pallas(
        t, w, block_rows=br, block_cols=bc, interpret=not on_tpu))

    pay_dev = jnp.asarray(pay)
    np.asarray(table[0, :1])  # warm the relay (first fetch can take minutes)

    def timeit(fn, *args, reps=3, label=""):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        compile_t = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(*args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        log(f"{label}: best {best*1e3:.1f} ms (compile+first {compile_t:.1f}s)")
        return best

    null_fn = jax.jit(lambda t: t[:8, :8] + jnp.uint8(1))
    t_null = timeit(null_fn, table, reps=5, label="null op (relay floor)")
    t_full = timeit(full_fn, table, pay_dev, label="full answer (expand+scan)")
    t_tiny = timeit(full_fn, tiny, pay_dev, label="expansion + 128B-wide scan")

    # stacked tail path (the serving default since r4): same split
    t_full_st = t_tiny_st = None
    if os.environ.get("ROOF_STACKED", "1") == "1" and \
            getattr(layout, "shared_rk", False):
        from pir_tpu.models.pipeline import (
            fused_fast_root_batch_stacked_fn,
            stacked_fast_geometry,
        )

        k_st, tail_st = stacked_fast_geometry(d, layout.leaf_blocks)
        st_fn = fused_fast_root_batch_stacked_fn(layout, interpret=not on_tpu)
        st_table = server._root_table_u8(1, d, layout.leaf_blocks,
                                         stacked=True)
        t_full_st = timeit(st_fn, st_table, pay_dev,
                           label=f"full answer STACKED (k={k_st}, "
                                 f"tail={tail_st})")
        t_tiny_st = timeit(st_fn, tiny, pay_dev,
                           label="STACKED expansion + 128B-wide scan")
        log(f"stacked vs per-query full: {t_full_st*1e3:.1f} vs "
            f"{t_full*1e3:.1f} ms")
    if batch > _SCAN_Q_VMEM:  # serving path scans in Q-slices; time them all
        n_sl = -(-batch // _SCAN_Q_VMEM)
        t_scan = sum(
            timeit(scan_fn, table,
                   words_t[:, s * _SCAN_Q_VMEM:(s + 1) * _SCAN_Q_VMEM],
                   label=f"scan only, slice {s}") - t_null
            for s in range(n_sl)) + t_null
    else:
        t_scan = timeit(scan_fn, table, words_t, label="scan only")

    # relay-adjusted component times
    adj = lambda t: max(t - t_null, 1e-9)
    t_full_a, t_tiny_a, t_scan_a = adj(t_full), adj(t_tiny), adj(t_scan)
    t_exp = max(t_tiny_a - t_scan_a * (128 / b), 1e-9)  # remove tiny-scan share

    aes_total = batch * aes_per_query
    bps = aes_total / t_exp
    macs = 8.0 * rows * b * batch  # 8 bit-planes of int8 XOR-matmul
    scan_tops = macs / t_scan_a / 1e12
    table_bytes = height * slot_bytes
    eff_full = batch * table_bytes / t_full_a / 1e9
    # device floor if both stages ran at their unit roofs
    t_roof = aes_total / AES_ROOF_BPS + macs / MXU_ROOF_MACS
    log(f"tree: depth {d} over {128 * n_blk}-row leaves -> "
        f"{aes_per_query/1e3:.1f} K "
        f"AES/query; achieved {bps/1e9:.2f} G AES blocks/s in expansion "
        f"({bps/AES_ROOF_BPS*100:.0f}% of the bitsliced-AES VPU roof)")
    log(f"scan: {scan_tops:.0f} T int8 MAC/s "
        f"({scan_tops*1e12/MXU_ROOF_MACS*100:.0f}% of the "
        f"{MXU_ROOF_MACS/1e12:.0f} T MAC/s MXU roof, i.e. of 394 int8 TOPS "
        f"at 2 ops/MAC) for the 8x XOR-via-matmul blow-up")
    log(f"full {batch}-batch: {t_full_a*1e3:.1f} ms adj -> {eff_full:.0f} GB/s "
        f"eff; expansion {t_exp*1e3:.1f} ms ({t_exp/t_full_a*100:.0f}%), scan "
        f"{t_scan_a*1e3:.1f} ms ({t_scan_a/t_full_a*100:.0f}%); "
        f"unit-roof floor {t_roof*1e3:.1f} ms "
        f"({t_full_a/t_roof:.2f}x above)")
    print(json.dumps({
        "metric": "fast_expansion_share",
        "value": round(t_exp / t_full_a, 3),
        "unit": "fraction",
        "aes_gblocks_per_s": round(bps / 1e9, 2),
        "aes_per_query_K": round(aes_per_query / 1e3, 1),
        "scan_tops": round(scan_tops, 1),
        "scan_pct_of_mxu": round(scan_tops * 1e12 / MXU_ROOF_MACS * 100, 1),
        "aes_pct_of_vpu": round(bps / AES_ROOF_BPS * 100, 1),
        "full_ms": round(t_full_a * 1e3, 1),
        "expansion_ms": round(t_exp * 1e3, 1),
        "scan_ms": round(t_scan_a * 1e3, 1),
        "null_ms": round(t_null * 1e3, 1),
        "roof_floor_ms": round(t_roof * 1e3, 1),
        **({"stacked_full_ms": round((t_full_st - t_null) * 1e3, 1),
            "stacked_expansion_ms": round(
                max(t_tiny_st - t_null - t_scan_a * (128 / b), 1e-9) * 1e3,
                1)}
           if t_full_st is not None else {}),
    }), flush=True)


if __name__ == "__main__":
    main()
