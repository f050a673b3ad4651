"""Compat-mode roof analysis: measure the pure bitsliced-AES floor.

Compat (reference-exact) answers walk the full 2^num_bits DPF tree per
query: sum_{l=1}^{nb} 2^(l-1) node expansions, 3 AES blocks each, plus
the varint-parity leaf pass — the AES work IS the compat floor, because
the scan is shared with fast mode (which reaches multi-TB/s effective).

This microbenchmark times the bitsliced AES plane kernel standalone at
serving shapes and derives:
  * aes_blocks_per_s      — measured device AES throughput
  * compat floor          — table_bytes * batch / (aes_blocks_needed /
                            aes_blocks_per_s)  == the effective GB/s an
                            infinitely-fast everything-else would reach
  * distance              — measured compat GB/s vs that floor.

Run on the real TPU: python benchmarks_roof.py   (stderr details, one
JSON summary line on stdout). BENCH_PLATFORM=cpu for harness testing.
"""

from __future__ import annotations

import functools
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

    from pir_tpu.dpf import host as dpf_host
    from pir_tpu.dpf.bitslice import aes_encrypt_planes, key_masks
    from pir_tpu.dpf.aes_host import key_schedule
    from pir_tpu.dpf.device import prf_key_masks

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # serving geometry: 1 GiB table = 2^20 rows -> num_bits 21 compat tree
    nb = int(os.environ.get("ROOF_NUM_BITS", 21))
    tree_nodes = (1 << nb) - 1  # parent expansions over all levels
    aes_per_query = 3 * tree_nodes  # _prf_triple per node

    client = dpf_host.client_initialize(nb)
    rk = jnp.asarray(prf_key_masks(client))  # (11, 8, 3, 16, 1)

    # Measure the PRG triple at the expansion's own operating shape:
    # seeds (8, 16, NW) planes, out (8, 3, 16, NW) — NW u32 words of 32
    # lanes each = 32*NW parallel nodes per call, 3 AES blocks per node.
    from pir_tpu.dpf.device import _prf_triple

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(seeds, reps):
        def body(s, _):
            out = _prf_triple(s, rk)
            # fold the 3 blocks back to one seed so work can't be elided
            s2 = out[:, 0] ^ out[:, 1] ^ out[:, 2]
            return s2, ()

        s, _ = jax.lax.scan(body, seeds, None, length=reps)
        return s

    results = {}
    for nw in (256, 1024, 4096):
        reps = int(os.environ.get("ROOF_REPS", 64))
        seeds = jnp.asarray(
            rng.integers(0, 1 << 32, size=(8, 16, nw), dtype=np.uint64
                         ).astype(np.uint32)
        )
        t0 = time.perf_counter()
        np.asarray(chained(seeds, reps))
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(seeds, reps))
        dt = time.perf_counter() - t0
        blocks = 3 * 32 * nw * reps
        bps = blocks / dt
        results[nw] = bps
        log(f"NW={nw:5d} ({32*nw} lanes): {reps} chained PRG triples "
            f"{dt*1e3:.1f} ms -> {bps/1e9:.2f} G AES blocks/s "
            f"(compile {compile_t:.1f}s)")

    bps = max(results.values())
    table_bytes = (1 << 20) * 1024
    floor_time_per_q = aes_per_query / bps
    floor_gbps = table_bytes / floor_time_per_q / 1e9
    log(f"AES peak: {bps/1e9:.2f} G blocks/s; compat tree needs "
        f"{aes_per_query/1e6:.1f} M AES/query -> floor "
        f"{floor_time_per_q*1e3:.2f} ms/query == {floor_gbps:.0f} GB/s "
        f"effective on the 1 GiB table")
    print(json.dumps({
        "metric": "compat_aes_floor", "value": round(floor_gbps, 1),
        "unit": "GB/s", "aes_gblocks_per_s": round(bps / 1e9, 2),
        "aes_per_query_M": round(aes_per_query / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
