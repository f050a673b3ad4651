"""Phase breakdown of the batched fast-mode serving path (dev tool).

Splits one batch into host payload build / device dispatch / result fetch,
and (optionally, PROF_SPLIT=1 — pays new jit compiles) expansion-only vs
scan-only device time. Run on the real TPU: `python benchmarks_profile.py`.
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

    from bench import enable_compile_cache

    enable_compile_cache()

    from pir_tpu import query as q
    from pir_tpu.database import Database
    from pir_tpu.server import TpuPirServer

    height = int(os.environ.get("BENCH_HEIGHT", 1 << 20))
    slot_bytes = int(os.environ.get("BENCH_SLOT_BYTES", 1024))
    batch = int(os.environ.get("BENCH_BATCH", 256))

    log(f"devices: {jax.devices()}")
    _ = np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))

    rng = np.random.default_rng(0)
    db = Database(slot_bytes=slot_bytes, db_size=height)
    db.data = rng.integers(0, 256, size=(height, slot_bytes), dtype=np.uint8)
    server = TpuPirServer(db)
    md = db.metadata()

    shares = [q.new_index_query_shares(md, int(i), 1, 2, fast=True)[0]
              for i in rng.integers(0, height, size=batch)]

    # warm up all compiles on this path
    t0 = time.perf_counter()
    server.private_secret_shared_query_batch(shares)
    log(f"warmup (incl. compile): {time.perf_counter()-t0:.1f}s")

    # --- host payload build (vectorised, bit-packed root layout) ---
    from pir_tpu.dpf.device import make_fast_payload_batch
    t0 = time.perf_counter()
    pay_root, layout = make_fast_payload_batch(shares)
    t_hostv = time.perf_counter() - t0
    log(f"host vectorised payload build (root layout): {t_hostv*1e3:.1f} ms")

    # --- upload ---
    t0 = time.perf_counter()
    dev = jax.device_put(pay_root)
    dev.block_until_ready()
    log(f"payload upload ({pay_root.nbytes/2**20:.2f} MiB): "
        f"{(time.perf_counter()-t0)*1e3:.1f} ms")

    # --- full fused dispatch (device compute incl. scan) ---
    from pir_tpu.models.pipeline import (
        fused_fast_root_batch_fn,
        fused_fast_root_batch_mxu_fn,
    )
    depth = shares[0].key_fast.depth
    planes = server._root_plane_table(1, depth)
    if planes is not None:
        fn = lambda p: fused_fast_root_batch_fn(layout)(planes, p)
        log("path: preplane (one-matmul) scan")
    else:
        tab = server._root_table_u8(1, depth)
        fn = lambda p: fused_fast_root_batch_mxu_fn(layout, server.mxu_block)(tab, p)
        log("path: streaming MXU scan")
    out = fn(dev)
    out.block_until_ready()  # warm (already compiled via batch call)
    t0 = time.perf_counter()
    out = fn(dev)
    out.block_until_ready()
    t_dev = time.perf_counter() - t0
    log(f"device fused expand+scan: {t_dev*1e3:.1f} ms")

    t0 = time.perf_counter()
    host_out = np.asarray(out)
    log(f"result fetch ({host_out.nbytes/1024:.0f} KiB): "
        f"{(time.perf_counter()-t0)*1e3:.1f} ms")

    if os.environ.get("PROF_SPLIT") == "1" and planes is None:
        import functools
        import jax.numpy as jnp
        from pir_tpu.dpf.device import (
            expand_planes_from_root,
            fast_leaf_bits_flat,
            unpack_fast_root_payload,
        )
        from pir_tpu.ops.matmul_scan import mxu_batched_scan

        @jax.jit
        def bits_only(payloads):
            def one(p):
                seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf = (
                    unpack_fast_root_payload(p, layout))
                seeds, t = expand_planes_from_root(
                    seeds, t, cw_s, cw_tl, cw_tr, rk, layout.depth)
                return fast_leaf_bits_flat(seeds, t, fcw, rk_leaf)
            return jax.vmap(one)(payloads)

        t0 = time.perf_counter()
        bits = bits_only(dev)
        bits.block_until_ready()
        log(f"bits-only compile+run: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        bits = bits_only(dev)
        bits.block_until_ready()
        log(f"device expansion only: {(time.perf_counter()-t0)*1e3:.1f} ms")

        pad = tab.shape[0] - bits.shape[1]
        bits_p = jnp.pad(bits, ((0, 0), (0, pad))) if pad else bits
        bits_p.block_until_ready()
        scan = functools.partial(mxu_batched_scan, block=server.mxu_block)
        t0 = time.perf_counter()
        o = scan(tab, bits_p)
        o.block_until_ready()
        log(f"scan-only compile+run: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        o = scan(tab, bits_p)
        o.block_until_ready()
        log(f"device scan only: {(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
