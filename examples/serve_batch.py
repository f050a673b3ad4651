"""Steady-state batched serving: the production throughput shape.

Demonstrates the pipeline bench.py measures on real hardware:
  * vectorised batch keygen on the client (one BGI'16 tree walk for the
    whole batch, query.new_index_query_shares_batch),
  * the servers' async batch API (private_secret_shared_query_batch_async)
    with several batches in flight, so host payload builds and result
    fetches overlap device compute,
  * bit-for-bit recovery checks against ground truth.

Runs on CPU with a small table (use_pallas stays off automatically); on
a TPU host the same code serves ~7.8 TB/s effective scan on a 1 GiB
table (docs/PERFORMANCE.md). Usage: python examples/serve_batch.py
"""

import os
import random
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("SERVE_PLATFORM"):  # e.g. SERVE_PLATFORM=cpu on rigs
    import jax                        # whose site config pins a platform

    jax.config.update("jax_platforms", os.environ["SERVE_PLATFORM"])

from pir_tpu import generate_random_db
from pir_tpu import query as q
from pir_tpu.server import TpuPirServer


def main():
    height, slot_bytes, batch, n_batches, depth = 1 << 13, 64, 32, 6, 2
    db = generate_random_db(height, slot_bytes)
    server_a = TpuPirServer(db)  # in production: two non-colluding hosts
    server_b = TpuPirServer(db)

    rng = random.Random(0)
    all_idx = [[rng.randrange(height) for _ in range(batch)]
               for _ in range(n_batches)]

    # client: one vectorised keygen walk per batch
    t0 = time.perf_counter()
    share_batches = [q.new_index_query_shares_batch(db.metadata(), idxs, 1,
                                                    fast=True)
                     for idxs in all_idx]
    keygen_t = time.perf_counter() - t0
    print(f"keygen: {n_batches * batch} queries in {keygen_t*1e3:.0f} ms "
          f"({keygen_t / (n_batches * batch) * 1e6:.0f} us/query)")

    # servers: pipelined batches, `depth` in flight per server
    def serve_all():
        recovered = 0
        in_flight = []  # (idxs, fin_a, fin_b)

        def drain(entry):
            nonlocal recovered
            idxs, fin_a, fin_b = entry
            for i, (ra, rb) in enumerate(zip(fin_a(), fin_b())):
                rec = q.recover([ra, rb])
                assert bytes(rec[0].data) == db.data[idxs[i]].tobytes(), i
                recovered += 1

        for idxs, shares in zip(all_idx, share_batches):
            fin_a = server_a.private_secret_shared_query_batch_async(
                [s[0] for s in shares])
            fin_b = server_b.private_secret_shared_query_batch_async(
                [s[1] for s in shares])
            in_flight.append((idxs, fin_a, fin_b))
            if len(in_flight) > depth:
                drain(in_flight.pop(0))
        while in_flight:
            drain(in_flight.pop(0))
        return recovered

    t0 = time.perf_counter()
    serve_all()  # first pass pays one-time jit compilation
    print(f"warm-up pass (incl. compile): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    recovered = serve_all()  # steady state
    serve_t = time.perf_counter() - t0

    table_bytes = height * (-(-slot_bytes // 4) * 4)
    qps = recovered / serve_t
    print(f"served {recovered} queries in {serve_t*1e3:.0f} ms "
          f"({qps:.0f} qps/server-pair, effective scan "
          f"{qps * table_bytes / 1e9:.2f} GB/s, all recoveries bit-exact)")

    # the same steady state over TCP: the serving stream answers batch
    # k-1 in the response to submit(k) (on a TPU backend batch k's scan
    # and batch k+1's expansion share one fused kernel; here the host
    # engines emulate the lag, so this demonstrates the wire contract)
    from pir_tpu.service import PirClient, PirService

    svcs = [PirService(db).start() for _ in range(2)]
    try:
        client = PirClient([s.address for s in svcs])
        stream = client.open_stream()
        pending, done = list(all_idx), []
        for idxs in all_idx:
            res = stream.submit(idxs)
            if res is not None:
                done.append((pending.pop(0), res))
        done.append((pending.pop(0), stream.flush()))
        for idxs, res in done:
            for i, slots in zip(idxs, res):
                assert bytes(slots[0].data) == db.data[i].tobytes(), i
        print(f"serving stream over TCP: {sum(len(r) for _, r in done)} "
              f"results, all bit-exact (one-batch lag)")
        client.close()
    finally:
        for s in svcs:
            s.close()


if __name__ == "__main__":
    main()
