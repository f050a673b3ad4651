"""Detailed benchmark matrix mirroring the reference's go test -bench set
(db_test.go:267-425, aspir_test.go:113-156, dpf/dpf_test.go:109-144).

CPU-only (host + native engines + Paillier); the TPU headline lives in
bench.py. Prints a table to stderr and a JSON object to stdout.

Reference harness parameters: BenchmarkDBSize = 2^20 slots x 3 B,
Paillier 1024-bit (test_constants.go:7-13).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from pir_tpu import query as q
    from pir_tpu.aspir import (
        auth_prove,
        generate_auth_chal_for_query,
        new_authenticated_query,
    )
    from pir_tpu.crypto.paillier import keygen
    from pir_tpu.database import generate_empty_db, generate_random_db
    from pir_tpu.dpf import host as dpf
    from pir_tpu.encrypted import new_encrypted_query, private_encrypted_query
    from pir_tpu.server import NativePirServer
    from pir_tpu import server as srv

    out = {}
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    size, slot_bytes = 1 << 20, 3  # BenchmarkDBSize (test_constants.go:8,12)
    log(f"building {size} x {slot_bytes} B database...")
    t = timeit(lambda: generate_empty_db(size, slot_bytes), 1)
    out["build_empty_db_s"] = round(t, 4)
    db = generate_random_db(size, slot_bytes)
    md = db.metadata()
    native = NativePirServer(db)

    # --- 2-server shared query (db_test.go:276-325) ---
    share = q.new_index_query_shares(md, 12345, 1, 2)[0]
    out["shared_query_host_s"] = round(
        timeit(lambda: srv.private_secret_shared_query(db, share)), 4)
    out["shared_query_native_s"] = round(
        timeit(lambda: native.private_secret_shared_query(share)), 4)
    fshare = q.new_index_query_shares(md, 12345, 1, 2, fast=True)[0]
    out["shared_query_native_fast_s"] = round(
        timeit(lambda: native.private_secret_shared_query(fshare)), 5)

    # --- keyword multi-party (3-server) query, 32-bit domain ---
    kwdb = generate_random_db(1 << 14, 8)
    kwdb.set_keywords(
        np.random.default_rng(7).choice(1 << 32, size=kwdb.db_size,
                                        replace=False).astype(np.uint64))
    kwn = NativePirServer(kwdb)
    mpsh = q.new_keyword_query_shares(kwdb.metadata(),
                                      int(kwdb.keywords[99]), 1, 3)[0]
    out["keyword_mp_query_native_s"] = round(
        timeit(lambda: kwn.private_secret_shared_query(mpsh), 3), 4)

    # --- query generation (db_test.go:327-353) ---
    out["querygen_compat_s"] = round(
        timeit(lambda: q.new_index_query_shares(md, 7, 1, 2)), 4)
    out["querygen_fast_s"] = round(
        timeit(lambda: q.new_index_query_shares(md, 7, 1, 2, fast=True)), 5)

    # --- DPF evals (dpf/dpf_test.go:109-144) ---
    client = dpf.client_initialize(32)
    keys = dpf.generate_two_server(client, 1, 1)
    server = dpf.server_initialize(client.prf_keys, 32)
    n = 200
    t = timeit(lambda: [dpf.evaluate_2p(server, 0, keys[0], i) for i in range(n)], 1)
    out["dpf_eval2p_32bit_us"] = round(t / n * 1e6, 1)
    client64 = dpf.client_initialize(64)
    keys64 = dpf.generate_two_server(client64, 1, 1)
    server64 = dpf.server_initialize(client64.prf_keys, 64)
    t = timeit(lambda: [dpf.evaluate_2p(server64, 0, keys64[0], i) for i in range(n)], 1)
    out["dpf_eval2p_64bit_us"] = round(t / n * 1e6, 1)

    # --- Paillier cPIR (db_test.go:355-389), 1024-bit keys, smaller DB ---
    log("paillier benches (1024-bit keys)...")
    sk, pk = keygen(1024)
    small = generate_random_db(1 << 10, 3)
    query = new_encrypted_query(small.metadata(), pk, 1, 3)
    out["cpir_scan_2e10_s"] = round(
        timeit(lambda: private_encrypted_query(small, query), 1), 3)

    # --- ASPIR challenge / prove (aspir_test.go:113-156) ---
    keydb = generate_random_db(1 << 6, 8)
    auth_query, state = new_authenticated_query(
        keydb.metadata(), sk, 1, 0, keydb.slot(0))
    out["aspir_challenge_s"] = round(
        timeit(lambda: generate_auth_chal_for_query(8, keydb, auth_query), 1), 3)
    chal = generate_auth_chal_for_query(8, keydb, auth_query)
    out["aspir_prove_s"] = round(timeit(lambda: auth_prove(state, chal), 1), 3)

    for k, v in out.items():
        log(f"{k:32s} {v}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
