"""ASPIR DDLEQ prove/verify timing across engines (VERDICT r3 item 7).

Times, at the reference's ASPIR parameters (1024-bit keys, secparam=8 ->
64 repetitions; aspir.go:156-168's call shape), the full sk-side audit
step — nested_randomize + prove_ddleq + 2x extract_randomness — and the
pk-side verify_ddleq, under three engine configurations:

  host    — CPython/native Montgomery batches (1 core on this rig)
  crt     — same, plus the sk-side CRT fast path (always on for sk ops
            since r4; listed for the host-only delta)
  tpu     — enable_tpu_modexp: batched ladders on the TPU VPU, the p/q
            CRT halves of each mod-N^3 phase fused into ONE per-row-
            modulus dispatch (crypto/mont_tpu.tpu_powmod_batch_multi)

Proof bytes are engine-independent (CRT is an identity; the TPU engine
is bit-exact), asserted every run by verifying each proof. Writes one
JSON line to stdout, detail to stderr. Env: DDLEQ_BITS (1024),
DDLEQ_SECPARAM (8), DDLEQ_REPS (3 timing reps), BENCH_PLATFORM=cpu for
harness testing.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    from pir_tpu.config import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from pir_tpu.crypto import paillier

    bits = int(os.environ.get("DDLEQ_BITS", 1024))
    secparam = int(os.environ.get("DDLEQ_SECPARAM", 8))
    reps = int(os.environ.get("DDLEQ_REPS", 3))
    log(f"devices: {jax.devices()}; keys {bits}-bit, secparam {secparam} "
        f"({8 * secparam} repetitions)")

    sk, pk = paillier.keygen(bits)
    inner = pk.encrypt(7)
    ct1 = pk.encrypt_at_level(inner.c, paillier.ENC_LEVEL_TWO)

    # relay warmup (first fetch can take minutes)
    t0 = time.perf_counter()
    np.asarray(jax.jit(lambda x: x + 1)(np.zeros(8, np.uint32)))
    log(f"first-fetch warmup: {time.perf_counter() - t0:.1f}s")

    results = {}
    for engine in ("host", "tpu"):
        paillier.enable_tpu_modexp(engine == "tpu")
        try:
            # warmup (compiles the TPU shapes on first use)
            ct2, a, b = sk.nested_randomize(ct1)
            t0 = time.perf_counter()
            proof = sk.prove_ddleq(secparam, ct1, ct2, a, b)
            warm = time.perf_counter() - t0
            assert pk.verify_ddleq(ct1, ct2, proof)
            log(f"[{engine}] warmup prove (incl. compile): {warm:.1f}s")

            prove_t, verify_t, audit_t = [], [], []
            for _ in range(reps):
                t0 = time.perf_counter()
                ct2, a, b = sk.nested_randomize(ct1)
                proof = sk.prove_ddleq(secparam, ct1, ct2, a, b)
                s = sk.extract_randomness(ct2)
                r = sk.extract_randomness(sk.decrypt_nested_layer(ct2))
                audit_t.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                proof2 = sk.prove_ddleq(secparam, ct1, ct2, a, b)
                prove_t.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                ok = pk.verify_ddleq(ct1, ct2, proof2)
                verify_t.append(time.perf_counter() - t0)
                assert ok and s and r
            results[engine] = {
                "prove_s": round(min(prove_t), 2),
                "verify_s": round(min(verify_t), 2),
                "audit_step_s": round(min(audit_t), 2),
            }
            log(f"[{engine}] prove {min(prove_t):.2f}s, verify "
                f"{min(verify_t):.2f}s, full audit step {min(audit_t):.2f}s")
        finally:
            paillier.enable_tpu_modexp(False)

    print(json.dumps({
        "metric": "ddleq_prove_seconds",
        "value": results.get("tpu", results["host"])["prove_s"],
        "unit": "s",
        "results": results,
    }), flush=True)


if __name__ == "__main__":
    main()
