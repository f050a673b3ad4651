"""cPIR scan engine comparison: CPython vs native C++ vs TPU Montgomery.

Stage 1 (correctness, timed): the reference's cPIR bench shape — 2^10
slots x 3 B, 1024-bit Paillier (db_test.go:330, test_constants.go) —
answered by every available engine; ciphertexts must be identical and
must decrypt to the right row.

Stage 2 (throughput): the isolated multi-exponentiation at a serving
shape (H rows x W chunks, 24-bit exponents, random bases mod N^2 — the
scan cost is data-independent, mirroring the reference's
fakeDoublyEncryptedQuery trick, db_test.go:427-477). Reports modexps/s
and the implied scan seconds per query.

Run on the TPU rig: `python benchmarks_paillier_tpu.py`
(first TPU dispatch compiles remotely: 1-10 min; timed separately).
Env: PAILLIER_H / PAILLIER_W / PAILLIER_BITS / SKIP_NATIVE=1.
"""

import os
import random
import sys
import time

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    bits = int(os.environ.get("PAILLIER_BITS", "1024"))
    H = int(os.environ.get("PAILLIER_H", "1024"))
    W = int(os.environ.get("PAILLIER_W", "32"))
    rng = random.Random(7)

    from pir_tpu import config as pir_config
    from pir_tpu import encrypted as enc
    from pir_tpu.crypto import mont_tpu
    from pir_tpu.crypto.paillier import keygen
    from pir_tpu.database import generate_random_db
    from pir_tpu.native import bigmod_available, paillier_scan

    pir_config.enable_compile_cache()  # reuse executables across runs

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"keygen({bits}) ...")
    t0 = time.perf_counter()
    sk, pk = keygen(bits)
    log(f"  {time.perf_counter() - t0:.1f}s")

    # ---- stage 1: reference bench shape, all engines, bit-identical ----
    db = generate_random_db(1 << 10, 3)
    q_row = 7
    q = enc.new_encrypted_query(db.metadata(), pk, 1, q_row)
    results = {}
    engines = ["tpu"] + ([] if os.environ.get("SKIP_NATIVE") else ["native"])
    for engine in engines:
        t0 = time.perf_counter()
        res = enc.private_encrypted_query(db, q, engine=engine)
        dt = time.perf_counter() - t0
        results[engine] = [[c.c for c in s.cts] for s in res.slots]
        log(f"stage1 {engine:7s}: {dt:.3f}s (2^10 x 3B, {bits}-bit key)"
            + (" [incl. compile]" if engine == "tpu" else ""))
        if engine == "tpu":
            t0 = time.perf_counter()
            enc.private_encrypted_query(db, q, engine="tpu")
            log(f"stage1 tpu warm: {time.perf_counter() - t0:.3f}s")
        rec = enc.recover_encrypted(res, sk)
        w = res.slots and len(res.slots)
        for j in range(len(res.slots)):
            idx = q_row * len(res.slots) + j
            if idx < db.db_size:
                assert db.slot(idx).equal(rec[j]), (engine, j)
    vals = list(results.values())
    assert all(v == vals[0] for v in vals), "engines disagree"
    log("stage1: ciphertexts identical across engines, recovery OK")

    # ---- stage 2: isolated multi-exponentiation throughput ----
    mod = pk.n2
    bases = [rng.randrange(1, mod) for _ in range(H)]
    exps = [rng.getrandbits(24) for _ in range(H * W)]
    e_max = 24

    t0 = time.perf_counter()
    out_tpu = mont_tpu.tpu_paillier_scan(bases, exps, W, mod, e_max=e_max)
    t_compile = time.perf_counter() - t0
    log(f"stage2 tpu first (compile+run): {t_compile:.2f}s")
    t0 = time.perf_counter()
    out_tpu = mont_tpu.tpu_paillier_scan(bases, exps, W, mod, e_max=e_max)
    t_tpu = time.perf_counter() - t0
    n_exp = H * W
    log(f"stage2 tpu  warm: {t_tpu:.3f}s = {n_exp / t_tpu:,.0f} "
        f"modexp(24b, {mod.bit_length()}b)/s")

    if not os.environ.get("SKIP_NATIVE") and bigmod_available():
        t0 = time.perf_counter()
        out_nat = paillier_scan(bases, exps, W, mod)
        t_nat = time.perf_counter() - t0
        log(f"stage2 native   : {t_nat:.3f}s = {n_exp / t_nat:,.0f}/s "
            f"-> TPU is {t_nat / t_tpu:.1f}x (1 CPU core)")
        assert out_nat == out_tpu, "stage2 engines disagree"
        log("stage2: products identical")

    # ---- stage 3: ASPIR DDLEQ prove/verify (64-rep, aspir.go:156-158) ----
    from pir_tpu.crypto import paillier

    ct1 = pk.encrypt_zero(2)
    ct2, a, b = sk.nested_randomize(ct1)
    times = {}
    for label, use_tpu in (("native", False), ("tpu", True)):
        if label == "native" and os.environ.get("SKIP_NATIVE"):
            continue
        paillier.enable_tpu_modexp(use_tpu)
        try:
            t0 = time.perf_counter()
            proof = sk.prove_ddleq(8, ct1, ct2, a, b)
            t_p = time.perf_counter() - t0
            t0 = time.perf_counter()
            ok = pk.verify_ddleq(ct1, ct2, proof)
            t_v = time.perf_counter() - t0
        finally:
            paillier.enable_tpu_modexp(False)
        assert ok
        times[label] = (t_p, t_v)
        log(f"stage3 {label:7s}: DDLEQ prove {t_p:.2f}s verify {t_v:.2f}s"
            + (" [first run incl. compile]" if use_tpu else ""))
    if "tpu" in times:
        paillier.enable_tpu_modexp(True)
        try:
            t0 = time.perf_counter()
            proof = sk.prove_ddleq(8, ct1, ct2, a, b)
            t_p = time.perf_counter() - t0
            t0 = time.perf_counter()
            assert pk.verify_ddleq(ct1, ct2, proof)
            t_v = time.perf_counter() - t0
        finally:
            paillier.enable_tpu_modexp(False)
        log(f"stage3 tpu warm: DDLEQ prove {t_p:.2f}s verify {t_v:.2f}s")

    # ---- stage 4: cPIR query generation (query.go:118-221) ----
    big_db = generate_random_db(1 << 14, 3)  # 128 x 128 grid
    for label, use_tpu in (("native", False), ("tpu", True)):
        if label == "native" and os.environ.get("SKIP_NATIVE"):
            continue
        paillier.enable_tpu_modexp(use_tpu)
        try:
            t0 = time.perf_counter()
            q1 = enc.new_encrypted_query(big_db.metadata(), pk, 1, 5)
            t_q = time.perf_counter() - t0
            t0 = time.perf_counter()
            q2 = enc.new_doubly_encrypted_query(big_db.metadata(), pk, 1, 77)
            t_d = time.perf_counter() - t0
        finally:
            paillier.enable_tpu_modexp(False)
        log(f"stage4 {label:7s}: query gen {t_q:.2f}s "
            f"({len(q1.ebits)} cts), recursive {t_d:.2f}s "
            f"({len(q2.row.ebits)}+{len(q2.col.ebits)} cts)"
            + (" [first run may compile]" if use_tpu else ""))
        if use_tpu:
            paillier.enable_tpu_modexp(True)
            try:
                t0 = time.perf_counter()
                enc.new_encrypted_query(big_db.metadata(), pk, 1, 5)
                t_q = time.perf_counter() - t0
                t0 = time.perf_counter()
                enc.new_doubly_encrypted_query(big_db.metadata(), pk, 1, 77)
                t_d = time.perf_counter() - t0
            finally:
                paillier.enable_tpu_modexp(False)
            log(f"stage4 tpu warm: query gen {t_q:.2f}s recursive {t_d:.2f}s")

    print(
        '{"metric": "paillier_scan_modexp_per_s", "value": %.0f, '
        '"unit": "modexp/s", "h": %d, "w": %d, "bits": %d}'
        % (n_exp / t_tpu, H, W, bits)
    )


if __name__ == "__main__":
    main()
