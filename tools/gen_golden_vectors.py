"""Derive the frozen golden-vector fixtures in tests/vectors/.

Run from the repo root:  python tools/gen_golden_vectors.py

Derivation is DETERMINISTIC: os.urandom is replaced by a SHA-256 counter
stream with a fixed seed, so re-running reproduces the committed files
byte-for-byte. Every two-party case is cross-checked during derivation
against tests/go_spec.py — an independent pure-Python transcription of
the reference Go evaluation (dpf/server.go:55-101, dpf/common.go:53-75,
encoding/binary.Varint) — before it is written, so the fixtures pin the
Go-exact semantics with two independently written implementations
agreeing on them, not host.py testing itself.

Quirk coverage asserted at the bottom of main():
  * height 1 (num_bits=1) and the power-of-two log2(h)+1 extra-bit
    domains (h=4 -> 3 bits, h=1024 -> 11 bits; query.go:54-61),
  * at least one leaf whose final seed is all-continuation bytes
    (binary.Varint returns 0 when no terminator byte exists in 8 bytes),
  * at least one leaf with a multi-byte (continuation) varint,
  * at least one key with negative FinalCW (dpf/client.go:141-148),
  * odd heights exercising the floor-division grid math.

Multi-party and fast-mode sections are regression anchors for THIS
framework's documented extensions (the reference's MP path is dead code:
keygen panics at dpf/client.go:152-156 and EvaluateMP's gamma arithmetic
degenerates under Go operator precedence; fast mode is our own
early-termination design) — they freeze our semantics, not Go's.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

SEED = b"pir_tpu golden vectors r3 v1"


class DetRandom:
    """SHA-256 counter stream standing in for os.urandom."""

    def __init__(self, seed: bytes):
        self.seed = seed
        self.ctr = 0
        self.buf = b""

    def __call__(self, n: int) -> bytes:
        while len(self.buf) < n:
            self.buf += hashlib.sha256(
                self.seed + self.ctr.to_bytes(8, "little")
            ).digest()
            self.ctr += 1
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


def hexs(b: bytes) -> str:
    return bytes(b).hex()


def main() -> None:
    det = DetRandom(SEED)
    os.urandom = det  # host keygen draws all randomness through os.urandom

    import go_spec
    from pir_tpu import wire
    from pir_tpu.dpf import host as dpf
    from pir_tpu.utils.bits import num_bits_for_height

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "vectors")
    os.makedirs(out_dir, exist_ok=True)

    saw_allcont = saw_multibyte = saw_negative_fcw = False

    # ---- two-party index-domain cases --------------------------------
    cases = []
    heights = [1, 2, 3, 4, 5, 8, 31, 32, 33, 100, 1000, 1024]
    for h in heights:
        nb = num_bits_for_height(h)
        assert nb == go_spec.num_bits_for_height(h)
        targets = sorted({0, h - 1, h // 2})
        for a in targets:
            client = dpf.client_initialize(nb)
            keys = dpf.generate_two_server(client, a, 1)
            prf_keys = [k.bytes for k in client.prf_keys]
            spec = go_spec.SpecDpf(prf_keys, nb)

            values, bits = [], []
            for sn in (0, 1):
                v = dpf.eval_full_domain(client, sn, keys[sn])[:h]
                b = dpf.eval_full_domain_bits(client, sn, keys[sn], h)
                values.append(v)
                bits.append(b.astype(np.uint8))
            # recovery semantics: sum shares == 1 exactly at a; bits XOR
            # to the one-hot row (inverted-parity convention)
            s = values[0] + values[1]
            assert s[a] == 1 and (np.delete(s, a) == 0).all(), (h, a)
            x = bits[0] ^ bits[1]
            assert x[a] == 1 and x.sum() == 1, (h, a)

            # audit against the independent Go transcription
            check_pts = (list(range(h)) if h <= 128 else
                         sorted({0, a, h - 1, *np.random.RandomState(h).randint(
                             0, h, 16).tolist()}))
            for x_pt in check_pts:
                for sn in (0, 1):
                    sv = go_spec.evaluate_2p(
                        spec, sn, keys[sn].s_init, keys[sn].t_init,
                        keys[sn].cw, keys[sn].final_cw, x_pt)
                    assert sv == int(values[sn][x_pt]), (h, a, x_pt, sn)
                    assert go_spec.selection_bit(sv) == int(bits[sn][x_pt])

            # quirk bookkeeping: inspect final seeds over the domain
            for sn in (0, 1):
                seeds = np.frombuffer(keys[sn].s_init, np.uint8)[None].copy()
                tb = np.array([keys[sn].t_init], np.uint8)
                for i in range(nb):
                    seeds, tb = dpf.expand_seeds_one_level(
                        client, seeds, tb, keys[sn].cw[i])
                first8 = seeds[:, :8]
                if (first8 >= 0x80).all(axis=1).any():
                    saw_allcont = True
                if (first8[:, 0] >= 0x80).any():
                    saw_multibyte = True
            if keys[0].final_cw < 0:
                saw_negative_fcw = True

            cases.append({
                "height": h, "num_bits": nb, "a": a, "b": 1,
                "prf_keys": [hexs(k) for k in prf_keys],
                "key0": hexs(wire.serialize_key2p(keys[0])),
                "key1": hexs(wire.serialize_key2p(keys[1])),
                "values0": [int(v) for v in values[0]],
                "values1": [int(v) for v in values[1]],
                "bits0": [int(v) for v in bits[0]],
                "bits1": [int(v) for v in bits[1]],
            })

    # large-b sum-share case (dpf_test.go:11-50 uses random uint b)
    for nb, a, b in ((10, 700, 123456789123), (6, 13, (1 << 62) + 7)):
        client = dpf.client_initialize(nb)
        keys = dpf.generate_two_server(client, a, b)
        prf_keys = [k.bytes for k in client.prf_keys]
        spec = go_spec.SpecDpf(prf_keys, nb)
        h = 1 << nb
        v0 = dpf.eval_full_domain(client, 0, keys[0])
        v1 = dpf.eval_full_domain(client, 1, keys[1])
        s = v0 + v1
        assert s[a] == b and (np.delete(s, a) == 0).all()
        for x_pt in (0, a, h - 1, 77 % h):
            for sn, vv in ((0, v0), (1, v1)):
                sv = go_spec.evaluate_2p(
                    spec, sn, keys[sn].s_init, keys[sn].t_init,
                    keys[sn].cw, keys[sn].final_cw, x_pt)
                assert sv == int(vv[x_pt])
        if keys[0].final_cw < 0:
            saw_negative_fcw = True
        cases.append({
            "height": h, "num_bits": nb, "a": a, "b": b,
            "prf_keys": [hexs(k) for k in prf_keys],
            "key0": hexs(wire.serialize_key2p(keys[0])),
            "key1": hexs(wire.serialize_key2p(keys[1])),
            "values0": [int(v) for v in v0],
            "values1": [int(v) for v in v1],
            "bits0": [int(v) for v in dpf.eval_full_domain_bits(
                client, 0, keys[0], h).astype(np.uint8)],
            "bits1": [int(v) for v in dpf.eval_full_domain_bits(
                client, 1, keys[1], h).astype(np.uint8)],
        })

    assert saw_allcont, "no all-continuation varint leaf in the matrix"
    assert saw_multibyte, "no multi-byte varint leaf in the matrix"
    assert saw_negative_fcw, "no negative FinalCW key in the matrix"

    # ---- keyword-domain (num_bits=32) point evaluation ---------------
    kw_rng = np.random.RandomState(0xC0FFEE)
    keywords = np.unique(kw_rng.randint(0, 1 << 32, 64, dtype=np.uint64))
    target_kw = int(keywords[17])
    client = dpf.client_initialize(32)
    keys = dpf.generate_two_server(client, target_kw, 1)
    prf_keys = [k.bytes for k in client.prf_keys]
    spec = go_spec.SpecDpf(prf_keys, 32)
    v0 = dpf.eval_points(client, 0, keys[0], keywords)
    v1 = dpf.eval_points(client, 1, keys[1], keywords)
    s = v0 + v1
    ti = int(np.where(keywords == target_kw)[0][0])
    assert s[ti] == 1 and (np.delete(s, ti) == 0).all()
    for j in (0, ti, len(keywords) - 1, 5):
        for sn, vv in ((0, v0), (1, v1)):
            sv = go_spec.evaluate_2p(
                spec, sn, keys[sn].s_init, keys[sn].t_init,
                keys[sn].cw, keys[sn].final_cw, int(keywords[j]))
            assert sv == int(vv[j])
    kw_case = {
        "num_bits": 32, "target": target_kw,
        "keywords": [int(k) for k in keywords],
        "prf_keys": [hexs(k) for k in prf_keys],
        "key0": hexs(wire.serialize_key2p(keys[0])),
        "key1": hexs(wire.serialize_key2p(keys[1])),
        "values0": [int(v) for v in v0],
        "values1": [int(v) for v in v1],
    }

    # ---- fast-mode anchors (our early-termination design) ------------
    fast_cases = []
    for h, a in ((1024, 700), (100, 3), (4096, 4095)):
        client = dpf.client_initialize(num_bits_for_height(h))
        fkeys = dpf.generate_two_server_fast(client, a, h)
        prf_keys = [k.bytes for k in client.prf_keys]
        b0 = dpf.eval_full_domain_fast_bits(
            dpf.server_initialize(client.prf_keys, fkeys[0].depth), fkeys[0])
        b1 = dpf.eval_full_domain_fast_bits(
            dpf.server_initialize(client.prf_keys, fkeys[1].depth), fkeys[1])
        x = (b0.astype(np.uint8) ^ b1.astype(np.uint8))[:h]
        assert x[a] == 1 and x.sum() == 1, (h, a)
        fast_cases.append({
            "height": h, "a": a, "depth": fkeys[0].depth,
            "prf_keys": [hexs(k) for k in prf_keys],
            "key0": hexs(wire.serialize_fast_key(fkeys[0])),
            "key1": hexs(wire.serialize_fast_key(fkeys[1])),
            "bits0": [int(v) for v in b0.astype(np.uint8)[:h]],
            "bits1": [int(v) for v in b1.astype(np.uint8)[:h]],
        })

    # ---- multi-party anchors (our completion of the dead Go path) ----
    mp_cases = []
    for num_parties, nb, a in ((3, 8, 77), (4, 9, 300), (5, 7, 0)):
        client = dpf.client_initialize(nb)
        mkeys = dpf.generate_multi_server(client, a, 1, num_parties)
        prf_keys = [k.bytes for k in client.prf_keys]
        h = 1 << nb
        pts = np.arange(h, dtype=np.int64)
        vals = [dpf.eval_points_mp(client, mk, pts) for mk in mkeys]
        acc = np.zeros(h, np.uint32)
        for v in vals:
            acc ^= v.astype(np.uint32)
        assert acc[a] == 1 and (np.delete(acc, a) == 0).all(), (num_parties, nb)
        # cross-check EVERY frozen value against go_spec.evaluate_mp — the
        # independent transcription of dpf/server.go:110-144 (own γ/δ
        # split, own µ, go_spec's pure-Python AES, the documented CTR
        # extension re-derived). MP parity is then pinned by two
        # implementations + frozen data, like 2P (VERDICT r3 item 5).
        mp_spec = go_spec.SpecDpf(prf_keys, nb)
        for p_i, mk in enumerate(mkeys):
            sig = [bytes(r) for r in mk.sigma]
            cwl = [[int(w) for w in row] for row in mk.cw]
            sv = np.array(
                [go_spec.evaluate_mp(mp_spec, num_parties, sig, cwl, int(x))
                 for x in pts], np.uint32)
            assert (sv == vals[p_i].astype(np.uint32)).all(), \
                (num_parties, nb, p_i)
        mp_cases.append({
            "num_parties": num_parties, "num_bits": nb, "a": a, "b": 1,
            "prf_keys": [hexs(k) for k in prf_keys],
            "keys": [hexs(wire.serialize_key_mp(mk)) for mk in mkeys],
            "values": [[int(x) for x in v.astype(np.uint32)] for v in vals],
        })

    # ---- PIR end-to-end: shares -> answer shares -> recovered row ----
    from pir_tpu import server as srv
    from pir_tpu.database import Database
    from pir_tpu.query import new_index_query_shares, recover

    db_rng = np.random.RandomState(0xDB)
    slot_bytes, height = 24, 64
    data = db_rng.randint(0, 256, (height, slot_bytes), dtype=np.uint8)
    db = Database(slot_bytes=slot_bytes, db_size=height, data=data.copy())
    pir_cases = []
    for group_size in (1, 4):
        for fast in (False, True):
            idx = 37 if group_size == 1 else 9
            shares = new_index_query_shares(
                db.metadata(), idx, group_size, 2, fast=fast)
            answers = [srv.private_secret_shared_query(db, s) for s in shares]
            rec = recover(answers)
            for j in range(group_size):
                assert bytes(rec[j].data) == data[idx * group_size + j].tobytes()
            pir_cases.append({
                "group_size": group_size, "fast": fast, "index": idx,
                "shares": [hexs(wire.serialize_query_share(s)) for s in shares],
                "answer0": [hexs(sl.data) for sl in answers[0].shares],
                "answer1": [hexs(sl.data) for sl in answers[1].shares],
                "recovered": [hexs(sl.data) for sl in rec],
            })

    doc = {
        "seed": SEED.decode(),
        "derivation": "tools/gen_golden_vectors.py (deterministic)",
        "two_party": cases,
        "keyword_2p": kw_case,
        "fast_mode": fast_cases,
        "multi_party": mp_cases,
        "pir_db_hex": hexs(data.tobytes()),
        "pir_slot_bytes": slot_bytes,
        "pir_height": height,
        "pir": pir_cases,
    }
    path = os.path.join(out_dir, "dpf_golden.json")
    with open(path, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
    print(f"wrote {path}: {os.path.getsize(path)} bytes, "
          f"{len(cases)} 2P cases, {len(fast_cases)} fast, {len(mp_cases)} MP, "
          f"{len(pir_cases)} PIR")


if __name__ == "__main__":
    main()
