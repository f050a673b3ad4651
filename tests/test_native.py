"""Native C++/AES-NI engine vs the host golden model (bit-for-bit)."""

import random

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db

native = pytest.importorskip("pir_tpu.native")
if not native.available():
    pytest.skip("native engine unavailable (no g++/AES-NI)", allow_module_level=True)

from pir_tpu.server import NativePirServer  # noqa: E402


def test_native_expand_matches_host():
    rng = random.Random(0)
    for height in (64, 1000, 1 << 12):
        db = generate_random_db(height, 5)
        shares = q.new_index_query_shares(db.metadata(), rng.randrange(height), 1, 2)
        for s in shares:
            host_bits = srv.expand_shared_query(db, s)
            nat_bits = NativePirServer(db).expand_shared_query(s)
            assert (host_bits == nat_bits.astype(bool)).all(), height


def test_native_full_query_roundtrip():
    rng = random.Random(1)
    db = generate_random_db(1 << 10, 24)
    server = NativePirServer(db)
    for group_size in (1, 4):
        dim_height = db.db_size // group_size
        idx = rng.randrange(dim_height)
        shares = q.new_index_query_shares(db.metadata(), idx, group_size, 2)
        res = q.recover([server.private_secret_shared_query(s) for s in shares])
        for j in range(group_size):
            assert db.slot(idx * group_size + j).equal(res[j])


def test_native_keyword_mode():
    rng = random.Random(2)
    db = generate_random_db(512, 6)
    db.set_keywords(np.array(rng.sample(range(1 << 32), 512), dtype=np.uint64))
    server = NativePirServer(db)
    row = rng.randrange(512)
    shares = q.new_keyword_query_shares(db.metadata(), int(db.keywords[row]), 1, 2)
    res = q.recover([server.private_secret_shared_query(s) for s in shares])
    assert db.slot(row).equal(res[0])


def test_native_fast_expand_matches_host():
    rng = random.Random(3)
    from pir_tpu.dpf import host as dpf

    for height in (200, 1 << 12, 5000):
        target = rng.randrange(height)
        client = dpf.client_initialize(dpf.fast_depth_for_height(height))
        keys = dpf.generate_two_server_fast(client, target, height)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)
        db = generate_random_db(height, 4)
        nat = NativePirServer(db)
        for snum in (0, 1):
            want = dpf.eval_full_domain_fast_bits(server, keys[snum])
            share = q.new_index_query_shares(db.metadata(), 0, 1, 2, fast=True)[0]
            share.key_fast = keys[snum]
            share.prf_keys = client.prf_keys
            got = nat.expand_shared_query(share)
            assert (got.astype(bool) == want).all(), (height, snum)


def test_native_scan_xor_batch_matches_single():
    rng = np.random.default_rng(3)
    for h, row_bytes, nq in ((257, 24, 5), (1 << 12, 96, 17), (500, 7, 3)):
        rows = rng.integers(0, 256, size=(h, row_bytes), dtype=np.uint8)
        bits = rng.integers(0, 2, size=(nq, h), dtype=np.uint8)
        batch = native.scan_xor_batch(rows, bits)
        for i in range(nq):
            single = native.scan_xor(rows, bits[i])
            assert (batch[i] == single).all(), (h, row_bytes, i)


def test_native_batch_query_roundtrip():
    rng = random.Random(5)
    db = generate_random_db(1 << 10, 16)
    server = NativePirServer(db)
    idxs = [rng.randrange(db.db_size) for _ in range(9)]
    share_lists = [
        q.new_index_query_shares(db.metadata(), i, 1, 2, fast=(i % 2 == 0))
        for i in idxs
    ]
    per_server = [[sl[k] for sl in share_lists] for k in range(2)]
    answers = [server.private_secret_shared_query_batch(p) for p in per_server]
    for i, idx in enumerate(idxs):
        res = q.recover([answers[0][i], answers[1][i]])
        assert db.slot(idx).equal(res[0]), idx
