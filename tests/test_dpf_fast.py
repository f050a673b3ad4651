"""Early-termination (fast-mode) DPF: host + device, end-to-end."""

import random

import numpy as np

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import device as dev
from pir_tpu.dpf import host as dpf
from pir_tpu.server import TpuPirServer


def test_fast_bits_one_hot():
    rng = random.Random(0)
    for height in (50, 128, 1000, 4096, 5000):
        target = rng.randrange(height)
        client = dpf.client_initialize(dpf.fast_depth_for_height(height))
        keys = dpf.generate_two_server_fast(client, target, height)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)
        b0 = dpf.eval_full_domain_fast_bits(server, keys[0])
        b1 = dpf.eval_full_domain_fast_bits(server, keys[1])
        sel = b0 ^ b1
        assert sel[target] and sel.sum() == 1, height


def test_fast_device_matches_host():
    rng = random.Random(1)
    for height in (512, 1000, 16384):
        target = rng.randrange(height)
        client = dpf.client_initialize(dpf.fast_depth_for_height(height))
        keys = dpf.generate_two_server_fast(client, target, height)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)
        for snum in (0, 1):
            want = dpf.eval_full_domain_fast_bits(server, keys[snum])
            dkey = dev.make_device_fast_key(server, keys[snum])
            if dkey.host_bits is not None:
                got = dkey.host_bits.astype(bool)
            else:
                from pir_tpu.models.pipeline import fused_fast_bits_fn

                payload, layout = dev.pack_fast_payload(dkey)
                got = np.asarray(
                    fused_fast_bits_fn(layout)(payload, dkey.perm)
                ).astype(bool)
            assert (got == want).all(), (height, snum)


def test_fast_query_roundtrip_all_engines():
    rng = random.Random(2)
    db = generate_random_db(1 << 12, 16)
    tpu = TpuPirServer(db)
    for group_size in (1, 3):
        dim_height = db.db_size // group_size
        idx = rng.randrange(dim_height)
        shares = q.new_index_query_shares(db.metadata(), idx, group_size, 2,
                                          fast=True)
        # host engine
        res = q.recover([srv.private_secret_shared_query(db, s) for s in shares])
        for j in range(group_size):
            assert db.slot(idx * group_size + j).equal(res[j])
        # TPU engine (single-dispatch fused)
        res_t = q.recover([tpu.private_secret_shared_query(s) for s in shares])
        for j in range(group_size):
            assert db.slot(idx * group_size + j).equal(res_t[j])


def test_fast_batched_queries():
    rng = random.Random(3)
    db = generate_random_db(1 << 13, 8)
    tpu = TpuPirServer(db)
    idxs = [rng.randrange(db.db_size) for _ in range(4)]
    shares0, shares1 = [], []
    for i in idxs:
        ss = q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
        shares0.append(ss[0])
        shares1.append(ss[1])
    out0 = tpu.private_secret_shared_query_batch(shares0)
    out1 = tpu.private_secret_shared_query_batch(shares1)
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0])


def test_fast_batched_queries_mxu_path():
    """Batch >= threshold routes through the MXU bit-plane scan."""
    rng = random.Random(4)
    db = generate_random_db(1 << 13, 8)
    tpu = TpuPirServer(db, mxu_batch_threshold=8, mxu_block=512)
    idxs = [rng.randrange(db.db_size) for _ in range(8)]
    shares0, shares1 = [], []
    for i in idxs:
        ss = q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
        shares0.append(ss[0])
        shares1.append(ss[1])
    out0 = tpu.private_secret_shared_query_batch(shares0)
    out1 = tpu.private_secret_shared_query_batch(shares1)
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


def test_fast_batched_queries_streaming_path():
    """Zero plane budget forces the streaming MXU scan."""
    rng = random.Random(6)
    db = generate_random_db(1 << 13, 8)
    tpu = TpuPirServer(db, mxu_batch_threshold=8, mxu_block=512,
                       plane_table_budget=0)
    idxs = [rng.randrange(db.db_size) for _ in range(8)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True) for i in idxs]
    out0 = tpu.private_secret_shared_query_batch([x[0] for x in sh])
    out1 = tpu.private_secret_shared_query_batch([x[1] for x in sh])
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


def test_fast_batched_queries_async_pipelined():
    """Async batch API: dispatch two batches before finalizing either."""
    rng = random.Random(8)
    db = generate_random_db(1 << 13, 8)
    tpu = TpuPirServer(db, mxu_batch_threshold=4)
    idx_a = [rng.randrange(db.db_size) for _ in range(4)]
    idx_b = [rng.randrange(db.db_size) for _ in range(4)]
    sh_a = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
            for i in idx_a]
    sh_b = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
            for i in idx_b]
    fins = [
        tpu.private_secret_shared_query_batch_async([x[s] for x in sh])
        for sh in (sh_a, sh_b) for s in (0, 1)
    ]
    out = [f() for f in fins]
    for idxs, (o0, o1) in ((idx_a, out[0:2]), (idx_b, out[2:4])):
        for k, i in enumerate(idxs):
            res = q.recover([o0[k], o1[k]])
            assert db.slot(i).equal(res[0]), (k, i)


def test_fast_root_batched_path():
    """Root-start device expansion (v2 batched path) vs host golden."""
    rng = random.Random(7)
    db = generate_random_db(1 << 13, 8)
    tpu = TpuPirServer(db, mxu_batch_threshold=4)
    idxs = [rng.randrange(db.db_size) for _ in range(6)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True) for i in idxs]
    out0 = tpu.private_secret_shared_query_batch([x[0] for x in sh])
    out1 = tpu.private_secret_shared_query_batch([x[1] for x in sh])
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


def test_fast_batch_keygen_one_hot():
    """Vectorised batch keygen == per-query semantics: every pair's bit
    shares XOR to exactly the target row's one-hot."""
    rng = random.Random(11)
    for height in (50, 128, 1000, 4096, 5000):
        targets = [rng.randrange(height) for _ in range(9)]
        client = dpf.client_initialize(dpf.fast_depth_for_height(height))
        pairs = dpf.generate_two_server_fast_batch(client, targets, height)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)
        for target, pair in zip(targets, pairs):
            sel = (dpf.eval_full_domain_fast_bits(server, pair[0])
                   ^ dpf.eval_full_domain_fast_bits(server, pair[1]))
            assert sel[target] and sel.sum() == 1, (height, target)


def test_fast_batch_keygen_out_of_domain():
    client = dpf.client_initialize(dpf.fast_depth_for_height(64))
    try:
        dpf.generate_two_server_fast_batch(client, [3, 64], 64)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_fast_batch_shares_roundtrip():
    """query-layer batch API recovers true rows end-to-end (host golden)."""
    rng = random.Random(12)
    db = generate_random_db(1 << 12, 16)
    idxs = [rng.randrange(db.db_size) for _ in range(17)]
    batches = q.new_fast_index_query_shares_batch(db.metadata(), idxs, 1)
    for idx, shares in zip(idxs, batches):
        res = q.recover([srv.private_secret_shared_query(db, s)
                         for s in shares])
        assert db.slot(idx).equal(res[0])
