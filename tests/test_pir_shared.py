"""End-to-end 2-server secret-shared PIR, mirroring db_test.go:18-64.

Both server roles run in one process (the reference's test strategy);
host and TPU/device backends are checked for bit-for-bit agreement.
"""

import random

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db
from pir_tpu.server import TpuPirServer

TEST_DB_SIZE = 1 << 10
SLOT_BYTES = 3
MIN_GROUP_SIZE, MAX_GROUP_SIZE = 1, 5
NUM_QUERIES = 6


@pytest.fixture(scope="module")
def db():
    return generate_random_db(TEST_DB_SIZE, SLOT_BYTES)


def _roundtrip(db, backend_answer, rng, group_size):
    dim_width = group_size
    dim_height = db.db_size // group_size
    for _ in range(NUM_QUERIES):
        q_index = rng.randrange(dim_height)
        shares = q.new_index_query_shares(db.metadata(), q_index, group_size, 2)

        res_a = backend_answer(shares[0])
        res_b = backend_answer(shares[1])
        res = q.recover([res_a, res_b])

        for j in range(dim_width):
            index = q_index * dim_width + j
            if index >= db.db_size:
                break
            assert db.slot(index).equal(res[j]), (q_index, j)


def test_shared_query_host_backend(db):
    rng = random.Random(0)
    for group_size in range(MIN_GROUP_SIZE, MAX_GROUP_SIZE):
        _roundtrip(db, lambda s: srv.private_secret_shared_query(db, s), rng, group_size)


def test_shared_query_device_backend(db):
    rng = random.Random(1)
    server = TpuPirServer(db)
    for group_size in range(MIN_GROUP_SIZE, MAX_GROUP_SIZE):
        _roundtrip(db, server.private_secret_shared_query, rng, group_size)


def test_host_device_bits_agree(db):
    rng = random.Random(2)
    server = TpuPirServer(db)
    for group_size in (1, 3):
        shares = q.new_index_query_shares(
            db.metadata(), rng.randrange(db.db_size // group_size), group_size, 2
        )
        for s in shares:
            host_bits = srv.expand_shared_query(db, s)
            dev_bits = np.asarray(server.expand_shared_query(s)).astype(bool)
            assert (host_bits == dev_bits).all()


def test_keyword_query_shares(db):
    """Keyword-based DPF mode (db.go:119-135, query.go:47-49)."""
    rng = random.Random(3)
    keywords = np.array(
        rng.sample(range(1 << 32), db.db_size), dtype=np.uint64
    )
    db.set_keywords(keywords)
    server = TpuPirServer(db)
    for _ in range(3):
        row = rng.randrange(db.db_size)
        shares = q.new_keyword_query_shares(db.metadata(), int(keywords[row]), 1, 2)

        res_host = [srv.private_secret_shared_query(db, s) for s in shares]
        got = q.recover(res_host)
        assert db.slot(row).equal(got[0])

        res_dev = [server.private_secret_shared_query(s) for s in shares]
        got_dev = q.recover(res_dev)
        assert db.slot(row).equal(got_dev[0])


def test_query_outside_domain_raises(db):
    with pytest.raises(ValueError):
        q.new_index_query_shares(db.metadata(), db.db_size + 5, 1, 2)


def test_compat_root_batched_path(db):
    """Batched compat (reference-exact) queries via the root-start MXU path."""
    rng = random.Random(9)
    server = TpuPirServer(db, mxu_batch_threshold=4)
    idxs = [rng.randrange(db.db_size) for _ in range(4)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2) for i in idxs]
    out0 = server.private_secret_shared_query_batch([x[0] for x in sh])
    out1 = server.private_secret_shared_query_batch([x[1] for x in sh])
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


def test_compat_fallback_chunked_batch(db):
    """Compat batch larger than the chunk size, with the root plane
    table forced over budget: must chunk the vmapped fallback."""
    import random

    rng = random.Random(11)
    server = TpuPirServer(db, mxu_batch_threshold=4, plane_table_budget=0,
                          compat_batch_chunk=4)
    idxs = [rng.randrange(db.db_size) for _ in range(10)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2) for i in idxs]
    out0 = server.private_secret_shared_query_batch([x[0] for x in sh])
    out1 = server.private_secret_shared_query_batch([x[1] for x in sh])
    for k, i in enumerate(idxs):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(i).equal(res[0]), (k, i)


def test_keyword_batched_queries(db):
    """Batched keyword-mode answering on the device engine."""
    import numpy as np

    rng = random.Random(11)
    if db.keywords is None:
        db.set_keywords(np.array(rng.sample(range(1 << 32), db.db_size),
                                 dtype=np.uint64))
    server = TpuPirServer(db, mxu_batch_threshold=2)
    rows = [rng.randrange(db.db_size) for _ in range(3)]
    sh = [q.new_keyword_query_shares(db.metadata(), int(db.keywords[r]), 1, 2)
          for r in rows]
    out0 = server.private_secret_shared_query_batch([x[0] for x in sh])
    out1 = server.private_secret_shared_query_batch([x[1] for x in sh])
    for k, r in enumerate(rows):
        res = q.recover([out0[k], out1[k]])
        assert db.slot(r).equal(res[0]), (k, r)
