"""TCP service: cPIR, keyword flows, metrics, config, and concurrency.

Covers the full protocol-family surface of service.py (the reference is
a library; SURVEY.md §7 step 8 plans this shell): secret-shared index
PIR (test_wire_service.py), keyword DPF (db.go:119-135), keyword sqrt
search tree (keyword.go:76-90), and single-server cPIR incl. recursive
(db.go:176-358), all over real sockets.
"""

import random
import threading

import numpy as np
import pytest

from pir_tpu.config import PirConfig, pick_engine
from pir_tpu.crypto.paillier import keygen
from pir_tpu.database import generate_random_db
from pir_tpu.keyword import new_private_sqrt_st, pad_to_sqrt
from pir_tpu.service import PirClient, PirService
from pir_tpu.slot import Slot


@pytest.fixture(scope="module")
def paillier_keys():
    return keygen(128)  # test-only key size, as in db_test.go:70


def test_encrypted_query_over_tcp(paillier_keys):
    sk, pk = paillier_keys
    db = generate_random_db(1 << 6, 3)
    svc = PirService(db).start()
    try:
        client = PirClient([svc.address])
        width, height = db.get_dimensions_for_database(8, 1)
        row = 5
        slots = client.query_encrypted(row, sk, pk)
        for j in range(width):
            idx = row * width + j
            if idx < db.db_size:
                assert db.slot(idx).equal(slots[j]), j
        client.close()
    finally:
        svc.close()


def test_recursive_encrypted_query_over_tcp(paillier_keys):
    sk, pk = paillier_keys
    db = generate_random_db(1 << 6, 3)
    svc = PirService(db).start()
    try:
        client = PirClient([svc.address])
        group_size = 2
        width, height = db.get_dimensions_for_database(8, group_size)
        q_index = 11
        slots = client.query_encrypted_recursive(q_index, sk, pk, group_size)
        row, col = db.index_to_coordinates(q_index, width, height)
        col //= group_size
        for j in range(group_size):
            idx = row * width + col * group_size + j
            if idx < db.db_size:
                assert db.slot(idx).equal(slots[j]), j
        client.close()
    finally:
        svc.close()


def test_keyword_dpf_over_tcp():
    rng = random.Random(3)
    db = generate_random_db(512, 6)
    kws = np.array(rng.sample(range(1 << 32), 512), dtype=np.uint64)
    db.set_keywords(kws)
    s0 = PirService(db).start()
    s1 = PirService(db).start()
    try:
        client = PirClient([s0.address, s1.address])
        row = rng.randrange(512)
        res = client.query_keyword_dpf(int(kws[row]))
        assert Slot(db.data[row].tobytes()).equal(res[0])
        client.close()
    finally:
        s0.close()
        s1.close()


def test_keyword_sqrt_st_over_tcp():
    data = sorted(pad_to_sqrt([f"user-{i:05d}" for i in range(150)]),
                  reverse=True)
    st = new_private_sqrt_st()
    st.build_for_data(data)
    s0 = PirService(sqrt_st=st).start()
    s1 = PirService(sqrt_st=st).start()
    try:
        client = PirClient([s0.address, s1.address])
        assert client.db_flags & 2  # META_HAS_SQRT_ST
        present, idx, _ = client.query_keyword("user-00042")
        assert present and data[idx] == "user-00042"
        present, _, _ = client.query_keyword("user-99999")
        assert not present
        client.close()
    finally:
        s0.close()
        s1.close()


def test_keyword_flows_require_capability():
    db = generate_random_db(64, 4)
    svc = PirService(db).start()
    try:
        client = PirClient([svc.address])
        with pytest.raises(RuntimeError):
            client.query_keyword_dpf(7)
        with pytest.raises(RuntimeError):
            client.query_keyword("nope")
        client.close()
    finally:
        svc.close()


def test_metrics_and_engine_config():
    db = generate_random_db(256, 4)
    cfg = PirConfig(engine="host")
    s0 = PirService(db, config=cfg).start()
    s1 = PirService(db, config=cfg).start()
    try:
        client = PirClient([s0.address, s1.address])
        m0 = client.get_metrics()
        assert m0["queries"] == 0 and m0["engine"] == "host"
        res = client.query_index(3)
        assert Slot(db.data[3].tobytes()).equal(res[0])
        client.query_index_batch([1, 2, 4], fast=False)
        m = client.get_metrics()
        assert m["queries"] == 4
        assert m["p50_ms"] > 0 and m["effective_GBps"] > 0
        client.close()
    finally:
        s0.close()
        s1.close()


def test_pick_engine_resolution():
    assert pick_engine(PirConfig(engine="host")) == "host"
    # on the CPU test mesh, auto resolves to native (if built) or host
    assert pick_engine(PirConfig(engine="auto")) in ("native", "host")
    with pytest.raises(ValueError):
        PirConfig(engine="bogus").validate()
    with pytest.raises(ValueError):
        PirConfig(num_shares=1).validate()


def test_concurrent_first_queries_tpu_server():
    """Two threads hammer a cold TpuPirServer: cache population must be
    race-free (the TCP shell serves it from a ThreadingTCPServer)."""
    from pir_tpu import query as q
    from pir_tpu.server import TpuPirServer, private_secret_shared_query

    rng = random.Random(9)
    db = generate_random_db(1 << 11, 8)
    server = TpuPirServer(db)
    md = db.metadata()
    errors = []

    def hammer(seed):
        try:
            r = random.Random(seed)
            for _ in range(3):
                idxs = [r.randrange(db.db_size) for _ in range(8)]
                shares = [q.new_index_query_shares(md, i, 1, 2, fast=True)[0]
                          for i in idxs]
                want = [private_secret_shared_query(db, s) for s in shares]
                got = server.private_secret_shared_query_batch(shares)
                for w, g in zip(want, got):
                    assert w.shares[0].equal(g.shares[0])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=hammer, args=(s,)) for s in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    # some device cache was populated (exactly once per key, under the lock)
    assert (len(server._storage_cache) + len(server._tables)
            + len(server._perms)) >= 1


def test_concurrent_clients_over_tcp():
    """Two client threads against a cold use_tpu service (paired with a
    host-engine peer: also checks cross-engine share parity over TCP)."""
    db = generate_random_db(1 << 10, 6)
    s0 = PirService(db, use_tpu=True).start()
    s1 = PirService(db).start()
    errors = []

    def run(seed):
        try:
            r = random.Random(seed)
            client = PirClient([s0.address, s1.address])
            idxs = [r.randrange(db.db_size) for _ in range(8)]
            res = client.query_index_batch(idxs)
            for i, out in zip(idxs, res):
                assert Slot(db.data[i].tobytes()).equal(out[0]), i
            client.close()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    try:
        threads = [threading.Thread(target=run, args=(s,)) for s in (4, 5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert s0.metrics.summary()["queries"] == 16
    finally:
        s0.close()
        s1.close()


def test_stabilize_pallas_cache_keys_idempotent():
    """The Mosaic debug-strip patch installs once and keeps the original
    serializer reachable (a second call must not re-wrap)."""
    from pir_tpu import config as cfg

    cfg.stabilize_pallas_cache_keys()
    import jax._src.tpu_custom_call as tcc

    first = tcc._lower_mosaic_module_to_asm
    cfg.stabilize_pallas_cache_keys()
    assert tcc._lower_mosaic_module_to_asm is first


def test_keyword_dpf_batch_over_tcp():
    rng = random.Random(31)
    db = generate_random_db(512, 6)
    kws = np.array(rng.sample(range(1 << 32), 512), dtype=np.uint64)
    db.set_keywords(kws)
    s0 = PirService(db).start()
    s1 = PirService(db).start()
    try:
        client = PirClient([s0.address, s1.address])
        rows = [rng.randrange(512) for _ in range(5)]
        res = client.query_keyword_dpf_batch([int(kws[r]) for r in rows])
        for r, slots in zip(rows, res):
            assert Slot(db.data[r].tobytes()).equal(slots[0]), r
        client.close()
    finally:
        s0.close()
        s1.close()
