"""Multi-party (>=3 servers) DPF — keygen completed beyond the reference
stub (dpf/client.go:152-156); eval semantics follow dpf/server.go:110-144."""

import random

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import host as dpf
from pir_tpu.utils.bits import num_bits_for_height


@pytest.mark.parametrize("num_parties", [3, 4, 5])
def test_mp_dpf_xor_shares_point_function(num_parties):
    rng = random.Random(num_parties)
    for _ in range(3):
        num = rng.randrange(1 << 8) + 50
        special = rng.randrange(num)
        value = rng.randrange(1, 1 << 32)

        client = dpf.client_initialize(num_bits_for_height(num))
        keys = dpf.generate_multi_server(client, special, value, num_parties)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)

        for x in rng.sample(range(num), 15) + [special]:
            acc = 0
            for j in range(num_parties):
                acc ^= dpf.evaluate_mp(server, keys[j], x)
            want = value if x == special else 0
            assert acc == want, (num_parties, x, special)


def test_mp_single_party_view_is_masked():
    """A single server's presence pattern has uniform marginals."""
    client = dpf.client_initialize(8)
    keys_a = dpf.generate_multi_server(client, 3, 1, 3)
    # sigma rows are byte strings; nonzero slots vary randomly per row
    nonzero_counts = []
    for g in range(len(keys_a[0].sigma)):
        row = np.frombuffer(keys_a[0].sigma[g], dtype=np.uint8).reshape(-1, 16)
        nonzero_counts.append(int(row.any(axis=1).sum()))
    # not all-zero and not all-full across rows (overwhelming probability)
    assert 0 < sum(nonzero_counts) < len(nonzero_counts) * 4


@pytest.mark.parametrize("num_shares", [3, 4])
def test_three_server_pir_end_to_end(num_shares):
    """>=3-server secret-shared PIR through the standard query API."""
    rng = random.Random(10 + num_shares)
    db = generate_random_db(1 << 9, 5)
    for _ in range(3):
        idx = rng.randrange(db.db_size)
        shares = q.new_index_query_shares(db.metadata(), idx, 1, num_shares)
        results = [srv.private_secret_shared_query(db, s) for s in shares]
        rec = q.recover(results)
        assert db.slot(idx).equal(rec[0]), idx


def test_three_server_pir_tpu_engine():
    """>=3-server queries through the TPU engine (host expand + device scan)."""
    from pir_tpu.server import TpuPirServer

    rng = random.Random(77)
    db = generate_random_db(1 << 8, 6)
    server = TpuPirServer(db)
    idx = rng.randrange(db.db_size)
    shares = q.new_index_query_shares(db.metadata(), idx, 1, 3)
    results = [server.private_secret_shared_query(s) for s in shares]
    rec = q.recover(results)
    assert db.slot(idx).equal(rec[0])


def test_eval_points_mp_matches_single_point_eval():
    """The vectorized full-domain MP eval (one AES dispatch over all
    unique rows) must agree with the per-point golden evaluate_mp."""
    import numpy as np

    from pir_tpu import query as q
    from pir_tpu.database import generate_random_db
    from pir_tpu.dpf import host as dpf_host
    from pir_tpu.utils.bits import num_bits_for_height

    db = generate_random_db(512, 4)
    for parties in (3, 4):
        shares = q.new_index_query_shares(db.metadata(), 77, 1, parties)
        for s in shares:
            pf = dpf_host.server_initialize(
                s.prf_keys, num_bits_for_height(512)
            )
            vec = dpf_host.eval_points_mp(pf, s.key_multi_party, np.arange(512))
            loop = np.array([
                dpf_host.evaluate_mp(pf, s.key_multi_party, x)
                for x in range(512)
            ])
            assert (vec == loop).all(), parties


def test_multiparty_native_engine_fallback():
    """NativePirServer answers >=3-party queries via the host expansion."""
    import random

    from pir_tpu import query as q
    from pir_tpu.database import generate_random_db
    from pir_tpu.server import NativePirServer

    rng = random.Random(51)
    db = generate_random_db(1 << 8, 8)
    servers = [NativePirServer(db) for _ in range(3)]
    idx = rng.randrange(db.db_size)
    shares = q.new_index_query_shares(db.metadata(), idx, 1, 3)
    res = q.recover([s.private_secret_shared_query(sh)
                     for s, sh in zip(servers, shares)])
    assert bytes(res[0].data) == db.data[idx].tobytes()


def test_device_mp_expansion_matches_host():
    """Device sigma-slot PRG walk == host eval (bit shares), all parties."""
    import numpy as np

    from pir_tpu.dpf import device as dev
    from pir_tpu.dpf import host as dpf

    for num_parties, nb, a, height in ((3, 8, 77, 256), (4, 9, 300, 500),
                                       (5, 7, 0, 128)):
        client = dpf.client_initialize(nb)
        keys = dpf.generate_multi_server(client, a, 1, num_parties)
        pts = np.arange(height, dtype=np.int64)
        acc = np.zeros(height, np.uint8)
        for k in keys:
            host_bits = ((dpf.eval_points_mp(client, k, pts) & 1) == 1)
            dev_bits = np.asarray(dev.expand_mp_full_domain_bits(client, k, height))
            assert (host_bits.astype(np.uint8) == dev_bits).all()
            acc ^= dev_bits
        want = np.zeros(height, np.uint8)
        if a < height:
            want[a] = 1
        assert (acc == want).all()


def test_tpu_engine_answers_mp_queries_on_device():
    """TpuPirServer answers >=3-party index queries with the device
    expansion (no host fallback) and recovery is bit-exact."""
    import random

    import numpy as np

    from pir_tpu import query as q
    from pir_tpu import server as srv
    from pir_tpu.database import generate_random_db

    rng = random.Random(13)
    db = generate_random_db(1 << 9, 16)
    engine = srv.TpuPirServer(db)
    for n_servers in (3, 4):
        idx = rng.randrange(db.db_size)
        shares = q.new_index_query_shares(db.metadata(), idx, 1, n_servers)
        # the engine expansion must equal the host engine's bits
        for s in shares:
            eng_bits = np.asarray(engine.expand_shared_query(s)).astype(bool)
            host_bits = srv.expand_shared_query(db, s)
            assert (eng_bits == host_bits).all()
        res = q.recover([engine.private_secret_shared_query(s) for s in shares])
        assert bytes(res[0].data) == db.data[idx].tobytes(), (n_servers, idx)
