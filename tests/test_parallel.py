"""Multi-chip sharded answer step on a virtual 8-device CPU mesh."""

import random

import jax
import numpy as np

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import host as dpf_host
from pir_tpu.ops.scan import pack_table_u32, unpack_result_u32
from pir_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_answer_step,
    make_sharded_key,
    pad_table_rows,
    shard_local_perm,
)
from pir_tpu.slot import Slot
from pir_tpu.utils.bits import num_bits_for_height


def test_sharded_batched_answer_matches_host():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8, dp=2)
    n_shards = mesh.shape["tp"]

    height = 1024
    slot_bytes = 12
    db = generate_random_db(height, slot_bytes)
    num_bits = num_bits_for_height(height)

    rng = random.Random(0)
    Q = 4
    shares, hosts = [], []
    for _ in range(Q):
        idx = rng.randrange(height)
        ss = q.new_index_query_shares(db.metadata(), idx, 1, 2)
        shares.append(ss[0])  # exercise server 0's share
        hosts.append(srv.private_secret_shared_query(db, ss[0]))

    keys = []
    for s in shares:
        pf = dpf_host.server_initialize(s.prf_keys, num_bits)
        keys.append(make_sharded_key(pf, s.key_two_party, height, n_shards))

    k0 = keys[0]
    seeds = np.stack([k.seeds for k in keys], axis=1)  # (D, Q, 8, 16, NWs)
    t = np.stack([k.t for k in keys], axis=1)  # (D, Q, NWs)
    cw_s = np.stack([k.cw_seed_masks for k in keys])
    cw_tl = np.stack([k.cw_tl for k in keys])
    cw_tr = np.stack([k.cw_tr for k in keys])
    rk = np.stack([k.rk_masks for k in keys])
    fcw = np.array([k.fcw_mask for k in keys], dtype=np.uint32)
    per_shard_nodes = k0.seeds.shape[-1] * 32
    perm = shard_local_perm(k0.d_levels, per_shard_nodes)

    table = pack_table_u32(db.data, height, 1)
    table = pad_table_rows(table, n_shards * k0.rows_per_shard)

    step = make_sharded_answer_step(mesh, k0.d_levels)
    out = np.asarray(step(table, seeds, t, cw_s, cw_tl, cw_tr, rk, fcw, perm))
    assert out.shape == (Q, table.shape[1])

    for i in range(Q):
        got = unpack_result_u32(out[i], 1, slot_bytes)
        assert Slot(got[0].tobytes()).equal(hosts[i].shares[0]), i


def test_sharded_fast_batched_answer_matches_host():
    """Fast-mode (early-termination) sharded step on the virtual mesh."""
    from pir_tpu.parallel.mesh import (
        make_sharded_fast_answer_step,
        make_sharded_fast_key,
    )
    from pir_tpu.dpf.device import _fast_leaf_perm

    mesh = make_mesh(8, dp=2)
    n_shards = mesh.shape["tp"]
    height = 128 * 32 * n_shards  # >= 32 leaves per shard
    slot_bytes = 8
    db = generate_random_db(height, slot_bytes)

    rng = random.Random(5)
    Q = 4
    shares, hosts = [], []
    for _ in range(Q):
        idx = rng.randrange(height)
        ss = q.new_index_query_shares(db.metadata(), idx, 1, 2, fast=True)
        shares.append(ss[1])
        hosts.append(srv.private_secret_shared_query(db, ss[1]))

    keys = []
    for s in shares:
        pf = dpf_host.server_initialize(s.prf_keys, s.key_fast.depth)
        keys.append(make_sharded_fast_key(pf, s.key_fast, n_shards))
    k0 = keys[0]

    seeds = np.stack([k.seeds for k in keys], axis=1)
    t = np.stack([k.t for k in keys], axis=1)
    cw_s = np.stack([k.cw_seed_masks for k in keys])
    cw_tl = np.stack([k.cw_tl for k in keys])
    cw_tr = np.stack([k.cw_tr for k in keys])
    fcw = np.stack([k.fcw_masks for k in keys])
    rk = np.stack([k.rk_masks for k in keys])
    rk_leaf = np.stack([k.rk_leaf for k in keys])
    n_blk = k0.fcw_masks.shape[1] if k0.fcw_masks.ndim == 4 else 1
    perm = _fast_leaf_perm(k0.d_levels, k0.rows_per_shard,
                           k0.per_shard_nodes, n_blk)

    table = pack_table_u32(db.data, height, 1)
    table = pad_table_rows(table, n_shards * k0.rows_per_shard)

    step = make_sharded_fast_answer_step(mesh, k0.d_levels)
    out = np.asarray(
        step(table, seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf, perm)
    )
    for i in range(Q):
        got = unpack_result_u32(out[i], 1, slot_bytes)
        assert Slot(got[0].tobytes()).equal(hosts[i].shares[0]), i


def test_mesh_pir_server_engine_matches_host():
    """MeshPirServer answers batches through the sharded steps with
    bit-exact recovery (compat + fast, incl. non-divisible batch)."""
    from pir_tpu.parallel.mesh import MeshPirServer

    height = 1024
    db = generate_random_db(height, 12)
    eng = MeshPirServer(db, tp=4, dp=2)
    rng = random.Random(7)
    for fast in (False, True):
        h = height if not fast else height  # fast needs >= 128*32*tp rows?
        if fast and height < 128 * 32 * eng.n_shards:
            continue  # covered by the TCP test with a bigger table
        idxs = [rng.randrange(height) for _ in range(5)]  # 5 % dp != 0
        share_lists = [
            q.new_index_query_shares(db.metadata(), i, 1, 2, fast=fast)
            for i in idxs
        ]
        for server_num in (0, 1):
            batch = [sl[server_num] for sl in share_lists]
            got = eng.private_secret_shared_query_batch(batch)
            for sl, res in zip(share_lists, got):
                want = srv.private_secret_shared_query(db, sl[server_num])
                assert res.shares[0].equal(want.shares[0])


def test_mesh_root_start_fast_path():
    """Shared-key fast batches ride the root-start sharded step (the
    single-chip serving kernels per shard: static subtree-prefix walk,
    lanes head, Pallas tail, packed MXU scan, ICI XOR-combine) with
    bit-exact recovery on a non-power-of-two height (partial last
    shard), group_size > 1, live updates, and per-query-keygen fallback."""
    from pir_tpu.parallel.mesh import MeshPirServer, make_mesh

    rng = random.Random(3)
    # sized from the EFFECTIVE leaf width so the root path engages at the
    # serving default (depth >= shard_levels + 5, full-word leaf
    # occupancy — _root_applicable); the +700 makes the last shard
    # partial. r4 regression: the geometry was hard-coded for 128-bit
    # leaves, so the 1024-bit default silently fell back to the host path.
    shard_levels = 2  # tp=4 below
    height = (dpf_host.DEFAULT_FAST_LEAF_BITS << (shard_levels + 5)) + 700
    db = generate_random_db(height, 24)
    md = db.metadata()
    eng = MeshPirServer(db, mesh=make_mesh(8, dp=2))
    idxs = [rng.randrange(height) for _ in range(6)]
    sh = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)
    outs = [eng.private_secret_shared_query_batch([s[k] for s in sh])
            for k in range(2)]
    assert eng._root_tables  # the root-start path actually engaged
    for i, idx in enumerate(idxs):
        rec = q.recover([outs[0][i], outs[1][i]])
        assert bytes(rec[0].data) == db.data[idx].tobytes(), (i, idx)

    # group_size > 1 reshapes rows; recover every slot of the group
    gi = [rng.randrange(height // 4) for _ in range(3)]
    sh_g = q.new_index_query_shares_batch(md, gi, 4, 2, fast=True)
    outs_g = [eng.private_secret_shared_query_batch([s[k] for s in sh_g])
              for k in range(2)]
    for i, idx in enumerate(gi):
        rec = q.recover([outs_g[0][i], outs_g[1][i]])
        for c in range(4):
            assert bytes(rec[c].data) == db.data[idx * 4 + c].tobytes()

    # live updates must reach the root-start sharded u8 table in place
    eng.apply_updates({idxs[0]: bytes([7]) * 24})
    sh_u = q.new_index_query_shares_batch(md, [idxs[0]], 1, 2, fast=True)
    outs_u = [eng.private_secret_shared_query_batch([s[k] for s in sh_u])
              for k in range(2)]
    rec = q.recover([outs_u[0][0], outs_u[1][0]])
    assert bytes(rec[0].data) == bytes([7]) * 24

    # A/B: the r3 per-query-tail root step (fast_stacked=False) must
    # produce identical recoveries through its classic bit-reversed
    # storage table (the stacked chunk-major order is the default)
    eng_c = MeshPirServer(db, mesh=make_mesh(8, dp=2), fast_stacked=False)
    outs_c = [eng_c.private_secret_shared_query_batch([s[k] for s in sh_u])
              for k in range(2)]
    assert eng_c._root_tables
    rec_c = q.recover([outs_c[0][0], outs_c[1][0]])
    assert bytes(rec_c[0].data) == bytes([7]) * 24

    # distinct-keygen shares (no shared PRF keys) must NOT take the
    # root-start path and still answer correctly
    sh_d = [q.new_index_query_shares(md, idxs[1], 1, 2, fast=True),
            q.new_index_query_shares(md, idxs[2], 1, 2, fast=True)]
    for k in range(2):
        batch = [sl[k] for sl in sh_d]
        assert not eng._root_applicable(batch)
    outs_d = [eng.private_secret_shared_query_batch([sl[k] for sl in sh_d])
              for k in range(2)]
    for i, idx in enumerate((idxs[1], idxs[2])):
        rec = q.recover([outs_d[0][i], outs_d[1][i]])
        assert bytes(rec[0].data) == db.data[idx].tobytes()


def test_mesh_fast_64k_8way():
    """A 64K-row table serves fast-mode through an 8-way mesh: the r4
    default flip raised the engagement floor to leaf_bits*32*n_shards =
    262144 rows, silently routing mid-size tables (which the r3 mesh
    served fine) to the single-host fallback. Distinct per-query keys,
    so this rides the subtree-split step with zero-padded partial lane
    words (make_sharded_fast_key)."""
    from pir_tpu.parallel.mesh import MeshPirServer

    height = 1 << 16
    db = generate_random_db(height, 8)
    eng = MeshPirServer(db, mesh=make_mesh(8, dp=1))
    rng = random.Random(13)
    idxs = [rng.randrange(height) for _ in range(2)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
          for i in idxs]
    assert eng._mesh_applicable(sh[0][0])
    outs = [eng.private_secret_shared_query_batch([s[k] for s in sh])
            for k in range(2)]
    assert eng._tables  # the sharded (non-root) fast path engaged
    for i, idx in enumerate(idxs):
        rec = q.recover([outs[0][i], outs[1][i]])
        assert bytes(rec[0].data) == db.data[idx].tobytes(), (i, idx)


def test_mesh_engine_served_over_tcp():
    """A TCP query answered by the 8-device mesh engine, selected via
    PirConfig(mesh_tp/mesh_dp) — the deployment integration of the
    reference's partial merge (db.go:256-261) at mesh scale."""
    from pir_tpu.config import PirConfig
    from pir_tpu.service import PirClient, PirService

    height = 1 << 11
    db = generate_random_db(height, 16)
    cfg = PirConfig(engine="tpu", mesh_tp=4, mesh_dp=2)
    s0 = PirService(db, config=cfg).start()
    s1 = PirService(db, config=cfg).start()
    try:
        assert s0.engine_name == "mesh"
        from pir_tpu.parallel.mesh import MeshPirServer

        assert isinstance(s0._engine, MeshPirServer)
        client = PirClient([s0.address, s1.address])
        rng = random.Random(9)
        idxs = [rng.randrange(height) for _ in range(4)]
        res = client.query_index_batch(idxs, fast=False)
        for i, r in zip(idxs, res):
            assert bytes(r[0].data) == db.data[i].tobytes(), i
        # single-query path + group_size > 1 through the mesh engine
        res1 = client.query_index(idxs[0], fast=False)
        assert bytes(res1[0].data) == db.data[idxs[0]].tobytes()
        g_res = client.query_index(3, group_size=4, fast=False)
        for j in range(4):
            assert bytes(g_res[j].data) == db.data[3 * 4 + j].tobytes()
        client.close()
    finally:
        s0.close()
        s1.close()


def test_mesh_engine_aspir_audit_over_tcp():
    """Shared ASPIR gating works when the engine is the mesh server
    (audit reuses the host-path expansion surface)."""
    import pytest

    from pir_tpu.config import PirConfig
    from pir_tpu.service import PirClient, PirService

    height = 1 << 10
    db = generate_random_db(height, 8)
    key_db = generate_random_db(height, 8)
    cfg = PirConfig(engine="mesh", mesh_tp=8, mesh_dp=1)
    leader = PirService(db, config=cfg, key_db=key_db).start()
    peer = PirService(db, config=cfg, key_db=key_db,
                      audit_leader=leader.address).start()
    try:
        client = PirClient([leader.address, peer.address])
        res = client.query_index_authenticated(21, key_db.slot(21))
        assert bytes(res[0].data) == db.data[21].tobytes()
        with pytest.raises(PermissionError):
            client.query_index_authenticated(22, key_db.slot(23))
        client.close()
    finally:
        leader.close()
        peer.close()


def test_mesh_single_query_dp3():
    """dp=3 with a single query: the dp pad must tile the batch up to a
    multiple of dp (review r3: the old pad could only append n elements,
    so n=1, dp=3 crashed the shard_map with a non-divisible Q axis)."""
    from pir_tpu.parallel.mesh import MeshPirServer

    height = 1024
    db = generate_random_db(height, 12)
    eng = MeshPirServer(db, tp=1, dp=3)
    idx = 137
    shares = q.new_index_query_shares(db.metadata(), idx, 1, 2)
    got = eng.private_secret_shared_query(shares[0])
    want = srv.private_secret_shared_query(db, shares[0])
    assert got.shares[0].equal(want.shares[0])


def test_mesh_root_start_compat_path():
    """Compat (reference-exact) batches ride the root-start sharded
    compat step — per shard: device-side skip walk, static subtree
    walk, the single-chip cascade (XLA lanes head + Pallas tail stages
    with the varint-parity leaf rule), packed MXU scan, ICI
    XOR-combine — with bit-exact shares vs the host golden engine on a
    non-pow2 height, plus pow2 (skip=1) + group_size + q_chunk padding
    + live updates + shallow-domain fallback."""
    from pir_tpu.parallel.mesh import MeshPirServer

    rng = random.Random(3)
    height = (1 << 12) + 300  # non-pow2: partial last shard
    db = generate_random_db(height, 8)
    md = db.metadata()
    eng = MeshPirServer(db, mesh=make_mesh(8, dp=2), compat_w=8,
                        compat_q_chunk=4)
    idxs = [rng.randrange(height) for _ in range(6)]
    sh = [q.new_index_query_shares(md, i, 1, 2) for i in idxs]
    outs = [eng.private_secret_shared_query_batch([s[k] for s in sh])
            for k in range(2)]
    assert eng._compat_root_tables  # the compat root path engaged
    for i, idx in enumerate(idxs):
        for k in range(2):  # each share bit-for-bit vs the golden model
            want = srv.private_secret_shared_query(db, sh[i][k])
            assert want.shares[0].equal(outs[k][i].shares[0]), (i, k)
        rec = q.recover([outs[0][i], outs[1][i]])
        assert bytes(rec[0].data) == db.data[idx].tobytes(), (i, idx)

    # pow2 height (skip=1) + group_size 4 + batch > q_chunk*dp (pads)
    h2 = 1 << 13
    db2 = generate_random_db(h2, 8)
    eng2 = MeshPirServer(db2, mesh=make_mesh(8, dp=2), compat_w=8,
                         compat_q_chunk=4)
    gi = [rng.randrange(h2 // 4) for _ in range(10)]
    sh_g = [q.new_index_query_shares(db2.metadata(), i, 4, 2) for i in gi]
    outs_g = [eng2.private_secret_shared_query_batch([s[k] for s in sh_g])
              for k in range(2)]
    assert eng2._compat_root_tables
    for i, idx in enumerate(gi):
        rec = q.recover([outs_g[0][i], outs_g[1][i]])
        for c in range(4):
            assert bytes(rec[c].data) == db2.data[idx * 4 + c].tobytes()

    # live updates must patch the compat sharded u8 table in place
    eng2.apply_updates({gi[0] * 4: bytes([9]) * 8})
    sh_u = [q.new_index_query_shares(db2.metadata(), gi[0], 4, 2)]
    outs_u = [eng2.private_secret_shared_query_batch([s[k] for s in sh_u])
              for k in range(2)]
    rec = q.recover([outs_u[0][0], outs_u[1][0]])
    assert bytes(rec[0].data) == bytes([9]) * 8

    # domain too shallow for the cascade: geometry gate falls back to
    # the host-prefix paths and still answers correctly
    h3 = 1 << 9
    db3 = generate_random_db(h3, 8)
    eng3 = MeshPirServer(db3, mesh=make_mesh(8, dp=2), compat_w=8)
    assert eng3._compat_root_geometry(
        q.new_index_query_shares(db3.metadata(), 3, 1, 2)[0]) is None
    sh3 = [q.new_index_query_shares(db3.metadata(), i, 1, 2)
           for i in (3, 77)]
    o3 = [eng3.private_secret_shared_query_batch([s[k] for s in sh3])
          for k in range(2)]
    for i, idx in enumerate((3, 77)):
        rec = q.recover([o3[0][i], o3[1][i]])
        assert bytes(rec[0].data) == db3.data[idx].tobytes()
    assert not eng3._compat_root_tables


def test_pow2_padded_len():
    """Every mesh batch pads so each dp shard's slice is a power of two
    (a power-of-two multiple of the query chunk above it), keeping the
    compiled step-shape set logarithmic in batch size — each distinct Q
    axis costs a fresh multi-minute remote compile (CLAUDE.md)."""
    from pir_tpu.parallel.mesh import pow2_padded_len

    # chunk=1: plain next-power-of-two per shard
    assert pow2_padded_len(1, 1) == 1
    assert pow2_padded_len(3, 1) == 4
    assert pow2_padded_len(4, 1) == 4
    assert pow2_padded_len(5, 2) == 8  # per-shard 3 -> 4
    assert pow2_padded_len(1, 3) == 3  # n=1, dp=3 tiles up
    # chunk>1: pow2 below the chunk, pow2 multiples of it above
    assert pow2_padded_len(3, 1, chunk=16) == 4
    assert pow2_padded_len(10, 1, chunk=16) == 16
    assert pow2_padded_len(17, 1, chunk=16) == 32
    assert pow2_padded_len(33, 1, chunk=16) == 64
    assert pow2_padded_len(10, 2, chunk=4) == 16  # per-shard 5 -> 8
    # non-pow2 chunk stays a valid slice size (<= chunk or multiple)
    assert pow2_padded_len(10, 1, chunk=12) == 12
    assert pow2_padded_len(13, 1, chunk=12) == 24
    # padded length never shrinks and always divides by dp
    for n in range(1, 70):
        for dp in (1, 2, 3, 4):
            for chunk in (1, 4, 12, 16):
                m = pow2_padded_len(n, dp, chunk)
                assert m >= n and m % dp == 0
                per = m // dp
                assert per <= chunk or per % chunk == 0


def test_mesh_keyword_and_mp_point_paths():
    """Keyword (2-party) and multi-party (>= 3 server) batches ride the
    sharded point-eval steps — bit-exact per share vs the host golden
    engine on a non-pow2 height, keyword + index MP domains, group_size
    > 1, and live updates through the natural-order sharded table."""
    from pir_tpu.parallel.mesh import MeshPirServer

    rng = random.Random(11)
    h = (1 << 11) + 77  # non-pow2: padded lanes on the last shard
    db = generate_random_db(h, 12)
    kws = np.random.default_rng(1).permutation(1 << 20)[:h].astype(np.uint64)
    db.set_keywords(kws)
    md = db.metadata()
    eng = MeshPirServer(db, mesh=make_mesh(8, dp=2))
    assert eng._points_applicable(
        q.new_keyword_query_shares(md, int(kws[0]), 1, 2)[0])

    # keyword 2-party batch: per-share exactness + recovery
    targets = [int(kws[rng.randrange(h)]) for _ in range(5)]
    sh = [q.new_keyword_query_shares(md, kw, 1, 2) for kw in targets]
    outs = [eng.private_secret_shared_query_batch([s[k] for s in sh])
            for k in range(2)]
    assert eng._point_steps  # the sharded point step actually engaged
    for i, kw in enumerate(targets):
        for k in range(2):
            want = srv.private_secret_shared_query(db, sh[i][k])
            assert want.shares[0].equal(outs[k][i].shares[0]), (i, k)
        rec = q.recover([outs[0][i], outs[1][i]])
        row = int(np.where(kws == kw)[0][0])
        assert bytes(rec[0].data) == db.data[row].tobytes(), (i, kw)

    # index-domain MP (3-server) batch: per-share exactness + recovery
    idxs = [rng.randrange(h) for _ in range(3)]
    shm = [q.new_index_query_shares(md, i, 1, 3) for i in idxs]
    outs_m = [eng.private_secret_shared_query_batch([s[k] for s in shm])
              for k in range(3)]
    assert eng._mp_steps  # the sharded MP step actually engaged
    for i, idx in enumerate(idxs):
        for k in range(3):
            want = srv.private_secret_shared_query(db, shm[i][k])
            assert want.shares[0].equal(outs_m[k][i].shares[0]), (i, k)
        rec = q.recover([outs_m[k][i] for k in range(3)])
        assert bytes(rec[0].data) == db.data[idx].tobytes(), (i, idx)

    # keyword-domain MP (3-server)
    kw2 = int(kws[rng.randrange(h)])
    shk = [q.new_keyword_query_shares(md, kw2, 1, 3)]
    outs_k = [eng.private_secret_shared_query_batch([s[k] for s in shk])
              for k in range(3)]
    rec = q.recover([outs_k[k][0] for k in range(3)])
    row = int(np.where(kws == kw2)[0][0])
    assert bytes(rec[0].data) == db.data[row].tobytes()

    # live updates reach the point paths' natural-order sharded table
    eng.apply_updates({row: bytes([5]) * 12})
    sh_u = q.new_keyword_query_shares(md, kw2, 1, 2)
    outs_u = [eng.private_secret_shared_query_batch([sh_u[k]])
              for k in range(2)]
    rec = q.recover([outs_u[0][0], outs_u[1][0]])
    assert bytes(rec[0].data) == bytes([5]) * 12

    # tiny domain: the 32-rows-per-shard gate falls back to the host path
    db3 = generate_random_db(64, 8)
    eng3 = MeshPirServer(db3, mesh=make_mesh(8, dp=2))
    sh3 = q.new_index_query_shares(db3.metadata(), 5, 1, 3)
    got = [eng3.private_secret_shared_query(s) for s in sh3]
    rec = q.recover(got)
    assert bytes(rec[0].data) == db3.data[5].tobytes()
    assert not eng3._mp_steps


def test_mesh_engine_keyword_and_mp_over_tcp():
    """Keyword-DPF batches and >= 3-server MP batches served by the mesh
    engine over real sockets (the service hands uniform MP batches to
    the engine whole via batch_accepts_multi_party)."""
    from pir_tpu.config import PirConfig
    from pir_tpu.parallel.mesh import MeshPirServer
    from pir_tpu.service import PirClient, PirService

    h = 1 << 11
    db = generate_random_db(h, 16)
    kws = np.random.default_rng(3).permutation(1 << 18)[:h].astype(np.uint64)
    db.set_keywords(kws)
    cfg = PirConfig(engine="mesh", mesh_tp=4, mesh_dp=2)
    services = [PirService(db, config=cfg).start() for _ in range(3)]
    try:
        assert isinstance(services[0]._engine, MeshPirServer)
        client = PirClient([s.address for s in services])
        # keyword batch falls out to 3 servers -> multi-party keyword
        rng = random.Random(2)
        rows = [rng.randrange(h) for _ in range(3)]
        res = client.query_keyword_dpf_batch([int(kws[r]) for r in rows])
        for r, out in zip(rows, res):
            assert bytes(out[0].data) == db.data[r].tobytes(), r
        assert services[0]._engine._mp_steps  # sharded MP step engaged
        # index MP batch (>= 3 shares) through the same engines
        res_i = client.query_index_batch([rows[0], rows[1]], fast=False)
        for r, out in zip(rows[:2], res_i):
            assert bytes(out[0].data) == db.data[r].tobytes(), r
        client.close()
    finally:
        for s in services:
            s.close()


def test_mesh_engine_keyword_two_party_over_tcp():
    """2-server keyword-DPF batch served by the mesh engine's sharded
    point step over TCP."""
    from pir_tpu.config import PirConfig
    from pir_tpu.parallel.mesh import MeshPirServer
    from pir_tpu.service import PirClient, PirService

    h = 1 << 11
    db = generate_random_db(h, 16)
    kws = np.random.default_rng(4).permutation(1 << 18)[:h].astype(np.uint64)
    db.set_keywords(kws)
    cfg = PirConfig(engine="mesh", mesh_tp=8, mesh_dp=1)
    services = [PirService(db, config=cfg).start() for _ in range(2)]
    try:
        assert isinstance(services[0]._engine, MeshPirServer)
        client = PirClient([s.address for s in services])
        rng = random.Random(6)
        rows = [rng.randrange(h) for _ in range(3)]
        res = client.query_keyword_dpf_batch([int(kws[r]) for r in rows])
        for r, out in zip(rows, res):
            assert bytes(out[0].data) == db.data[r].tobytes(), r
        assert services[0]._engine._point_steps  # sharded point step
        client.close()
    finally:
        for s in services:
            s.close()
