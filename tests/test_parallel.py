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
    perm = _fast_leaf_perm(k0.d_levels, k0.rows_per_shard, k0.per_shard_nodes)

    table = pack_table_u32(db.data, height, 1)
    table = pad_table_rows(table, n_shards * k0.rows_per_shard)

    step = make_sharded_fast_answer_step(mesh, k0.d_levels)
    out = np.asarray(
        step(table, seeds, t, cw_s, cw_tl, cw_tr, fcw, rk, rk_leaf, perm)
    )
    for i in range(Q):
        got = unpack_result_u32(out[i], 1, slot_bytes)
        assert Slot(got[0].tobytes()).equal(hosts[i].shares[0]), i
