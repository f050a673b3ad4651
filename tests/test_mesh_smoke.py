"""Quick-tier mesh smoke test: a serving-default change can never again
ship with the mesh tier unrun (the r4 regression: the 1024-bit-leaf
default flip broke both multi-chip fast paths, and only the full suite —
which was not re-run — would have caught it).

A 2-device virtual CPU mesh. XLA CPU compiles each unrolled bitsliced
AES circuit in ~5 s on the 1-core rig, so the smoke EXECUTES the paths
whose traced graphs are small (few AES blocks) and covers the deep
root-start serving geometry with host-side engagement asserts plus a
full trace/lower of the real sharded step — which catches geometry
crashes, silent disengagement, and trace-time shape breaks at the true
serving-default key width without the ~50 s XLA-optimize pass. The full
tier (tests/test_parallel.py) remains the numerical gate for the
root-start kernels.
"""

import random

import jax.numpy as jnp

from pir_tpu import query as q
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import host as dpf_host
from pir_tpu.parallel.mesh import MeshPirServer, make_mesh


def test_mesh_fast_subtree_smoke():
    """Distinct-key fast batch (root path inapplicable) EXECUTES the
    subtree-split sharded step end-to-end — at the clamped default leaf
    width on a table small enough that the per-shard lane word needs
    zero-padding (the exact make_sharded_fast_key geometry the r4
    default flip crashed)."""
    height = 32 * 128 * 2  # the engagement floor at tp=2
    db = generate_random_db(height, 8)
    eng = MeshPirServer(db, mesh=make_mesh(2, dp=1))
    rng = random.Random(2)
    idxs = [rng.randrange(height) for _ in range(2)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
          for i in idxs]  # per-query keygen: distinct PRF keys
    assert eng._mesh_applicable(sh[0][0])
    outs = [eng.private_secret_shared_query_batch([s[k] for s in sh])
            for k in range(2)]
    assert not eng._root_tables  # distinct keys cannot ride root-start
    for i, idx in enumerate(idxs):
        rec = q.recover([outs[0][i], outs[1][i]])
        assert bytes(rec[0].data) == db.data[idx].tobytes(), (i, idx)


def test_mesh_fast_root_engagement_and_trace():
    """Shared-key fast batch at the serving-default leaf width: the
    root-start path must be APPLICABLE, the sharded table must build,
    and the real sharded step must trace/lower over the mesh. Executing
    this graph costs ~50 s of XLA CPU optimize, so the quick tier stops
    at lower(); tests/test_parallel.py::test_mesh_root_start_fast_path
    executes it bit-exactly."""
    from pir_tpu.dpf.device import make_fast_payload_batch

    shard_levels = 1  # tp=2
    # minimal height where _root_applicable holds at the default width
    height = dpf_host.DEFAULT_FAST_LEAF_BITS << (shard_levels + 5)
    db = generate_random_db(height, 8)
    eng = MeshPirServer(db, mesh=make_mesh(2, dp=1))
    sh = q.new_index_query_shares_batch(
        db.metadata(), [5, height - 3], 1, 2, fast=True)
    batch = [s[0] for s in sh]
    assert eng._root_applicable(batch), (
        "root-start fast path must engage at the serving-default leaf "
        "width (r4 regression class)")
    pay, layout = make_fast_payload_batch(batch, shared_rk=True)
    table = eng._root_table(1, batch[0].key_fast.depth, layout.leaf_blocks)
    lowered = eng._root_step(layout).lower(table, jnp.asarray(pay))
    assert lowered is not None


def test_mesh_compat_smoke():
    """Compat batch EXECUTES the subtree-split sharded step at minimal
    device depth (d_levels=1: one expansion level + leaf select) with
    bit-exact shares vs the host golden model; the deeper compat
    root-start geometry is asserted host-side (its execution lives in
    tests/test_parallel.py::test_mesh_root_start_compat_path)."""
    from pir_tpu import server as srv

    height = 128  # nb=7; 64-node split at lvl 6 -> d_levels=1 per shard
    db = generate_random_db(height, 8)
    eng = MeshPirServer(db, mesh=make_mesh(2, dp=1))
    rng = random.Random(3)
    idxs = [rng.randrange(height) for _ in range(2)]
    sh = [q.new_index_query_shares(db.metadata(), i, 1, 2) for i in idxs]
    outs = [eng.private_secret_shared_query_batch([s[k] for s in sh])
            for k in range(2)]
    for i, idx in enumerate(idxs):
        for k in range(2):
            want = srv.private_secret_shared_query(db, sh[i][k])
            assert want.shares[0].equal(outs[k][i].shares[0]), (i, k)
        rec = q.recover([outs[0][i], outs[1][i]])
        assert bytes(rec[0].data) == db.data[idx].tobytes(), (i, idx)

    # compat root-start engagement geometry (host-side, instant)
    db2 = generate_random_db((1 << 10) + 13, 8)
    eng2 = MeshPirServer(db2, mesh=make_mesh(2, dp=1), compat_w=8)
    q2 = q.new_index_query_shares(db2.metadata(), 3, 1, 2)[0]
    assert eng2._compat_root_geometry(q2) is not None
