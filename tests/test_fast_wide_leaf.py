"""Wide-leaf fast mode (leaf_bits > 128): every engine, every path.

Wide leaves terminate the early-termination DPF tree higher, CTR-
extending each leaf seed into leaf_bits/128 MMO blocks (dpf/host.py
wide-leaf note): leaf AES stays fixed at height/128 blocks per query
while tree AES shrinks geometrically — ~3x less total AES at
leaf_bits=1024 on a 2^20-row table. These tests pin:

* host keygen/eval one-hot semantics across leaf widths (single+batch);
* the height clamp (trees keep >= 5 levels where possible);
* bit-exact agreement of host golden, native C++, TPU-engine XLA,
  TPU-engine Pallas (interpret), and mesh engines;
* wire round-trips (wide flag bit 4) with the legacy 128-bit encoding
  byte-identical to round 2;
* fast-key geometry validation (crafted depth / leaf width / height
  must fail fast — the table-layout remote-DoS class).
"""

import random

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu import wire
from pir_tpu.database import generate_random_db
from pir_tpu.dpf import host as dpf
from pir_tpu.server import TpuPirServer


def _recover(r0, r1, col=0):
    return bytes(a ^ b for a, b in zip(r0.shares[col].data, r1.shares[col].data))


def test_host_one_hot_across_leaf_widths():
    rng = random.Random(0)
    for height in (300, 4096, 1 << 14):
        for lb in (128, 256, 512, 1024):
            if dpf.fast_leaf_bits_for_height(height, lb) != lb:
                continue  # clamp would reduce it; covered below
            pf = dpf.client_initialize(dpf.fast_depth_for_height(height, lb))
            a = rng.randrange(height)
            k0, k1 = dpf.generate_two_server_fast(pf, a, height, leaf_bits=lb)
            assert k0.leaf_bits == lb
            x = (dpf.eval_full_domain_fast_bits(pf, k0)
                 ^ dpf.eval_full_domain_fast_bits(pf, k1))
            assert x[a] and x.sum() == 1, (height, lb, a)


def test_batch_keygen_matches_semantics():
    height, lb = 1 << 14, 512
    pf = dpf.client_initialize(dpf.fast_depth_for_height(height, lb))
    idxs = [0, 1, height - 1, height // 2, 12345 % height]
    pairs = dpf.generate_two_server_fast_batch(pf, idxs, height, leaf_bits=lb)
    for a, (k0, k1) in zip(idxs, pairs):
        assert k0.leaf_bits == lb and k0.depth == dpf.fast_depth_for_height(
            height, lb)
        x = (dpf.eval_full_domain_fast_bits(pf, k0)
             ^ dpf.eval_full_domain_fast_bits(pf, k1))
        assert x[a] and x.sum() == 1


def test_leaf_width_clamp():
    assert dpf.fast_leaf_bits_for_height(1 << 20, 1024) == 1024
    assert dpf.fast_leaf_bits_for_height(1 << 14, 1024) == 512
    assert dpf.fast_leaf_bits_for_height(1 << 10, 8192) == 128
    with pytest.raises(ValueError):
        dpf.fast_leaf_bits_for_height(1 << 20, 192)  # not a power of two


def test_wire_round_trip_wide_and_legacy():
    md_height = 1 << 15
    db_md = type("MD", (), {"slot_bytes": 8, "db_size": md_height})()
    from pir_tpu.database import DBMetadata

    md = DBMetadata(8, md_height)
    wide = q.new_index_query_shares(md, 77, 1, 2, fast=True, leaf_bits=1024)[0]
    blob = wire.serialize_query_share(wide)
    rt = wire.deserialize_query_share(blob)
    assert rt.key_fast.leaf_bits == 1024
    assert rt.key_fast.final_cw_block == wide.key_fast.final_cw_block
    assert rt.key_fast.cw == wide.key_fast.cw
    assert rt.key_fast.depth == wide.key_fast.depth

    legacy = q.new_index_query_shares(md, 77, 1, 2, fast=True, leaf_bits=128)[0]
    blob = wire.serialize_query_share(legacy)
    assert not (blob[6] & 16)  # flags bit 4 clear: original encoding
    rt = wire.deserialize_query_share(blob)
    assert rt.key_fast.leaf_bits == 128
    del db_md


def test_geometry_validation_rejects_crafted_keys():
    height = 1 << 14
    db = generate_random_db(height, 8)
    md = db.metadata()
    share = q.new_index_query_shares(md, 3, 1, 2, fast=True, leaf_bits=512)[0]
    good = share.key_fast

    # crafted depth: would size a 128 << depth table layout
    bad = dpf.FastKey2P(good.s_init, good.t_init, good.cw + [b"\0" * 18] * 10,
                        good.final_cw_block, good.depth + 10, good.height)
    with pytest.raises(ValueError):
        srv.validate_fast_key_geometry(bad, height)
    # crafted leaf width beyond the domain
    bad = dpf.FastKey2P(good.s_init, good.t_init, [], b"\0" * 16 * 1024,
                        0, good.height)
    with pytest.raises(ValueError):
        srv.validate_fast_key_geometry(bad, height)
    # wrong height
    bad = dpf.FastKey2P(good.s_init, good.t_init, good.cw,
                        good.final_cw_block, good.depth, height * 2)
    with pytest.raises(ValueError):
        srv.validate_fast_key_geometry(bad, height)
    # the genuine key passes
    srv.validate_fast_key_geometry(good, height)

    # host engine path rejects too
    share.key_fast = dpf.FastKey2P(
        good.s_init, good.t_init, good.cw + [b"\0" * 18] * 4,
        good.final_cw_block, good.depth + 4, good.height)
    with pytest.raises(ValueError):
        srv.expand_shared_query(db, share)


def test_mixed_leaf_width_batch_rejected():
    height = 1 << 15
    db = generate_random_db(height, 8)
    md = db.metadata()
    s_a = q.new_index_query_shares(md, 1, 1, 2, fast=True, leaf_bits=128)[0]
    s_b = q.new_index_query_shares(md, 2, 1, 2, fast=True, leaf_bits=1024)[0]
    eng = TpuPirServer(db, use_pallas=False)
    with pytest.raises(ValueError):
        eng.private_secret_shared_query_batch([s_a, s_b])


@pytest.mark.parametrize("use_pallas", [False, True])
def test_tpu_engine_wide_batch(use_pallas):
    rng = np.random.default_rng(4)
    height, sb = 1 << 15, 16
    db = generate_random_db(height, sb)
    eng = TpuPirServer(db, use_pallas=use_pallas)
    idxs = [int(i) for i in rng.integers(0, height, size=16)]
    sl = q.new_index_query_shares_batch(md := db.metadata(), idxs, 1, 2,
                                        fast=True, leaf_bits=1024)
    assert sl[0][0].key_fast.leaf_bits == 1024
    o0 = eng.private_secret_shared_query_batch([s[0] for s in sl])
    o1 = eng.private_secret_shared_query_batch([s[1] for s in sl])
    for k, idx in enumerate(idxs):
        assert _recover(o0[k], o1[k]) == db.data[idx].tobytes(), k
    # single-query fused path
    a, b = q.new_index_query_shares(md, idxs[0], 1, 2, fast=True,
                                    leaf_bits=1024)
    assert _recover(eng.private_secret_shared_query(a),
                    eng.private_secret_shared_query(b)) == \
        db.data[idxs[0]].tobytes()


def test_tpu_engine_wide_live_updates():
    rng = np.random.default_rng(5)
    height, sb = 1 << 15, 8
    db = generate_random_db(height, sb)
    eng = TpuPirServer(db, use_pallas=False)
    md = db.metadata()
    idxs = [int(i) for i in rng.integers(0, height, size=8)]
    sl = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True,
                                        leaf_bits=1024)
    eng.private_secret_shared_query_batch([s[0] for s in sl])  # build table
    eng.apply_updates({idxs[0]: bytes(range(sb))})
    o0 = eng.private_secret_shared_query_batch([s[0] for s in sl])
    o1 = eng.private_secret_shared_query_batch([s[1] for s in sl])
    assert _recover(o0[0], o1[0]) == bytes(range(sb))
    assert _recover(o0[1], o1[1]) == db.data[idxs[1]].tobytes()


def test_native_engine_wide():
    from pir_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(6)
    height, sb = 1 << 15, 8
    db = generate_random_db(height, sb)
    from pir_tpu.server import NativePirServer

    eng = NativePirServer(db)
    md = db.metadata()
    for lb in (256, 1024):
        idx = int(rng.integers(0, height))
        a, b = q.new_index_query_shares(md, idx, 1, 2, fast=True, leaf_bits=lb)
        assert _recover(eng.private_secret_shared_query(a),
                        eng.private_secret_shared_query(b)) == \
            db.data[idx].tobytes(), lb


def test_mesh_engine_wide():
    import jax

    from pir_tpu.parallel.mesh import MeshPirServer

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    rng = np.random.default_rng(7)
    height, sb = 1 << 16, 8
    db = generate_random_db(height, sb)
    eng = MeshPirServer(db, tp=4, dp=2)
    md = db.metadata()
    # shared-key (root-start) batch
    idxs = [int(i) for i in rng.integers(0, height, size=8)]
    sl = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True,
                                        leaf_bits=1024)
    o0 = eng.private_secret_shared_query_batch([s[0] for s in sl])
    o1 = eng.private_secret_shared_query_batch([s[1] for s in sl])
    for k, idx in enumerate(idxs):
        assert _recover(o0[k], o1[k]) == db.data[idx].tobytes(), k
    # distinct-keygen (host-prefix subtree) path
    pairs = [q.new_index_query_shares(md, i, 1, 2, fast=True, leaf_bits=1024)
             for i in idxs[:3]]
    o0 = eng.private_secret_shared_query_batch([p[0] for p in pairs])
    o1 = eng.private_secret_shared_query_batch([p[1] for p in pairs])
    for k, idx in enumerate(idxs[:3]):
        assert _recover(o0[k], o1[k]) == db.data[idx].tobytes(), k
