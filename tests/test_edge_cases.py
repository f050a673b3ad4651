"""Edge cases and boundary geometry."""

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import Database, generate_random_db
from pir_tpu.slot import Slot


def test_height_one_database():
    db = generate_random_db(1, 9)
    shares = q.new_index_query_shares(db.metadata(), 0, 1, 2)
    res = q.recover([srv.private_secret_shared_query(db, s) for s in shares])
    assert db.slot(0).equal(res[0])


def test_group_size_equals_db_size():
    """One row containing the whole database."""
    db = generate_random_db(16, 4)
    shares = q.new_index_query_shares(db.metadata(), 0, 16, 2)
    res = q.recover([srv.private_secret_shared_query(db, s) for s in shares])
    for j in range(16):
        assert db.slot(j).equal(res[j])


def test_non_divisible_group_size_truncates():
    """DBSize % G != 0: trailing slots are unreachable, like the reference
    (dimHeight = DBSize // G, db.go:78-80)."""
    db = generate_random_db(10, 3)
    shares = q.new_index_query_shares(db.metadata(), 2, 3, 2)  # h = 3
    res = q.recover([srv.private_secret_shared_query(db, s) for s in shares])
    for j in range(3):
        assert db.slot(2 * 3 + j).equal(res[j])


def test_single_byte_slots():
    db = generate_random_db(257, 1)
    shares = q.new_index_query_shares(db.metadata(), 256, 1, 2)
    res = q.recover([srv.private_secret_shared_query(db, s) for s in shares])
    assert db.slot(256).equal(res[0])


def test_build_for_data_empty_strings():
    db = Database()
    db.build_for_data_with_slot_size(["", "a", ""], 2)
    assert db.db_size == 3
    assert db.slot(0).equal(Slot(b"\x00\x00"))
    assert db.slot(1).equal(Slot(b"a\x00"))


def test_fast_mode_tiny_heights():
    from pir_tpu.dpf import host as dpf

    for height in (1, 2, 100, 127, 128, 129):
        client = dpf.client_initialize(dpf.fast_depth_for_height(height))
        keys = dpf.generate_two_server_fast(client, height - 1, height)
        server = dpf.server_initialize(client.prf_keys, client.num_bits)
        sel = dpf.eval_full_domain_fast_bits(server, keys[0]) ^ \
            dpf.eval_full_domain_fast_bits(server, keys[1])
        assert sel[height - 1] and sel.sum() == 1, height


def test_fast_mode_out_of_domain_raises():
    from pir_tpu.dpf import host as dpf

    client = dpf.client_initialize(3)
    with pytest.raises(ValueError):
        dpf.generate_two_server_fast(client, 100, 100)


def test_recover_three_shares():
    """recover() XORs any number of result shares (query.go:277-297)."""
    from pir_tpu.query import SecretSharedQueryResult, recover

    a = SecretSharedQueryResult(2, [Slot(b"\x01\x02")])
    b = SecretSharedQueryResult(2, [Slot(b"\x10\x20")])
    c = SecretSharedQueryResult(2, [Slot(b"\x11\x22")])
    out = recover([a, b, c])
    assert bytes(out[0].data) == b"\x00\x00"


def test_fast_batch_distinct_keys_chunks():
    """A large fast-mode batch whose shares carry DISTINCT PRF keys
    (multi-tenant serving) must chunk its per-query round-key mask
    expansion instead of materialising it whole (review r3: the
    unchunked form OOMs HBM at batch 4096). Exercised with a tiny chunk
    so the pad-tail + device-concat path runs."""
    from pir_tpu.server import TpuPirServer

    height = 1 << 12  # depth >= 5 so the root-start fast path applies
    db = generate_random_db(height, 8)
    eng = TpuPirServer(db, fast_nonshared_chunk=4)
    rng = np.random.default_rng(3)
    # 9 = 4 + 4 + 1: the tail chunk tiles a SINGLE query, which must
    # still dispatch with the non-shared layout (a tiled tail shares
    # keys by construction and would otherwise flip the compiled shape)
    idxs = [int(i) for i in rng.integers(0, height, size=9)]
    # one keygen per query -> independent PRF keys per share
    share_lists = [q.new_index_query_shares(db.metadata(), i, 1, 2, fast=True)
                   for i in idxs]
    for server_num in (0, 1):
        batch = [sl[server_num] for sl in share_lists]
        got = eng.private_secret_shared_query_batch(batch)
        assert len(got) == len(batch)
        for sl, res in zip(share_lists, got):
            want = srv.private_secret_shared_query(db, sl[server_num])
            assert res.shares[0].equal(want.shares[0])


def test_compat_batch_tail_pad_is_full_chunk():
    """Tail chunks smaller than half the chunk size must still pad to
    the full chunk (review r3: `part + part[:chunk-len]` under-padded,
    compiling a fresh jit shape per odd batch size)."""
    from pir_tpu.server import TpuPirServer

    height = 256
    db = generate_random_db(height, 6)
    eng = TpuPirServer(db, compat_batch_chunk=8, mxu_batch_threshold=4)
    rng = np.random.default_rng(5)
    idxs = [int(i) for i in rng.integers(0, height, size=10)]  # 10 = 8 + 2
    share_lists = [q.new_index_query_shares(db.metadata(), i, 1, 2)
                   for i in idxs]
    batch = [sl[0] for sl in share_lists]
    got = eng.private_secret_shared_query_batch(batch)
    assert len(got) == len(batch)
    for sl, res in zip(share_lists, got):
        want = srv.private_secret_shared_query(db, sl[0])
        assert res.shares[0].equal(want.shares[0])


def test_fast_payload_layout_override():
    """A chunk tail tiled from one query shares PRF keys by construction;
    the dispatcher forces shared_rk=False so the compiled-shape choice
    never flips on padding artifacts (review r3)."""
    from pir_tpu.dpf.device import make_fast_payload_batch
    from pir_tpu.utils import pad_tile

    db = generate_random_db(1 << 12, 8)
    share = q.new_index_query_shares(db.metadata(), 5, 1, 2, fast=True)[0]
    part = pad_tile([share], 4)
    _, lo_auto = make_fast_payload_batch(part)
    _, lo_forced = make_fast_payload_batch(part, shared_rk=False)
    assert lo_auto.shared_rk is True
    assert lo_forced.shared_rk is False
