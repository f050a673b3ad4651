"""Live database updates: Database.update_slots + engine table patches.

The reference rebuilds its DB per run (SURVEY.md §5); a serving
deployment must update rows without re-uploading multi-GiB tables or
restarting. Every device-resident layout TpuPirServer caches derives
row-wise from db.data, so apply_updates patches each with a row-scatter;
these tests assert the patched caches are bit-identical to a fresh
server's rebuilds, and that retrieval end-to-end returns the new value.
"""

import numpy as np
import pytest

from pir_tpu import query as q
from pir_tpu import server as srv
from pir_tpu.database import Database, generate_random_db
from pir_tpu.server import TpuPirServer
from pir_tpu.slot import Slot


def test_update_slots_semantics(tmp_path):
    db = generate_random_db(64, 8)
    db.update_slots({3: b"\x01\x02", 5: Slot(b"\xff" * 8)})
    assert db.data[3].tobytes() == b"\x01\x02" + b"\x00" * 6  # zero-padded
    assert db.data[5].tobytes() == b"\xff" * 8
    with pytest.raises(IndexError):
        db.update_slots({64: b"x"})
    with pytest.raises(ValueError):
        db.update_slots({0: b"x" * 9})  # larger than slot_bytes
    # mmap-loaded checkpoints are read-only: refuse instead of segfault
    p = str(tmp_path / "ck.npz")
    db.save(p, mmap_capable=True)
    back = Database.load(p, mmap=True)
    with pytest.raises(ValueError, match="read-only"):
        back.update_slots({0: b"y"})


def _populate_caches(eng: TpuPirServer, db, rng):
    """Run one query of every flavor so every cache family exists."""
    md = db.metadata()
    idxs = [int(i) for i in rng.integers(0, db.db_size, size=8)]
    for g in (1, 2):
        h = db.db_size // g
        eng.private_secret_shared_query(
            q.new_index_query_shares(md, idxs[0] % h, g, 2, fast=True)[0])
        eng.private_secret_shared_query(
            q.new_index_query_shares(md, idxs[1] % h, g, 2)[0])
    fast_b = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)
    eng.private_secret_shared_query_batch([s[0] for s in fast_b])
    compat_b = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=False)
    eng.private_secret_shared_query_batch([s[0] for s in compat_b])
    if db.keywords is not None:
        eng.private_secret_shared_query(
            q.new_keyword_query_shares(md, int(db.keywords[5]), 1, 2)[0])


def test_apply_updates_patches_equal_rebuild():
    rng = np.random.default_rng(0)
    db = generate_random_db(1 << 10, 12)
    db.set_keywords(np.arange(7, 7 + db.db_size, dtype=np.uint64))
    eng = TpuPirServer(db)
    _populate_caches(eng, db, rng)

    updates = {17: b"\xaa" * 12, 513: b"", 1023: b"\x01"}
    eng.apply_updates(updates)

    fresh = TpuPirServer(db)  # rebuilds every table from the updated data
    _populate_caches(fresh, db, rng)

    def eq(a, b):
        return np.array_equal(np.asarray(a), np.asarray(b))

    assert set(eng._tables_u8) == set(fresh._tables_u8)
    for g in fresh._tables_u8:
        assert eq(eng._tables_u8[g], fresh._tables_u8[g]), ("u8", g)
    for g in fresh._tables:
        assert eq(eng._tables[g][0], fresh._tables[g][0]), ("u32", g)
    for g in fresh._plane_tables:
        a, b = eng._plane_tables[g], fresh._plane_tables[g]
        assert (a is None) == (b is None)
        if a is not None:
            assert eq(a, b), ("plane", g)
    assert set(eng._storage_cache) == set(fresh._storage_cache)
    for key in fresh._storage_cache:
        a, b = eng._storage_cache[key], fresh._storage_cache[key]
        if a is None or b is None:
            assert a is None and b is None
            continue
        if isinstance(a, tuple):
            assert eq(a[1], b[1]), key
        else:
            assert eq(a, b), key
    # keyword planes derive from keywords, untouched by slot updates
    for g in fresh._kw_planes:
        assert eq(eng._kw_planes[g], fresh._kw_planes[g])


def test_update_end_to_end_recovery():
    """Retrieval after apply_updates returns the new value (TPU engine
    share 0 + host engine share 1, both over the same updated db)."""
    db = generate_random_db(1 << 10, 12)
    md = db.metadata()
    eng = TpuPirServer(db)
    idx, other = 257, 700
    old_other = db.data[other].tobytes()

    def fetch(i, fast):
        shares = q.new_index_query_shares(md, i, 1, 2, fast=fast)
        r0 = eng.private_secret_shared_query(shares[0])
        r1 = srv.private_secret_shared_query(db, shares[1])
        return bytes(q.recover([r0, r1])[0].data)

    assert fetch(idx, True) == db.data[idx].tobytes()  # populate caches
    assert fetch(idx, False) == db.data[idx].tobytes()
    eng.apply_updates({idx: b"\x5a" * 12})
    for fast in (True, False):
        assert fetch(idx, fast) == b"\x5a" * 12
        assert fetch(other, fast) == old_other  # neighbours untouched


def test_updates_race_concurrent_queries():
    """Queries concurrent with apply_updates see the old or the new row
    atomically (each cached table is swapped whole), never a torn one —
    and the service-level convenience routes to the engine."""
    import threading

    from pir_tpu.service import PirService

    db = generate_random_db(1 << 9, 8)
    md = db.metadata()
    svc = PirService(db, use_tpu=True).start()
    try:
        idx = 123
        olds = {db.data[idx].tobytes()}
        news = set()
        stop = threading.Event()
        seen, errs = [], []

        def hammer():
            # both shares answer on the engine: each patched table is a
            # whole-buffer swap, so reads are atomic per table (db.data
            # itself is only safe to read under quiescence)
            eng = svc._engine
            while not stop.is_set():
                try:
                    shares = q.new_index_query_shares(md, idx, 1, 2, fast=True)
                    r0 = eng.private_secret_shared_query(shares[0])
                    r1 = eng.private_secret_shared_query(shares[1])
                    seen.append(bytes(q.recover([r0, r1])[0].data))
                except Exception as e:  # surface, don't swallow
                    errs.append(e)
                    return

        t = threading.Thread(target=hammer)
        t.start()
        for k in range(10):
            val = bytes([k]) * 8
            news.add(val)
            svc.apply_updates({idx: val})
        stop.set()
        t.join(timeout=60)
        assert not errs, errs
        assert seen, "no concurrent reads happened"
        allowed = olds | news
        assert all(s in allowed for s in seen), set(seen) - allowed
        # once quiescent, the final state is the last update
        eng = svc._engine
        shares = q.new_index_query_shares(md, idx, 1, 2, fast=True)
        final = q.recover([eng.private_secret_shared_query(s)
                           for s in shares])
        assert bytes(final[0].data) == bytes([9]) * 8
    finally:
        svc.close()


def test_mesh_apply_updates():
    from pir_tpu.parallel.mesh import MeshPirServer

    db = generate_random_db(1 << 10, 8)
    md = db.metadata()
    eng = MeshPirServer(db, tp=4, dp=2)
    idxs = [int(i) for i in np.random.default_rng(1).integers(
        0, db.db_size, size=8)]
    share_lists = q.new_index_query_shares_batch(md, idxs, 1, 2, fast=True)

    def fetch_all():
        r0 = eng.private_secret_shared_query_batch(
            [s[0] for s in share_lists])
        r1 = [srv.private_secret_shared_query(db, s[1]) for s in share_lists]
        return [bytes(q.recover([a, b])[0].data) for a, b in zip(r0, r1)]

    assert fetch_all() == [db.data[i].tobytes() for i in idxs]
    eng.apply_updates({idxs[0]: b"\x77" * 8})
    want = [db.data[i].tobytes() for i in idxs]
    assert want[0] == b"\x77" * 8
    assert fetch_all() == want
