"""Single-server cPIR tests, mirroring db_test.go:67-265.

Key size 128 bits as in the reference tests (db_test.go:70 — tiny, test-
only); query counts reduced for CI speed, assertions identical.
"""

import random

import pytest

from pir_tpu import encrypted as enc
from pir_tpu.crypto.paillier import keygen
from pir_tpu.database import generate_random_db
from pir_tpu.slot import new_empty_slot

TEST_DB_SIZE = 1 << 10
TEST_DB_HEIGHT = 1 << 5
SLOT_BYTES = 3
NUM_QUERIES = 2


@pytest.fixture(scope="module")
def keys():
    return keygen(128)


@pytest.fixture(scope="module")
def db():
    return generate_random_db(TEST_DB_SIZE, SLOT_BYTES)


def test_encrypted_query(keys, db):
    """db_test.go:67-113."""
    sk, pk = keys
    rng = random.Random(0)
    for group_size in range(1, 5):
        dim_width, dim_height = db.get_dimensions_for_database(
            TEST_DB_HEIGHT, group_size
        )
        for _ in range(NUM_QUERIES):
            q_index = rng.randrange(dim_height)
            query = enc.new_encrypted_query(db.metadata(), pk, group_size, q_index)
            response = enc.private_encrypted_query(db, query)
            res = enc.recover_encrypted(response, sk)
            assert len(res) % group_size == 0
            for j in range(dim_width):
                index = q_index * dim_width + j
                if index >= db.db_size:
                    break
                assert db.slot(index).equal(res[j]), (group_size, q_index, j)


def test_encrypted_null_query(keys, db):
    """db_test.go:115-158: index -1 recovers all-zero slots."""
    sk, pk = keys
    for group_size in (1, 3):
        dim_width, _ = db.get_dimensions_for_database(TEST_DB_HEIGHT, group_size)
        query = enc.new_encrypted_query(db.metadata(), pk, group_size, -1)
        response = enc.private_encrypted_query(db, query)
        res = enc.recover_encrypted(response, sk)
        empty = new_empty_slot(len(res[0].data))
        for j in range(dim_width):
            assert empty.equal(res[j])


def test_doubly_encrypted_query(keys, db):
    """db_test.go:197-265."""
    sk, pk = keys
    rng = random.Random(1)
    for group_size in range(1, 5):
        dim_width, dim_height = db.get_dimensions_for_database(
            TEST_DB_HEIGHT, group_size
        )
        assert dim_width * dim_height <= db.db_size + dim_width

        for _ in range(NUM_QUERIES):
            q_index = rng.randrange(dim_width * dim_height) // group_size
            query = enc.new_doubly_encrypted_query(
                db.metadata(), pk, group_size, q_index
            )
            assert len(query.col.ebits) <= dim_width // group_size

            response = enc.private_doubly_encrypted_query(db, query)
            res = enc.recover_doubly_encrypted(response, sk)

            row_index, col_index = db.index_to_coordinates(
                q_index, dim_width, dim_height
            )
            col_index //= group_size
            for j in range(group_size):
                index = row_index * dim_width + col_index * group_size + j
                if index >= db.db_size:
                    break
                assert db.slot(index).equal(res[j]), (group_size, q_index, j)


def test_doubly_encrypted_null_query(keys, db):
    """db_test.go:159-196."""
    sk, pk = keys
    for group_size in (1, 2):
        query = enc.new_doubly_encrypted_null_query(db.metadata(), pk, group_size)
        response = enc.private_doubly_encrypted_query(db, query)
        res = enc.recover_doubly_encrypted(response, sk)
        empty = new_empty_slot(len(res[0].data))
        for col in range(group_size):
            assert empty.equal(res[col])


def test_invalid_group_sizes_raise(keys, db):
    sk, pk = keys
    query = enc.new_doubly_encrypted_query(db.metadata(), pk, 1, 0)
    query.row.group_size = 0
    with pytest.raises(ValueError):
        enc.private_doubly_encrypted_query(db, query)


def test_recursive_col_geometry_bounds(keys, db):
    """A served column vector that doesn't match the row result geometry
    must die with the same ValueError class as the row pass — never an
    IndexError (encrypted.py column-pass bounds; cf. db.go:294-358)."""
    sk, pk = keys

    def fresh():
        return enc.new_doubly_encrypted_query(db.metadata(), pk, 1, 0)

    q_short = fresh()
    q_short.col.ebits = q_short.col.ebits[:-1]
    with pytest.raises(ValueError, match="geometry"):
        enc.private_doubly_encrypted_query(db, q_short)

    q_long = fresh()
    q_long.col.ebits = q_long.col.ebits + [q_long.col.ebits[0]]
    with pytest.raises(ValueError, match="geometry"):
        enc.private_doubly_encrypted_query(db, q_long)

    # direct column-pass calls (the ASPIR challenge path) get the same
    # bounds even without private_doubly_encrypted_query's pre-checks
    row_res = enc.private_encrypted_query(db, fresh().row)
    bad_col = fresh().col
    bad_col.group_size = 0
    with pytest.raises(ValueError, match="group size"):
        enc.private_encrypted_query_over_encrypted_result(db, bad_col, row_res)


def test_native_scan_matches_python(keys, db, monkeypatch):
    """The threaded C++ AHE scan (bigmod.cpp:paillier_scan) must produce
    bit-identical ciphertexts to the CPython reference loop, including the
    nprocs partial-merge path and out-of-range skip semantics."""
    sk, pk = keys
    if enc._native_scan() is None:
        pytest.skip("native bigmod engine unavailable")
    q1 = enc.new_encrypted_query(db.metadata(), pk, 2, 7)
    q2 = enc.new_doubly_encrypted_query(db.metadata(), pk, 2, 99)
    nat_r1 = enc.private_encrypted_query(db, q1, nprocs=3)
    nat_r2 = enc.private_doubly_encrypted_query(db, q2, nprocs=3)
    monkeypatch.setattr(enc, "_native_scan", lambda: None)
    py_r1 = enc.private_encrypted_query(db, q1)
    py_r2 = enc.private_doubly_encrypted_query(db, q2)
    assert nat_r1.num_bytes_per_ciphertext == py_r1.num_bytes_per_ciphertext
    for a, b in zip(nat_r1.slots, py_r1.slots):
        assert [c.c for c in a.cts] == [c.c for c in b.cts]
    for a, b in zip(nat_r2.slots, py_r2.slots):
        assert [c.c for c in a.cts] == [c.c for c in b.cts]


def test_powmod_batch_matches_pow(keys):
    """Native batched modexp (threaded, shared-window-table) vs CPython."""
    import random as pyrandom

    from pir_tpu.crypto.paillier import _powmod_batch

    _, pk = keys
    rng = pyrandom.Random(7)
    bases = [rng.randrange(2, pk.n3) for _ in range(9)]
    exps = [rng.randrange(0, pk.n2) for _ in range(9)]
    assert _powmod_batch(bases, exps, pk.n3, nthreads=2) == [
        pow(b, e, pk.n3) for b, e in zip(bases, exps)
    ]
    assert _powmod_batch(bases[0], exps, pk.n3, common_base=True) == [
        pow(bases[0], e, pk.n3) for e in exps
    ]
