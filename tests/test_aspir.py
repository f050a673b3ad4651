"""Single-server AHE ASPIR (aspir_test.go:12-57) + commitment tests."""

import random

import pytest

from pir_tpu.aspir import (
    auth_check,
    auth_prove,
    generate_auth_chal_for_query,
    new_authenticated_query,
)
from pir_tpu.commitment import commit
from pir_tpu.crypto.paillier import keygen
from pir_tpu.database import generate_random_db

SEC_BYTES = 8
TEST_DB_SIZE = 1 << 6  # reduced from 1<<10 for CI speed; assertions identical


@pytest.fixture(scope="module")
def keys():
    return keygen(128)


def test_commitment_binding():
    c = commit(12345)
    assert c.check_open(12345)
    assert not c.check_open(12346)  # the reference's digest bug made this pass


def test_aspir_complete(keys):
    sk, pk = keys
    rng = random.Random(0)
    db = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    for group_size in (1, 2):
        keydb_size = TEST_DB_SIZE // group_size
        keydb = generate_random_db(keydb_size, SEC_BYTES)
        q_index = rng.randrange(keydb.db_size)
        auth_key = keydb.slot(q_index)

        auth_query, state = new_authenticated_query(
            db.metadata(), sk, group_size, q_index, auth_key
        )
        chal = generate_auth_chal_for_query(SEC_BYTES, keydb, auth_query)
        proof = auth_prove(state, chal)
        assert auth_check(pk, auth_query, chal, proof), group_size


def test_aspir_wrong_auth_key_cannot_prove_real_side(keys):
    """With a wrong key the real-side challenge is non-zero; the client can
    only produce a proof for the *null* query slot (the reference's design:
    AuthProve falls back to whichever token is zero, aspir.go:131-154).
    The client never obtains a valid proof tied to its real query."""
    sk, pk = keys
    rng = random.Random(1)
    keydb = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    db = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    q_index = rng.randrange(1, keydb.db_size)
    wrong_key = keydb.slot(0)

    auth_query, state = new_authenticated_query(
        db.metadata(), sk, 1, q_index, wrong_key
    )
    chal = generate_auth_chal_for_query(SEC_BYTES, keydb, auth_query)
    proof = auth_prove(state, chal)
    # the proof necessarily refers to the null slot, not the real one
    assert proof.q_bit == 1 - state.bit
    # and a proof claiming the real slot does not verify
    proof.q_bit = state.bit
    assert not auth_check(pk, auth_query, chal, proof)


def test_aspir_proof_bound_to_committed_token(keys):
    """A proof with a swapped-in auth token fails the commitment check."""
    sk, pk = keys
    keydb = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    db = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    q_index = 3
    auth_key = keydb.slot(q_index)
    auth_query, state = new_authenticated_query(
        db.metadata(), sk, 1, q_index, auth_key
    )
    chal = generate_auth_chal_for_query(SEC_BYTES, keydb, auth_query)
    proof = auth_prove(state, chal)
    proof.auth_token = pk.encrypt_zero()  # not the committed token
    assert not auth_check(pk, auth_query, chal, proof)


def test_auth_chal_geometry_bounds(keys):
    """Malformed served auth queries must die as clean ValueErrors in
    generate_auth_chal_for_query (aspir.py bounds; the reference only
    asserts the exactly-one shape for the shared variant,
    aspir.go:272-274), never IndexError/ZeroDivisionError."""
    sk, pk = keys
    db = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    keydb = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    auth_key = keydb.slot(3)

    def fresh():
        return new_authenticated_query(db.metadata(), sk, 1, 3, auth_key)[0]

    q = fresh()
    q.query1.col.group_size = 2  # mismatched sides
    with pytest.raises(ValueError, match="group size"):
        generate_auth_chal_for_query(SEC_BYTES, keydb, q)

    q = fresh()
    q.query0.col.group_size = 0
    q.query1.col.group_size = 0
    with pytest.raises(ValueError, match="group size"):
        generate_auth_chal_for_query(SEC_BYTES, keydb, q)

    q = fresh()  # short col vector: geometry error, not IndexError
    q.query0.col.ebits = q.query0.col.ebits[:-1]
    with pytest.raises(ValueError, match="geometry"):
        generate_auth_chal_for_query(SEC_BYTES, keydb, q)


def test_auth_chal_requires_single_ciphertext_reduction(keys):
    """A key DB whose slots span multiple Paillier plaintexts cannot
    yield the one-ciphertext ChalToken the protocol carries — the server
    must reject rather than silently drop ciphertext chunks."""
    sk, pk = keys
    db = generate_random_db(TEST_DB_SIZE, SEC_BYTES)
    # 128-bit test modulus => 14 plaintext bytes per ciphertext; 33-byte
    # auth keys need 3 ciphertext chunks per key-DB slot
    keydb = generate_random_db(TEST_DB_SIZE, 33)
    auth_query, _ = new_authenticated_query(
        db.metadata(), sk, 1, 3, keydb.slot(3)
    )
    with pytest.raises(ValueError, match="exactly one ciphertext"):
        generate_auth_chal_for_query(SEC_BYTES, keydb, auth_query)
