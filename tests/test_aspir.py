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
