"""Shared-variant ASPIR completeness & soundness (aspir_test.go:60-111)."""

import random

from pir_tpu.aspir_shared import (
    check_audit,
    generate_audit_for_shared_query,
    new_authenticated_index_query_shares,
)
from pir_tpu.database import generate_random_db
from pir_tpu.server import TpuPirServer

SEC_BYTES = 8  # StatisticalSecurityBytes (test_constants.go:16)
DB_SIZE = 1 << 10


def test_shared_aspir_completeness():
    rng = random.Random(0)
    keydb = generate_random_db(DB_SIZE, SEC_BYTES)
    for _ in range(8):
        index = rng.randrange(DB_SIZE)
        auth_key = keydb.slot(index)
        shares = new_authenticated_index_query_shares(
            keydb.metadata(), index, auth_key, 1, 2
        )
        audits = [generate_audit_for_shared_query(keydb, s) for s in shares]
        assert check_audit(*audits)


def test_shared_aspir_soundness():
    """Wrong auth key => audit must fail (aspir_test.go:87-111)."""
    rng = random.Random(1)
    keydb = generate_random_db(DB_SIZE, SEC_BYTES)
    for _ in range(8):
        index = rng.randrange(DB_SIZE - 1) + 1
        auth_key = keydb.slot(0)  # key for a *different* row
        shares = new_authenticated_index_query_shares(
            keydb.metadata(), index, auth_key, 1, 2
        )
        audits = [generate_audit_for_shared_query(keydb, s) for s in shares]
        assert not check_audit(*audits)


def test_shared_aspir_device_expansion():
    """Audit bits expanded on device agree with host (bits-reuse path)."""
    rng = random.Random(2)
    keydb = generate_random_db(DB_SIZE, SEC_BYTES)
    server = TpuPirServer(keydb)
    index = rng.randrange(DB_SIZE)
    shares = new_authenticated_index_query_shares(
        keydb.metadata(), index, keydb.slot(index), 1, 2
    )
    audits = [
        generate_audit_for_shared_query(keydb, s, server=server) for s in shares
    ]
    assert check_audit(*audits)


def test_shared_aspir_fast_mode():
    """Audit works with early-termination (fast) query shares."""
    rng = random.Random(3)
    keydb = generate_random_db(DB_SIZE, SEC_BYTES)
    index = rng.randrange(DB_SIZE)
    shares = new_authenticated_index_query_shares(
        keydb.metadata(), index, keydb.slot(index), 1, 2, fast=True
    )
    audits = [generate_audit_for_shared_query(keydb, s) for s in shares]
    assert check_audit(*audits)
    # wrong key fails
    shares = new_authenticated_index_query_shares(
        keydb.metadata(), (index + 1) % DB_SIZE, keydb.slot(index), 1, 2,
        fast=True,
    )
    audits = [generate_audit_for_shared_query(keydb, s) for s in shares]
    assert not check_audit(*audits)
