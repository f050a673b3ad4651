"""Steady-state serving stream over TCP (OP_STREAM_SUBMIT / OP_STREAM_FLUSH).

The stream's wire contract — submit(batch k) answers batch k-1, flush
drains the last batch — must hold on every engine: the TPU engine rides
TpuPirServer.fast_serving_stream (the fused scan+expand kernel,
ops/pallas_fused.py, interpret mode on CPU here), and other engines
emulate the one-batch lag in the service shell so clients never care
which engine answers.
"""

import numpy as np
import pytest

from pir_tpu.config import PirConfig
from pir_tpu.database import generate_random_db
from pir_tpu.service import PirClient, PirService
from pir_tpu.slot import Slot


def _check(db, idxs, got):
    assert len(got) == len(idxs)
    for idx, slots in zip(idxs, got):
        assert Slot(db.data[idx].tobytes()).equal(slots[0])


def _run_stream(db, services, batches, forbid_emulation=False):
    if forbid_emulation:
        # the emulated path answers through _answer_batch; the fused
        # device stream never touches it
        def boom(shares):
            raise AssertionError("stream fell back to emulation")

        for s in services:
            s._answer_batch = boom
    client = PirClient([s.address for s in services])
    try:
        stream = client.open_stream()
        outs = []
        for i, idxs in enumerate(batches):
            res = stream.submit(idxs)
            assert (res is None) == (i == 0)
            if res is not None:
                outs.append(res)
        outs.append(stream.flush())
        assert stream.flush() is None  # empty stream drains to None
        for idxs, got in zip(batches, outs):
            _check(db, idxs, got)
        # the connection is still usable for regular RPCs afterwards
        res = client.query_index(batches[0][0], fast=True)
        assert Slot(db.data[batches[0][0]].tobytes()).equal(res[0])
        # and a fresh stream can start on the same connection
        s2 = stream.submit(batches[0])
        assert s2 is None
        _check(db, batches[0], s2 or stream.flush())
    finally:
        client.close()


def test_stream_emulated_on_host_engine():
    rng = np.random.default_rng(3)
    db = generate_random_db(1 << 9, 8)
    services = [PirService(db).start() for _ in range(2)]
    try:
        batches = [[int(i) for i in rng.integers(0, db.db_size, size=4)]
                   for _ in range(3)]
        _run_stream(db, services, batches)
    finally:
        for s in services:
            s.close()


def test_stream_group_size():
    """Streams honor group_size: each recovered query is the whole
    group of adjacent slots (query.go:21 semantics)."""
    db = generate_random_db(1 << 9, 8)
    services = [PirService(db).start() for _ in range(2)]
    try:
        client = PirClient([s.address for s in services])
        stream = client.open_stream(group_size=2)
        rows = [3, 200]  # row r covers slots [2r, 2r+1]
        assert stream.submit(rows) is None
        res = stream.flush()
        for r, slots in zip(rows, res):
            assert len(slots) == 2
            for c in (0, 1):
                assert bytes(slots[c].data) == db.data[2 * r + c].tobytes()
        client.close()
    finally:
        for s in services:
            s.close()


def test_stream_fused_on_tpu_engine():
    """End-to-end over real sockets through the fused overlap kernel
    (interpret mode on CPU; compiled-TPU behavior is benchmarks_fused.py's
    on-chip A/B). Emulation fallback is forbidden, so this fails if the
    service stops routing streams through fast_serving_stream."""
    rng = np.random.default_rng(5)
    db = generate_random_db(1 << 15, 8)
    cfg = PirConfig(engine="tpu", use_pallas=True)
    services = [PirService(db, config=cfg).start() for _ in range(2)]
    try:
        batches = [[int(i) for i in rng.integers(0, db.db_size, size=16)]
                   for _ in range(3)]
        _run_stream(db, services, batches, forbid_emulation=True)
    finally:
        for s in services:
            s.close()


def test_stream_shape_mismatch_is_recoverable():
    """In fused mode a batch of a different size is refused without
    desyncing the stream: the pending batch stays answerable."""
    rng = np.random.default_rng(7)
    db = generate_random_db(1 << 15, 8)
    cfg = PirConfig(engine="tpu", use_pallas=True)
    services = [PirService(db, config=cfg).start() for _ in range(2)]
    try:
        client = PirClient([s.address for s in services])
        try:
            stream = client.open_stream()
            b0 = [int(i) for i in rng.integers(0, db.db_size, size=16)]
            assert stream.submit(b0) is None
            with pytest.raises(RuntimeError, match="one shape"):
                stream.submit(b0[:4])
            b1 = [int(i) for i in rng.integers(0, db.db_size, size=16)]
            _check(db, b0, stream.submit(b1))
            _check(db, b1, stream.flush())
        finally:
            client.close()
    finally:
        for s in services:
            s.close()
