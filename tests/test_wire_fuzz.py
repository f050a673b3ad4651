"""Deserializer fuzzing: corrupted wire bytes must fail cleanly AND fast.

The service shell turns any deserializer exception into an OP_ERROR
frame (service.py handler), so the robustness contract for wire.py is
"raise, never hang or crash the interpreter". Mutations: truncations,
single-byte flips (including an exhaustive sweep of the flags byte,
which routes between key deserializers), and huge count/length fields
at every offset. Each mutation also carries a wall-clock budget: a u32
count driving a slicing loop once spun for ~10^9 iterations before the
_need() bounds were added, so "fails cleanly" explicitly includes
"fails in bounded time".

Seeds are zlib.crc32-derived (str hash() is salted per process, which
made earlier runs non-reproducible).
"""

import time
import zlib

import numpy as np
import pytest

from pir_tpu import wire
from pir_tpu.database import generate_random_db
from pir_tpu.query import new_index_query_shares, new_keyword_query_shares

# generous bound: honest parses are microseconds; the count-loop DoS ran
# for minutes-to-hours. Keep slack for contended CI cores.
MUTATION_TIME_BUDGET_S = 2.0


import functools


@functools.lru_cache(maxsize=1)
def _blobs():
    db = generate_random_db(1 << 8, 6)
    md = db.metadata()
    shares = new_index_query_shares(md, 7, 1, 2)
    from pir_tpu.server import private_secret_shared_query

    result = private_secret_shared_query(db, shares[0])
    out = {
        "share_compat": wire.serialize_query_share(shares[0]),
        "share_fast": wire.serialize_query_share(
            new_index_query_shares(md, 7, 1, 2, fast=True)[0]),
        "share_mp": wire.serialize_query_share(
            new_index_query_shares(md, 7, 1, 3)[0]),
        "share_kw": wire.serialize_query_share(
            new_keyword_query_shares(md, 1234, 1, 2)[0]),
        "metadata": wire.serialize_metadata(6, 1 << 8, 3),
        "shared_result": wire.serialize_shared_result(result),
    }
    return out


_DESERIALIZERS = {
    "metadata": wire.deserialize_metadata,
    "shared_result": wire.deserialize_shared_result,
}


def _mutations(blob: bytes, rng: np.random.Generator):
    yield b""
    yield blob[:1]
    yield blob[: len(blob) // 2]
    yield blob[:-1]
    yield blob + b"\x00" * 7
    for v in range(256):  # exhaustive flags/first-payload-byte sweep
        b = bytearray(blob)
        if len(b) > 6:
            b[6] = v
            yield bytes(b)
    for _ in range(40):  # random single-byte flips
        b = bytearray(blob)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        yield bytes(b)
    # huge count/length fields at EVERY offset (not just the first 24):
    # any u32 read as a count must be bounded by the remaining payload
    for huge in (0xFFFFFF7F, 0xFFFFFFFF, 0x7FFFFFFF):
        for off in range(0, len(blob) - 4):
            b = bytearray(blob)
            b[off:off + 4] = huge.to_bytes(4, "little")
            yield bytes(b)


@pytest.mark.parametrize("name", list(_blobs()))
def test_fuzz_deserializers(name):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    blob = _blobs()[name]
    de = _DESERIALIZERS.get(name, wire.deserialize_query_share)
    ok = bad = 0
    for mut in _mutations(blob, rng):
        t0 = time.monotonic()
        try:
            de(mut)
            ok += 1
        except MemoryError:
            bad += 1  # absurd count field: allocation refused, still clean
        except Exception:
            bad += 1
        dt = time.monotonic() - t0
        assert dt < MUTATION_TIME_BUDGET_S, (
            f"{name}: mutation took {dt:.1f}s — unbounded count loop?"
        )
    # both outcomes are fine; reaching here means nothing hung or crashed
    assert ok + bad > 40
