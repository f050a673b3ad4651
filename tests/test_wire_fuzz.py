"""Deserializer fuzzing: corrupted wire bytes must fail cleanly.

The service shell turns any deserializer exception into an OP_ERROR
frame (service.py handler), so the robustness contract for wire.py is
"raise, never hang or crash the interpreter". Mutations: truncations,
single-byte flips, and corrupted leading count/length fields, over the
main client->server message types.
"""

import numpy as np
import pytest

from pir_tpu import wire
from pir_tpu.database import generate_random_db
from pir_tpu.query import new_index_query_shares, new_keyword_query_shares


def _blobs():
    db = generate_random_db(1 << 8, 6)
    md = db.metadata()
    out = {
        "share_compat": wire.serialize_query_share(
            new_index_query_shares(md, 7, 1, 2)[0]),
        "share_fast": wire.serialize_query_share(
            new_index_query_shares(md, 7, 1, 2, fast=True)[0]),
        "share_mp": wire.serialize_query_share(
            new_index_query_shares(md, 7, 1, 3)[0]),
        "share_kw": wire.serialize_query_share(
            new_keyword_query_shares(md, 1234, 1, 2)[0]),
        "metadata": wire.serialize_metadata(6, 1 << 8, 3),
    }
    return out


def _mutations(blob: bytes, rng: np.random.Generator):
    yield b""
    yield blob[:1]
    yield blob[: len(blob) // 2]
    yield blob[:-1]
    yield blob + b"\x00" * 7
    for _ in range(40):  # random single-byte flips
        b = bytearray(blob)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        yield bytes(b)
    for off in range(0, min(len(blob) - 4, 24)):  # corrupt early counts
        b = bytearray(blob)
        b[off:off + 4] = (0xFFFFFF7F).to_bytes(4, "little")
        yield bytes(b)


@pytest.mark.parametrize("name", list(_blobs()))
def test_fuzz_deserializers(name):
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    blob = _blobs()[name]
    de = (wire.deserialize_metadata if name == "metadata"
          else wire.deserialize_query_share)
    ok = bad = 0
    for mut in _mutations(blob, rng):
        try:
            de(mut)
            ok += 1
        except MemoryError:
            bad += 1  # absurd count field: allocation refused, still clean
        except Exception:
            bad += 1
    # both outcomes are fine; reaching here means nothing hung or crashed
    assert ok + bad > 40
