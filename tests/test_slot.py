"""Slot data-model tests, mirroring slot_test.go."""

import os
import random

from pir_tpu.slot import (
    Slot,
    get_required_slot_size,
    new_empty_slot,
    new_random_slot,
    new_slot_from_string,
    xor_slots,
)


def test_to_from_string():
    assert new_slot_from_string("test", len("test")).to_string() == "test"
    assert new_slot_from_string("ab", 5).data == bytearray(b"ab\x00\x00\x00")


def test_to_from_int_array():
    """slot_test.go:19-66: round-trip through chunked big-endian ints."""
    rng = random.Random(0)
    for num_bytes in range(1, 40):
        data = bytes(rng.randrange(256) for _ in range(num_bytes))
        slot = Slot(data)
        try:
            slot.to_int_array(0)
            assert False, "expected error for 0 chunks"
        except ValueError:
            pass
        for i in range(1, num_bytes * 2):
            ints, per = slot.to_int_array(i)
            assert len(ints) == i
            rec = Slot.from_int_array(ints, num_bytes, per)
            assert rec.equal(slot), (num_bytes, i)


def test_compare_matches_string_order():
    """slot_test.go:87-120."""
    rng = random.Random(1)
    for num_bytes in range(1, 8):
        a = str(rng.randrange(2 ** (num_bytes * 8)))
        b = str(rng.randrange(2 ** (num_bytes * 8)))
        sa = new_slot_from_string(a, max(len(a), len(b)))
        sb = new_slot_from_string(b, max(len(a), len(b)))
        want = (a > b) - (a < b)
        # equal-length zero-padded slots compare like the padded strings
        pa, pb = sa.to_string(), sb.to_string()
        assert ((pa > pb) - (pa < pb)) == sa.compare(sb)
        del want


def test_xor_truncates_to_shorter():
    a = Slot(b"\x01\x02\x03")
    b = Slot(b"\xff\xff")
    xor_slots(a, b)
    assert bytes(a.data) == b"\xfe\xfd\x03"
    c = Slot(b"\x0f")
    d = Slot(b"\xf0\xaa\xbb")
    xor_slots(c, d)
    assert bytes(c.data) == b"\xff"


def test_constructors_and_required_size():
    assert len(new_random_slot(9).data) == 9
    assert new_empty_slot(4).data == bytearray(4)
    assert get_required_slot_size(["a", "abc", "ab"]) == 3
