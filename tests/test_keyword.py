"""Keyword PIR end-to-end, mirroring keyword_test.go:25-102."""

import random

import pytest

from pir_tpu import query as q
from pir_tpu.keyword import (
    PrivateSqrtST,
    new_private_sqrt_st,
    pad_to_power_of_2,
    pad_to_sqrt,
)
from pir_tpu.server import TpuPirServer


def _build(rng):
    num_strings = rng.randrange(1 << 10) + 100
    data = [str(i) for i in range(num_strings)]
    data = pad_to_sqrt(data)
    data.sort()
    data.reverse()  # reverse-sorted, as argsort.ReverseStrings in the test
    sqst = new_private_sqrt_st()
    sqst.build_for_data(data)
    return sqst, data


def test_keyword_query_sqrt_st_host():
    rng = random.Random(0)
    for _ in range(2):
        sqst, data = _build(rng)
        md = sqst.get_second_layer_metadata()
        assert len(sqst.first_layer) == sqst.width

        for i in rng.sample(range(len(data)), 25):
            key = data[i]
            row_index = sqst.find_bucket(key)
            shares = q.new_index_query_shares(md, row_index, sqst.height, 2)
            res_a = sqst.private_query(shares[0])
            res_b = sqst.private_query(shares[1])
            res = q.recover([res_a, res_b])
            assert len(res) == len(sqst.first_layer)

            col_index = sqst.find_in_row(res, key)
            index = row_index * sqst.width + col_index
            assert index == i or data[index] == data[i], (i, index)


def test_keyword_query_sqrt_st_device():
    rng = random.Random(1)
    sqst, data = _build(rng)
    md = sqst.get_second_layer_metadata()
    server = TpuPirServer(sqst.second_layer)

    for i in rng.sample(range(len(data)), 6):
        key = data[i]
        row_index = sqst.find_bucket(key)
        shares = q.new_index_query_shares(md, row_index, sqst.height, 2)
        res = q.recover([sqst.private_query(s, server) for s in shares])
        col_index = sqst.find_in_row(res, key)
        index = row_index * sqst.width + col_index
        assert index == i or data[index] == data[i], (i, index)


def test_build_rejects_bad_input():
    sqst = PrivateSqrtST()
    with pytest.raises(ValueError, match="perfect square"):
        sqst.build_for_data(["c", "b", "a"])  # len 3 not square
    with pytest.raises(ValueError, match="not sorted"):
        sqst.build_for_data(["a", "b", "c", "d"])  # ascending


def test_padding_helpers():
    assert len(pad_to_power_of_2(["a"] * 5)) == 8
    assert len(pad_to_sqrt(["a"] * 5)) == 9
    assert pad_to_sqrt(["a"] * 5)[8] == "\x00"
