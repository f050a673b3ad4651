"""Device DPF expansion vs the host golden model (bit-for-bit)."""

import random

import numpy as np

from pir_tpu.dpf import device as dev
from pir_tpu.dpf import host as dpf
from pir_tpu.utils.bits import num_bits_for_height


def _check_height(height: int, rng: random.Random, min_device_nodes=32):
    nb = num_bits_for_height(height)
    special = rng.randrange(height)
    client = dpf.client_initialize(nb)
    keys = dpf.generate_two_server(client, special, 1)
    server = dpf.server_initialize(client.prf_keys, client.num_bits)

    sel = None
    for snum in (0, 1):
        want = dpf.eval_full_domain_bits(server, snum, keys[snum], height)
        dkey = dev.make_device_key(server, keys[snum], height, min_device_nodes)
        got = np.asarray(dev.expand_query_bits(dkey))
        assert got.shape == (height,)
        assert (got.astype(bool) == want).all(), (height, snum)
        sel = got.astype(bool) if sel is None else sel ^ got.astype(bool)
    assert sel[special] and sel.sum() == 1


def test_expand_powers_of_two():
    rng = random.Random(0)
    for height in (32, 64, 1024, 4096):
        _check_height(height, rng)


def test_expand_odd_heights():
    rng = random.Random(1)
    for height in (33, 100, 1000, 777, 2049):
        _check_height(height, rng)


def test_expand_tiny_heights_host_fallback():
    rng = random.Random(2)
    for height in (1, 2, 3, 7, 16, 31):
        _check_height(height, rng)


def test_point_eval_keyword_domain():
    """Batched point eval on a 32-bit keyword domain (db.go:119-135)."""
    rng = random.Random(3)
    n = 500
    keywords = np.array([rng.randrange(1 << 32) for _ in range(n)], dtype=np.uint64)
    target_kw = int(keywords[123])

    client = dpf.client_initialize(32)
    keys = dpf.generate_two_server(client, target_kw, 1)
    server = dpf.server_initialize(client.prf_keys, client.num_bits)

    xplanes = dev.pack_point_bit_planes(keywords, 32)
    sel = None
    for snum in (0, 1):
        dkey = dev.make_device_point_key(server, keys[snum])
        got = np.asarray(dev.eval_points_bits(dkey, xplanes, n)).astype(bool)
        # golden: per-point host eval
        for i in rng.sample(range(n), 10) + [123]:
            v = dpf.evaluate_2p(server, snum, keys[snum], int(keywords[i]))
            assert got[i] == ((v % 2) == 0), i
        sel = got if sel is None else sel ^ got
    # target keyword selected; others (distinct keywords) not
    assert sel[123]
    dup = keywords == keywords[123]
    assert (sel == dup).all()
