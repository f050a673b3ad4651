"""MXU bit-plane scan vs the direct XOR scan (bit-for-bit)."""

import numpy as np

from pir_tpu.ops.matmul_scan import mxu_batched_scan, pad_rows_u8


def test_mxu_scan_matches_xor():
    rng = np.random.default_rng(0)
    h, b, q = 1 << 12, 96, 5
    table = rng.integers(0, 256, size=(h, b), dtype=np.uint8)
    bits = rng.integers(0, 2, size=(q, h), dtype=np.uint8)

    got = np.asarray(mxu_batched_scan(table, bits, block=1024))
    for i in range(q):
        want = np.bitwise_xor.reduce(table[bits[i].astype(bool)], axis=0)
        assert (got[i] == want).all(), i


def test_mxu_scan_padded_rows():
    rng = np.random.default_rng(1)
    table = rng.integers(0, 256, size=(1000, 12), dtype=np.uint8)
    bits = rng.integers(0, 2, size=(3, 1000), dtype=np.uint8)
    padded = pad_rows_u8(table, 256)
    pbits = np.zeros((3, padded.shape[0]), dtype=np.uint8)
    pbits[:, :1000] = bits
    got = np.asarray(mxu_batched_scan(padded, pbits, block=256))
    for i in range(3):
        want = np.bitwise_xor.reduce(table[bits[i].astype(bool)], axis=0)
        assert (got[i] == want).all()


def test_preplane_scan_matches_xor():
    from pir_tpu.ops.matmul_scan import make_plane_table, mxu_preplane_scan

    rng = np.random.default_rng(2)
    h, b, q = 2048, 24, 4
    table = rng.integers(0, 256, size=(h, b), dtype=np.uint8)
    bits = rng.integers(0, 2, size=(q, h), dtype=np.uint8)
    planes = make_plane_table(table, chunk=300)
    got = np.asarray(mxu_preplane_scan(planes, bits))
    for i in range(q):
        want = np.bitwise_xor.reduce(table[bits[i].astype(bool)], axis=0)
        assert (got[i] == want).all(), i
