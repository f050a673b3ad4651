"""Pallas scan kernel vs the XLA masked-XOR scan (interpret mode on CPU)."""

import numpy as np

from pir_tpu.ops.pallas_scan import masked_xor_scan_pallas


def test_pallas_scan_matches_direct():
    rng = np.random.default_rng(0)
    h, c = 4096, 1024
    table = rng.integers(0, 1 << 32, size=(h, c), dtype=np.uint32)
    bits = rng.integers(0, 2, size=h, dtype=np.uint8)
    got = np.asarray(
        masked_xor_scan_pallas(table, bits, block_rows=512, block_cols=512,
                               interpret=True)
    )
    want = np.bitwise_xor.reduce(table[bits.astype(bool)], axis=0)
    assert (got == want).all()
