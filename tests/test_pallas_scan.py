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


def test_scan_tile_sizes_vmem_budget():
    """Tile choices stay inside the 16 MB scoped-VMEM budget and keep the
    frozen q<=512 shapes (cached executables depend on them)."""
    from pir_tpu.models.pipeline import scan_tile_sizes

    rows, b = 1 << 20, 1024
    assert scan_tile_sizes(512, rows, b) == (2048, 512)  # frozen
    assert scan_tile_sizes(256, rows, b) == (2048, 512)  # frozen
    assert scan_tile_sizes(1024, rows, b) == (1024, 256)
    assert scan_tile_sizes(2048, rows, b) == (512, 128)
    # worst-case VMEM estimate: bits (q, br) + table + 8 planes (br, bc)
    # + dot/acc/folded (3x q*bc*4)
    for q in (256, 512, 1024, 2048):
        br, bc = scan_tile_sizes(q, rows, b)
        est = q * br + 9 * br * bc + 3 * 4 * q * bc
        assert est < 16 * 2**20, (q, br, bc, est)
    # non-power-of-two columns fall back to full width
    assert scan_tile_sizes(512, rows, 96)[1] == 96
