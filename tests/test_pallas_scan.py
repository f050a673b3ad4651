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


def test_packed_scan_matches_unpacked():
    """mxu_batched_scan_packed_pallas == mxu_batched_scan_pallas with the
    bits unpacked (bit j of word w selects row 32w+j)."""
    import numpy as np

    from pir_tpu.ops.pallas_scan import (
        mxu_batched_scan_packed_pallas,
        mxu_batched_scan_pallas,
    )

    rng = np.random.default_rng(11)
    for h, b, q, br, bc in ((4096, 256, 8, 512, 128), (2048, 256, 3, 2048, 128),
                            (8192, 512, 16, 1024, 256)):
        table = rng.integers(0, 256, size=(h, b), dtype=np.uint8)
        packed = rng.integers(0, 1 << 32, size=(q, h // 32), dtype=np.uint64
                              ).astype(np.uint32)
        shifts = np.arange(32, dtype=np.uint32)
        bits = ((packed[:, :, None] >> shifts) & 1).astype(np.uint8
                                                           ).reshape(q, h)
        want = np.asarray(mxu_batched_scan_pallas(
            table, bits, block_rows=br, block_cols=bc, interpret=True))
        got = np.asarray(mxu_batched_scan_packed_pallas(
            table, packed.T.copy(), block_rows=br, block_cols=bc,
            interpret=True))
        assert (got == want).all(), (h, b, q)
