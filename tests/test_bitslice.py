"""Machine verification of the bitsliced AES building blocks.

Every algebraic component is checked exhaustively or against the OpenSSL
AES used by the host golden model, so the TPU kernel provably computes
real AES-128 (required for bit-for-bit parity with the Go reference DPF).
"""

import numpy as np
import jax.numpy as jnp

from pir_tpu.dpf import bitslice as bs
from pir_tpu.dpf.aes_host import SBOX, EcbCipher, key_schedule, prf_blocks


def _bytes_to_bitplanes(vals: np.ndarray) -> jnp.ndarray:
    """(n,) uint8 -> (8, ceil(n/32)) uint32 planes (lane packing)."""
    n = len(vals)
    nw = -(-n // 32)
    padded = np.zeros(nw * 32, dtype=np.uint8)
    padded[:n] = vals
    bits = ((padded[:, None] >> np.arange(8)) & 1).T.astype(np.uint32)  # (8, N)
    words = (bits.reshape(8, nw, 32) << np.arange(32, dtype=np.uint32)).sum(
        axis=-1, dtype=np.uint32
    )
    return jnp.asarray(words)


def _bitplanes_to_bytes(planes, n: int) -> np.ndarray:
    planes = np.asarray(planes)
    bits = (planes[..., None] >> np.arange(32, dtype=np.uint32)) & 1
    bits = bits.reshape(8, -1)[:, :n]
    return (bits.astype(np.uint8) << np.arange(8, dtype=np.uint8)[:, None]).sum(
        axis=0, dtype=np.uint8
    )


def test_gf_inv_and_sbox_exhaustive():
    vals = np.arange(256, dtype=np.uint8)
    planes = _bytes_to_bitplanes(vals)
    x = [planes[k] for k in range(8)]

    inv = bs.gf_inv_planes(x)
    inv_bytes = _bitplanes_to_bytes(jnp.stack(inv), 256)
    want_inv = np.array([0] + [bs._gf_pow_int(v, 254) for v in range(1, 256)],
                        dtype=np.uint8)
    assert (inv_bytes == want_inv).all()

    # full S-box via the (8, 16, ...) state entry points: both the
    # Boyar-Peralta circuit (production) and the algebraic derivation
    state = jnp.stack([planes] * 16, axis=1).reshape(8, 16, -1)
    for impl in (bs.sub_bytes, bs.sub_bytes_algebraic):
        sboxed = impl(state)
        got = _bitplanes_to_bytes(np.asarray(sboxed)[:, 3, :], 256)
        assert (got == SBOX[vals]).all(), impl.__name__


def test_gf_mul_random():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, 1024, dtype=np.uint8)
    b = rng.integers(0, 256, 1024, dtype=np.uint8)
    pa = _bytes_to_bitplanes(a)
    pb = _bytes_to_bitplanes(b)
    prod = bs.gf_mul_planes([pa[k] for k in range(8)], [pb[k] for k in range(8)])
    got = _bitplanes_to_bytes(jnp.stack(prod), 1024)
    want = np.array([bs._gf_mul_int(int(x), int(y)) for x, y in zip(a, b)],
                    dtype=np.uint8)
    assert (got == want).all()


def test_block_plane_roundtrip():
    rng = np.random.default_rng(1)
    blocks = rng.integers(0, 256, size=(100, 16), dtype=np.uint8)
    planes = bs.blocks_to_planes(blocks)
    assert planes.shape == (8, 16, 4)
    back = bs.planes_to_blocks(planes, 100)
    assert (back == blocks).all()


def test_aes_encrypt_matches_openssl():
    rng = np.random.default_rng(2)
    for trial in range(3):
        key = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        blocks = rng.integers(0, 256, size=(77, 16), dtype=np.uint8)

        want = EcbCipher(key).encrypt_blocks(blocks)

        planes = jnp.asarray(bs.blocks_to_planes(blocks))
        rk = bs.key_masks(key_schedule(key))  # (11, 8, 16)
        got_planes = bs.aes_encrypt_planes(planes, jnp.asarray(rk[..., None]))
        got = bs.planes_to_blocks(got_planes, 77)
        assert (got == want).all()


def test_key_masks_multi_slot_broadcast():
    """Three PRF keys encrypted in one bitsliced pass (the MMO triple)."""
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 256, size=(3, 16), dtype=np.uint8)
    blocks = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)

    ciphers = [EcbCipher(k.tobytes()) for k in keys]
    want = prf_blocks(blocks, ciphers, 3)  # (64, 3, 16)

    planes = jnp.asarray(bs.blocks_to_planes(blocks))[:, None, :, :]  # (8,1,16,2)
    rks = np.stack([key_schedule(k.tobytes()) for k in keys])  # (3, 11, 16)
    # slot axis before byte axis (see device._prf_triple)
    rk_masks = jnp.asarray(
        np.ascontiguousarray(bs.key_masks(rks).transpose(0, 1, 3, 2))[..., None]
    )  # (11, 8, 3, 16, 1)
    enc = bs.aes_encrypt_planes(planes, rk_masks)  # (8, 3, 16, 2)
    out = enc ^ planes  # MMO: AES_k(x) ^ x

    for s in range(3):
        got = bs.planes_to_blocks(np.asarray(out)[:, s, :, :], 64)
        assert (got == want[:, s, :]).all(), s
