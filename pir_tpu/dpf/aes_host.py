"""Host-side AES-128 utilities for the DPF fixed-key PRG.

The reference DPF uses a Matyas–Meyer–Oseas PRG built from ``initPRFLen=4``
fixed AES-128 ciphers: ``out_i = AES_{k_i}(x) ^ x`` (dpf/common.go:60-75).
On the host we use the ``cryptography`` package (OpenSSL, AES-NI) and batch
blocks through ECB for vectorised exact evaluation; the key schedule is
also computed here in numpy so the TPU bitsliced kernel can consume
precomputed round keys.
"""

from __future__ import annotations

import numpy as np
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

INIT_PRF_LEN = 4  # dpf/common.go:10
BLOCK_SIZE = 16

# FIPS-197 S-box.
SBOX = np.array([
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b,
    0xfe, 0xd7, 0xab, 0x76, 0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0,
    0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0, 0xb7, 0xfd, 0x93, 0x26,
    0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2,
    0xeb, 0x27, 0xb2, 0x75, 0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0,
    0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84, 0x53, 0xd1, 0x00, 0xed,
    0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f,
    0x50, 0x3c, 0x9f, 0xa8, 0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5,
    0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2, 0xcd, 0x0c, 0x13, 0xec,
    0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14,
    0xde, 0x5e, 0x0b, 0xdb, 0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c,
    0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79, 0xe7, 0xc8, 0x37, 0x6d,
    0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f,
    0x4b, 0xbd, 0x8b, 0x8a, 0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e,
    0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e, 0xe1, 0xf8, 0x98, 0x11,
    0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f,
    0xb0, 0x54, 0xbb, 0x16,
], dtype=np.uint8)

RCON = np.array([0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36],
                dtype=np.uint8)
RCON_B = bytes(RCON)
_SBOX_BYTES = bytes(SBOX)


def key_schedule(key: bytes | np.ndarray) -> np.ndarray:
    """AES-128 key expansion -> (11, 16) uint8 round keys (FIPS-197 §5.2).

    Pure-python inner loop: this runs 4-8x per query on the serving hot
    path, where numpy small-array overhead dominated.
    """
    kb = bytes(key) if not isinstance(key, np.ndarray) else key.tobytes()
    assert len(kb) == 16
    sbox = _SBOX_BYTES
    w = [kb[4 * i:4 * i + 4] for i in range(4)]
    for i in range(4, 44):
        t = w[i - 1]
        if i % 4 == 0:
            t = bytes((
                sbox[t[1]] ^ RCON_B[i // 4 - 1], sbox[t[2]], sbox[t[3]],
                sbox[t[0]],
            ))
        prev = w[i - 4]
        w.append(bytes((prev[0] ^ t[0], prev[1] ^ t[1], prev[2] ^ t[2],
                        prev[3] ^ t[3])))
    return np.frombuffer(b"".join(w), dtype=np.uint8).reshape(11, 16)


def key_schedule_batch(keys: np.ndarray) -> np.ndarray:
    """Vectorised AES-128 key expansion: (K, 16) uint8 -> (K, 11, 16)."""
    keys = np.asarray(keys, dtype=np.uint8)
    k = keys.shape[0]
    w = np.zeros((k, 44, 4), np.uint8)
    w[:, :4] = keys.reshape(k, 4, 4)
    for i in range(4, 44):
        t = w[:, i - 1]
        if i % 4 == 0:
            t = SBOX[np.roll(t, -1, axis=1)]
            t[:, 0] ^= RCON[i // 4 - 1]
        w[:, i] = w[:, i - 4] ^ t
    return w.reshape(k, 11, 16)


class EcbCipher:
    """Batched AES-128-ECB encryption of many 16-byte blocks at once."""

    def __init__(self, key: bytes):
        self._cipher = Cipher(algorithms.AES(bytes(key)), modes.ECB())
        self.key = bytes(key)
        self._round_keys = None
        # one long-lived ECB context: update() is block-independent for
        # ECB, and context creation dominated the per-query host cost.
        # (Cipher objects are per-query / single-threaded by construction.)
        self._enc = self._cipher.encryptor()

    @property
    def round_keys(self) -> np.ndarray:
        if self._round_keys is None:
            self._round_keys = key_schedule(self.key)
        return self._round_keys

    def encrypt_blocks(self, blocks: np.ndarray) -> np.ndarray:
        """(n, 16) uint8 -> (n, 16) uint8 of AES_k(block)."""
        out = self._enc.update(blocks.tobytes())
        return np.frombuffer(out, dtype=np.uint8).reshape(blocks.shape)


def prf_blocks(x: np.ndarray, ciphers: list[EcbCipher], num_blocks: int) -> np.ndarray:
    """Vectorised fixed-key MMO PRG (dpf/common.go:60-75).

    Args:
      x: (n, 16) uint8 input blocks.
      ciphers: the fixed-key ciphers.
      num_blocks: how many 16-byte output blocks per input.
    Returns (n, num_blocks, 16) uint8 with out[:, i] = AES_{k_i}(x) ^ x.

    For num_blocks > len(ciphers) (reachable only from the multi-party
    path, where the reference would index past its 4 fixed ciphers and
    panic — dpf/common.go:62-67 with dpf/server.go:131), the PRG extends
    as out_i = AES_{k_{i mod 4}}(x ^ ctr) ^ x ^ ctr with ctr = i // 4 as
    a little-endian block; identical to the reference for i < 4.
    """
    n = x.shape[0]
    k = len(ciphers)
    out = np.empty((n, num_blocks, 16), dtype=np.uint8)
    for i in range(num_blocks):
        if i < k:
            out[:, i] = ciphers[i].encrypt_blocks(x) ^ x
        else:
            ctr = np.zeros(16, dtype=np.uint8)
            ctr_val = i // k
            ctr[:8] = np.frombuffer((ctr_val).to_bytes(8, "little"), np.uint8)
            xi = x ^ ctr[None, :]
            out[:, i] = ciphers[i % k].encrypt_blocks(xi) ^ xi
    return out
