"""Paillier level-1/2 crypto unit tests."""

import secrets

import pytest

from pir_tpu.crypto import paillier as pl


@pytest.fixture(scope="module")
def keys():
    return pl.keygen(256)


def test_encrypt_decrypt_level1(keys):
    sk, pk = keys
    for _ in range(10):
        m = secrets.randbelow(pk.n)
        assert sk.decrypt(pk.encrypt(m)) == m
    # fixed-randomness form used by null ciphertexts
    assert sk.decrypt(pk.null_ciphertext(pl.ENC_LEVEL_ONE)) == 0


def test_encrypt_decrypt_level2(keys):
    sk, pk = keys
    for _ in range(6):
        m = secrets.randbelow(pk.n2)
        ct = pk.encrypt_at_level(m, pl.ENC_LEVEL_TWO)
        assert sk.decrypt_level2(ct) == m


def test_homomorphism(keys):
    sk, pk = keys
    a, b = secrets.randbelow(1 << 64), secrets.randbelow(1 << 64)
    k = secrets.randbelow(1 << 32)
    ct = pk.add(pk.encrypt(a), pk.encrypt(b))
    assert sk.decrypt(ct) == (a + b) % pk.n
    assert sk.decrypt(pk.const_mult(pk.encrypt(a), k)) == a * k % pk.n
    # level 2
    ct2 = pk.add(
        pk.encrypt_at_level(a, pl.ENC_LEVEL_TWO),
        pk.encrypt_at_level(b, pl.ENC_LEVEL_TWO),
    )
    assert sk.decrypt_level2(ct2) == (a + b) % pk.n2


def test_nested_encrypt_decrypt(keys):
    sk, pk = keys
    m = secrets.randbelow(1 << 48)
    inner = pk.encrypt(m)
    outer = pk.encrypt_at_level(inner.c, pl.ENC_LEVEL_TWO)
    assert sk.nested_decrypt(outer) == m
    inner_rec = sk.decrypt_nested_layer(outer)
    assert inner_rec.c == inner.c


def test_nested_sub(keys):
    sk, pk = keys
    m, t = 977, 455
    chal = pk.encrypt_at_level(pk.encrypt(m).c, pl.ENC_LEVEL_TWO)
    token = pk.encrypt(t)
    diff = pk.nested_sub(chal, token)
    assert sk.nested_decrypt(diff) == (m - t) % pk.n
    # sk.nested_sub (aspir.go:117) is the same public operation
    assert sk.nested_decrypt(sk.nested_sub(chal, token)) == (m - t) % pk.n


def test_extract_randomness_roundtrip(keys):
    sk, pk = keys
    r = pk.random_r()
    s = pk.random_r()
    inner = pk.encrypt_with_r_at_level(0, r, pl.ENC_LEVEL_ONE)
    outer = pk.encrypt_with_r_at_level(inner.c, s, pl.ENC_LEVEL_TWO)
    assert sk.extract_randomness(inner) == r % pk.n
    assert sk.extract_randomness(outer) == s % pk.n
    # recompute-check used by AuthCheck (aspir.go:201-205)
    chk = pk.encrypt_with_r_at_level(0, sk.extract_randomness(inner), pl.ENC_LEVEL_ONE)
    chk2 = pk.encrypt_with_r_at_level(chk.c, sk.extract_randomness(outer), pl.ENC_LEVEL_TWO)
    assert chk2.c == outer.c


def test_nested_randomize_and_ddleq(keys):
    sk, pk = keys
    inner = pk.encrypt(0)
    ct1 = pk.encrypt_at_level(inner.c, pl.ENC_LEVEL_TWO)
    ct2, a, b = sk.nested_randomize(ct1)
    # inner plaintext preserved
    assert sk.nested_decrypt(ct2) == 0
    # randomness extraction consistent with a fresh double-enc of zero
    r = sk.extract_randomness(sk.decrypt_nested_layer(ct2))
    s = sk.extract_randomness(ct2)
    chk = pk.encrypt_with_r_at_level(0, r, pl.ENC_LEVEL_ONE)
    chk2 = pk.encrypt_with_r_at_level(chk.c, s, pl.ENC_LEVEL_TWO)
    assert chk2.c == ct2.c

    proof = sk.prove_ddleq(2, ct1, ct2, a, b)
    assert pk.verify_ddleq(ct1, ct2, proof)
    # proof must not verify against a different ct1
    other = pk.encrypt_at_level(pk.encrypt(5).c, pl.ENC_LEVEL_TWO)
    assert not pk.verify_ddleq(other, ct2, proof)


def test_ddleq_rejects_wrong_rerandomization(keys):
    sk, pk = keys
    inner = pk.encrypt(3)
    ct1 = pk.encrypt_at_level(inner.c, pl.ENC_LEVEL_TWO)
    ct2, a, b = sk.nested_randomize(ct1)
    proof = sk.prove_ddleq(2, ct1, ct2, a, b)
    # tamper with one commitment
    proof.commitments[0] = (proof.commitments[0] * 2) % pk.n3
    assert not pk.verify_ddleq(ct1, ct2, proof)
