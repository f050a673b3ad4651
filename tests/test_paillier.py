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


def test_sk_crt_powmod_bit_identical(keys):
    """_powmod_batch_sk / _powmod_sk (the CRT fast path behind every
    sk-side decryption and DDLEQ prove batch) must equal plain
    pow(b, e, N^s) bit for bit — it is a mathematical identity
    (CRT + exponent reduction mod phi for unit bases), not an
    approximation."""
    sk, pk = keys
    rng = secrets.SystemRandom(0)
    for s in (1, 2, 3):
        m = sk.n ** s
        phi = sk._crt[s][2] * sk._crt[s][3]
        bases = [rng.randrange(1, m) | 1 for _ in range(5)]
        exps = [1, 2, sk.lam, phi + 3, rng.randrange(m)]
        want = [pow(b, e, m) for b, e in zip(bases, exps)]
        assert sk._powmod_batch_sk(bases, exps, s) == want
        assert [sk._powmod_sk(b, e, s)
                for b, e in zip(bases, exps)] == want
        # common base (the DDLEQ ct1/ct2/b ladders)
        cb = bases[0]
        assert sk._powmod_batch_sk(cb, exps, s, common_base=True) == [
            pow(cb, e, m) for e in exps]
    # non-unit base falls back to the plain path (exponent reduction
    # would be invalid there)
    assert sk._powmod_sk(sk.p, 5, 2) == pow(sk.p, 5, sk.n2)
    assert sk._powmod_batch_sk([sk.q, 3], [4, 5], 2) == [
        pow(sk.q, 4, sk.n2), pow(3, 5, sk.n2)]


def test_ddleq_prove_delta_identity(keys):
    """The prove-side folded exponent floor(alpha*e/N^2) must equal the
    old (alpha*e - z^N mod N^2) / N^2 form for random (a, u) — the
    binomial identity (au)^N === (au mod N)^N (mod N^2) the z^N batch
    removal relies on."""
    sk, pk = keys
    n, n2 = sk.n, sk.n2
    rng = secrets.SystemRandom(0)
    for _ in range(8):
        a = rng.randrange(1, n)
        u = rng.randrange(1, n)
        alpha = pow(a, n, n2)
        e = pow(u, n, n2)
        z = a * u % n
        delta_old = alpha * e - pow(z, n, n2)
        assert delta_old >= 0 and delta_old % n2 == 0
        assert alpha * e // n2 == delta_old // n2
