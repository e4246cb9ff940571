"""Tests for the CL_HSM2k scheme: enc/dec roundtrip, homomorphisms,
closed-form power_of_f / dlog_in_F, and threshold decryption."""

import random
from itertools import combinations

import pytest

from cofhe_tpu.core import liss
from cofhe_tpu.core.cl_hsm2k import CLHSM2k
from cofhe_tpu.core.qfi import nupow
from cofhe_tpu.core.rng import RandGen

random.seed(99)


@pytest.fixture(scope="module")
def rng():
    return RandGen(b"clhsm2k-tests")


@pytest.fixture(scope="module")
def keys(toy_hsm, rng):
    sk = toy_hsm.keygen(rng)
    return sk, toy_hsm.pk_from_sk(sk)


def test_power_of_f_closed_form(toy_hsm):
    for _ in range(20):
        m = random.randrange(toy_hsm.M)
        assert toy_hsm.power_of_f(m) == nupow(toy_hsm.f, m)
    assert toy_hsm.power_of_f(0) == toy_hsm.identity


def test_dlog_roundtrip(toy_hsm):
    for _ in range(30):
        m = random.randrange(toy_hsm.M)
        assert toy_hsm.dlog_in_F(toy_hsm.power_of_f(m)) == m
    # edge cases: 0, 1, M-1, powers of two
    for m in (0, 1, toy_hsm.M - 1, 2, toy_hsm.M // 2, toy_hsm.M // 2 + 1):
        assert toy_hsm.dlog_in_F(toy_hsm.power_of_f(m)) == m


def test_f_has_order_2k(toy_hsm):
    x = toy_hsm.f
    for _ in range(toy_hsm.k - 1):
        from cofhe_tpu.core.qfi import nudupl

        x = nudupl(x)
    assert x != toy_hsm.identity
    from cofhe_tpu.core.qfi import nudupl

    assert nudupl(x) == toy_hsm.identity


def test_encrypt_decrypt(toy_hsm, keys, rng):
    sk, pk = keys
    for _ in range(5):
        m = random.randrange(toy_hsm.M)
        ct = toy_hsm.encrypt(pk, m, rng)
        assert toy_hsm.decrypt(sk, ct) == m


def test_additive_homomorphism(toy_hsm, keys, rng):
    sk, pk = keys
    m1, m2 = random.randrange(toy_hsm.M), random.randrange(toy_hsm.M)
    ct1 = toy_hsm.encrypt(pk, m1, rng)
    ct2 = toy_hsm.encrypt(pk, m2, rng)
    assert toy_hsm.decrypt(sk, toy_hsm.add_ciphertexts(ct1, ct2)) == (m1 + m2) % toy_hsm.M
    s = random.randrange(1 << 16)
    assert toy_hsm.decrypt(sk, toy_hsm.scal_ciphertext(ct1, s)) == m1 * s % toy_hsm.M
    assert toy_hsm.decrypt(sk, toy_hsm.negate_ciphertext(ct1)) == -m1 % toy_hsm.M


def test_deterministic_params():
    a = CLHSM2k(128, 32, p=CLHSM2k(128, 32, p=1048583 if False else None).p)
    b = CLHSM2k(128, 32)
    assert a.p == b.p and a.h == b.h and a.f == b.f


@pytest.mark.parametrize("t,n", [(2, 3), (3, 5), (2, 2)])
def test_threshold(toy_hsm, keys, rng, t, n):
    sk, pk = keys
    shares = liss.share_secret(sk, n, t, toy_hsm.encrypt_randomness_bound(), rng)
    m = random.randrange(toy_hsm.M)
    ct = toy_hsm.encrypt(pk, m, rng)
    for combo in combinations(range(n), t):
        sh = [shares[pm][liss.share_index_for_party(pm, combo, n)] for pm in combo]
        assert liss.reconstruct(sh) == sk
        ds = [toy_hsm.part_decrypt(ct, s) for s in sh]
        assert toy_hsm.final_decrypt(ct, ds) == m


def test_combination_rank():
    from math import comb

    n, t = 5, 3
    for i, combo in enumerate(combinations(range(n), t)):
        assert liss.combination_rank(combo, n) == i


def test_compact_variant(rng):
    """Compact variant (cofhe.hpp:96-121 arm; lift call sites
    cpu_cryptosystem_vector_ops.inl:11-13): h/pk/c1 live in Cl(DeltaK),
    lifted on use as lift(x)^(2^(k+1)). Roundtrip, homomorphisms, threshold
    decryption, and the bandwidth claim (c1 coefficients at DeltaK size)."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import toy_prime

    hsm = CLHSM2k(128, 32, p=toy_prime(100), compact_variant=True)
    assert hsm.compact_variant()
    sk = hsm.keygen(rng)
    pk = hsm.pk_from_sk(sk)
    assert pk.disc == hsm.DeltaK  # pk stays in the small group
    M = hsm.M
    for m in (0, 1, M - 1, random.randrange(M), random.randrange(M)):
        ct = hsm.encrypt(pk, m, rng)
        assert ct.c1.disc == hsm.DeltaK and ct.c2.disc == hsm.Delta
        assert hsm.decrypt(sk, ct) == m
    # homomorphisms
    m1, m2, s = random.randrange(M), random.randrange(M), random.randrange(1000)
    ct1, ct2 = hsm.encrypt(pk, m1, rng), hsm.encrypt(pk, m2, rng)
    assert hsm.decrypt(sk, hsm.add_ciphertexts(ct1, ct2)) == (m1 + m2) % M
    assert hsm.decrypt(sk, hsm.scal_ciphertext(ct1, s)) == (m1 * s) % M
    assert hsm.decrypt(sk, hsm.negate_ciphertext(ct1)) == (-m1) % M
    # threshold t-of-n with rank-indexed bundles
    t, n = 2, 3
    shares = liss.share_secret(sk, n, t, hsm.encrypt_randomness_bound(), rng)
    ct = hsm.encrypt(pk, m1, rng)
    for combo in combinations(range(n), t):
        sh = [shares[pm][liss.share_index_for_party(pm, combo, n)]
              for pm in combo]
        pdrs = [hsm.part_decrypt(ct, s) for s in sh]
        assert pdrs[0].disc == hsm.Delta  # PDRs are lifted
        assert hsm.final_decrypt(ct, pdrs) == m1


def test_compact_variant_api_facade(rng):
    """CryptoSystem(compact=True) end-to-end through the facade."""
    import sys
    sys.path.insert(0, "tests")
    from conftest import toy_prime
    from cofhe_tpu.api import CryptoSystem
    from cofhe_tpu.tensor import Tensor

    cs = CryptoSystem(128, 32, compact=True, p=toy_prime(100), seed=b"cv")
    assert cs._engine is None  # element-level path (mixed discriminants)
    sk = cs.keygen()
    pk = cs.keygen(sk)
    vals = [random.randrange(cs.hsm2k.M) for _ in range(4)]
    ct = cs.encrypt_tensor(pk, Tensor(vals, (2, 2)))
    assert cs.decrypt_tensor(sk, ct).data == vals
    assert "1" in cs.serialize().split()[-1]  # compact flag round-trips
    cs2 = CryptoSystem.deserialize(cs.serialize())
    assert cs2.hsm2k.compact_variant()
