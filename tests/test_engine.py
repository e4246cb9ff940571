"""JaxEngine vs host-path equivalence: batched add/scal/decrypt/matmul must
be bit-exact with the pure-Python oracle."""

import random

import pytest

from cofhe_tpu.api import CryptoSystem
from cofhe_tpu.tensor import Tensor

random.seed(31)


@pytest.fixture(scope="module")
def jcs(toy_cs):
    cs = CryptoSystem(128, 32, p=toy_cs.hsm2k.p, seed=b"engine-test", device="cpu-jax")
    return cs


@pytest.fixture(scope="module")
def jkeys(jcs):
    sk = jcs.keygen()
    return sk, jcs.keygen(sk)


def test_add_batch(jcs, jkeys):
    sk, pk = jkeys
    M = jcs.hsm2k.M
    a = [random.randrange(M) for _ in range(5)]
    b = [random.randrange(M) for _ in range(5)]
    ca = jcs.encrypt_vector(pk, a)
    cb = jcs.encrypt_vector(pk, b)
    out = jcs.add_ciphertext_vectors(pk, ca, cb)
    # bit-exact vs host compose
    for i in range(5):
        expect = jcs.hsm2k.add_ciphertexts(ca[i], cb[i])
        assert out[i] == expect, i
    got = [jcs.hsm2k.decrypt(sk, ct) for ct in out]
    assert got == [(x + y) % M for x, y in zip(a, b)]


def test_scal_batch(jcs, jkeys):
    sk, pk = jkeys
    M = jcs.hsm2k.M
    vals = [random.randrange(M) for _ in range(4)]
    scal = [random.randrange(M) for _ in range(4)]
    scal[0] = 0
    scal[1] = 1
    cts = jcs.encrypt_vector(pk, vals)
    out = jcs.scal_ciphertext_vector(pk, scal, cts)
    for i in range(4):
        expect = jcs.hsm2k.scal_ciphertext(cts[i], scal[i])
        assert out[i] == expect, i
    got = [jcs.hsm2k.decrypt(sk, ct) for ct in out]
    assert got == [v * s % M for v, s in zip(vals, scal)]


def test_decrypt_batch(jcs, jkeys):
    sk, pk = jkeys
    M = jcs.hsm2k.M
    vals = [random.randrange(M) for _ in range(6)]
    cts = jcs.encrypt_vector(pk, vals)
    assert jcs.decrypt_vector(sk, cts) == vals


def test_part_decrypt_batch(jcs, jkeys):
    sk, pk = jkeys
    from cofhe_tpu.core import liss

    shares = liss.share_secret(sk, 3, 2, jcs.hsm2k.encrypt_randomness_bound(),
                               jcs.rand_gen)
    vals = [random.randrange(jcs.hsm2k.M) for _ in range(3)]
    cts = jcs.encrypt_vector(pk, vals)
    combo = (0, 1)
    sh = [shares[p][liss.share_index_for_party(p, combo, 3)] for p in combo]
    pdrs = [jcs.part_decrypt_vector(s, cts) for s in sh]
    for i in range(3):
        expect_pdrs = [jcs.hsm2k.part_decrypt(cts[i], s) for s in sh]
        assert pdrs[0][i] == expect_pdrs[0] and pdrs[1][i] == expect_pdrs[1], i
    out = jcs.combine_part_decryption_results_vector(cts, pdrs)
    assert out == vals


def test_scal_matmul(jcs, jkeys):
    sk, pk = jkeys
    M = jcs.hsm2k.M
    n, m, p = 2, 3, 2
    ctv = [random.randrange(1000) for _ in range(n * m)]
    sv = [random.randrange(1000) for _ in range(m * p)]
    ct = jcs.encrypt_tensor(pk, Tensor(ctv, (n, m)))
    res = jcs.scal_ciphertext_tensors(pk, Tensor(sv, (m, p)), ct)
    dec = jcs.decrypt_tensor(sk, res)
    for i in range(n):
        for kk in range(p):
            expect = sum(ctv[i * m + j] * sv[j * p + kk] for j in range(m)) % M
            assert dec.at(i, kk) == expect, (i, kk)


def test_scal_matmul_partial_chunk(jcs, jkeys, monkeypatch):
    """n not divisible by the row chunk: pad rows must be computed and
    dropped without corrupting real outputs (engine.scal_matmul pad path)."""
    monkeypatch.setenv("COFHE_MATMUL_CHUNK_ROWS", "2")
    sk, pk = jkeys
    M = jcs.hsm2k.M
    # (m, p) matches test_scal_matmul so the per-chunk plan (rows2=4, m=3,
    # p=2) hits the same compiled kernel — keeps the cold fast tier lean
    n, m, p = 3, 3, 2  # 2 chunks: rows (0,1) and (2, pad)
    ctv = [random.randrange(1000) for _ in range(n * m)]
    sv = [random.randrange(1000) for _ in range(m * p)]
    ct = jcs.encrypt_tensor(pk, Tensor(ctv, (n, m)))
    res = jcs.scal_ciphertext_tensors(pk, Tensor(sv, (m, p)), ct)
    dec = jcs.decrypt_tensor(sk, res)
    for i in range(n):
        for kk in range(p):
            expect = sum(ctv[i * m + j] * sv[j * p + kk] for j in range(m)) % M
            assert dec.at(i, kk) == expect, (i, kk)
