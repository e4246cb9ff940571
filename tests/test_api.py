"""Tests for the CryptoSystem facade (full op surface) and serialization."""

import random

import pytest

from cofhe_tpu import serialize as ser
from cofhe_tpu.tensor import Tensor

random.seed(5)


def test_make_plaintext_roundtrip(toy_cs):
    for x in (0.0, 1.0, -1.0, 123.0, -4567.0, 3.9, -3.9):
        pt = toy_cs.make_plaintext(x)
        assert 0 <= pt < toy_cs.hsm2k.M
        assert toy_cs.get_float_from_plaintext(pt) == float(int(x))


def test_encrypt_decrypt_tensor(toy_cs, toy_keys):
    sk, pk = toy_keys
    vals = [random.randrange(toy_cs.hsm2k.M) for _ in range(12)]
    t = Tensor(vals, (3, 4))
    ct = toy_cs.encrypt_tensor(pk, t)
    assert ct.shape == (3, 4)
    back = toy_cs.decrypt_tensor(sk, ct)
    assert back.data == vals


def test_add_scal_negate_tensors(toy_cs, toy_keys):
    sk, pk = toy_keys
    M = toy_cs.hsm2k.M
    a = [random.randrange(M) for _ in range(6)]
    b = [random.randrange(M) for _ in range(6)]
    ta, tb = Tensor(a, (2, 3)), Tensor(b, (2, 3))
    ca, cb = toy_cs.encrypt_tensor(pk, ta), toy_cs.encrypt_tensor(pk, tb)
    s = toy_cs.add_ciphertext_tensors(pk, ca, cb)
    assert toy_cs.decrypt_tensor(sk, s).data == [(x + y) % M for x, y in zip(a, b)]
    sc = [random.randrange(100) for _ in range(6)]
    scl = toy_cs.scal_ciphertext_tensors(pk, Tensor(sc, (6,)), Tensor(ca.data, (6,)))
    assert toy_cs.decrypt_tensor(sk, scl).data == [x * y % M for x, y in zip(sc, a)]
    ng = toy_cs.negate_ciphertext_tensor(pk, ca)
    assert toy_cs.decrypt_tensor(sk, ng).data == [-x % M for x in a]


def test_scal_broadcast_zero_degree_only(toy_cs, toy_keys):
    """0-D tensors broadcast elementwise, but SHAPED 1-element tensors keep
    the reference's dimension checks (cpu_cryptosystem_tensor_ops.inl:281-285):
    a (1,) scalar against a (3,) ct vector must still error."""
    sk, pk = toy_keys
    M = toy_cs.hsm2k.M
    vals = [random.randrange(M) for _ in range(3)]
    ct = toy_cs.encrypt_tensor(pk, Tensor(vals, (3,)))
    s0 = Tensor.zero_degree(7)
    out = toy_cs.scal_ciphertext_tensors(pk, s0, ct)
    assert out.shape == (3,)
    assert toy_cs.decrypt_tensor(sk, out).data == [7 * v % M for v in vals]
    # ct 0-D, s vector: broadcast the ct
    ct0 = Tensor.zero_degree(toy_cs.encrypt(pk, vals[0]))
    sv = Tensor([2, 3, 4], (3,))
    out = toy_cs.scal_ciphertext_tensors(pk, sv, ct0)
    assert toy_cs.decrypt_tensor(sk, out).data == [x * vals[0] % M for x in (2, 3, 4)]
    with pytest.raises(ValueError):
        toy_cs.scal_ciphertext_tensors(pk, Tensor([7], (1,)), ct)
    with pytest.raises(ValueError):
        toy_cs.scal_ciphertext_tensors(
            pk, Tensor([7], (1, 1)), toy_cs.encrypt_tensor(pk, Tensor(vals, (1, 3))))


def test_scal_matmul(toy_cs, toy_keys):
    """ct(n,m) x pt(m,p): res[i,k] = sum_j ct[i,j]*s[j,k] (+ Enc(0))."""
    sk, pk = toy_keys
    M = toy_cs.hsm2k.M
    n, m, p = 2, 3, 2
    ctv = [random.randrange(1000) for _ in range(n * m)]
    sv = [random.randrange(1000) for _ in range(m * p)]
    ct = toy_cs.encrypt_tensor(pk, Tensor(ctv, (n, m)))
    res = toy_cs.scal_ciphertext_tensors(pk, Tensor(sv, (m, p)), ct)
    assert res.shape == (n, p)
    dec = toy_cs.decrypt_tensor(sk, res)
    for i in range(n):
        for kk in range(p):
            expect = sum(ctv[i * m + j] * sv[j * p + kk] for j in range(m)) % M
            assert dec.at(i, kk) == expect


def test_float_matmul_end_to_end(toy_cs, toy_keys):
    """The tutorial.cpp workflow: floats -> fixed point -> encrypt -> matmul
    -> decrypt -> floats."""
    sk, pk = toy_keys
    n, m, p = 2, 2, 2
    xs = [[1.0, 2.0], [3.0, -4.0]]
    ws = [[5.0, -6.0], [7.0, 8.0]]
    ct = toy_cs.encrypt_tensor(pk, Tensor([toy_cs.make_plaintext(v) for row in xs for v in row], (n, m)))
    s = Tensor([toy_cs.make_plaintext(abs(v)) for row in ws for v in row], (m, p))
    # scalars must be non-negative; test with abs values
    res = toy_cs.decrypt_tensor(sk, toy_cs.scal_ciphertext_tensors(pk, s, ct))
    for i in range(n):
        for kk in range(p):
            expect = sum(xs[i][j] * abs(ws[j][kk]) for j in range(m))
            assert toy_cs.get_float_from_plaintext(res.at(i, kk)) == expect


def test_beavers_triplet(toy_cs):
    a, b, c = toy_cs.generate_random_beavers_triplet()
    assert c == a * b and 0 <= a < 10 and 0 <= b < 10


def test_serialize_scalars(toy_cs, toy_keys):
    sk, pk = toy_keys
    assert toy_cs.deserialize_public_key(toy_cs.serialize_public_key(pk)) == pk
    assert toy_cs.deserialize_secret_key(toy_cs.serialize_secret_key(sk)) == sk
    ct = toy_cs.encrypt(pk, 42)
    assert toy_cs.deserialize_ciphertext(toy_cs.serialize_ciphertext(ct)) == ct
    pdr = toy_cs.part_decrypt(sk, ct)
    assert toy_cs.deserialize_part_decryption_result(
        toy_cs.serialize_part_decryption_result(pdr)) == pdr
    cs2 = type(toy_cs).deserialize(toy_cs.serialize())
    assert cs2.hsm2k.p == type(toy_cs)(toy_cs.sec_level, toy_cs.k).hsm2k.p


def test_serialize_tensors(toy_cs, toy_keys):
    sk, pk = toy_keys
    M = toy_cs.hsm2k.M
    vals = [random.randrange(M) for _ in range(6)] + [0]
    t = Tensor(vals, (7,))
    blob = ser.serialize_plaintext_tensor(t)
    assert ser.deserialize_plaintext_tensor(blob) == t
    ct = toy_cs.encrypt_tensor(pk, t.reshape((7, 1)))
    blob = ser.serialize_ciphertext_tensor(ct)
    back = ser.deserialize_ciphertext_tensor(blob)
    assert back == ct
    pdr = toy_cs.part_decrypt_tensor(sk, ct)
    blob = ser.serialize_pdr_tensor(pdr)
    assert ser.deserialize_pdr_tensor(blob) == pdr


def test_serialize_negative_values():
    t = Tensor([-5, 0, 7, -(1 << 70), 1 << 70], (5,))
    blob = ser.serialize_plaintext_tensor(t)
    assert ser.deserialize_plaintext_tensor(blob) == t


def test_plaintext_tensor_ops(toy_cs):
    a = Tensor([1, 2, 3], (3,))
    b = Tensor([10, 20, 30], (3,))
    assert toy_cs.add_plaintext_tensors(a, b).data == [11, 22, 33]
    assert toy_cs.multiply_plaintext_tensors(a, b).data == [10, 40, 90]
    neg = toy_cs.negate_plaintext_tensor(a)
    assert [toy_cs.get_float_from_plaintext(v) for v in neg.data] == [-1.0, -2.0, -3.0]


def test_factory():
    from cofhe_tpu.api import SecurityLevel, Device, make_cryptosystem

    cs = make_cryptosystem(SecurityLevel.MEDIUM, 32, device=Device.CPU)
    assert cs.sec_level == 128 and cs.k == 32


def test_tensor_views():
    """Strided section / broadcast views (the reference's Accessor walk/
    section machinery, common/tensor.hpp:112-193, 462-1095): shared
    storage, write-through, stride-0 broadcast, nested sections."""
    from cofhe_tpu.tensor import Tensor

    t = Tensor(list(range(12)), (3, 4))
    v = t.section((1, 1), (3, 3))        # rows 1..2, cols 1..2
    assert v.shape == (2, 2)
    assert [v.at(i, j) for i in range(2) for j in range(2)] == [5, 6, 9, 10]
    assert not v.is_contiguous() and not v.is_broadcasted()
    v.set(0, 1, 99)                      # write-through
    assert t.at(1, 2) == 99
    assert v.make_contiguous().data == [5, 99, 9, 10]
    # nested section
    v2 = v.section((1, 0), (2, 2))
    assert list(v2) == [9, 10]
    # broadcast view: stride-0 axis, no copy
    row = Tensor([7, 8], (2,))
    b = row.broadcast_view((3, 2))
    assert b.is_broadcasted()
    assert [b.at(i, j) for i in range(3) for j in range(2)] == [7, 8] * 3
    row.data[0] = 70                     # view sees parent mutation
    assert b.at(2, 0) == 70
    # full-row contiguous section is contiguous
    assert t.section((0, 0), (1, 4)).is_contiguous()
    # in-place element set on Tensor itself
    t.set(0, 0, -1)
    assert t.at(0, 0) == -1
