"""Golden-byte vectors for the packed tensor wire format.

Expected blobs are spelled out literally from the reference format spec
(cpu_cryptosystem.inl:229-635): [u32 ndim][u32 shape...][u64 offset table,
MSB = sign bit set when value <= 0][little-endian magnitudes, each field
bitlen//8 + 1 bytes]. This pins the byte layout independently of the
serializer's own helpers (and of whether the native codec or the Python
fallback produced it).
"""

import struct

from cofhe_tpu import serialize as ser
from cofhe_tpu.core.qfi import Form
from cofhe_tpu.tensor import Tensor

SIGN = 1 << 63


def test_plaintext_tensor_golden():
    t = Tensor([5, 0, 300], (3,))
    blob = ser.serialize_plaintext_tensor(t)
    expect = (
        struct.pack("<I", 1) + struct.pack("<I", 3)      # ndim, shape
        + struct.pack("<Q", 0)                           # 5  -> off 0
        + struct.pack("<Q", 1 | SIGN)                    # 0  -> off 1, sgn<=0
        + struct.pack("<Q", 2)                           # 300 -> off 2
        + bytes([0x05])                                  # 5: 1 byte (3 bits)
        + bytes([0x00])                                  # 0: 1 byte
        + bytes([0x2C, 0x01])                            # 300 LE: 2 bytes (9 bits)
    )
    assert blob == expect
    back = ser.deserialize_plaintext_tensor(blob)
    assert back.shape == (3,) and list(back.data) == [5, 0, 300]


def test_pdr_tensor_golden_negative_field():
    t = Tensor([Form(2, -1, 13)], (1,))
    blob = ser.serialize_pdr_tensor(t)
    expect = (
        struct.pack("<I", 1) + struct.pack("<I", 1)
        + struct.pack("<Q", 0)                           # a=2
        + struct.pack("<Q", 1 | SIGN)                    # b=-1 (sign in MSB)
        + struct.pack("<Q", 2)                           # c=13
        + bytes([0x02, 0x01, 0x0D])
    )
    assert blob == expect
    back = ser.deserialize_pdr_tensor(blob)
    assert back.data[0] == Form(2, -1, 13)


def test_field_sizing_boundary():
    """bitlen//8 + 1 sizing: an exact-multiple-of-8 bitlength gains a pad
    byte (mpz-compatible sizing, cpu_cryptosystem.inl:246)."""
    t = Tensor([255, 256], (2,))
    blob = ser.serialize_plaintext_tensor(t)
    expect = (
        struct.pack("<I", 1) + struct.pack("<I", 2)
        + struct.pack("<Q", 0)
        + struct.pack("<Q", 2)                           # 255 took 8//8+1 = 2
        + bytes([0xFF, 0x00])                            # 255 + pad byte
        + bytes([0x00, 0x01])                            # 256 LE, 9//8+1 = 2
    )
    assert blob == expect


def test_2d_ciphertext_header():
    """ndim=2 header ordering for a ct tensor (6 fields per element)."""
    from cofhe_tpu.core.cl_hsm2k import CipherText

    ct = CipherText(Form(1, 0, 7), Form(3, -2, 11))
    t = Tensor([ct, ct], (2, 1))
    blob = ser.serialize_ciphertext_tensor(t)
    assert blob[:12] == struct.pack("<III", 2, 2, 1)
    # 12 fields -> offset table of 12 u64s; field 1 (c1.b=0) and field 4
    # (c2.b=-2) carry the sign bit
    table = struct.unpack("<12Q", blob[12:12 + 96])
    assert table[1] & SIGN and table[4] & SIGN
    assert not (table[0] & SIGN) and not (table[2] & SIGN)
    back = ser.deserialize_ciphertext_tensor(blob)
    assert back.shape == (2, 1) and back.data[0] == ct
