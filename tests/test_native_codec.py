"""Native C++ codec vs pure-Python serializer: byte-identical output and
correct roundtrips."""

import random

import pytest

from cofhe_tpu import native
from cofhe_tpu import serialize as ser
from cofhe_tpu.tensor import Tensor

random.seed(55)


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no native toolchain")
    return l


def _py_serialize(t):
    """Force the pure-Python path."""
    import cofhe_tpu.serialize as s

    orig = s._native_pack
    s._native_pack = lambda fields: None
    try:
        return ser.serialize_plaintext_tensor(t)
    finally:
        s._native_pack = orig


def test_bytes_identical(lib):
    vals = [random.getrandbits(random.randrange(1, 400)) for _ in range(20)]
    vals += [0, -5, -(1 << 100), 1 << 100, 255, 256, -65536]
    t = Tensor(vals, (len(vals),))
    assert ser.serialize_plaintext_tensor(t) == _py_serialize(t)


def test_roundtrip(lib):
    vals = [random.getrandbits(random.randrange(1, 900)) for _ in range(30)]
    vals[0] = 0
    vals[1] = -vals[1] if vals[1] else -1
    t = Tensor(vals, (5, 6))
    blob = ser.serialize_plaintext_tensor(t)
    assert ser.deserialize_plaintext_tensor(blob) == t


def test_python_blob_native_unpack(lib):
    """Python-serialized blob decoded through the native unpacker."""
    vals = [random.getrandbits(64) for _ in range(8)]
    t = Tensor(vals, (8,))
    blob = _py_serialize(t)
    assert ser.deserialize_plaintext_tensor(blob) == t
