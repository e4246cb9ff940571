"""Lightweight n-D tensor of Python objects (plaintext ints / CipherTexts /
partial-decryption Forms).

The reference implements a ~1.2k-line strided/broadcast pointer-tensor
(common/tensor.hpp:18-1247) because C++ has no ergonomic n-D container; on
the host side of the TPU framework a flat list + shape is all that's needed
(the TPU compute path uses jnp limb arrays instead, see cofhe_tpu/ops/).
API mirrors the reference surface: ndim/shape/num_elements/flatten/reshape/
at/broadcast.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Iterable, Sequence


class Tensor:
    __slots__ = ("data", "shape")

    def __init__(self, data: Sequence[Any], shape: Sequence[int] | None = None):
        self.data = list(data)
        if shape is None:
            shape = (len(self.data),)
        self.shape = tuple(int(s) for s in shape)
        if math.prod(self.shape) != len(self.data):
            raise ValueError(f"shape {self.shape} does not match {len(self.data)} elements")

    # -- constructors -------------------------------------------------------
    @staticmethod
    def full(shape: Sequence[int], value: Any) -> "Tensor":
        return Tensor([value] * math.prod(shape), shape)

    @staticmethod
    def zero_degree(value: Any) -> "Tensor":
        """0-D scalar tensor (reference tensor.hpp:1109)."""
        return Tensor([value], ())

    @staticmethod
    def from_nested(nested: Any) -> "Tensor":
        shape = []
        probe = nested
        while isinstance(probe, (list, tuple)):
            shape.append(len(probe))
            probe = probe[0]
        flat: list[Any] = []

        def rec(x, depth):
            if depth == len(shape):
                flat.append(x)
                return
            if len(x) != shape[depth]:
                raise ValueError("ragged nested list")
            for e in x:
                rec(e, depth + 1)

        rec(nested, 0)
        return Tensor(flat, shape)

    # -- shape ops ----------------------------------------------------------
    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def num_elements(self) -> int:
        return len(self.data)

    def is_zero_degree(self) -> bool:
        return self.shape == ()

    def get_value(self) -> Any:
        if not self.is_zero_degree() and self.num_elements != 1:
            raise ValueError("not a scalar tensor")
        return self.data[0]

    def reshape(self, shape: Sequence[int]) -> "Tensor":
        return Tensor(self.data, shape)

    def flatten(self) -> "Tensor":
        return Tensor(self.data, (len(self.data),))

    def at(self, *idx: int) -> Any:
        if len(idx) != max(self.ndim, 1):
            raise IndexError("wrong index arity")
        flat = 0
        shape = self.shape or (1,)
        for i, s in zip(idx, shape):
            if not 0 <= i < s:
                raise IndexError(f"index {idx} out of bounds for {shape}")
            flat = flat * s + i
        return self.data[flat]

    def __getitem__(self, i: int) -> Any:
        return self.data[i]

    def __iter__(self) -> Iterable[Any]:
        return iter(self.data)

    def __len__(self) -> int:
        return len(self.data)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Tensor) and self.shape == other.shape and self.data == other.data

    def map(self, fn: Callable[[Any], Any]) -> "Tensor":
        return Tensor([fn(x) for x in self.data], self.shape)

    def zip_map(self, other: "Tensor", fn: Callable[[Any, Any], Any]) -> "Tensor":
        a, b = broadcast_pair(self, other)
        return Tensor([fn(x, y) for x, y in zip(a.data, b.data)], a.shape)

    def tolist(self) -> Any:
        def build(dim: int, offset: int, stride: int):
            if dim == self.ndim:
                return self.data[offset]
            size = self.shape[dim]
            inner = stride // size if size else 0
            return [build(dim + 1, offset + i * inner, inner) for i in range(size)]

        return build(0, 0, len(self.data))

    def __repr__(self) -> str:
        return f"Tensor(shape={self.shape}, data[0]={self.data[0]!r}...)" if self.data else "Tensor([])"


def broadcast_pair(a: Tensor, b: Tensor) -> tuple[Tensor, Tensor]:
    """Numpy-style broadcasting of two object tensors."""
    if a.shape == b.shape:
        return a, b
    sa = (1,) * (max(a.ndim, b.ndim) - a.ndim) + a.shape
    sb = (1,) * (max(a.ndim, b.ndim) - b.ndim) + b.shape
    out_shape = []
    for x, y in zip(sa, sb):
        if x != y and 1 not in (x, y):
            raise ValueError(f"cannot broadcast {a.shape} with {b.shape}")
        out_shape.append(max(x, y))
    out_shape = tuple(out_shape)

    def expand(t: Tensor, s: tuple[int, ...]) -> Tensor:
        if s == out_shape:
            return Tensor(t.data, out_shape)
        out = []
        strides = []
        acc = 1
        for dim in reversed(s):
            strides.append(acc)
            acc *= dim
        strides.reverse()
        for flat in range(math.prod(out_shape)):
            idx = []
            rem = flat
            for d in range(len(out_shape) - 1, -1, -1):
                idx.append(rem % out_shape[d])
                rem //= out_shape[d]
            idx.reverse()
            src = 0
            for d in range(len(s)):
                i = idx[d] if s[d] != 1 else 0
                src += i * strides[d]
            out.append(t.data[src])
        return Tensor(out, out_shape)

    return expand(Tensor(a.data, sa), sa), expand(Tensor(b.data, sb), sb)
