"""Beaver-triplet ciphertext x ciphertext multiplication (reference
smpc/ciphertext_multiplications.hpp:8-164).

Protocol per element (multiply_ciphertexts, :16-39): with triplet
(Enc(a), Enc(b), Enc(ab)) and inputs x, y:
    eps   = Dec(x - a)            (interactive threshold decrypt)
    delta = Dec(y - b)
    z     = Enc(eps*delta) + eps*Enc(b) + delta*Enc(a) + Enc(ab)
The tensor variant broadcasts ct1 (n,m) x ct2 (m,p) to n*m*p element pairs,
runs ONE vector Beaver round (a single fan-out decrypt for all pairs), then
accumulates rows into the (n, p) result (:41-160).
"""

from __future__ import annotations

from ..tensor import Tensor
from .client import SMPCClient


class SMPCCipherTextMultiplier:
    def __init__(self, smpc_client: SMPCClient, public_key):
        self.smpc = smpc_client
        self.cs = smpc_client.cs
        self.pk = public_key

    def multiply_ciphertexts(self, ct1, ct2):
        res = self._beaver_batch([ct1], [ct2])
        return res[0]

    def _beaver_batch(self, xs: list, ys: list) -> list:
        """One Beaver round over a batch of ciphertext pairs."""
        cs, pk = self.cs, self.pk
        n = len(xs)
        triplets = self.smpc.get_beavers_triplets(n)
        # x - a, y - b (homomorphic subtraction via negation)
        diffs = []
        for (x, y), (ea, eb, _ec) in zip(zip(xs, ys), triplets):
            diffs.append(cs.add_ciphertexts(pk, x, cs.negate_ciphertext(pk, ea)))
            diffs.append(cs.add_ciphertexts(pk, y, cs.negate_ciphertext(pk, eb)))
        # single interactive decrypt round
        opened = self.smpc.decrypt_tensor(Tensor(diffs, (len(diffs),)))
        out = []
        for i, ((x, y), (ea, eb, ec)) in enumerate(zip(zip(xs, ys), triplets)):
            eps = opened[2 * i] % cs.hsm2k.M
            delta = opened[2 * i + 1] % cs.hsm2k.M
            z = cs.encrypt(pk, eps * delta % cs.hsm2k.M)
            z = cs.add_ciphertexts(pk, z, cs.scal_ciphertext(pk, eps, eb))
            z = cs.add_ciphertexts(pk, z, cs.scal_ciphertext(pk, delta, ea))
            z = cs.add_ciphertexts(pk, z, ec)
            out.append(z)
        return out

    def multiply_ciphertext_tensors(self, ct1: Tensor, ct2: Tensor) -> Tensor:
        """(n, m) x (m, p) -> (n, p) via one broadcast Beaver round plus row
        accumulation (reference :41-113)."""
        cs, pk = self.cs, self.pk
        if ct1.ndim != 2 or ct2.ndim != 2:
            raise ValueError("tensors must be 2-D matrices")
        n, m = ct1.shape
        m2, p = ct2.shape
        if m != m2:
            raise ValueError(f"matmul shape mismatch {ct1.shape} x {ct2.shape}")
        xs, ys = [], []
        for i in range(n):
            for j in range(m):
                for k in range(p):
                    xs.append(ct1.at(i, j))
                    ys.append(ct2.at(j, k))
        prods = self._beaver_batch(xs, ys)
        out = []
        for i in range(n):
            for k in range(p):
                acc = None
                for j in range(m):
                    term = prods[(i * m + j) * p + k]
                    acc = term if acc is None else cs.add_ciphertexts(pk, acc, term)
                out.append(acc)
        return Tensor(out, (n, p))
