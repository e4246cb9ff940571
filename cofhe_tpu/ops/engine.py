"""JaxEngine: the TPU compute path behind the CryptoSystem facade.

Maps the reference's OpenMP-parallel per-element loops
(cpu_cryptosystem_vector_ops.inl / cpu_cryptosystem_tensor_ops.inl) onto
batched JAX kernels over limb arrays:

  * add_batch      — one batched composition over the stacked (c1, c2) pairs
                     (2N forms in a single kernel).
  * scal_batch     — batched ladder exponentiation with per-element k-bit
                     exponents (2N forms, exponents duplicated for c1/c2).
  * part_decrypt / decrypt — shared-exponent ladder (the exponent is the
                     host-known share/secret key), then a host-side
                     closed-form dlog for decrypt.
  * scal_matmul    — ct (n,m) x pt (m,p): batched nupow over all n*m*p
                     products, then a log2(m) pairwise-composition tree over
                     the contraction axis, seeded with the fresh Enc(0) the
                     reference also adds (cpu_cryptosystem_tensor_ops.inl:
                     352-356).

Batch shapes are bucketed to powers of two (pad with identity forms) to
bound recompilation. Results are bit-exact with the host path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cl_hsm2k import CipherText, CLHSM2k
from ..core.qfi import Form
from . import limb as lb
from .forms import BForm, FormSpec, bform_from_forms, bform_to_forms, compose_batch
from .nupow import (identity_bform, nupow_batch, nupow_shared,
                    nupow_shared_wnaf)


def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class JaxEngine:
    def __init__(self, hsm2k: CLHSM2k, platform: str | None = None):
        self.hsm = hsm2k
        disc_bits = (-hsm2k.Delta).bit_length()
        self.spec = FormSpec.for_disc_bits(disc_bits)
        L2 = 2 * self.spec.L
        # numpy (not device) constant: closure-captured device arrays can
        # deadlock during lowering (observed on jax 0.9 cpu)
        self.delta4 = lb.ints_to_limbs([(-hsm2k.Delta) // 4], L2)[0]
        self._identity_form = hsm2k.identity

    # ------------------------------------------------------------- transport
    def _forms_to_bform(self, forms, batch: int) -> BForm:
        padded = list(forms) + [self._identity_form] * (batch - len(forms))
        return bform_from_forms(padded, self.spec.L)

    def _cts_to_bform(self, cts) -> tuple[BForm, int, int]:
        """Stack [c1s..., c2s...] into one padded BForm batch."""
        n = len(cts)
        batch = _bucket(2 * n)
        forms = [ct.c1 for ct in cts] + [ct.c2 for ct in cts]
        return self._forms_to_bform(forms, batch), n, batch

    def _bform_to_cts(self, bf: BForm, n: int):
        out = bform_to_forms(bf)
        return [CipherText(out[i], out[n + i]) for i in range(n)]

    # --------------------------------------------------------------- kernels
    @functools.lru_cache(maxsize=32)
    def _add_kernel(self, batch: int):
        spec, d4 = self.spec, self.delta4

        @jax.jit
        def k(F1, F2):
            return compose_batch(F1, F2, spec, d4)

        return k

    @functools.lru_cache(maxsize=32)
    def _scal_kernel(self, batch: int, exp_bits: int):
        spec, d4 = self.spec, self.delta4

        @jax.jit
        def k(base, exps):
            return nupow_batch(base, exps, spec, d4, exp_bits)

        return k

    @functools.lru_cache(maxsize=32)
    def _matmul_pow_kernel(self, n: int, m: int, p: int):
        """Batched nupow for the (n,m)x(m,p) matmul with the doubling chain
        shared across the p exponents of each ciphertext cell (the TPU form
        of the reference's cross-exponent doubling cache, qfi.inl:28-62)."""
        spec, d4 = self.spec, self.delta4
        exp_bits = self.hsm.k
        nmp = n * m * p
        half_b = _bucket(n * m)
        half_e = _bucket(nmp)
        base_map = np.zeros(2 * half_e, dtype=np.int32)
        for i in range(n):
            for j in range(m):
                for kk in range(p):
                    flat = (i * m + j) * p + kk
                    base_map[flat] = i * m + j
                    base_map[half_e + flat] = half_b + i * m + j
        base_map[nmp:half_e] = 0
        base_map[half_e + nmp:] = 0

        @jax.jit
        def k(base, exps):
            return nupow_batch(base, exps, spec, d4, exp_bits, base_map=base_map)

        return k, half_b, half_e

    @functools.lru_cache(maxsize=32)
    def _shared_pow_kernel(self, batch: int, nbits: int):
        spec, d4 = self.spec, self.delta4

        @jax.jit
        def k(base, bits):
            return nupow_shared(base, bits, spec, d4)

        return k

    @functools.lru_cache(maxsize=32)
    def _shared_wnaf_kernel(self, batch: int, sched_len: int, w: int):
        spec, d4 = self.spec, self.delta4

        @jax.jit
        def k(base, sched):
            return nupow_shared_wnaf(base, sched, spec, d4, w=w)

        return k

    # ------------------------------------------------------------------- ops
    def add_batch(self, cts1, cts2):
        bf1, n, batch = self._cts_to_bform(cts1)
        bf2, _, _ = self._cts_to_bform(cts2)
        out = self._add_kernel(batch)(bf1, bf2)
        return self._bform_to_cts(jax.tree.map(np.asarray, out), n)

    def scal_batch(self, scalars, cts):
        n = len(cts)
        bf, _, batch = self._cts_to_bform(cts)
        k_bits = self.hsm.k
        Lk = (k_bits + lb.BASE_BITS - 1) // lb.BASE_BITS
        # layout from _cts_to_bform: [c1 x n, c2 x n, identity pad...]
        e_l = lb.ints_to_limbs(list(scalars), Lk)
        full = np.zeros((batch, Lk), dtype=np.int32)
        full[:n] = e_l
        full[n:2 * n] = e_l
        out = self._scal_kernel(batch, k_bits)(bf, jnp.asarray(full))
        return self._bform_to_cts(jax.tree.map(np.asarray, out), n)

    def _cts_to_bform_halves(self, cts):
        """Like _cts_to_bform but pads each half separately so c1s occupy
        [0, half) and c2s [half, 2*half)."""
        n = len(cts)
        half = _bucket(n)
        forms = ([ct.c1 for ct in cts] + [self._identity_form] * (half - n)
                 + [ct.c2 for ct in cts] + [self._identity_form] * (half - n))
        return bform_from_forms(forms, self.spec.L), n, 2 * half

    def part_decrypt_batch(self, share: int, cts):
        """d_i = c1^share for every ct (shared exponent)."""
        n = len(cts)
        batch = _bucket(n)
        bf = self._forms_to_bform([ct.c1 for ct in cts], batch)
        if share == 0:
            return [self._identity_form] * n
        neg = share < 0
        e = abs(share)
        # width-5 wNAF schedule, front-padded to a multiple of 64 so the
        # kernel caches by a coarse length bucket, not the exact exponent
        from .nupow import wnaf_digits

        w = 5
        sched = wnaf_digits(e, w)
        sched = [0] * ((-len(sched)) % 64) + sched
        out = self._shared_wnaf_kernel(batch, len(sched), w)(
            bf, jnp.asarray(sched, jnp.int32))
        forms = bform_to_forms(jax.tree.map(np.asarray, out))[:n]
        if neg:
            from ..core.qfi import neg as qneg, reduce_form

            forms = [reduce_form(qneg(f)) for f in forms]
        return forms

    def decrypt_batch(self, sk: int, cts):
        """m = dlog(c2 * (c1^sk)^-1): batched shared-exponent pow + batched
        compose, then the O(1) host dlog per element."""
        from ..core.qfi import neg as qneg, reduce_form

        n = len(cts)
        c1sk = self.part_decrypt_batch(sk, cts)
        batch = _bucket(n)
        inv = [reduce_form(qneg(f)) for f in c1sk]
        bf_inv = self._forms_to_bform(inv, batch)
        bf_c2 = self._forms_to_bform([ct.c2 for ct in cts], batch)
        fm = self._add_kernel(batch)(bf_c2, bf_inv)
        forms = bform_to_forms(jax.tree.map(np.asarray, fm))[:n]
        return [self.hsm.dlog_in_F(f) for f in forms]

    def scal_matmul(self, s_tensor, ct_tensor, zero_ct: CipherText):
        """ct (n,m) x s (m,p) -> (n,p); see module docstring."""
        from ..tensor import Tensor

        n, m = ct_tensor.shape
        m2, p = s_tensor.shape
        k_bits = self.hsm.k
        Lk = (k_bits + lb.BASE_BITS - 1) // lb.BASE_BITS
        # base forms: one (c1, c2) pair per ciphertext CELL (n*m of each);
        # the Yao kernel shares each cell's doubling chain across its p
        # exponents via base_map.
        kern, half_b, half = self._matmul_pow_kernel(n, m, p)
        cells = [ct_tensor.at(i, j) for i in range(n) for j in range(m)]
        bf_base = bform_from_forms(
            [ct.c1 for ct in cells] + [self._identity_form] * (half_b - n * m)
            + [ct.c2 for ct in cells] + [self._identity_form] * (half_b - n * m),
            self.spec.L)
        exps = [int(s_tensor.at(j, kk))
                for i in range(n) for j in range(m) for kk in range(p)]
        nmp = n * m * p
        exp_arr = np.zeros((2 * half, Lk), dtype=np.int32)
        e_l = lb.ints_to_limbs(exps, Lk)
        exp_arr[:nmp] = e_l
        exp_arr[half:half + nmp] = e_l
        powed = kern(bf_base, jnp.asarray(exp_arr))

        # reduction over j (the m axis): reshape each half to (n, m, p) and
        # pairwise-compose along m in log2 steps
        m_pad = _bucket(m)
        idx = np.full((2, n, m_pad, p), -1, dtype=np.int64)
        for i in range(n):
            for j in range(m):
                for kk in range(p):
                    flat = (i * m + j) * p + kk
                    idx[0, i, j, kk] = flat
                    idx[1, i, j, kk] = half + flat
        # gather into (2*n*m_pad*p) order, identity padding where idx < 0
        def gather(bfx, index):
            flat_idx = np.where(index < 0, 0, index).reshape(-1)
            mask = (index >= 0).reshape(-1)
            sel = BForm(
                jnp.asarray(np.asarray(bfx.a)[flat_idx]),
                jnp.asarray(np.asarray(bfx.b_sign)[flat_idx]),
                jnp.asarray(np.asarray(bfx.b)[flat_idx]),
                jnp.asarray(np.asarray(bfx.c)[flat_idx]))
            ident = identity_bform(self.spec, self.delta4, sel.a.shape[0])
            from .forms import bform_select

            return bform_select(jnp.asarray(mask), sel, ident)

        cur = gather(jax.tree.map(np.asarray, powed), idx)  # (2*n*m_pad*p) forms
        cur_m = m_pad
        while cur_m > 1:
            halfm = cur_m // 2
            A = jax.tree.map(
                lambda x: x.reshape(2 * n, cur_m, p, *x.shape[1:])[:, :halfm].reshape(
                    2 * n * halfm * p, *x.shape[1:]), cur)
            B = jax.tree.map(
                lambda x: x.reshape(2 * n, cur_m, p, *x.shape[1:])[:, halfm:].reshape(
                    2 * n * halfm * p, *x.shape[1:]), cur)
            cur = self._add_kernel(2 * n * halfm * p)(BForm(*A), BForm(*B))
            cur = jax.tree.map(jnp.asarray, cur)
            cur_m = halfm
        # cur: (2*n*p) accumulated sums; add Enc(0)
        zeros_c1 = [zero_ct.c1] * (n * p) + [zero_ct.c2] * (n * p)
        bf_zero = bform_from_forms(zeros_c1, self.spec.L)
        final = self._add_kernel(2 * n * p)(BForm(*jax.tree.map(jnp.asarray, cur)), bf_zero)
        forms = bform_to_forms(jax.tree.map(np.asarray, final))
        cts = [CipherText(forms[i], forms[n * p + i]) for i in range(n * p)]
        return Tensor(cts, (n, p))
