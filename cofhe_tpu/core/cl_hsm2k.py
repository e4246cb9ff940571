"""CL_HSM2k: threshold-friendly linearly homomorphic encryption over class
groups of imaginary quadratic orders, with message space Z/2^k Z.

Re-derivation (from scratch, verified empirically and by group theory) of the
scheme the reference obtains from BICYCL (`BICYCL::CL_HSM2k`, used throughout
/root/reference/include/x86_64/*.inl; the scheme is from Castagnos-
Laguillaumie-Tucker, eprint 2022/1143, cited at
cpu_cryptosystem_distributed.inl:174,247,260).

Construction
------------
* p: deterministic odd prime with p_bits = max(disc_bits(sec) - 3, 2k + 16).
* Fundamental discriminant DeltaK = -8p  (always fundamental for odd p).
* Working order: conductor 2^(k+1), Delta = 2^(2k+2) * DeltaK.
* F = <f> with  f = (2^(2k), 2^(k+1), 1 - DeltaK)  is cyclic of order 2^k
  (kernel of Cl(Delta) -> Cl(DeltaK) is cyclic of order 2^(k+1); F is its
  subgroup of squares).
* In the "large DeltaK" regime |DeltaK| >~ 4^k (enforced by p_bits above),
  every element of F has the unique reduced form
      f^(2^v * m') = (4^j, 2^(j+1) * L, L^2 - 4^v * DeltaK),   j = k - v,
  with L odd, |L| < 2^(j-1).
* dlog_in_F is CLOSED FORM via the 2-adic formal logarithm of the kernel's
  formal group law  t (+) s = (t + s) / (1 - 2 p t s):
      lambda(t) = sum_i (-1)^i (2p)^i t^(2i+1) / (2i+1)   (arctan-type)
  with parameter t = -2^(v+1) * L^(-1) (2-adically);  m = lambda(t)/lambda(t_f)
  mod 2^k where t_f = -2 is f's parameter. Conversely power_of_f(m) is O(1)
  via Newton inversion of lambda (formal exponential).
* Encrypt(pk, m; r) = (h^r, f^m * pk^r);  h = lift(prime form)^(2^(k+1)).
* Threshold decryption via LISS shares (see liss.py) : di = c1^si and
  d = prod di^lambda_i, m = dlog_in_F(c2 * d^-1).

All arithmetic here is pure Python int; this module is the bit-exact oracle
for the batched JAX kernels in cofhe_tpu/ops/.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

from .intmath import invmod, is_prime, isqrt, kronecker
from .qfi import (
    Form,
    compose,
    form_from_ab,
    identity_form,
    lift_form,
    neg,
    nudupl,
    nupow,
    prime_form,
    reduce_form,
)
from .rng import RandGen

# |DeltaK| size (bits) per security level — class-group discriminant sizes
# (matching BICYCL's SecLevel table; 80 is an extrapolation for CoFHE's LOW).
DISC_BITS = {80: 1012, 112: 1348, 128: 1827, 192: 3598, 256: 5971}

DEFAULT_STAT_DISTANCE = 40  # statistical-distance parameter for randomness bounds


@dataclass(frozen=True)
class CipherText:
    c1: Form
    c2: Form

    def __iter__(self):
        return iter((self.c1, self.c2))


def _derive_p(security_level: int, k: int) -> int:
    """Deterministic prime p for DeltaK = -8p, derived from (sec, k) only."""
    if security_level not in DISC_BITS:
        raise ValueError(f"unsupported security level {security_level}")
    p_bits = max(DISC_BITS[security_level] - 3, 2 * k + 16)
    rng = RandGen(f"cofhe-tpu-params-v1:{security_level}:{k}".encode())
    while True:
        cand = rng.random_bits(p_bits) | (1 << (p_bits - 1)) | 1
        if is_prime(cand):
            return cand


@lru_cache(maxsize=16)
def _cached_params(security_level: int, k: int) -> int:
    return _derive_p(security_level, k)


class CLHSM2k:
    def __init__(self, security_level: int, k: int, compact_variant: bool = False,
                 p: int | None = None, distance: int = DEFAULT_STAT_DISTANCE):
        if compact_variant:
            raise NotImplementedError("compact variant not supported (reference default is non-compact)")
        self.security_level = security_level
        self.k = k
        self._compact = False
        self.distance = distance
        self.p = p if p is not None else _cached_params(security_level, k)
        self.DeltaK = -8 * self.p
        self.cond = 1 << (k + 1)
        self.Delta = self.cond * self.cond * self.DeltaK
        self.M = 1 << k  # cleartext bound 2^k
        # generator of F (order 2^k) — closed form, see module docstring
        self.f = Form(1 << (2 * k), 1 << (k + 1), 1 - self.DeltaK)
        self.identity = identity_form(self.Delta)
        # randomness / secret-key bound: covers |Cl(Delta)| ~ h(DeltaK)*2^(k+1)
        # with 2^distance statistical slack; h(DeltaK) < sqrt(|DeltaK|)*log(..)
        class_number_bound = (isqrt(-self.DeltaK) + 1) * self.DeltaK.bit_length()
        self._rand_bound = class_number_bound * (1 << (k + 1)) << distance
        self.h = self._derive_h()
        # cached odd-inverse of lambda(t_f)/2 (t_f = -2), used by dlog/power_of_f
        N = self.k + 3
        den = self._formal_log(-2 % (1 << N), N)
        assert den % 2 == 0 and (den >> 1) % 2 == 1
        self._log_tf_half = den >> 1
        self._inv_log_tf_half = invmod(self._log_tf_half, 1 << (k + 2))

    # -- public parameter accessors (BICYCL CL_HSM2k API parity) -----------
    def encrypt_randomness_bound(self) -> int:
        return self._rand_bound

    def secretkey_bound(self) -> int:
        return self._rand_bound

    def cleartext_bound(self) -> int:
        return self.M

    def compact_variant(self) -> bool:
        return self._compact

    def _derive_h(self) -> Form:
        """h = (lift of smallest split odd prime form of DeltaK)^(2^(k+1)).

        Deterministic given p. The 2^(k+1)-th power kills the kernel
        component, so <h> intersects F trivially (required for IND-CPA per
        the CL framework)."""
        l = 3
        while True:
            if is_prime(l) and kronecker(self.DeltaK, l) == 1:
                fl = prime_form(self.DeltaK, l)
                if fl is not None:
                    break
            l += 2
        t = lift_form(fl, self.DeltaK, self.cond)
        h = t
        for _ in range(self.k + 1):
            h = nudupl(h)
        return h

    # -- formal group law helpers (2-adic) ---------------------------------
    def _formal_log(self, t: int, N: int) -> int:
        """lambda(t) = sum (-1)^i (2p)^i t^(2i+1)/(2i+1) mod 2^N, t even."""
        mod = 1 << N
        ratio = (-2 * self.p) % mod
        t2 = t * t % mod
        acc = 0
        cur = t % mod
        i = 0
        while cur != 0:
            acc = (acc + cur * invmod(2 * i + 1, mod)) % mod
            cur = cur * ratio % mod * t2 % mod
            i += 1
        return acc

    def _formal_exp(self, u: int, N: int) -> int:
        """Inverse of _formal_log mod 2^N via Newton iteration (u even)."""
        mod = 1 << N
        u %= mod
        t = u % 8  # initial approx: lambda(t) = t + O(t^3 * 2p), correct mod 8
        prec = 3
        while prec < N:
            prec = min(2 * prec, N)
            m2 = 1 << prec
            # t <- t - (lambda(t) - u) * (1 + 2p t^2) mod 2^prec
            lam = self._formal_log(t % m2, prec)
            deriv_inv = (1 + 2 * self.p * t * t) % m2  # 1/lambda'(t)
            t = (t - (lam - u) * deriv_inv) % m2
        return t % mod

    # -- F subgroup: fast power and dlog -----------------------------------
    def power_of_f(self, m: int) -> Form:
        """f^m in O(1) big-int ops via the formal exponential."""
        m %= self.M
        if m == 0:
            return self.identity
        v = (m & -m).bit_length() - 1
        j = self.k - v
        N = self.k + 3
        mod = 1 << N
        u = m * ((self._log_tf_half << 1) % mod) % mod
        t = self._formal_exp(u, N)
        # t = -2^(v+1) / L  =>  L = -2^(v+1) * inv(t >> (v+1)) * ... (odd part)
        assert t % (1 << (v + 1)) == 0 and (t >> (v + 1)) % 2 == 1, (m, v, t)
        Linv = -(t >> (v + 1)) % (1 << j)  # L^{-1} mod 2^j (odd)
        L = invmod(Linv, 1 << j)
        # symmetric representative
        if L >= (1 << (j - 1)):
            L -= 1 << j
        a = 1 << (2 * j)
        b = L << (j + 1)
        c = L * L - (1 << (2 * v)) * self.DeltaK
        r = Form(a, b, c)
        assert r.disc == self.Delta
        return r

    def dlog_in_F(self, r: Form) -> int:
        """Closed-form discrete log in F (the decrypt finisher; reference
        calls BICYCL's dlog_in_F at cpu_cryptosystem_distributed.inl:269)."""
        if r == self.identity:
            return 0
        a, b, _c = r
        j = (a.bit_length() - 1) // 2
        if a != 1 << (2 * j) or j > self.k:
            raise ValueError("form is not in F (invalid ciphertext/decrypt)")
        L = b >> (j + 1)
        if L << (j + 1) != b or L % 2 == 0:
            raise ValueError("form is not in F")
        v = self.k - j
        N = self.k + 3
        mod = 1 << N
        t = (-(1 << (v + 1)) * invmod(L, mod)) % mod
        num = self._formal_log(t, N)
        m = ((num >> 1) * self._inv_log_tf_half) % (1 << (self.k + 1))
        return m % self.M

    # -- group ops ----------------------------------------------------------
    def nucomp(self, f1: Form, f2: Form) -> Form:
        return compose(f1, f2)

    def nucompinv(self, f1: Form, f2: Form) -> Form:
        """f1 * f2^-1 (reference: Cl_Delta().nucompinv at
        cpu_cryptosystem_distributed.inl:267)."""
        return compose(f1, neg(f2))

    def nupow(self, f: Form, n: int) -> Form:
        return nupow(f, n)

    def power_of_h(self, r: int) -> Form:
        return nupow(self.h, r)

    # -- scheme -------------------------------------------------------------
    def keygen(self, rand_gen: RandGen) -> int:
        return rand_gen.random_mpz(self.secretkey_bound())

    def pk_from_sk(self, sk: int) -> Form:
        return nupow(self.h, sk)

    def encrypt(self, pk: Form, m: int, rand_gen: RandGen) -> CipherText:
        r = rand_gen.random_mpz(self.encrypt_randomness_bound())
        return self.encrypt_with_r(pk, m, r)

    def encrypt_with_r(self, pk: Form, m: int, r: int) -> CipherText:
        c1 = nupow(self.h, r)
        pkr = nupow(pk, r)
        return CipherText(c1, compose(self.power_of_f(m), pkr))

    def encrypt_with_parts(self, m: int, c1: Form, pkr: Form) -> CipherText:
        """Shared-randomness batch encryption: c1 = h^r and pkr = pk^r are
        computed once per batch (reference encrypt_vector trick,
        cpu_cryptosystem_vector_ops.inl:4-18)."""
        return CipherText(c1, compose(self.power_of_f(m), pkr))

    def decrypt(self, sk: int, ct: CipherText) -> int:
        c1sk = nupow(ct.c1, sk)
        fm = compose(ct.c2, neg(c1sk))
        return self.dlog_in_F(fm)

    def add_ciphertexts(self, ct1: CipherText, ct2: CipherText) -> CipherText:
        return CipherText(compose(ct1.c1, ct2.c1), compose(ct1.c2, ct2.c2))

    def scal_ciphertext(self, ct: CipherText, s: int) -> CipherText:
        if s < 0:
            raise ValueError("plaintext scalar must be non-negative")
        return CipherText(nupow(ct.c1, s), nupow(ct.c2, s))

    def negate_ciphertext(self, ct: CipherText) -> CipherText:
        return CipherText(reduce_form(neg(ct.c1)), reduce_form(neg(ct.c2)))

    # -- threshold ----------------------------------------------------------
    def part_decrypt(self, ct: CipherText, sk_share: int) -> Form:
        """d_i = c1^{s_i} (reference partDecrypt,
        cpu_cryptosystem_distributed.inl:244-254)."""
        return nupow(ct.c1, sk_share)

    def final_decrypt(self, ct: CipherText, ds: list[Form]) -> int:
        """Combine partial decryptions: lambda = (1, -1, ..., -1),
        d = prod d_i^{lambda_i}, m = dlog_in_F(c2 * d^-1) (reference
        finalDecrypt, cpu_cryptosystem_distributed.inl:256-270)."""
        d = ds[0]
        for di in ds[1:]:
            d = compose(d, neg(di))
        fm = compose(ct.c2, neg(d))
        return self.dlog_in_F(fm)
