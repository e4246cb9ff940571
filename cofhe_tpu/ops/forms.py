"""Batched binary-quadratic-form (class group) arithmetic in JAX.

TPU equivalent of BICYCL's QFI composition/reduction as used by the
reference (x86_64/qfi.inl, cpu_cryptosystem_*.inl call into QFI::nucomp /
nudupl / nupow). A batch of forms is a `BForm` of (batch, L) limb arrays;
every algorithm is fixed-trip and masked, and validated bit-exactly against
cofhe_tpu.core.qfi — reduction theory makes the reduced representative
unique, so only final results must agree, not intermediate routes.

Composition (batched Gauss composition; see core/qfi.py for the scalar
oracle and the derivation):

  * rotate F2 to odd a2 via (a,b,c) ~ (c,-b,a) (for primitive forms of even
    discriminant a and c are never both even),
  * s = (b1+b2)/2,
  * two divstep xgcds (ops/xgcd.py) with Bezout residues mod a2:
        d1 = gcd(a2, a1), beta = a1-coefficient
        g  = gcd(d1, |s|), xi/eta = coefficients of (d1, |s|)
    Multiplying the two exact 2^sigma-scaled Bezout identities shows
    u ≡ xi*beta, w ≡ sign(s)*eta (mod a2) belong to one exact Bezout triple
    u*a1 + v*a2 + w*s = g (the 2-adic scalings cancel modulo the odd a2),
  * mu = [u*(b2-b1) - 2*w*c1] mod m2 (m2 = a2/g); when a1 is odd the coset
    mod 2*m2 is pinned by parity (b3 must be even), when a1 is even the
    factor a1/g is already even and any lift works,
  * a3 = (a1/g)*m2, b3 = b1 + (a1/g)*mu,
    c3 = ((b3/2)^2 + |Delta|/4) / a3 (Hensel on the odd part of a3),
  * full reduction: masked normalize/rho steps with f32-estimated quotient
    digits (capped at 2^14 per step) under a lax.while_loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import limb as lb
from .xgcd import xgcd_mod


class BForm(NamedTuple):
    a: jnp.ndarray       # (..., L) magnitude, a > 0
    b_sign: jnp.ndarray  # (...,) in {-1, 0, 1}
    b: jnp.ndarray       # (..., L) magnitude
    c: jnp.ndarray       # (..., L) magnitude, c > 0


@dataclass(frozen=True)
class FormSpec:
    """Static sizing for one discriminant."""

    disc_bits: int   # bits of |Delta|
    L: int           # limbs of a, b, c buffers
    n_bits: int      # xgcd bit bound for reduced operands (~disc_bits/2)

    @staticmethod
    def for_disc_bits(disc_bits: int) -> "FormSpec":
        L = (disc_bits + 16 * 6) // 16 + 1
        L = ((L + 7) // 8) * 8
        # xgcd bound must cover rotated operands (c ~ |Delta|/4a can reach
        # disc_bits); the xgcd's early-exit keeps the common ~disc/2-bit
        # case cheap.
        return FormSpec(disc_bits=disc_bits, L=L, n_bits=disc_bits + 32)


# ---------------------------------------------------------------------------
# host conversion / selection helpers
# ---------------------------------------------------------------------------


def bform_from_forms(forms, L: int) -> BForm:
    a = lb.ints_to_limbs([f.a for f in forms], L)
    bs, b = lb.ints_to_signed([f.b for f in forms], L)
    c = lb.ints_to_limbs([f.c for f in forms], L)
    return BForm(jnp.asarray(a), jnp.asarray(bs), jnp.asarray(b), jnp.asarray(c))


def bform_to_forms(bf: BForm):
    from ..core.qfi import Form

    av = lb.limbs_to_ints(np.asarray(bf.a))
    bv = lb.limbs_to_ints(np.asarray(bf.b), np.asarray(bf.b_sign))
    cv = lb.limbs_to_ints(np.asarray(bf.c))
    return [Form(x, y, z) for x, y, z in zip(av, bv, cv)]


def bform_select(mask, t: BForm, f: BForm) -> BForm:
    m1 = mask[..., None]
    return BForm(jnp.where(m1, t.a, f.a), jnp.where(mask, t.b_sign, f.b_sign),
                 jnp.where(m1, t.b, f.b), jnp.where(m1, t.c, f.c))


def bform_broadcast(bf: BForm, batch: int) -> BForm:
    return BForm(jnp.broadcast_to(bf.a, (batch,) + bf.a.shape[-1:]),
                 jnp.broadcast_to(bf.b_sign, (batch,)),
                 jnp.broadcast_to(bf.b, (batch,) + bf.b.shape[-1:]),
                 jnp.broadcast_to(bf.c, (batch,) + bf.c.shape[-1:]))


def bform_neg(bf: BForm) -> BForm:
    """Class inverse of a REDUCED form: (a, -b, c), except on the boundary
    |b| == a or a == c where the reduced inverse keeps b (core.qfi.neg)."""
    boundary = (lb.mag_cmp(bf.b, bf.a) == 0) | (lb.mag_cmp(bf.a, bf.c) == 0)
    s = jnp.where(boundary, bf.b_sign, -bf.b_sign)
    return BForm(bf.a, s, bf.b, bf.c)


def rotate_to_odd(bf: BForm) -> BForm:
    """(a,b,c) ~ (c,-b,a) when a is even (then c is odd)."""
    even = (bf.a[..., 0] & 1) == 0
    return bform_select(even, BForm(bf.c, -bf.b_sign, bf.b, bf.a), bf)


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def _scalar_mul_mag(mag, scalar_abs):
    """mag * scalar_abs (0 <= scalar_abs < 2^16) -> redundant NONNEG limbs
    (< 2^25); 8-bit split avoids int32 overflow."""
    lo = (scalar_abs & 0xFF)[..., None] * mag          # <= 2^24
    t = (scalar_abs >> 8)[..., None] * mag             # <= 2^24
    red = lo + ((t & 0xFF) << 8)
    up = t >> 8
    red = red + jnp.concatenate([jnp.zeros_like(up[..., :1]), up[..., :-1]], axis=-1)
    return red


def _sm_half(sign, mag):
    """(sign, mag) / 2 for even values."""
    return sign, lb.mag_shr_bits(mag, 1)


def _mulmod(x_mag, y_mag, m_mag, L: int, Lq: int):
    """x*y mod m for magnitudes (x, y < m)."""
    prod = lb.mag_mul(x_mag, y_mag)  # 2L
    _, r = lb.mag_divmod(prod, lb.resize(m_mag, prod.shape[-1]), Lq)
    return lb.resize(r, L)


# ---------------------------------------------------------------------------
# reduction
# ---------------------------------------------------------------------------


def _is_normal(bf: BForm):
    c = lb.mag_cmp(bf.b, bf.a)
    return (c < 0) | ((c == 0) & (bf.b_sign >= 0))


def _is_reduced(bf: BForm):
    ac = lb.mag_cmp(bf.a, bf.c)
    return _is_normal(bf) & ((ac < 0) | ((ac == 0) & (bf.b_sign >= 0)))


def _normalize_step(bf: BForm) -> BForm:
    """One masked move of b toward (-a, a]: b -= 2*a*q for an f32-estimated
    quotient q = qd * 2^shift (qd <= 2^13, dynamic per-element shift — CF
    quotients of skewed forms can span hundreds of bits), with c updated
    incrementally as c' = q*(a*q - b) + c. Iterating converges; estimate
    errors are repaired by later iterations."""
    L = bf.a.shape[-1]
    a_mant, a_exp = lb.mag_float(bf.a)
    b_mant, b_exp = lb.mag_float(bf.b)
    ratio = b_mant / jnp.maximum(a_mant, 1.0)
    e = b_exp - a_exp - 1  # q ~= ratio * 2^e
    # renormalize: ratio = frac * 2^lr with frac in [1, 2) — mantissas from
    # mag_float are not aligned, so ratio can be enormous or tiny and all the
    # exponent arithmetic must stay exact in int32
    lr = jnp.floor(jnp.log2(jnp.maximum(ratio, 1e-30))).astype(jnp.int32)
    frac = ratio * jnp.exp2(jnp.clip(-lr, -126, 126).astype(jnp.float32))
    qbits = lr + e + 1  # ceil-ish bit size of the estimated quotient
    shift = jnp.maximum(qbits - 13, 0)
    expo = lr + e - shift  # <= 13 by construction
    qd = jnp.clip(jnp.round(frac * jnp.exp2(
        jnp.clip(expo, -30, 14).astype(jnp.float32))), 0.0, 16383.0).astype(jnp.int32)
    # |b| > a needs q >= 1 (the f32 estimate can round b/(2a) in (0.5, 1)
    # down to 0, which would loop forever)
    qd = jnp.where((lb.mag_cmp(bf.b, bf.a) > 0) & (qd == 0), 1, qd)
    qsign = bf.b_sign

    def shifted(mag_red):
        """(redundant nonneg limbs < 2^25) * 2^shift, carry-fixed."""
        s_, m_ = lb.canonicalize_fast(mag_red)
        return lb.mag_shl_bits_dyn(m_, shift)

    # b' = b - 2*a*qd*2^shift
    two_aq = shifted(_scalar_mul_mag(bf.a, 2 * qd))
    bs, bm = lb.canonicalize_fast(
        bf.b_sign[..., None] * bf.b - qsign[..., None] * two_aq)
    # c' = q*(a*q - b) + c with q = qsign*qd*2^shift
    aq = shifted(_scalar_mul_mag(bf.a, qd))  # a*qd*2^shift
    t_s, t_m = lb.sm_sub((qsign, aq), (bf.b_sign, bf.b))  # qsign*aq - b
    u_mag = lb.mag_shl_bits_dyn(lb.canonicalize_fast(_scalar_mul_mag(t_m, qd))[1], shift)
    u_red = (qsign * t_s)[..., None] * u_mag
    cs, cm = lb.canonicalize_fast(u_red + bf.c)
    # boundary: b' == -a  ->  use +a representative (same c)
    neg_boundary = (bs < 0) & (lb.mag_cmp(bm, bf.a) == 0)
    bs = jnp.where(neg_boundary, 1, bs)
    return BForm(bf.a, bs, bm, cm)


def reduce_batch(bf: BForm, max_iters: int) -> BForm:
    """Masked (normalize | rho) iterations until all elements reduced."""

    def cond(state):
        bf, it = state
        return (it < max_iters) & jnp.logical_not(jnp.all(_is_reduced(bf)))

    def body(state):
        bf, it = state
        normal = _is_normal(bf)
        reduced = _is_reduced(bf)
        need_rho = normal & jnp.logical_not(reduced)
        rho = BForm(bf.c, -bf.b_sign, bf.b, bf.a)
        cur = bform_select(need_rho, rho, bf)
        stepped = _normalize_step(cur)
        out = bform_select(reduced, bf, stepped)
        return out, it + 1

    out, _ = jax.lax.while_loop(cond, body, (bf, jnp.int32(0)))
    return out


# ---------------------------------------------------------------------------
# composition
# ---------------------------------------------------------------------------


def compose_batch(F1: BForm, F2: BForm, spec: FormSpec, delta4_mag: jnp.ndarray,
                  nbits: int | None = None, reduce_iters: int | None = None) -> BForm:
    """Gauss composition + reduction. F1, F2 reduced forms of the same
    discriminant (F1 may be a skewed form like f^m with tiny even a and huge
    c — sizes stay bounded because only a2 is rotated odd)."""
    L = spec.L
    L2 = 2 * L
    nbits = nbits if nbits is not None else spec.n_bits
    reduce_iters = reduce_iters if reduce_iters is not None else spec.disc_bits + 256

    # order operands so a1 <= a2: F2 gets rotated odd, and the rotated
    # c2 <= |Delta|/(4 a2) <= |Delta|/(4 a1) keeps a1*c2 <= |Delta|/4, so
    # every product below fits the L/2L buffers.
    swap = lb.mag_cmp(F1.a, F2.a) > 0
    F1n = bform_select(swap, F2, F1)
    F2n = bform_select(swap, F1, F2)
    F2n = rotate_to_odd(F2n)
    a1, b1s, b1m, c1 = F1n
    a2, b2s, b2m, c2 = F2n

    # s = (b1 + b2) / 2  (b's are even: 4 | Delta)
    ss, smag = lb.sm_add((b1s, b1m), (b2s, b2m))
    smag = lb.mag_shr_bits(smag, 1)

    # xgcd #1: gcd(a2, a1) with Bezout mod a2; beta = a1-coefficient
    d1, _alpha, beta = xgcd_mod(a2, a1, a2, nbits)
    # xgcd #2: gcd(d1, |s|). Random reduced forms are coprime with
    # overwhelming probability, so when EVERY element has d1 == 1 we can
    # skip the whole second xgcd: g = 1, xi = 1, eta = 0.
    d1_is_one = (d1[..., 0] == 1) & (jnp.sum(jnp.abs(d1), axis=-1) == 1)

    def _skip(_):
        one = jnp.concatenate([jnp.ones_like(d1[..., :1]),
                               jnp.zeros_like(d1[..., 1:])], axis=-1)
        return one, one, jnp.zeros_like(d1)

    def _full(_):
        return xgcd_mod(d1, smag, a2, nbits)

    g, xi, eta = jax.lax.cond(jnp.all(d1_is_one), _skip, _full, None)

    # m2 = a2/g, a1g = a1/g (g odd since it divides odd a2... via d1 | a2)
    m2 = lb.mag_divexact_odd(a2, g, L)
    a1g = lb.mag_divexact_odd(a1, g, L)

    # u ≡ xi * beta (mod a2); w ≡ sign(s) * eta
    Lq = L + 2
    u = _mulmod(xi, beta, a2, L, Lq)

    # mu_num = u*(b2 - b1) - 2*w*c1  (signed, <= ~3n bits)
    ds, dm = lb.sm_sub((b2s, b2m), (b1s, b1m))
    t1s, t1m = lb.sm_mul((jnp.ones_like(ds), u), (ds, dm), L_out=L2)
    wcs, wcm = lb.sm_mul((ss, eta), (jnp.ones_like(ss), c1), L_out=L2)
    wcm = lb.mag_shl_bits(wcm, 1, L2)  # *2
    nums, numm = lb.sm_sub((t1s, t1m), (wcs, wcm))

    # mu = mu_num mod 2*m2, in [0, 2*m2). The modulus is 2*m2 (not m2):
    # b3 is only determined mod 2*a3 and (a1/g)*(mu + m2) shifts b3 by a3,
    # i.e. to a DIFFERENT class. K = u*(b2-b1) - 2*w*c1 is well-defined mod
    # 2*m2 from u,w mod a2 because b1, b2 are even (4 | Delta).
    m2x2 = lb.mag_shl_bits(m2, 1, L)
    _, mu = lb.mag_divmod(numm, lb.resize(m2x2, numm.shape[-1]), L2)
    mu = lb.resize(mu, L)
    # negative numerator: mu -> 2*m2 - mu (if nonzero)
    mu_nonzero = jnp.logical_not(lb.mag_is_zero(mu))
    neg = (nums < 0) & mu_nonzero
    _, mu = lb.canonicalize_fast(jnp.where(neg[..., None], m2x2 - mu, mu))

    # a3 = a1g * m2 ; b3 = b1 + a1g * mu ; c3 = ((b3/2)^2 + |D|/4) / a3
    a3 = lb.mag_mul(a1g, m2, L)
    t = lb.mag_mul(a1g, mu, L)
    b3s, b3m = lb.sm_add((b1s, b1m), (jnp.ones_like(b1s), t))
    b3hs, b3hm = _sm_half(b3s, b3m)
    sq = lb.mag_mul(b3hm, b3hm, L2)  # (b3/2)^2
    csum = lb.resize(sq, L2) + lb.resize(delta4_mag, L2)  # + |Delta|/4, redundant-safe
    _, csum = lb.canonicalize_fast(csum)
    # a3 = 2^e * odd: shift then Hensel
    e = lb.mag_v2(a3)
    a3_odd = lb.mag_shr_bits_dyn(a3, e)
    csum_shifted = lb.mag_shr_bits_dyn(csum, jnp.minimum(e, jnp.int32(16 * L2 - 1)))
    c3 = lb.mag_divexact_odd(csum_shifted, lb.resize(a3_odd, L2), L)

    out = BForm(a3, b3s, b3m, c3)
    return reduce_batch(out, reduce_iters)


def nudupl_batch(F: BForm, spec: FormSpec, delta4_mag: jnp.ndarray,
                 nbits: int | None = None, reduce_iters: int | None = None) -> BForm:
    """Squaring: one xgcd instead of two. b3 = b - 2*(a/g)*(y*c mod m2),
    a3 = (a/g)^2, with g = gcd(a, b) and y the b-coefficient mod a."""
    L = spec.L
    L2 = 2 * L
    nbits = nbits if nbits is not None else spec.n_bits
    reduce_iters = reduce_iters if reduce_iters is not None else spec.disc_bits + 256

    F = rotate_to_odd(F)
    a, bs, bm, c = F
    g, _xa, y = xgcd_mod(a, bm, a, nbits)  # y*|b| ≡ g - xa*a ≡ g (mod a)
    m2 = lb.mag_divexact_odd(a, g, L)      # = a/g (odd)
    # w = y * sign(b); mu = (w * c) mod m2
    prod = lb.mag_mul(y, c)  # 2L
    _, mu = lb.mag_divmod(prod, lb.resize(m2, prod.shape[-1]), L + 2)
    mu = lb.resize(mu, L)
    # sign: w*c ≡ sign(b)*y*c; if sign negative, mu -> m2 - mu
    mu_nonzero = jnp.logical_not(lb.mag_is_zero(mu))
    neg = (bs < 0) & mu_nonzero
    _, mu = lb.canonicalize_fast(jnp.where(neg[..., None], m2 - mu, mu))

    a3 = lb.mag_mul(m2, m2, L)  # (a/g)^2
    t = lb.mag_mul(m2, mu, L)   # (a/g) * mu
    b3s, b3m = lb.sm_sub((bs, bm), (jnp.ones_like(bs), lb.mag_shl_bits(t, 1, L)))
    b3hs, b3hm = _sm_half(b3s, b3m)
    sq = lb.mag_mul(b3hm, b3hm, L2)
    csum = lb.resize(sq, L2) + lb.resize(delta4_mag, L2)
    _, csum = lb.canonicalize_fast(csum)
    e = lb.mag_v2(a3)
    a3_odd = lb.mag_shr_bits_dyn(a3, e)
    csum_shifted = lb.mag_shr_bits_dyn(csum, jnp.minimum(e, jnp.int32(16 * L2 - 1)))
    c3 = lb.mag_divexact_odd(csum_shifted, lb.resize(a3_odd, L2), L)

    out = BForm(a3, b3s, b3m, c3)
    return reduce_batch(out, reduce_iters)
