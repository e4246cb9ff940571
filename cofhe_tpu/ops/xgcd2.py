"""v2 batched extended GCD via Bernstein-Yang divsteps on balanced redundant
limbs (the safegcd modular-inverse formulation).

This replaces ops/xgcd.py in the hot path (the reference leans on GMP's
variable-time xgcd inside BICYCL nucomp; call sites behind
/root/reference/include/x86_64/qfi.inl). Key differences from v1:

* ONE Bezout column by default: all call sites need only the coefficient of
  g0 and use a modulus m that DIVIDES f0 (compose: beta = a1-coefficient mod
  a2 with f0 = a2; nudupl: y = b-coefficient mod a with f0 = a; the tiny
  second gcd: eta mod d1 with f0 = d1). Then P*f0 ≡ 0 (mod m) and the column
  invariant Q*g0 ≡ f_cur (mod m) stands alone — 2 accumulators, not 4.
* No canonicalization inside the loop: balanced partial carries (ops/rl.py)
  plus an f32-estimated quotient subtraction and a fused Montgomery step
  keep |Q|, |S| <= ~1.5 m across groups.
* The while loop early-exits once every g is all-zero limbs (balanced
  representations of 0 are exactly all-zero), so the trip count tracks the
  ACTUAL operand bits, not the static cap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limb as lb
from . import rl

W = 13  # divsteps per group; |matrix entries| <= 2^13 keeps int32 exact
MASK_W = (1 << W) - 1


def iterations_for_bits(n: int) -> int:
    """Safegcd divstep bound for n-bit inputs, rounded up to a group."""
    it = (45907 * n + 26313) // 19929 + 1
    return ((it + W - 1) // W) * W


def _divstep_group(delta, f0l, g0l):
    """Simulate W divsteps on int32 low bits (low W+1 bits of the balanced
    limb 0 are the value's low bits). Returns (delta', u, v, q, r) with the
    scaled transition matrix: [f'; g'] = [[u, v], [q, r]] @ [f; g] / 2^W."""
    u = jnp.ones_like(delta)
    v = jnp.zeros_like(delta)
    q = jnp.zeros_like(delta)
    r = jnp.ones_like(delta)
    f, g = f0l, g0l
    for _ in range(W):
        g_odd = (g & 1).astype(jnp.int32)
        swap = (delta > 0) & (g_odd == 1)
        delta = jnp.where(swap, 1 - delta, 1 + delta)
        new_f = jnp.where(swap, g, f)
        new_g = jnp.where(swap, (g - f) >> 1, (g + g_odd * f) >> 1)
        new_u = jnp.where(swap, 2 * q, 2 * u)
        new_v = jnp.where(swap, 2 * r, 2 * v)
        new_q = jnp.where(swap, q - u, q + g_odd * u)
        new_r = jnp.where(swap, r - v, r + g_odd * v)
        f, g, u, v, q, r = new_f, new_g, new_u, new_v, new_q, new_r
    return delta, u, v, q, r


def _shr_w(x):
    """Exact division by 2^W on redundant limbs (value ≡ 0 mod 2^W implies
    limb0 ≡ 0 mod 2^W in any limbwise-2^16 encoding since 16 >= W)."""
    h = x >> W
    l = x & MASK_W
    l_up = jnp.concatenate([l[..., 1:], jnp.zeros_like(l[..., :1])], axis=-1)
    return h + (l_up << (16 - W))


def _submul0(x, qd, m, m14):
    """x - qd*m for |qd| < 2^28 (14+14 split), no limb shift."""
    s = jnp.sign(qd)
    a = jnp.abs(qd)
    lo = (a & 0x3FFF) * s
    hi = (a >> 14) * s
    return x - rl.carry_pass(lo[..., None] * m) - rl.carry_pass(hi[..., None] * m14)


def xgcd_coeff_g(f_mag, g_mag, m_mag, nbits: int, need_u: bool = False,
                 unroll: int = 1):
    """gcd of (f, g) with f ODD, plus the Bezout coefficient of g0 modulo m.

    CONTRACT: m must divide f0 (all call sites use m == f0). Returns
    (d_mag, cg[, cu]) canonical with

        cg * g0 ≡ d (mod m),  0 <= cg < m.

    With need_u=True additionally tracks the f0-column and returns cu with
    cu * f0 + cg * g0 ≡ d as integers mod m (costs 2 more accumulators).

    nbits: static bound on max(bits(f), bits(g)) — only caps the loop; the
    early exit makes the realized trip count track actual bits."""
    L = f_mag.shape[-1]
    m = lb.resize(m_mag, L)
    _, m14 = lb.canonicalize_fast(m << 14)
    minv_w = (-lb.modinv16(m[..., 0])) & MASK_W
    mant_m, top_m = rl.value_est(m)

    groups = iterations_for_bits(nbits) // W

    f = rl.carry_pass(f_mag.astype(jnp.int32))
    g = rl.carry_pass(g_mag.astype(jnp.int32))
    delta = jnp.ones(f.shape[:-1], jnp.int32)
    Q = jnp.zeros_like(f)
    one0 = jnp.concatenate([jnp.ones_like(f[..., :1]),
                            jnp.zeros_like(f[..., 1:])], axis=-1)
    S = one0
    P = one0
    R = jnp.zeros_like(f)

    def reduce_row(x):
        """(matrix-applied accumulator) * 2^-W (mod m), kept ~1.5m-bounded."""
        x = rl.carry2(x)
        mant_x, top_x = rl.value_est(x)
        # direct j=0 digit: |x| <= 2^14 * 1.5m so tops differ by <= 1 limb
        ratio = mant_x / jnp.maximum(mant_m, 1e-30)
        scale = rl.pow2f(jnp.clip(16 * (top_x - top_m), -126, 30))
        qd = jnp.clip(jnp.round(ratio * scale), -98303.0, 98303.0).astype(jnp.int32)
        x = _submul0(x, qd, m, m14)
        t = ((x[..., 0] & MASK_W) * minv_w) & MASK_W
        x = _shr_w(x + t[..., None] * m)
        return rl.carry_pass(x)

    def cond(state):
        k = state[0]
        g = state[3]
        return (k < groups) & jnp.any(g != 0)

    def body(state):
        k, delta, f, g, Q, S, P, R = state
        delta2, u, v, q, r = _divstep_group(delta, f[..., 0], g[..., 0])
        uf = u[..., None] * f + v[..., None] * g
        qg = q[..., None] * f + r[..., None] * g
        f2 = rl.carry_pass(_shr_w(uf))
        g2 = rl.carry_pass(_shr_w(qg))
        Q2 = reduce_row(u[..., None] * Q + v[..., None] * S)
        S2 = reduce_row(q[..., None] * Q + r[..., None] * S)
        if need_u:
            P2 = reduce_row(u[..., None] * P + v[..., None] * R)
            R2 = reduce_row(q[..., None] * P + r[..., None] * R)
        else:
            P2, R2 = P, R
        return k + 1, delta2, f2, g2, Q2, S2, P2, R2

    # extra groups past g == 0 are exact identities (u = 2^W, shr_w undoes
    # it; reduce_row only re-represents Q mod m), so unroll overshoot is safe
    (_, _, f, g, Q, S, P, R) = jax.lax.while_loop(
        cond, rl.unrolled(body, unroll),
        (jnp.int32(0), delta, f, g, Q, S, P, R))

    sf, d = lb.canonicalize_fast(f)

    def into_range(x):
        sX, mX = lb.canonicalize_fast(x)
        sX = jnp.where(sf < 0, -sX, sX)  # normalize to +d
        y = sX[..., None] * mX
        for _ in range(2):
            s2, m2 = lb.canonicalize_fast(y)
            ge = (s2 > 0) & (lb.mag_cmp(m2, m) >= 0)
            neg = s2 < 0
            y = s2[..., None] * m2 + jnp.where(neg[..., None], m, 0) \
                - jnp.where(ge[..., None], m, 0)
        _, out = lb.canonicalize_fast(y)
        return out

    cg = into_range(Q)
    if need_u:
        return d, cg, into_range(P)
    return d, cg
