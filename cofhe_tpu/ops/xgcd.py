"""Batched constant-trip extended GCD via Bernstein-Yang divsteps (JAX).

The reference's composition hot path leans on GMP's variable-time xgcd
(BICYCL QFI nucomp; e.g. call sites behind x86_64/qfi.inl). On a vector
machine, variable-time Euclid is poison; divsteps (eprint 2019/266) are
branch-free, driven entirely by low bits, and batch perfectly:

* 13 divsteps at a time are simulated on int32 low-bit surrogates,
  producing a 2x2 transition matrix with entries |.| <= 2^13.
* The matrix is applied to the full (batch, L) limb vectors in *redundant*
  form — no carry scans inside the loop; a single elementwise partial-carry
  pass keeps limbs bounded, and the exact /2^13 is done limb-locally
  (possible because value ≡ 0 mod 2^13 implies limb0 ≡ 0 mod 2^13 in the
  redundant encoding, and 16 >= 13).
* Bezout accumulators are kept reduced modulo a caller-supplied ODD modulus
  m via a fused Montgomery step (add t*m to clear 13 low bits, then shift),
  so they never grow beyond ~2m. The returned value satisfies

      u * f0 + v * g0 ≡ eps * 2^0 * gcd   (mod m)      -- after the final
                                                         2^-sigma folding,
  i.e. `u` is exactly (true Bezout coefficient of f0) mod m.

Trip count is static: it(n) = floor((45907 n + 26313) / 19929) divsteps for
n-bit inputs, rounded up to a multiple of 13 (extra steps are no-ops once
g = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .limb import canonicalize, canonicalize_fast, mag_cmp, modinv16, resize

W = 13  # divsteps per group; matrix entries bounded by 2^13 keep int32 exact
MASK_W = (1 << W) - 1


def iterations_for_bits(n: int) -> int:
    """Safegcd divstep bound for n-bit inputs, rounded up to a group."""
    it = (45907 * n + 26313) // 19929 + 1
    return ((it + W - 1) // W) * W


def _partial_carry(x):
    """One elementwise carry pass: limbs -> [0, 2^16) plus small signed
    carry folded into the next limb. The TOP limb keeps its carry (it would
    otherwise be silently dropped, wrapping negative values by 2^(16 L));
    callers must leave >= 2 guard limbs so the top limb stays tiny."""
    c = x >> 16
    r = x - (c << 16)
    out = r + jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    return out.at[..., -1].add(c[..., -1] << 16)


def _redundant_shr_w(x):
    """Exact division by 2^W on redundant limbs; requires value ≡ 0 (2^W)
    (which forces limb0 ≡ 0 mod 2^W after low bits were cleared)."""
    h = x >> W
    l = x & MASK_W
    l_up = jnp.concatenate([l[..., 1:], jnp.zeros_like(l[..., :1])], axis=-1)
    return h + (l_up << (16 - W))


def _divstep_group(delta, f0l, g0l):
    """Simulate W divsteps on int32 low bits. Returns (delta', u, v, q, r)
    with the *scaled* integer transition matrix (|entries| <= 2^W):
        [f'; g'] = [[u, v], [q, r]] @ [f; g] / 2^W
    """
    u = jnp.ones_like(delta)
    v = jnp.zeros_like(delta)
    q = jnp.zeros_like(delta)
    r = jnp.ones_like(delta)
    f, g = f0l, g0l
    for _ in range(W):
        g_odd = (g & 1).astype(jnp.int32)
        swap = (delta > 0) & (g_odd == 1)
        # swap case: (delta,f,g) <- (1-delta, g, (g-f)/2); rows: (2q,2r),(q-u,r-v)
        # else:      (delta,f,g) <- (1+delta, f, (g+g_odd*f)/2); rows: (2u,2v),(q+g_odd*u,r+g_odd*v)
        delta = jnp.where(swap, 1 - delta, 1 + delta)
        new_f = jnp.where(swap, g, f)
        new_g = jnp.where(swap, (g - f) >> 1, (g + g_odd * f) >> 1)
        new_u = jnp.where(swap, 2 * q, 2 * u)
        new_v = jnp.where(swap, 2 * r, 2 * v)
        new_q = jnp.where(swap, q - u, q + g_odd * u)
        new_r = jnp.where(swap, r - v, r + g_odd * v)
        f, g, u, v, q, r = new_f, new_g, new_u, new_v, new_q, new_r
    return delta, u, v, q, r


def _apply_to_fg(u, v, q, r, f, g):
    """(f, g) <- ([u v; q r] @ (f, g)) / 2^W on redundant limbs."""
    uf = u[..., None] * f + v[..., None] * g
    qg = q[..., None] * f + r[..., None] * g
    return _partial_carry(_redundant_shr_w(uf)), _partial_carry(_redundant_shr_w(qg))


def _approx_quotient(x, m_scaled_f32, m_top):
    """Estimate round(value(x) / m) from a 6-limb window of the redundant
    limbs of x around m's top limb. Exact to +-2 (window truncation + f32)."""
    L = x.shape[-1]
    acc = jnp.zeros(x.shape[:-1], jnp.float32)
    for off in range(-1, 5):  # limbs m_top-1 .. m_top+4
        pos = jnp.clip(m_top + off, 0, L - 1)
        valid = (m_top + off >= 0) & (m_top + off < L)
        limb = jnp.take_along_axis(x, pos[..., None], axis=-1)[..., 0]
        acc = acc + jnp.where(valid, limb.astype(jnp.float32), 0.0) * (2.0 ** (16 * off))
    return jnp.round(acc / m_scaled_f32).astype(jnp.int32)


def _sub_qm(x, qhat, m, m8):
    """x - qhat * m on redundant limbs; |qhat| < 2^16 handled via 8-bit split
    against m and m<<8."""
    aq = jnp.abs(qhat)
    sgn = jnp.sign(qhat)
    q_lo = (aq & 0xFF) * sgn
    q_hi = (aq >> 8) * sgn
    return x - q_lo[..., None] * m - q_hi[..., None] * m8


def _apply_bezout_mod(u, v, q, r, P, Q, m, m8, minv_w, m_scaled_f32, m_top):
    """(P, Q) <- ([u v; q r] @ (P, Q)) * 2^-W  (mod m), redundant limbs.

    Two-stage reduction keeps |value| <= ~2m across groups: first an
    estimated quotient subtraction (the matrix product can reach 2^14 * m),
    then a fused Montgomery step (add t*m to clear the W low bits) before
    the exact /2^W shift."""
    def reduce_row(x):
        x = _partial_carry(x)
        qhat = _approx_quotient(x, m_scaled_f32, m_top)
        # full (log-depth) canonicalization pins the limb support near m's
        # top limb — without it, cancel-pair residues ripple upward across
        # groups and eventually poison the quotient window.
        s, mag = canonicalize_fast(_sub_qm(x, qhat, m, m8))
        x = s[..., None] * mag
        x0 = x[..., 0] & MASK_W
        t = (x0 * minv_w) & MASK_W  # makes x + t*m ≡ 0 (mod 2^W)
        return _partial_carry(_redundant_shr_w(x + t[..., None] * m))

    uP = u[..., None] * P + v[..., None] * Q
    qP = q[..., None] * P + r[..., None] * Q
    return reduce_row(uP), reduce_row(qP)


def xgcd_mod(f_mag, g_mag, m_mag, nbits: int):
    """Extended gcd of (f, g) with f ODD, with Bezout coefficients delivered
    modulo the ODD modulus m.

    Returns (d_mag, u_mag, v_mag) with
        d = gcd(f, g)  (canonical magnitude), and
        u * f + v * g ≡ d (mod m),  0 <= u, v < m.

    nbits: static bound on max(bits(f), bits(g)) across the batch.
    """
    L = f_mag.shape[-1]
    m = resize(m_mag, L)
    # -m^{-1} mod 2^W (for the fused Montgomery step): from m^{-1} mod 2^16
    minv16 = modinv16(m[..., 0])
    minv_w = (-minv16) & MASK_W
    # m << 8 (for 16-bit quotient subtraction via 8-bit split), m's top limb
    # index and a f32 surrogate m / 2^(16*m_top) for quotient estimation
    from .limb import mag_bitlen, _carry_scan

    m8, _ = _carry_scan(m << 8)
    m_top = jnp.maximum((mag_bitlen(m) - 1) // 16, 0)
    mt0 = jnp.take_along_axis(m, m_top[..., None], axis=-1)[..., 0].astype(jnp.float32)
    mt1 = jnp.where(m_top >= 1, jnp.take_along_axis(
        m, jnp.clip(m_top - 1, 0, L - 1)[..., None], axis=-1)[..., 0], 0).astype(jnp.float32)
    mt2 = jnp.where(m_top >= 2, jnp.take_along_axis(
        m, jnp.clip(m_top - 2, 0, L - 1)[..., None], axis=-1)[..., 0], 0).astype(jnp.float32)
    m_scaled_f32 = mt0 + mt1 * 2.0 ** -16 + mt2 * 2.0 ** -32

    total = iterations_for_bits(nbits)
    groups = total // W

    f = f_mag.astype(jnp.int32)
    g = g_mag.astype(jnp.int32)
    delta = jnp.ones(f.shape[:-1], jnp.int32)
    # Bezout accumulators (mod m), times 2^(-W*k) after k groups:
    # (P, Q) = f-row of the transition matrix, (R, S) = g-row; P/R multiply
    # f0 and Q/S multiply g0. Rows couple under the matrix product, so all
    # four are carried. _apply_bezout_mod updates one *column* (x_f, x_g).
    P = jnp.zeros_like(f).at[..., 0].set(1)
    Q = jnp.zeros_like(f)
    R = jnp.zeros_like(f)
    S = jnp.zeros_like(f).at[..., 0].set(1)

    def cond(state):
        k, delta, f, g, P, Q, R, S = state
        # early exit once every g is the all-zero representation (value 0 in
        # the redundant encoding is sufficient, not necessary — safe either
        # way; the invariant P*f0 + Q*g0 ≡ f_current (mod m) holds after any
        # number of groups).
        return (k < groups) & jnp.any(g != 0)

    def body(state):
        k, delta, f, g, P, Q, R, S = state
        delta, u, v, q, r = _divstep_group(delta, f[..., 0], g[..., 0])
        f2, g2 = _apply_to_fg(u, v, q, r, f, g)
        P2, R2 = _apply_bezout_mod(u, v, q, r, P, R, m, m8, minv_w, m_scaled_f32, m_top)
        Q2, S2 = _apply_bezout_mod(u, v, q, r, Q, S, m, m8, minv_w, m_scaled_f32, m_top)
        return (k + 1, delta, f2, g2, P2, Q2, R2, S2)

    (_, delta, f, g, P, Q, R, S) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), delta, f, g, P, Q, R, S))

    # f now holds ±gcd (redundant); P,Q ≡ (matrix f-row) * 2^-sigma mod m and
    # u_true * f0 + v_true * g0 = 2^sigma * f_final, so P*f0 + Q*g0 ≡ f_final.
    sf, fmag = canonicalize_fast(f)
    d = fmag
    # normalize Bezout: want u*f0 + v*g0 ≡ +d (mod m): flip sign if f_final<0
    sP, mP = canonicalize_fast(P)
    sQ, mQ = canonicalize_fast(Q)
    flip = sf < 0
    sP = jnp.where(flip, -sP, sP)
    sQ = jnp.where(flip, -sQ, sQ)
    u = _mod_into_range(sP, mP, m)
    v = _mod_into_range(sQ, mQ, m)
    return d, u, v


def _mod_into_range(sign, mag, m):
    """Signed value with |value| < 4m -> canonical residue in [0, m)."""
    x = sign[..., None] * mag
    for _ in range(4):
        s, mg = canonicalize_fast(x)
        too_big = (s > 0) & (mag_cmp(mg, m) >= 0)
        neg = s < 0
        x = s[..., None] * mg + jnp.where(neg[..., None], m, 0) - jnp.where(too_big[..., None], m, 0)
    s, mg = canonicalize_fast(x)
    return mg
