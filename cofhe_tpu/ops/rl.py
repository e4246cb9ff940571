"""Redundant-limb arithmetic: the v2 hot-loop toolkit.

The v1 kernels (ops/limb.py canonicalize_fast & friends) re-canonicalize to
sign-magnitude inside every loop iteration — ~100 elementwise passes over the
(batch, L) arrays each time. v2 keeps values REDUNDANT across iterations and
works with float32 *estimates* instead of exact comparisons, falling back to
exact fixes only once per call:

* redundant value: int32 limbs x with value = sum x[i] * 2^(16 i); after
  `carry2` every limb is BALANCED in ~[-2^15 - 2, 2^15 + 2], which (a) bounds
  products against 14-bit digits inside int32 and (b) guarantees the float
  estimate below is accurate: with balanced limbs, |value| is within a factor
  ~4 of the top limb's scale, so the f32 masked sum cannot catastrophically
  cancel (a plain nonneg carry would create borrow ripples
  (..., 65535, 65535, -1) whose estimate collapses to 0).
* `value_est` -> (mant f32, top int32) with value ~= mant * 2^(16 top).
* `mod_topdown`: x mod m for redundant signed x via 28-bit estimated digits
  (14+14 split against m and m<<14), limb-aligned shifts (gathers, exact on
  redundant limbs), early-exit while loop, exact canonical tail.
* `redc_pow16`: x * 2^(-16 K) mod d for ODD d (Montgomery-style bottom-up
  clearing) — used with a matching un-scaling pass so no division by d is
  ever needed.

All trip counts are runtime-adaptive (while_loop early exit) with static
caps; everything is elementwise/maskable and Pallas-portable.

Replaces the role of GMP mpn division/reduction in the reference's hot path
(BICYCL nucomp internals behind /root/reference/include/x86_64/qfi.inl).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limb as lb

MASK = lb.MASK
BASE_BITS = lb.BASE_BITS


def unrolled(body, factor: int):
    """Repeat a while-loop body `factor` times per iteration. At small
    batches the XLA while loop is LATENCY-bound (~tens of µs per iteration
    of device loop overhead regardless of lane count — a batch-256 compose2
    costs ~35 ms for ~800 total loop iterations on a v5e while a batch-16k
    one is bandwidth-bound), so folding K steps into one iteration is a
    ~K× win there. All loop bodies in this module are fixed points on
    converged/masked lanes, so overshooting by up to factor-1 steps is
    harmless."""
    if factor == 1:
        return body

    def body_k(state):
        for _ in range(factor):
            state = body(state)
        return state

    return body_k


def carry_pass(x):
    """One BALANCED partial carry pass; keeps the value exact. Limbs land in
    [-2^15, 2^15) plus the folded-in carry of the limb below. The top limb
    keeps its own carry (callers leave >= 2 guard limbs so it stays small)."""
    c = (x + (1 << (BASE_BITS - 1))) >> BASE_BITS
    r = x - (c << BASE_BITS)
    out = r + jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    # static-slice+concat with POSITIVE indices instead of .at[..., -1].add:
    # both the scatter form and negative static indices lower to
    # dynamic_slice, which Mosaic (Pallas TPU) can't lower
    Ll = out.shape[-1]
    return jnp.concatenate(
        [out[..., :Ll - 1],
         (out[..., Ll - 1] + (c[..., Ll - 1] << BASE_BITS))[..., None]],
        axis=-1)


def carry2(x):
    return carry_pass(carry_pass(x))


def shr1_red(x):
    """Exact /2 of a redundant value whose VALUE is even (then limb 0 is
    even, and odd bits of limb i move to bit 15 of limb i-1)."""
    odd = x & 1
    down = jnp.concatenate([odd[..., 1:], jnp.zeros_like(odd[..., :1])], axis=-1)
    return (x >> 1) + (down << 15)


def shl_limbs_take(x, j):
    """x * 2^(16 j) for per-element j >= 0 (pure limb relabeling — exact on
    redundant limbs). Truncates limbs that fall off the top; callers size
    buffers so that never holds value. Gather-free (binary limb shifts)."""
    L = x.shape[-1]
    out = x
    sh = 1
    while sh < L:
        shifted = jnp.concatenate(
            [jnp.zeros_like(out[..., :sh]), out[..., :L - sh]], axis=-1)
        out = jnp.where(((j[..., None] & sh) != 0), shifted, out)
        sh <<= 1
    return out * (j[..., None] < L)


def pow2f(e):
    """2^e as f32 for int32 e; 0 for e < -126 (underflow), inf-safe for
    e > 127 is NOT handled — callers clamp."""
    ok = e >= -126
    bits = ((jnp.clip(e, -126, 127) + 127) << 23).astype(jnp.int32)
    val = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(ok, val, 0.0)


def log2f_i(mant):
    """floor-ish log2 |mant| as int32 via f32 exponent bits; 0 -> -200."""
    bits = jax.lax.bitcast_convert_type(jnp.abs(mant), jnp.int32)
    e = (bits >> 23) - 127
    return jnp.where(mant == 0.0, -200, e)


def value_est(x):
    """(mant, top) with value(x) ~= mant * 2^(16 top), mant SIGNED f32.

    x must have BALANCED limbs within ~2^15.7 — any carry_pass/carry2
    output qualifies, as do single carry_pass sums whose pre-carry terms
    stay under ~2^30.5 (reduce2 feeds such). Balance rules out
    catastrophic cancellation in the masked f32 sum, so the relative
    error stays ~2^-19 against the 0.25-bit flag margins downstream. For
    the all-zero value returns (0.0, 0)."""
    L = x.shape[-1]
    idx = jnp.arange(L, dtype=jnp.int32)
    nz = x != 0
    top = jnp.max(jnp.where(nz, idx, 0), axis=-1)
    e = 16 * (idx - top[..., None])
    mant = jnp.sum(x.astype(jnp.float32) * pow2f(e), axis=-1)
    return mant, top


def bits_est(mant, top):
    """~bit length of the estimated value as f32 (signed -> of |value|);
    -inf-ish (very negative) for zero."""
    return 16.0 * top.astype(jnp.float32) + _log2_f32(jnp.abs(mant))


def _log2_f32(v):
    bits = jax.lax.bitcast_convert_type(jnp.maximum(v, 1e-30), jnp.int32)
    e = ((bits >> 23) - 127).astype(jnp.float32)
    frac = jax.lax.bitcast_convert_type(
        (bits & 0x7FFFFF) | (127 << 23), jnp.float32)  # in [1, 2)
    # log2(frac) ~ frac - 1 + small correction; 0.06 max err is fine for our
    # tolerance windows (we only gate loops with ~0.5-bit margins)
    return jnp.where(v <= 1e-30, -200.0, e + (frac - 1.0) * (2.0 - frac * 0.5) * 0.7219281)


def digit_est(mant_x, top_x, mant_m, top_m, max_digit_bits: int = 28):
    """Estimate q = value(x) / value(m) as (qd, j) with q ~= qd * 2^(16 j),
    qd SIGNED int32, |qd| < 2^max_digit_bits, j >= 0.

    Used for top-down reduction: one subtraction of qd*m << 16j removes
    ~(digit bits) from x. m must be positive."""
    ratio = mant_x / jnp.maximum(mant_m, 1e-30)
    ebits = 16 * (top_x - top_m)
    qbits = ebits + log2f_i(ratio) + 1
    j = jnp.maximum((qbits - max_digit_bits + 15) // 16, 0)
    scale = pow2f(jnp.clip(ebits - 16 * j, -126, max_digit_bits + 2))
    qd = jnp.round(ratio * scale)
    lim = float((1 << max_digit_bits) - 1)
    return jnp.clip(qd, -lim, lim).astype(jnp.int32), j


def submul_shifted(x, qd, j, m, m14):
    """x - qd * m * 2^(16 j) on redundant limbs; |qd| < 2^28 via 14+14 split
    against m (canonical) and m14 (canonical m*2^14). One carry pass folded
    in so products stay in int32."""
    s = jnp.sign(qd)
    a = jnp.abs(qd)
    lo = (a & 0x3FFF) * s
    hi = (a >> 14) * s
    p = carry_pass(lo[..., None] * m) + carry_pass(hi[..., None] * m14)
    return x - shl_limbs_take(p, j)


def mod_topdown28(x, m_mag, active=None, max_iters: int | None = None):
    """x mod m with 28-BIT estimated digits (vs mod_topdown's 16): each
    iteration subtracts qd * m * 2^(16 j) via digit_est + submul_shifted,
    eating ~28 bits, so the trip count roughly halves. Same contract and
    exact tail as mod_topdown. MEASURED NEGATIVE on a v5e (round 3):
    compose2 189.8 ms vs 125.3 ms @8192 — the in-loop shifted submul
    (8 masked limb-shift passes per product) costs more than the halved
    trip count saves. Kept as a tested alternative (COFHE_MU28=1); the
    default 16-bit walking-window path stays."""
    L = x.shape[-1]
    Lm = m_mag.shape[-1]
    assert Lm < L, (Lm, L)
    m = lb.resize(m_mag, L)
    _, m14 = lb.canonicalize_fast(m << 14)
    mant_m, top_m = value_est(m)
    bits_m = bits_est(mant_m, top_m)
    if active is None:
        active = jnp.ones(x.shape[:-1], bool)
    if max_iters is None:
        max_iters = L + 60
    jmax = jnp.maximum(L - 2 - top_m, 0)

    def need_work(xc):
        mant_x, top_x = value_est(xc)
        w = active & (bits_est(mant_x, top_x) > bits_m - 0.75)
        return w, mant_x, top_x

    def cond(state):
        w, it = state[1], state[-1]
        return (it < max_iters) & jnp.any(w)

    def body(state):
        xc, w, mant_x, top_x, it = state
        qd, j = digit_est(mant_x, top_x, mant_m, top_m, max_digit_bits=28)
        # clipping j down only slows convergence (qd saturates at 2^28-1)
        j = jnp.minimum(j, jmax)
        qd = jnp.where(w, qd, 0)
        xn = carry2(submul_shifted(xc, qd, j, m, m14))
        wn, mxn, txn = need_work(xn)
        return xn, wn, mxn, txn, it + 1

    x0 = carry2(x)
    w0, mx0, tx0 = need_work(x0)
    xf, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, w0, mx0, tx0, jnp.int32(0)))

    # exact tail (same as mod_topdown)
    s, mag = lb.canonicalize_fast(xf)
    for _ in range(2):
        ge = (s > 0) & (lb.mag_cmp(mag, m) >= 0)
        neg = s < 0
        delta = jnp.where(neg[..., None], m, 0) - jnp.where(ge[..., None], m, 0)
        s, mag = lb.canonicalize_fast(s[..., None] * mag + delta)
    return mag


def mod_topdown(x, m_mag, active=None, max_iters: int | None = None,
                unroll: int = 1):
    """x mod m -> canonical magnitude in [0, m), for SIGNED redundant x and
    canonical m >= 1 (per element). active: bool mask — inactive elements
    are passed through cheaply and do not hold the early exit open.

    GATHER-FREE schoolbook with ~24-bit digits: a shifted copy of m starts
    ONE LIMB BELOW x's value top (one batched limb-shift outside the loop —
    per-row dynamic limb shifts are prohibitive inside TPU while loops) so
    the estimated digit against it carries ~16-24 bits, and walks DOWN up
    to two limbs per iteration to hold that alignment as x shrinks. The
    digit is applied 12+12 against (msh, msh<<12), keeping every product
    within int32. Profiling round 4: the previous above-the-top walk
    extracted only ~9.3 bits/iteration (224 iterations for the compose2 mu
    reduction = 72% of compose2 device time); this variant halves the trip
    count at the same per-iteration cost. Ends with an exact canonical
    tail (<= 2 fixes)."""
    L = x.shape[-1]
    Lm = m_mag.shape[-1]
    assert Lm < L, (Lm, L)  # need >= 1 guard limb for m << 12
    m = lb.resize(m_mag, L)
    mant_m, top_m = value_est(m)
    bits_m = bits_est(mant_m, top_m)
    if active is None:
        active = jnp.ones(x.shape[:-1], bool)

    x0 = carry2(x)

    def need_work(xc):
        mant_x, top_x = value_est(xc)
        bx = bits_est(mant_x, top_x)
        w = active & (bx > bits_m - 0.75)
        return w, mant_x, top_x, bx

    w0, mx0, tx0, bx0 = need_work(x0)
    # per-element: align msh's VALUE 8-24 bits below |x|'s (clamped so
    # m<<12 shifted keeps its top <= L-1). The walk below tracks the VALUE
    # estimate, not the top limb index — a balanced top limb of +-1 can
    # leave the value at half the limb scale, and a limb-index walk then
    # stalls with ~0-bit digits (round-4 bug).
    wmax = (L - 2 - top_m).astype(jnp.int32)
    wleft0 = jnp.clip(((bx0 - bits_m - 8.0) / 16.0).astype(jnp.int32),
                      0, wmax)
    _, m12 = lb.canonicalize_fast(m << 12)
    msh0 = shl_limbs_take(m, wleft0)
    m12sh0 = shl_limbs_take(m12, wleft0)
    if max_iters is None:
        max_iters = 2 * L + 80

    def shift_down(v):
        return jnp.concatenate([v[..., 1:], jnp.zeros_like(v[..., :1])], axis=-1)

    # while-carry is int32-only (bool / f32 carries fail Mosaic's scf.yield
    # legalization when this loop runs inside the Pallas kernel; bitcast
    # the f32 mantissa estimate, keep the work mask as int32)
    def cond(state):
        w = state[4]
        it = state[-1]
        return (it < max_iters) & jnp.any(w != 0)

    def body(state):
        xc, msh, m12sh, wleft, wi, mant_bits, top_x, it = state
        w = wi != 0
        mant_x = jax.lax.bitcast_convert_type(mant_bits, jnp.float32)
        top_s = top_m + wleft
        ratio = mant_x / jnp.maximum(mant_m, 1e-30)
        # exponent clamp only guards f32 overflow (ratio <= ~2^17, so 2^60
        # keeps the product finite); the DIGIT clamp below is the real
        # bound. Clamping the exponent near the digit width instead
        # silently under-shoots when the limb gap is 2 but mant_x/mant_m
        # is small, stalling the loop (round-4 bug).
        scale = pow2f(jnp.clip(16 * (top_x - top_s), -126, 60))
        qd = jnp.clip(jnp.round(ratio * scale), -16777215.0,
                      16777215.0).astype(jnp.int32)
        qd = jnp.where(w, qd, 0)
        s = jnp.sign(qd)
        a = jnp.abs(qd)
        lo = (a & 0xFFF) * s
        hi = (a >> 12) * s
        xn = carry2(xc - lo[..., None] * msh - hi[..., None] * m12sh)
        wn, mxn, txn, bxn = need_work(xn)
        # hold bits(msh) ~8-24 below bits(x): a ~24-bit digit drops x by up
        # to two limbs, so walk down <= 2 per iteration (cheap static
        # shifts; do NOT walk below the unshifted m)
        for _ in range(2):
            do_shift = (wleft > 0) & (bits_m + 16.0 * wleft > bxn - 8.0)
            msh = jnp.where(do_shift[..., None], shift_down(msh), msh)
            m12sh = jnp.where(do_shift[..., None], shift_down(m12sh), m12sh)
            wleft = wleft - do_shift.astype(jnp.int32)
        return (xn, msh, m12sh, wleft, wn.astype(jnp.int32),
                jax.lax.bitcast_convert_type(mxn, jnp.int32), txn, it + 1)

    xf, _, _, _, _, _, _, _ = jax.lax.while_loop(
        cond, unrolled(body, unroll),
        (x0, msh0, m12sh0, wleft0, w0.astype(jnp.int32),
         jax.lax.bitcast_convert_type(mx0, jnp.int32), tx0, jnp.int32(0)))

    # exact tail: |xf| <~ 1.7 m; canonicalize, then fold sign / subtract
    s, mag = lb.canonicalize_fast(xf)
    for _ in range(2):
        ge = (s > 0) & (lb.mag_cmp(mag, m) >= 0)
        neg = s < 0
        delta = jnp.where(neg[..., None], m, 0) - jnp.where(ge[..., None], m, 0)
        s, mag = lb.canonicalize_fast(s[..., None] * mag + delta)
    return mag


def lehmer_euclid(r0_mag, r1_mag, bits_stop, max_groups: int,
                  sim_steps: int = 8, active=None):
    """Grouped partial extended Euclid (Lehmer style), batched.

    Maintains EXACT invariants  r_i = x_i * r0 + y_i * r1  for two rows
    (prev, cur), starting ((r0,1,0), (r1,0,1)). Per group: simulate up to
    `sim_steps` continued-fraction steps on ~27-bit int32 top-word
    approximations of (rp, rc) — cheap (batch,) scalar ops — accumulating a
    2x2 matrix with entries bounded by 2^13, then apply the matrix ONCE to
    the full-width redundant (r, x, y) rows (products int32-exact against
    balanced limbs). Any unimodular matrix preserves the invariants, so
    estimation noise can only slow progress, never break correctness —
    this is the top-down (CF) analogue of the divstep groups in
    ops/xgcd2.py, and the engine of the NUCOMP composition tail in
    forms2.compose2 (the role BICYCL's partial reduction plays behind the
    reference's qfi.inl call sites).

    Stops per lane when bits(rc) <= bits_stop, when the cofactor yc
    outgrows its bound (bits(r0) - bits_stop + 24 — keeps downstream
    product widths static), or at max_groups. Returns redundant signed
    (rp, rc, xp, xc, yp, yc) and parity (#row swaps mod 2, the det sign of
    [[xp,yp],[xc,yc]])."""
    if active is None:
        active = jnp.ones(r0_mag.shape[:-1], bool)
    mant0, top0 = value_est(r0_mag)
    bits_r0 = bits_est(mant0, top0)
    y_cap = bits_r0 - bits_stop + 24.0

    one = jnp.concatenate([jnp.ones_like(r0_mag[..., :1]),
                           jnp.zeros_like(r0_mag[..., 1:])], axis=-1)
    zero = jnp.zeros_like(r0_mag)
    LIM = 1 << 13

    def ests(v):
        mant, top = value_est(v)
        return mant, top, bits_est(mant, top)

    def cond(state):
        it = state[-1]
        return (it < max_groups) & jnp.any(state[-2] != 0)

    def body(state):
        rp, rc, xp, xc, yp, yc, par, _w, it = state
        mant_p, top_p, bits_p = ests(rp)
        mant_c, top_c, bits_c = ests(rc)
        _, _, bits_y = ests(yc)
        # fresh per-lane work mask (the carried copy only feeds cond, one
        # group stale — worth it to est each row once per group)
        w_f = active & (bits_c > bits_stop) & (bits_y < y_cap)
        lane_on = (_w != 0) & w_f  # finished lanes get identity updates
        # CF quotients above the 2^13 matrix-entry bound cannot be
        # expressed by the Lehmer group at all (a clamped 13-bit quotient
        # makes ~zero progress against a 100-bit gap — round-4 ladder
        # stall: P(quotient > 2^13) ~ 2^-13 per CF step guarantees such
        # lanes at B=16k). Those lanes instead take ONE shifted ~24-bit
        # digit step per group (exact, unimodular, no swap):
        #   (rp, xp, yp) -= qd * 2^(16 jj) * (rc, xc, yc)
        big = lane_on & (bits_p - bits_c > 20.0)
        sc = jnp.sign(mant_c).astype(jnp.int32)
        qd, jj = digit_est(mant_p, top_p, jnp.abs(mant_c), top_c,
                           max_digit_bits=24)
        qd = jnp.where(big, qd * sc, 0)

        def submul_shift_red(x, v):
            s = jnp.sign(qd)
            a = jnp.abs(qd)
            lo = (a & 0xFFF) * s
            hi = (a >> 12) * s
            v12 = carry_pass(v << 12)
            p = carry_pass(lo[..., None] * v) + carry_pass(hi[..., None] * v12)
            return carry_pass(x - shl_limbs_take(p, jj))

        # the digit machinery (~27 elementwise passes) only runs when some
        # lane actually faces a big gap — a real XLA conditional, since most
        # groups have none
        rp_d, xp_d, yp_d = jax.lax.cond(
            jnp.any(big),
            lambda: (submul_shift_red(rp, rc), submul_shift_red(xp, xc),
                     submul_shift_red(yp, yc)),
            lambda: (rp, xp, yp))

        # Lehmer group for the in-range lanes: top-word approximations
        # aligned at rp's scale, ~27 significant bits (values < 2^28)
        sh = (jnp.maximum(bits_p, bits_c) - 26.0)
        up = jnp.round(mant_p * pow2f(
            jnp.clip((16 * top_p).astype(jnp.float32) - sh, -126.0,
                     30.0).astype(jnp.int32))).astype(jnp.int32)
        vc = jnp.round(mant_c * pow2f(
            jnp.clip((16 * top_c).astype(jnp.float32) - sh, -126.0,
                     30.0).astype(jnp.int32))).astype(jnp.int32)
        # simulate CF steps on (up, vc); matrix rows (mp0, mp1), (mc0, mc1)
        mp0 = jnp.ones_like(up)
        mp1 = jnp.zeros_like(up)
        mc0 = jnp.zeros_like(up)
        mc1 = jnp.ones_like(up)
        parg = jnp.zeros_like(up)
        sim_on = lane_on & jnp.logical_not(big)
        for _ in range(sim_steps):
            emax = jnp.maximum(jnp.abs(mc0), jnp.abs(mc1))
            epmx = jnp.maximum(jnp.abs(mp0), jnp.abs(mp1))
            qmax = (LIM - epmx) // jnp.maximum(emax, 1)
            can = sim_on & (jnp.abs(vc) > 32) & (qmax > 0)
            q = jnp.clip(up // jnp.where(vc == 0, 1, vc), -qmax, qmax)
            q = jnp.where(can, q, 0)
            up2 = jnp.where(can, vc, up)
            vc2 = jnp.where(can, up - q * vc, vc)
            np0 = jnp.where(can, mc0, mp0)
            np1 = jnp.where(can, mc1, mp1)
            nc0 = jnp.where(can, mp0 - q * mc0, mc0)
            nc1 = jnp.where(can, mp1 - q * mc1, mc1)
            parg = parg ^ can.astype(jnp.int32)
            up, vc, mp0, mp1, mc0, mc1 = up2, vc2, np0, np1, nc0, nc1
        # apply the group matrix to the full-width rows (entries <= 2^13,
        # balanced limbs < ~2^15.3: products < 2^29 — int32-exact); big
        # lanes take their digit-step result instead (their matrix is the
        # identity by construction)
        def app(a0, a1, pv, cv, dv):
            out = carry_pass(a0[..., None] * pv + a1[..., None] * cv)
            return jnp.where(big[..., None], dv, out)

        rp2 = app(mp0, mp1, rp, rc, rp_d)
        rc2 = app(mc0, mc1, rp, rc, rc)
        xp2 = app(mp0, mp1, xp, xc, xp_d)
        xc2 = app(mc0, mc1, xp, xc, xc)
        yp2 = app(mp0, mp1, yp, yc, yp_d)
        yc2 = app(mc0, mc1, yp, yc, yc)
        par2 = par ^ parg
        return rp2, rc2, xp2, xc2, yp2, yc2, par2, w_f.astype(jnp.int32), it + 1

    w0 = (active & (bits_est(*value_est(r1_mag)) > bits_stop)).astype(jnp.int32)
    state0 = (carry_pass(r0_mag.astype(jnp.int32)),
              carry_pass(r1_mag.astype(jnp.int32)),
              one, zero, zero, one,
              jnp.zeros(r0_mag.shape[:-1], jnp.int32), w0, jnp.int32(0))
    rp, rc, xp, xc, yp, yc, par, _, _ = jax.lax.while_loop(
        cond, body, state0)
    return rp, rc, xp, xc, yp, yc, par


def redc_pow16(x, d_mag, d8, dinv16, steps: int, active=None,
               unroll: int = 1):
    """x * 2^(-16*steps) mod d for ODD canonical d, redundant nonneg x.

    Per step: add t*d to clear the low 16 bits (t = x0 * (-d^-1) mod 2^16),
    drop one limb. Returns a redundant value in [0, ~2d). `steps` is static
    (the caller folds the 2^(16*steps) scale into a matching un-scaling
    pass); when no element is active the loop exits immediately."""
    if active is None:
        active = jnp.ones(x.shape[:-1], bool)
    minv = (-dinv16) & MASK

    def body(k, xc):
        t = ((xc[..., 0] & MASK) * minv) & MASK
        t = jnp.where(active, t, 0)
        t_lo = t & 0xFF
        t_hi = t >> 8
        y = xc + t_lo[..., None] * d_mag + t_hi[..., None] * d8
        # low limb of y is ≡ 0 mod 2^16: shift down one limb exactly
        c0 = y[..., 0] >> BASE_BITS
        y = jnp.concatenate(
            [(y[..., 1] + c0)[..., None], y[..., 2:],
             jnp.zeros_like(y[..., :1])], axis=-1)
        return carry_pass(y)

    def cond(state):
        k, _ = state
        return (k < steps) & jnp.any(active)

    def wbody(state):
        k, xc = state
        return k + 1, body(k, xc)

    while steps % unroll:
        unroll //= 2  # exact step count required: drop to a divisor
    _, out = jax.lax.while_loop(cond, unrolled(wbody, unroll),
                                (jnp.int32(0), carry_pass(x)))
    return out
