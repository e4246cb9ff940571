"""v2 batched Gauss composition + reduction on balanced redundant limbs.

Same algebra as ops/forms.py (documented there; mirrors BICYCL nucomp's role
behind /root/reference/include/x86_64/qfi.inl) but a new computation
strategy, ~10x fewer elementwise passes:

* identity fast path: operands with a == 1 are substituted by a fixed
  non-identity form (h) and the result selected afterwards — the Yao bank is
  mostly identities early on and the identity's c = |Delta|/4 would drag
  every loop to full width.
* xgcd via ops/xgcd2.py: single Bezout column, no in-loop canonicalization.
* second gcd g = gcd(d1, |s|) via Montgomery REDC at width 8 (d1 < 2^120
  with a full-width rare-path fallback that early-exits to ~zero work when
  unused), then xi from the EXACT integer identity
      xi = (g - eta0*|s|) / d1
  so no big division for the Bezout triple at all.
* mu = [u*(b2-b1) - 2*w*c1] mod 2*m2 with ONE estimate-driven top-down
  reduction (rl.mod_topdown) instead of two schoolbook long divisions.
* reduction: estimate-driven rho-descent on redundant (a, b, c) with 28-bit
  digits and ONE exact tail (the v1 reduce_batch, which early-exits after
  <= ~2 steps).

nudupl is compose(F, F): the dedicated rotation-based nudupl formula can
overflow (a3 = (c/g)^2 with c up to |Delta|/4a) for small-a forms, while
composition keeps a1 * a2_rotated <= ~|Delta| always; squaring runs on the
small doubling-chain batch so the extra xgcd is noise.

Bit-exact vs core.qfi (reduction theory: the reduced representative is
unique, so only final results must match).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import limb as lb
from . import rl
from .forms import BForm, bform_select, reduce_batch, rotate_to_odd
from .xgcd2 import xgcd_coeff_g


def _renorm_est(m, t):
    """Renormalize a (mant f32, top int32) estimate so |mant| lands back
    in ~[1, 2^16) (zero mant passes through). Clip covers the per-step
    drift of the grouped-rho sim (<= 2^13 growth / full cancellation)."""
    sh = jnp.clip(rl.log2f_i(m) >> 4, -4, 4)
    z = m == 0.0
    return (jnp.where(z, m, m * rl.pow2f(-16 * sh)),
            jnp.where(z, t, t + sh))


@dataclass(frozen=True)
class CGCtx:
    """Static context for one discriminant: widths + shared constants."""

    disc_bits: int
    L: int           # form coefficient width (limbs)
    Lh: int          # half width: reduced-form a/b values (~disc/2 bits)

    @staticmethod
    def widths_for_disc_bits(disc_bits: int):
        L = (disc_bits + 16 * 6) // 16 + 1
        L = ((L + 7) // 8) * 8
        Lh = (disc_bits // 2 + 64) // 16 + 1
        Lh = ((Lh + 7) // 8) * 8
        return L, Lh


class CG:
    """Per-discriminant kernel family. Holds the device constants (delta/4,
    the substitute forms h, h2) so the jitted functions close over numpy
    arrays only (device-array closures can deadlock lowering on some
    backends)."""

    def __init__(self, disc_bits: int, delta4_L2: np.ndarray, h_forms,
                 h2_forms=None, use_pallas: bool = False,
                 use_pallas_mu: bool | None = None):
        import os

        self.use_pallas = use_pallas
        # fixed at construction (NOT at trace time: kernels are lru_cached
        # per shape, so a late env flip would silently mix variants)
        self.use_mu28 = os.environ.get("COFHE_MU28") == "1"
        # Pallas VMEM-resident mu loop: OPT-IN (COFHE_PALLAS_MU=1).
        # Measured on a v5e @8192: compose2 134.3 ms with it vs 127.9 ms
        # with the XLA loop — Mosaic's generated loop code loses ~2x per
        # iteration, the same verdict as the Pallas xgcd. Kept as the
        # scaffolding for a future fused multi-phase kernel.
        if use_pallas_mu is None:
            from .pallas_group import env_enabled_mu

            use_pallas_mu = env_enabled_mu(False)
        self.use_pallas_mu = use_pallas_mu
        # NUCOMP tail (Lehmer-grouped partial reduction) — OPT-IN
        # (COFHE_NUCOMP=1). Measured on a v5e at the real matmul-ladder
        # distribution (B=16384, round 4): the Lehmer loop needs ~143
        # groups (the CF of mu/2B is ~300 small quotients; 2^13 matrix
        # entries cap progress at ~13 bits/group) and the cofactor-form
        # muls add ~150 ms/step, vs the plain rho-descent tail's ~147 ms
        # 3-array loop — NUCOMP loses end-to-end (24.7 s vs 12.8 s per
        # ladder) even though it wins on the 8-distinct-pair micro. The
        # C++ host backend keeps NUCOMP (GMP's subquadratic big-word muls
        # make the cofactor products nearly free there).
        self.use_nucomp = os.environ.get("COFHE_NUCOMP", "0") == "1"
        # grouped-rho reduction (round 5): default ON; COFHE_GROUPED_RHO=0
        # falls back to the per-quotient iteration loop
        self.use_grouped_rho = os.environ.get("COFHE_GROUPED_RHO", "1") == "1"
        self.disc_bits = disc_bits
        L, Lh = CGCtx.widths_for_disc_bits(disc_bits)
        self.L = L
        self.Lh = Lh
        self.L2 = 2 * L
        self.delta4 = np.asarray(delta4_L2)  # (2L,) magnitude of |Delta|/4
        # |Delta| as a (mant, top) float estimate for the grouped-rho sim's
        # invariant-derived c: c = (b^2 + |Delta|) / 4a
        d4int = 0
        for i, v in enumerate(self.delta4.tolist()):
            d4int += int(v) << (16 * i)
        dD = 4 * d4int
        tD = max((dD.bit_length() - 1) // 16, 0)
        sh = max(dD.bit_length() - 48, 0)
        self.dD_mant = float(dD >> sh) * (2.0 ** (sh - 16 * tD))
        self.dD_top = int(tD)
        # substitute forms for the identity fast path: TWO DIFFERENT fixed
        # reduced non-identity forms (h and h^2 from the cryptosystem).
        # Substituting the same form on both sides makes identity lanes
        # SELF-composes, whose first gcd d1 = gcd(a, a) = a is ~disc/2 bits
        # and drags the whole batch onto the full-width rare path of the
        # second-gcd block — measured 10x on the ladder, where early
        # windows are mostly identity bank lanes.
        a, bs, b, c = h_forms
        self.h_a = np.asarray(a)
        self.h_bs = np.asarray(bs)
        self.h_b = np.asarray(b)
        self.h_c = np.asarray(c)
        if h2_forms is None:
            h2_forms = h_forms  # legacy callers; self-compose slow path
        a2_, bs2, b2_, c2_ = h2_forms
        self.h2_a = np.asarray(a2_)
        self.h2_bs = np.asarray(bs2)
        self.h2_b = np.asarray(b2_)
        self.h2_c = np.asarray(c2_)
        self.xgcd_nbits = disc_bits + 32
        self.mu_iters = (2 * 16 * L) // 13 + 24
        self.red_iters = (2 * disc_bits) // 13 + 96
        # Tight worst-case intermediate widths (all bounds hold for ANY
        # reduced inputs, including rotated a2 up to |Delta|/4):
        #   u  = xi*beta       <= |s| * a2r         <= 3D/2 bits
        #   t1 = u*(b2-b1)     <= 2D+2 bits   (mu_red / b3h^2 width)
        #   t2 = eta0*c1       <= a1*c1 <= |Delta|/3  -> fits L
        # Each gets >= 2 guard limbs for the redundant-limb loops.
        def _r8(limbs):
            return ((limbs + 7) // 8) * 8

        self.Lu = _r8((3 * disc_bits // 2 + 48 + 15) // 16)
        self.Lm = max(_r8((2 * disc_bits + 34 + 15) // 16), L + 8)
        self.Lsq = min(_r8((disc_bits + 19 + 15) // 16), L)  # b3/2 operand
        # NUCOMP numerators a3*x^2 / b3*x*y / c3*y^2: worst case ~2D+|y|^2
        # with the lehmer_euclid y-cap — Lm + 1 limb of margin
        self.Ln = self.Lm + 8
        self.eu_groups = disc_bits // 16 + 48
        # narrow width for the first xgcd: reduced a's are <= ~D/2 bits, and
        # rotated-in c2 exceeds Lxn only when a2 < |Delta|/2^(16*Lxn) — for
        # random class-group elements that has probability ~2^-400; such
        # lanes fall through to a full-width pass that early-exits when
        # unused (same pattern as the second-gcd rare path)
        self.Lxn = min(_r8(Lh + 16), L)

    # ------------------------------------------------------------ helpers
    @staticmethod
    def _unroll_for(x) -> int:
        """While-body unroll factor (see rl.unrolled). MEASURED NEGATIVE
        on a v5e (round 4): compose2 @256 lanes is 27.5 / 26.4 / 25.4 /
        26.1 ms at unroll 1/2/4/8 — the small-batch cost is per-FUSED-
        KERNEL launch inside the body (unrolling just launches 4x as many
        per iteration), not while-loop bookkeeping, so the ~8% gain does
        not cover the 4x compiled-program growth (the CPU test tier's
        compile times blew past their budget). Plumbing kept for future
        fused-kernel work; the effective small-batch lever is batching the
        chains wider instead (engine.scal_matmul chain hoist)."""
        return 1

    def _is_one(self, mag):
        return (mag[..., 0] == 1) & (jnp.sum(mag, axis=-1) == 1)

    def _h_bform(self):
        return BForm(jnp.asarray(self.h_a), jnp.asarray(self.h_bs),
                     jnp.asarray(self.h_b), jnp.asarray(self.h_c))

    def _h2_bform(self):
        return BForm(jnp.asarray(self.h2_a), jnp.asarray(self.h2_bs),
                     jnp.asarray(self.h2_b), jnp.asarray(self.h2_c))

    # ------------------------------------------------------------- reduce
    def reduce2(self, a_red, b_red, c_red, grouped: bool | None = None):
        """Reduction front-end. grouped=None -> self.use_grouped_rho
        (default on, COFHE_GROUPED_RHO=0 flips it); the scan kernels
        (matmul/wNAF/Yao ladders) pass grouped=False explicitly — the
        grouped loop wins 1.5-2x in standalone jits at every batch size
        measured (8..16384), but when the same while is embedded in a scan
        body that carries a slot bank, XLA's scheduling makes its per-group
        cost ~5x (ladder A/B: 23.6 s vs 13.8 s per chunk; the
        optimization-barrier and sim-size ablations in docs/PLAN_r5.md rule
        out the sim graph and trip counts). Inputs must be a genuine form
        of this discriminant (b^2 - 4ac = Delta) — the grouped sim derives
        c-magnitude estimates from that invariant."""
        if grouped is None:
            grouped = self.use_grouped_rho
        if grouped:
            return self.reduce2_grouped(a_red, b_red, c_red)
        return self.reduce2_iter(a_red, b_red, c_red)

    def _c_est(self, ma, ta, mb, tb):
        """Estimate (mant, top) of c = (b^2 + |Delta|) / (4a) from the
        estimates of a and b via the discriminant invariant — the key to
        simulating rho-descent steps on scalars: the direct update
        c' = c + q*(q*a - b) cancels catastrophically (c drops from
        ~b^2/4a to ~|Delta|/4a in one normalization), while the invariant
        form never does."""
        t2b = 2 * tb
        tD = jnp.int32(self.dD_top)
        tbig = jnp.maximum(t2b, tD)
        m1 = (mb * mb) * rl.pow2f(jnp.clip(16 * (t2b - tbig), -126, 0))
        m2 = jnp.float32(self.dD_mant) * rl.pow2f(
            jnp.clip(16 * (tD - tbig), -126, 0))
        mc = (m1 + m2) / jnp.maximum(4.0 * ma, 1e-30)
        return _renorm_est(mc, tbig - ta)

    def reduce2_grouped(self, a_red, b_red, c_red):
        """Grouped rho-descent: simulate up to SIM_STEPS normalization/rho
        quotients per group on (mant, top) scalar estimates — accumulating
        a 2x2 unimodular matrix M with entries bounded by 2^12 — then apply
        M ONCE to the full-width limb arrays via the quadratic-form
        transform
            a' = a p^2 + b p r + c r^2
            b' = 2 a p q + b (p s + q r) + 2 c r s
            c' = a q^2 + b q s + c s^2        (M = [[p, q], [r, s]])
        with 13+12-bit split coefficients (6 int32-exact products per
        output against balanced limbs). Any unimodular M preserves the
        class and the invariant, so estimate noise can only waste a group,
        never corrupt. Per 12 quotient-bits this costs ~14 wide passes vs
        ~37 for the per-quotient loop (the measured 72%-of-compose2
        hotspot, round-4 trace; reference hot path qfi.inl:1-135).
        Exact-tail and freak-quotient semantics match reduce2_iter."""
        import os

        # 3 sim steps nearly always exhaust the 12-bit matrix budget (CF
        # quotients average ~4.7 bits); 6 steps only help rare tiny-quotient
        # runs and DOUBLE the while-body graph — measured to break XLA's
        # in-scan fusion of the sim chains (yao2 ladder 9.3 s vs 5.5 s with
        # the old loop, while the standalone compose2 was 1.5x FASTER).
        SIM_STEPS = int(os.environ.get("COFHE_RHO_SIM_STEPS", "3"))
        LIM = 4096  # 2^12 matrix-entry bound

        def flags(ma, ta, mb, tb, mc, tc):
            bitsA = rl.bits_est(ma, ta)
            bitsB = rl.bits_est(mb, tb)
            bitsC = rl.bits_est(mc, tc)
            raw_norm = bitsB > bitsA + 0.25
            freak = bitsB - bitsA > 25.0
            need_rho = jnp.logical_not(raw_norm) & (bitsC < bitsA - 0.25)
            return raw_norm & jnp.logical_not(freak), need_rho

        def cond(state):
            w, it = state[-2], state[-1]
            return (it < self.red_iters) & jnp.any(w != 0)

        def body(state):
            a, b, c, ma, ta, mb, tb, w, it = state
            lane = w != 0
            # ---- scalar simulation of up to SIM_STEPS quotients
            p = jnp.ones_like(ta)
            r = jnp.zeros_like(ta)
            qq = jnp.zeros_like(ta)
            ss = jnp.ones_like(ta)
            sma, sta, smb, stb = ma, ta, mb, tb
            for _ in range(SIM_STEPS):
                mc_e, tc_e = self._c_est(sma, sta, smb, stb)
                need_norm, need_rho = flags(sma, sta, smb, stb, mc_e, tc_e)
                act = lane & (need_norm | need_rho)
                do_rho = act & need_rho
                man = jnp.where(do_rho, mc_e, sma)
                tan = jnp.where(do_rho, tc_e, sta)
                mbn = jnp.where(do_rho, -smb, smb)
                # matrix right-multiplied by rho = [[0,-1],[1,0]]
                p2 = jnp.where(do_rho, qq, p)
                qq2 = jnp.where(do_rho, -p, qq)
                r2 = jnp.where(do_rho, ss, r)
                ss2 = jnp.where(do_rho, -r, ss)
                # digit q ~ b/2a, clipped to the remaining matrix budget
                ratio = mbn / jnp.maximum(2.0 * man, 1e-30)
                scale = rl.pow2f(jnp.clip(16 * (stb - tan), -126, 60))
                col1 = jnp.maximum(jnp.abs(p2), jnp.abs(r2))
                col2 = jnp.maximum(jnp.abs(qq2), jnp.abs(ss2))
                qcap = ((LIM - col2) // jnp.maximum(col1, 1)).astype(jnp.float32)
                qf = jnp.clip(jnp.round(ratio * scale), -qcap, qcap)
                qf = jnp.where(act, qf, 0.0)
                qi = qf.astype(jnp.int32)
                # b <- b - 2 q a, evaluated at b's scale (safe negative
                # exponent), renormalized against the cancellation
                inv = rl.pow2f(jnp.clip(16 * (tan - stb), -126, 60))
                smb, stb = _renorm_est(mbn - 2.0 * qf * man * inv, stb)
                sma, sta = man, tan
                p, r = p2, r2
                qq, ss = qq2 - qi * p2, ss2 - qi * r2
            # ---- apply M once to the limb arrays (13+12 split)
            a13 = rl.carry_pass(a << 13)
            b13 = rl.carry_pass(b << 13)
            c13 = rl.carry_pass(c << 13)

            def coefmul(coef, v, v13):
                s = jnp.sign(coef)
                u = jnp.abs(coef)
                lo = (u & 0x1FFF) * s
                hi = (u >> 13) * s
                return lo[..., None] * v + hi[..., None] * v13

            def xform(ca, cb, cc):
                return rl.carry_pass(coefmul(ca, a, a13)
                                     + coefmul(cb, b, b13)
                                     + coefmul(cc, c, c13))

            a2 = xform(p * p, p * r, r * r)
            b2 = xform(2 * p * qq, p * ss + qq * r, 2 * r * ss)
            c2 = xform(qq * qq, qq * ss, ss * ss)
            ma2, ta2 = rl.value_est(a2)
            mb2, tb2 = rl.value_est(b2)
            mc2, tc2 = self._c_est(ma2, ta2, mb2, tb2)
            nn, nr = flags(ma2, ta2, mb2, tb2, mc2, tc2)
            return (a2, b2, c2, ma2, ta2, mb2, tb2,
                    (nn | nr).astype(jnp.int32), it + 1)

        a0 = rl.carry2(a_red)
        b0 = rl.carry2(b_red)
        c0 = rl.carry2(c_red)
        ma0, ta0 = rl.value_est(a0)
        mb0, tb0 = rl.value_est(b0)
        mc0, tc0 = self._c_est(ma0, ta0, mb0, tb0)
        nn0, nr0 = flags(ma0, ta0, mb0, tb0, mc0, tc0)
        a, b, c, _, _, _, _, _, _ = jax.lax.while_loop(
            cond, body, (a0, b0, c0, ma0, ta0, mb0, tb0,
                         (nn0 | nr0).astype(jnp.int32), jnp.int32(0)))

        _, am = lb.canonicalize_fast(a)
        sb, bm = lb.canonicalize_fast(b)
        _, cm = lb.canonicalize_fast(c)
        return reduce_batch(BForm(am, sb, bm, cm), self.disc_bits // 4 + 64)

    def reduce2_iter(self, a_red, b_red, c_red):
        """Estimate-driven rho-descent; returns a reduced canonical BForm.
        a_red, c_red: positive redundant; b_red: signed redundant.

        The (mant, top) value estimates of all three coefficients ride the
        while-loop state: each iteration re-estimates only the two values
        it changed (b, c) — a changes only by swapping with c, whose
        estimate is already carried. The round-3 body estimated 7 values
        per iteration (a redundant start-of-body pass duplicating the end
        -of-body one, plus a post-swap re-estimate); with value_est ~4
        elementwise passes each, that was over half the per-iteration HBM
        traffic of the measured 72%-of-compose2 loop."""

        def flags(ma, ta, mb, tb, mc, tc):
            bitsA = rl.bits_est(ma, ta)
            bitsB = rl.bits_est(mb, tb)
            bitsC = rl.bits_est(mc, tc)
            raw_norm = bitsB > bitsA + 0.25
            # quotients above ~24 bits cannot be applied unshifted; those
            # (rare: CF tail / inverse-pair composes) fall to the exact tail
            freak = bitsB - bitsA > 25.0
            need_rho = jnp.logical_not(raw_norm) & (bitsC < bitsA - 0.25)
            return raw_norm & jnp.logical_not(freak), need_rho

        unroll = self._unroll_for(a_red)

        def cond(state):
            w, it = state[-2], state[-1]
            return (it < self.red_iters) & jnp.any(w)

        def body(state):
            a, b, c, ma, ta, mb, tb, mc, tc, _w, it = state
            need_norm, need_rho = flags(ma, ta, mb, tb, mc, tc)
            # rho where needed: (a, b, c) <- (c, -b, a); ests follow the
            # swap for free (c's estimate is carried)
            rho = need_rho[..., None]
            an = jnp.where(rho, c, a)
            cn = jnp.where(rho, a, c)
            bn = jnp.where(rho, -b, b)
            man = jnp.where(need_rho, mc, ma)
            tan = jnp.where(need_rho, tc, ta)
            mbn = jnp.where(need_rho, -mb, mb)
            # digit q ~ b / 2a, UNSHIFTED (no limb gathers inside TPU while
            # loops); |q| <= 2^27 per step, so rare huge CF quotients just
            # take ceil(bits/18-27) extra iterations
            ratio = mbn / jnp.maximum(2.0 * man, 1e-30)
            scale = rl.pow2f(jnp.clip(16 * (tb - tan), -126, 29))
            qd = jnp.clip(jnp.round(ratio * scale), -134217000.0,
                          134217000.0).astype(jnp.int32)
            active = need_norm | need_rho
            qd = jnp.where(active, qd, 0)
            # aq = q*a via 14+14 split ; b' = b - 2*aq ; t = aq - b ;
            # c' = c + q*t. Single balanced carry passes throughout: every
            # input below is a carry_pass output (limbs ~< 2^15.4), so each
            # product against a 14-bit half-digit and each 2-3-term sum
            # stays well inside int32, and the value_est mantissa error at
            # ~2^15.4-bounded limbs is still ~2^-19 against 0.25-bit flag
            # margins (leftovers land in the exact tail below either way).
            a14 = rl.carry_pass(an << 14)
            s = jnp.sign(qd)
            aq_ = jnp.abs(qd)
            lo = (aq_ & 0x3FFF) * s
            hi = (aq_ >> 14) * s
            aq = rl.carry_pass(rl.carry_pass(lo[..., None] * an)
                               + rl.carry_pass(hi[..., None] * a14))
            b2 = rl.carry_pass(bn - 2 * aq)
            t = rl.carry_pass(aq - bn)
            t14 = rl.carry_pass(t << 14)
            qt = rl.carry_pass(lo[..., None] * t) + rl.carry_pass(hi[..., None] * t14)
            c2 = rl.carry_pass(cn + qt)
            mb2, tb2 = rl.value_est(b2)
            mc2, tc2 = rl.value_est(c2)
            nn2, nr2 = flags(man, tan, mb2, tb2, mc2, tc2)
            return (an, b2, c2, man, tan, mb2, tb2, mc2, tc2,
                    nn2 | nr2, it + 1)

        a0 = rl.carry2(a_red)
        b0 = rl.carry2(b_red)
        c0 = rl.carry2(c_red)
        ma0, ta0 = rl.value_est(a0)
        mb0, tb0 = rl.value_est(b0)
        mc0, tc0 = rl.value_est(c0)
        w0, r0 = flags(ma0, ta0, mb0, tb0, mc0, tc0)
        a, b, c, _, _, _, _, _, _, _, _ = jax.lax.while_loop(
            cond, rl.unrolled(body, unroll),
            (a0, b0, c0, ma0, ta0, mb0, tb0, mc0, tc0,
             w0 | r0, jnp.int32(0)))

        _, am = lb.canonicalize_fast(a)
        sb, bm = lb.canonicalize_fast(b)
        _, cm = lb.canonicalize_fast(c)
        # exact tail: <= ~2 steps for est-loop leftovers; also finishes the
        # rare huge-quotient elements the est loop cannot handle (early
        # exits to ~zero work when everything is already reduced)
        return reduce_batch(BForm(am, sb, bm, cm), self.disc_bits // 4 + 64)

    # ------------------------------------------------------------ compose
    def compose2(self, F1: BForm, F2: BForm,
                 grouped: bool | None = None) -> BForm:
        (a3, b3s, b3m, c3, a1g, m2x2, mu,
         id1, id2) = self.compose2_unreduced(F1, F2)
        if not self.use_nucomp:
            out = self.reduce2(a3.astype(jnp.int32),
                               (b3s[..., None] * b3m).astype(jnp.int32),
                               c3.astype(jnp.int32), grouped=grouped)
        else:
            out = self._nucomp_tail(a3, b3s, b3m, c3, a1g, m2x2, mu)
        # identity selects (both-id: F2 is the identity, so the first select
        # already returns it)
        out = bform_select(id2 & jnp.logical_not(id1), F1, out)
        out = bform_select(id1, F2, out)
        return out

    def compose2_unreduced(self, F1: BForm, F2: BForm):
        """Everything before the reduction: returns the unreduced composed
        coefficients (a3, b3s, b3m, c3), the NUCOMP-tail operands
        (a1g, m2x2, mu) and the identity masks (id1, id2). Split out so the
        reduction phase (72% of compose2 device time, round-4 trace) can be
        benchmarked and swapped independently."""
        L, Lh, L2 = self.L, self.Lh, self.L2
        delta4 = jnp.asarray(self.delta4)
        unroll = self._unroll_for(F1.a)

        # identity fast path: substitute DIFFERENT fixed forms on each side
        # (h, h^2) so identity lanes never become self-composes (see ctor)
        id1 = self._is_one(F1.a)
        id2 = self._is_one(F2.a)
        some_id = id1 | id2
        h = self._h_bform()
        h2 = self._h2_bform()
        hb = BForm(jnp.broadcast_to(h.a, F1.a.shape),
                   jnp.broadcast_to(h.b_sign, F1.b_sign.shape),
                   jnp.broadcast_to(h.b, F1.b.shape),
                   jnp.broadcast_to(h.c, F1.c.shape))
        h2b = BForm(jnp.broadcast_to(h2.a, F2.a.shape),
                    jnp.broadcast_to(h2.b_sign, F2.b_sign.shape),
                    jnp.broadcast_to(h2.b, F2.b.shape),
                    jnp.broadcast_to(h2.c, F2.c.shape))
        F1b = bform_select(some_id, hb, F1)
        F2b = bform_select(some_id, h2b, F2)

        # order so a1 <= a2, rotate F2 odd (then a1 * a2_rot <= ~|Delta|)
        swap = lb.mag_cmp(F1b.a, F2b.a) > 0
        F1n = bform_select(swap, F2b, F1b)
        F2n = bform_select(swap, F1b, F2b)
        F2n = rotate_to_odd(F2n)
        a1, b1s, b1m, c1 = F1n
        a2, b2s, b2m, c2 = F2n

        # s = (b1 + b2)/2 ; dd = b2 - b1   (b's of reduced forms: <= Lh)
        b1h = lb.resize(b1m, Lh)
        b2h = lb.resize(b2m, Lh)
        ss, sm = lb.sm_add((b1s, b1h), (b2s, b2h))
        sm = lb.mag_shr_bits(sm, 1)
        dds, ddm = lb.sm_sub((b2s, b2h), (b1s, b1h))

        # xgcd 1: d1 = gcd(a2, a1), beta = a1-coefficient mod a2 — the
        # dominant loop. Two-tier width (see Lxn in __init__): the narrow
        # pass covers every lane whose operands fit 16*Lxn-32 bits; the
        # full-width pass handles the astronomically-rare rest and
        # early-exits immediately when none exist.
        if self.use_pallas:
            from . import pallas_group

            d1, beta = pallas_group.xgcd_coeff_g(a2, a1, a2,
                                                 self.xgcd_nbits)
        elif self.Lxn < L:
            NL = self.Lxn
            nb = 16 * NL - 32
            fitsx = (lb.mag_bitlen(a2) <= nb) & (lb.mag_bitlen(a1) <= nb)
            fx = fitsx[..., None]
            one_n = jnp.concatenate([jnp.ones_like(a2[..., :1]),
                                     jnp.zeros_like(a2[..., 1:NL])], axis=-1)
            a2_n = jnp.where(fx, a2[..., :NL], one_n)
            a1_n = jnp.where(fx, a1[..., :NL], 0)
            d1_n, beta_n = xgcd_coeff_g(a2_n, a1_n, a2_n, nb + 16,
                                        unroll=unroll)
            one_L = jnp.concatenate([jnp.ones_like(a2[..., :1]),
                                     jnp.zeros_like(a2[..., 1:])], axis=-1)
            a2_w = jnp.where(fx, one_L, a2)
            a1_w = jnp.where(fx, 0, a1)
            d1_w, beta_w = xgcd_coeff_g(a2_w, a1_w, a2_w, self.xgcd_nbits,
                                        unroll=unroll)
            d1 = jnp.where(fx, lb.resize(d1_n, L), d1_w)
            beta = jnp.where(fx, lb.resize(beta_n, L), beta_w)
        else:
            d1, beta = xgcd_coeff_g(a2, a1, a2, self.xgcd_nbits,
                                    unroll=unroll)

        # ---- second gcd block: g = gcd(d1, |s|), eta0 in [0, d1) with
        # eta0 * |s| ≡ g (mod d1)
        fits8 = lb.mag_bitlen(d1) <= 120
        one8 = jnp.concatenate([jnp.ones_like(d1[..., :1]),
                                jnp.zeros_like(d1[..., 1:8])], axis=-1)
        d1_8 = jnp.where(fits8[..., None], d1[..., :8], one8)
        dinv8 = lb.modinv16(d1_8[..., 0])
        d1_8L = lb.resize(d1_8, Lh)
        _, d1_8L8 = lb.canonicalize_fast(d1_8L << 8)
        rp = rl.redc_pow16(lb.resize(sm, Lh), d1_8L, d1_8L8, dinv8,
                           steps=Lh, active=fits8, unroll=unroll)
        _, rp_m = lb.canonicalize_fast(rp)
        ge = lb.mag_cmp(rp_m, d1_8L) >= 0
        _, rp_m = lb.canonicalize_fast(rp_m - jnp.where(ge[..., None], d1_8L, 0))
        g8, eta8 = xgcd_coeff_g(d1_8, rp_m[..., :8], d1_8, 136,
                                unroll=unroll)
        # un-Montgomery: eta0 = eta8 * 2^(-16*Lh) ... wait, rp carries
        # 2^(-16*Lh): eta8 * rp ≡ g  =>  (eta8 * 2^(-16*Lh)) * s ≡ g; so the
        # SAME scale removal applies to eta8.
        _, e8_8 = lb.canonicalize_fast(d1_8 << 8)
        eta0_8 = rl.redc_pow16(eta8, d1_8, e8_8, dinv8, steps=Lh,
                               active=fits8, unroll=unroll)
        _, eta0_8 = lb.canonicalize_fast(eta0_8)
        ge = lb.mag_cmp(eta0_8, d1_8) >= 0
        _, eta0_8 = lb.canonicalize_fast(eta0_8 - jnp.where(ge[..., None], d1_8, 0))

        # rare path: d1 >= 2^120 — same pipeline at width Lh; all loops
        # early-exit when no element needs it
        rare = jnp.logical_not(fits8) & jnp.logical_not(some_id)
        d1h = lb.resize(d1, Lh)  # d1 <= a1 fits Lh
        d1h = jnp.where(rare[..., None], d1h, lb.resize(one8, Lh))
        dinvF = lb.modinv16(d1h[..., 0])
        _, d1h8 = lb.canonicalize_fast(d1h << 8)
        rpF = rl.redc_pow16(lb.resize(sm, Lh), d1h, d1h8, dinvF,
                            steps=Lh, active=rare, unroll=unroll)
        _, rpF_m = lb.canonicalize_fast(rpF)
        geF = lb.mag_cmp(rpF_m, d1h) >= 0
        _, rpF_m = lb.canonicalize_fast(rpF_m - jnp.where(geF[..., None], d1h, 0))
        gF, etaF = xgcd_coeff_g(d1h, jnp.where(rare[..., None], rpF_m, 0),
                                d1h, 16 * Lh, unroll=unroll)
        eta0F = rl.redc_pow16(etaF, d1h, d1h8, dinvF, steps=Lh, active=rare,
                              unroll=unroll)
        _, eta0F = lb.canonicalize_fast(eta0F)
        geF = lb.mag_cmp(eta0F, d1h) >= 0
        _, eta0F = lb.canonicalize_fast(eta0F - jnp.where(geF[..., None], d1h, 0))

        g = jnp.where(fits8[..., None], lb.resize(g8, Lh), lb.resize(gF, Lh))
        eta0 = jnp.where(fits8[..., None], lb.resize(eta0_8, Lh), eta0F)

        # xi = (g - eta0*|s|) / d1 exactly (integer identity); |xi| <= |s|
        prod_es = lb.mag_mul(eta0, sm, L)            # eta0 * |s|
        ts, tm = lb.sm_sub((jnp.ones_like(ss), lb.resize(g, L)),
                           (jnp.ones_like(ss), prod_es))
        xi = lb.mag_divexact_odd(tm, d1, Lh)         # magnitude of xi
        xi_s = ts

        # u = xi * beta ; mu_num = u*(b2-b1) - 2*sign(s)*eta0*c1
        # (widths Lu/Lm/L from the worst-case bounds in __init__ — the
        # grouped-conv mul and the mod_topdown per-iteration cost both
        # scale with the limb width, so tight bounds are free speed)
        Lu, Lm = self.Lu, self.Lm
        u = lb.mag_mul(xi, beta, Lu)
        t1 = lb.mag_mul(u, ddm, Lm)                  # |u*(b2-b1)|
        t1_sign = xi_s * dds
        t2 = lb.mag_mul(eta0, c1, L)                 # eta0*c1 <= |Delta|/3
        mu_red = (t1_sign[..., None] * t1
                  - 2 * (ss[..., None] * lb.resize(t2, Lm)))

        # m2 = a2/g, a1g = a1/g  (g odd: divides odd a2 via d1)
        m2 = lb.mag_divexact_odd(a2, g, L)
        a1g = lb.mag_divexact_odd(a1, g, Lh)
        m2x2 = lb.mag_shl_bits(m2, 1, L)

        if self.use_mu28:
            # 28-bit-digit mu reduction (opt-in; measured negative on TPU)
            mu = rl.mod_topdown28(mu_red, m2x2, max_iters=self.mu_iters)
        elif self.use_pallas_mu:
            from . import pallas_group

            mu = pallas_group.mod_topdown(mu_red, m2x2,
                                          max_iters=self.mu_iters)
        else:
            mu = rl.mod_topdown(mu_red, m2x2, max_iters=self.mu_iters,
                                unroll=unroll)
        mu = lb.resize(mu, L)

        # a3 = a1g*m2 ; b3 = b1 + a1g*mu ; c3 = ((b3/2)^2 + |D|/4)/a3
        # b3 <= b1 + a1g*2*m2 <= 2|Delta|/3 + sqrt -> b3/2 fits Lsq;
        # (b3/2)^2 + |Delta|/4 <= 2D+2 bits -> the c3 pipeline runs at Lm
        a3 = lb.mag_mul(a1g, m2, L)
        t = lb.mag_mul(a1g, mu, L)
        b3s, b3m = lb.sm_add((b1s, b1m), (jnp.ones_like(b1s), t))
        b3h = lb.resize(lb.mag_shr_bits(b3m, 1), self.Lsq)
        sq = lb.mag_mul(b3h, b3h, Lm)
        csum = lb.resize(sq, Lm) + lb.resize(delta4, Lm)
        _, csum = lb.canonicalize_fast(csum)
        e = lb.mag_v2(a3)
        a3_odd = lb.mag_shr_bits_dyn(a3, e)
        csum_sh = lb.mag_shr_bits_dyn(csum, jnp.minimum(e, jnp.int32(16 * Lm - 1)))
        c3 = lb.mag_divexact_odd(csum_sh, lb.resize(a3_odd, Lm), L)
        return a3, b3s, b3m, c3, a1g, m2x2, mu, id1, id2

    def _nucomp_tail(self, a3, b3s, b3m, c3, a1g, m2x2, mu):
        """NUCOMP partial reduction: instead of handing the full-size
        (a3, b3, c3) to the 200+-iteration rho-descent (measured 72% of
        compose2 device time on a v5e), walk the continued fraction of
        mu / 2m2 with lehmer_euclid (exact unimodular groups, ~13 bits per
        group) and build the nearly-reduced equivalent form from the
        cofactors:

            z_i = (x_i, y_i),  r_i = x_i*(2B) + y_i*mu
            Q(z)  = a3 x^2 + b3 x y + c3 y^2       (the transformed a / c)
            cross = 2 a3 xp xc + b3 (xp yc + xc yp) + 2 c3 yp yc  (the b)

        det[[xp,yp],[xc,yc]] = ±1; an improper transform conjugates the
        class, undone by negating b. reduce2 then finishes in O(1) steps.
        This is the role BICYCL's NUCOMP plays for the reference
        (qfi.inl call sites); validated bit-exactly against the oracle."""
        L = self.L
        Ln = self.Ln

        mantB, topB = rl.value_est(m2x2)
        bitsB = rl.bits_est(mantB, topB)
        mantA, topA = rl.value_est(a1g)
        bitsA = rl.bits_est(mantA, topA)
        # T^2 ~ 2B * sqrt(|D|/4) / sqrt(A*B)
        bits_stop = 0.5 * (bitsB + 0.5 * (self.disc_bits - 2.0)
                           - 0.5 * (bitsA + bitsB - 1.0))
        rp, rc, xp, xc, yp, yc, par = rl.lehmer_euclid(
            lb.resize(m2x2, L), lb.resize(mu, L), bits_stop, self.eu_groups)
        del rp, rc  # the cofactors alone determine the transformed form
        # cofactors are bounded by the euclid's y-cap (~bits(2B) - bits(T)
        # + slack <= 16*Lh even for wide-rotation lanes) — truncating them
        # halves every product below
        Lxy = min(self.Lh, L)
        sxp, mxp = lb.canonicalize_fast(xp)
        sxc, mxc = lb.canonicalize_fast(xc)
        syp, myp = lb.canonicalize_fast(yp)
        syc, myc = lb.canonicalize_fast(yc)
        mxp, mxc = lb.resize(mxp, Lxy), lb.resize(mxc, Lxy)
        myp, myc = lb.resize(myp, Lxy), lb.resize(myc, Lxy)

        def term(sa, ma, sb, mb, coeff_mag, coeff_sign=None):
            prod = lb.mag_mul(ma, mb)
            full = lb.mag_mul(prod, coeff_mag, Ln)
            s = sa * sb if coeff_sign is None else sa * sb * coeff_sign
            return s, full

        b3_sign = b3s
        # nA = a3 xp^2 + b3 xp yp + c3 yp^2  (> 0: form value)
        t1s, t1m = term(sxp, mxp, sxp, mxp, a3)
        t2s, t2m = term(sxp, mxp, syp, myp, b3m, b3_sign)
        t3s, t3m = term(syp, myp, syp, myp, c3)
        _, nA = lb.canonicalize_fast(t1s[..., None] * t1m
                                     + t2s[..., None] * t2m
                                     + t3s[..., None] * t3m)
        # nC = a3 xc^2 + b3 xc yc + c3 yc^2
        u1s, u1m = term(sxc, mxc, sxc, mxc, a3)
        u2s, u2m = term(sxc, mxc, syc, myc, b3m, b3_sign)
        u3s, u3m = term(syc, myc, syc, myc, c3)
        _, nC = lb.canonicalize_fast(u1s[..., None] * u1m
                                     + u2s[..., None] * u2m
                                     + u3s[..., None] * u3m)
        # nB = 2 a3 xp xc + b3 (xp yc + xc yp) + 2 c3 yp yc, conjugated on
        # improper (det = -1) transforms
        v1s, v1m = term(sxp, mxp, sxc, mxc, a3)
        v3s, v3m = term(syp, myp, syc, myc, c3)
        cross = lb.canonicalize_fast(
            (sxp * syc)[..., None] * lb.mag_mul(mxp, myc)
            + (sxc * syp)[..., None] * lb.mag_mul(mxc, myp))
        v2s, v2m = cross[0] * b3_sign, lb.mag_mul(cross[1], b3m, Ln)
        nB_red = (2 * v1s[..., None] * v1m
                  + v2s[..., None] * lb.resize(v2m, Ln)
                  + 2 * v3s[..., None] * v3m)
        flip = (1 - 2 * (par & 1))[..., None]
        nB_red = flip * nB_red

        red = self.reduce2(nA.astype(jnp.int32), nB_red.astype(jnp.int32),
                           lb.resize(nC, Ln).astype(jnp.int32))
        # reduced coefficients fit L (c <= |Delta|/4); back to form width
        return BForm(lb.resize(red.a, L), red.b_sign,
                     lb.resize(red.b, L), lb.resize(red.c, L))

    def nudupl2(self, F: BForm, grouped: bool | None = None) -> BForm:
        return self.compose2(F, F, grouped=grouped)
