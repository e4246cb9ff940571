"""v2 batched exponentiation: signed-digit Yao ladder on the v2 compose
kernels (ops/forms2.py).

The reference's hot primitive is qfi_nupow — a wNAF ladder with a doubling
cache shared across the exponents of one ciphertext row
(/root/reference/include/x86_64/qfi.inl:1-135). The TPU v2 form:

* signed radix-2^w recode (host side — exponents are plaintext scalars) with
  digits in [-2^(w-1), 2^(w-1)); class-group inversion is free (negate b),
  so the bank needs only 2^(w-1)+1 slots instead of 2^w.
* the doubling chain advances on the DISTINCT-BASE batch only (the n*m
  ciphertext cells), gathered per exponent row via `base_map` — the matmul
  case where each cell meets p scalars pays the chain once.
* one bank-compose per window at the full exponent batch; digit-0 rows
  compose into a garbage slot so control flow stays uniform.
* Yao finalization (result = prod_v bank[v]^v) as a lax.scan over the
  suffix-product recurrence — 2(S-2) composes, ~2 compose instances in the
  compiled graph instead of the v1 unrolled 2(S-2) instances.

Everything stays reduced after every step, so results are bit-exact with
core.qfi.nupow (unique reduced representative).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limb as lb
from .forms import BForm, bform_neg, bform_select
from .forms2 import CG


def identity_bform2(cg: CG, batch: int) -> BForm:
    L = cg.L
    a = jnp.zeros((batch, L), jnp.int32).at[:, 0].set(1)
    b = jnp.zeros((batch, L), jnp.int32)
    bs = jnp.zeros((batch,), jnp.int32)
    c = jnp.broadcast_to(
        lb.resize(jnp.asarray(cg.delta4), L)[None, :], (batch, L)).astype(jnp.int32)
    return BForm(a, bs, b, c)


def signed_windows(e: int, w: int, nwind: int) -> list[int]:
    """Little-endian signed radix-2^w digits: e = sum d_t * 2^(w t) with
    d_t in [-2^(w-1), 2^(w-1))."""
    assert e >= 0
    half = 1 << (w - 1)
    out = []
    for _ in range(nwind):
        d = e & ((1 << w) - 1)
        if d >= half:
            d -= 1 << w
        e = (e - d) >> w
        out.append(d)
    assert e == 0, "nwind too small for exponent"
    return out


def nwind_for_bits(bits: int, w: int) -> int:
    """Window count covering `bits`-bit exponents incl. the recode carry."""
    return (bits + w) // w


def nupow_yao2(cg: CG, base: BForm, digits, base_map=None, w: int = 4) -> BForm:
    """base[base_map[i]] ^ e_i for host-recoded signed digits.

    base:   (Bb, L) reduced forms.
    digits: (nwind, B) int32 in [-2^(w-1), 2^(w-1)), from signed_windows.
    base_map: static (B,) int array mapping exponent row -> base row (None
    when B == Bb, elementwise).
    """
    digits = jnp.asarray(digits, jnp.int32)
    nwind, B = digits.shape
    half = 1 << (w - 1)
    S = half + 1  # bank slots 0..half; slot by |digit|, sign on the term
    if base_map is None:
        assert base.a.shape[0] == B, (base.a.shape, B)
    else:
        base_map = jnp.asarray(base_map, jnp.int32)

    ident = identity_bform2(cg, B)
    bank = BForm(jnp.broadcast_to(ident.a[None], (S,) + ident.a.shape),
                 jnp.broadcast_to(ident.b_sign[None], (S,) + ident.b_sign.shape),
                 jnp.broadcast_to(ident.b[None], (S,) + ident.b.shape),
                 jnp.broadcast_to(ident.c[None], (S,) + ident.c.shape))
    slots = jnp.arange(S, dtype=jnp.int32)[:, None]  # (S, 1)

    def body(carry, d):
        bank, chain = carry
        cg_b = chain if base_map is None else BForm(
            jnp.take(chain.a, base_map, axis=0),
            jnp.take(chain.b_sign, base_map, axis=0),
            jnp.take(chain.b, base_map, axis=0),
            jnp.take(chain.c, base_map, axis=0))
        term = bform_select(d < 0, bform_neg(cg_b), cg_b)
        slot = jnp.abs(d)  # (B,)
        idx3 = slot[None, :, None]
        sel = BForm(jnp.take_along_axis(bank.a, idx3, axis=0)[0],
                    jnp.take_along_axis(bank.b_sign, slot[None, :], axis=0)[0],
                    jnp.take_along_axis(bank.b, idx3, axis=0)[0],
                    jnp.take_along_axis(bank.c, idx3, axis=0)[0])
        comp = cg.compose2(sel, term, grouped=False)
        m2 = slots == slot[None, :]  # (S, B)
        m3 = m2[..., None]
        bank = BForm(jnp.where(m3, comp.a[None], bank.a),
                     jnp.where(m2, comp.b_sign[None], bank.b_sign),
                     jnp.where(m3, comp.b[None], bank.b),
                     jnp.where(m3, comp.c[None], bank.c))
        for _ in range(w):
            chain = cg.nudupl2(chain, grouped=False)
        return (bank, chain), None

    (bank, _), _ = jax.lax.scan(body, (bank, base), digits)

    # Yao finalization: R = prod_{v=1}^{half} bank[v]^v via suffix products,
    # T_v = bank[half]∘…∘bank[v], R accumulates ∘T_v — as a scan so the
    # compiled graph holds ~2 compose instances, not 2(S-2).
    def slot_of(v):
        return BForm(jax.lax.dynamic_index_in_dim(bank.a, v, 0, keepdims=False),
                     jax.lax.dynamic_index_in_dim(bank.b_sign, v, 0, keepdims=False),
                     jax.lax.dynamic_index_in_dim(bank.b, v, 0, keepdims=False),
                     jax.lax.dynamic_index_in_dim(bank.c, v, 0, keepdims=False))

    T0 = slot_of(half)

    def fin_body(carry, v):
        T, R = carry
        T = cg.compose2(T, slot_of(v), grouped=False)
        R = cg.compose2(R, T, grouped=False)
        return (T, R), None

    vs = jnp.arange(half - 1, 0, -1, dtype=jnp.int32)
    (_, R), _ = jax.lax.scan(fin_body, (T0, T0), vs)
    return R


def wnaf_digits(e: int, w: int) -> list[int]:
    """MSB-first wNAF digit stream (host side); nonzero digits odd in
    (-2^(w-1), 2^(w-1)). Density ~1/(w+1)."""
    assert e >= 0
    digits = []
    while e > 0:
        if e & 1:
            d = e & ((1 << w) - 1)
            if d >= (1 << (w - 1)):
                d -= 1 << w
            e -= d
        else:
            d = 0
        digits.append(d)
        e >>= 1
    return digits[::-1] or [0]


def make_wnaf_bank(cg: CG, base: BForm, w: int = 5) -> BForm:
    """Odd-power table bank[i] = base^(2i+1), (nslots, batch, L)."""
    nslots = 1 << (w - 2)
    sq = cg.nudupl2(base, grouped=False)

    def tab_body(prev, _):
        nxt = cg.compose2(prev, sq, grouped=False)
        return nxt, prev

    _, tab = jax.lax.scan(tab_body, base, None, length=nslots)
    return BForm(tab.a, tab.b_sign, tab.b, tab.c)


def wnaf_segment(cg: CG, bank: BForm, r: BForm, sched_seg, w: int = 5,
                 grouped: bool = False) -> BForm:
    """Run one fixed-length segment of the shared-exponent wNAF ladder:
    r <- r^(2^len(seg)) * prod(bank digits). The engine chains segments
    with the accumulator resident on device — the TPU runtime reproducibly
    crashes on single ~1500-step scans at k=256 widths (round 4), and
    fixed segments also mean ONE cached kernel per (batch, seg, w) instead
    of one per exponent-length bucket.

    `grouped` selects the reduction mode inside the scan (default off —
    see forms2.reduce2; this scan carries only the accumulator, not a
    slot bank, so the grouped loop MAY escape the scan-embedding
    pathology here: benchmarks/micro.py --what wnaf measures it)."""
    sched_seg = jnp.asarray(sched_seg, jnp.int32)

    def body(rr, d):
        rr = cg.nudupl2(rr, grouped=grouped)

        def with_compose(r2):
            idx = (jnp.abs(d) - 1) // 2
            t = BForm(jax.lax.dynamic_index_in_dim(bank.a, idx, 0, False),
                      jax.lax.dynamic_index_in_dim(bank.b_sign, idx, 0, False),
                      jax.lax.dynamic_index_in_dim(bank.b, idx, 0, False),
                      jax.lax.dynamic_index_in_dim(bank.c, idx, 0, False))
            t = bform_select(jnp.broadcast_to(d < 0, t.b_sign.shape),
                             bform_neg(t), t)
            return cg.compose2(r2, t, grouped=grouped)

        rr = jax.lax.cond(d != 0, with_compose, lambda r2: r2, rr)
        return rr, None

    r, _ = jax.lax.scan(body, r, sched_seg)
    return r


def nupow_shared_wnaf2(cg: CG, base: BForm, sched, w: int = 5) -> BForm:
    """base^e for a HOST-KNOWN shared exponent (part_decrypt / decrypt /
    power-of-h): width-w wNAF over an odd-power table, v2 kernels.

    `sched` is the wnaf_digits() stream (MSB-first, zero-front-padded so the
    kernel caches by coarse length bucket, not exponent value)."""
    nslots = 1 << (w - 2)  # odd powers 1, 3, ..., 2^(w-1)-1
    batch = base.a.shape[0]

    sq = cg.nudupl2(base, grouped=False)

    def tab_body(prev, _):
        nxt = cg.compose2(prev, sq, grouped=False)
        return nxt, prev

    _, tab = jax.lax.scan(tab_body, base, None, length=nslots)
    bank = BForm(tab.a, tab.b_sign, tab.b, tab.c)  # (nslots, batch, L)

    r = identity_bform2(cg, batch)
    sched = jnp.asarray(sched, jnp.int32)

    def body(r, d):
        r = cg.nudupl2(r, grouped=False)

        def with_compose(rr):
            idx = (jnp.abs(d) - 1) // 2
            t = BForm(jax.lax.dynamic_index_in_dim(bank.a, idx, 0, False),
                      jax.lax.dynamic_index_in_dim(bank.b_sign, idx, 0, False),
                      jax.lax.dynamic_index_in_dim(bank.b, idx, 0, False),
                      jax.lax.dynamic_index_in_dim(bank.c, idx, 0, False))
            t = bform_select(jnp.broadcast_to(d < 0, t.b_sign.shape),
                             bform_neg(t), t)
            return cg.compose2(rr, t, grouped=False)

        r = jax.lax.cond(d != 0, with_compose, lambda rr: rr, r)
        return r, None

    r, _ = jax.lax.scan(body, r, sched)
    return r
