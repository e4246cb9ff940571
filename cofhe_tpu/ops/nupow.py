"""Batched class-group exponentiation (the reference's hot-loop primitive:
qfi_nupow wNAF ladder with a cross-exponent memoized doubling cache,
x86_64/qfi.inl:1-135).

Variants:
  * nupow_shared: one host-known exponent for the whole batch (the
    part_decrypt / decrypt / power_of_h case). Left-to-right binary ladder
    as a lax.scan over a static bit schedule; zero bits skip the compose via
    lax.cond, so the cost is ~bits nudupls + hamming-weight composes.
  * nupow_batch (Yao windowed, right-to-left): per-element exponents as limb
    arrays (the scal_ciphertext / matmul case). The doubling chain runs on
    the BASE (shared across every exponent of the same base — the TPU
    equivalent of the reference's `get_doubled` cache shared across the p
    exponents of one ciphertext row); each w-bit window scatters one
    composition into a 2^w-slot accumulator bank, and a 2*(2^w-2)-compose
    Yao finalization assembles base^e. Cost per exponent:
    ceil(bits/w) + 2^(w+1) - 4 composes + bits nudupls amortized over all
    exponents sharing a base (vs 1 compose + 1 nudupl PER BIT for the plain
    ladder).
  * nupow_batch_binary: the plain uniform masked ladder (kept as a second
    implementation for differential testing).

All variants keep everything reduced after every step, so results are
bit-exact with core.qfi.nupow (unique reduced representative)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limb as lb
from .forms import (BForm, FormSpec, bform_neg, bform_select, compose_batch,
                    nudupl_batch)


def identity_bform(spec: FormSpec, delta4_mag, batch: int) -> BForm:
    """(1, 0, |Delta|/4) broadcast to the batch."""
    L = spec.L
    a = jnp.zeros((batch, L), jnp.int32).at[:, 0].set(1)
    b = jnp.zeros((batch, L), jnp.int32)
    bs = jnp.zeros((batch,), jnp.int32)
    c = jnp.broadcast_to(lb.resize(delta4_mag, L)[None, :], (batch, L)).astype(jnp.int32)
    return BForm(a, bs, b, c)


def nupow_shared(base: BForm, exponent_bits, spec: FormSpec, delta4_mag) -> BForm:
    """base^e for one exponent shared by the whole batch, given as a bit
    array (MSB first; leading zero padding is harmless). The compose is
    gated by a runtime lax.cond, so zero bits cost only the squaring and the
    kernel does not recompile per exponent value — only per bit length."""
    bits = jnp.asarray(exponent_bits, dtype=jnp.int32)
    batch = base.a.shape[0]
    r = identity_bform(spec, delta4_mag, batch)

    def body(r, bit):
        r = nudupl_batch(r, spec, delta4_mag)
        r = jax.lax.cond(bit == 1,
                         lambda rr: compose_batch(rr, base, spec, delta4_mag),
                         lambda rr: rr,
                         r)
        return r, None

    r, _ = jax.lax.scan(body, r, bits)
    return r


def wnaf_digits(e: int, w: int) -> list[int]:
    """Left-to-right per-bit-position wNAF digit stream (host-side).
    Returns digits MSB-first, one per squaring; nonzero digits are odd in
    (-2^(w-1), 2^(w-1)). Density ~ 1/(w+1)."""
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


def nupow_shared_wnaf(base: BForm, sched, spec: FormSpec, delta4_mag,
                      w: int = 5) -> BForm:
    """base^e for a HOST-KNOWN shared exponent via width-w wNAF — the TPU
    form of the reference's qfi_nupow wNAF with odd-power table
    (x86_64/qfi.inl:28-62). Cost: ~bits nudupls + bits/(w+1) composes +
    2^(w-2) table composes; class-group inversion is free (negate b), so
    signed digits halve the table.

    `sched` is the wnaf_digits() stream (MSB-first, zero-padded at the
    front), passed as a traced array so the kernel caches by (batch, padded
    schedule length, w), not by exponent value."""
    nslots = 1 << (w - 2)  # odd powers 1, 3, ..., 2^(w-1) - 1
    batch = base.a.shape[0]

    # table: tab[i] = base^(2i+1); built with 1 nudupl + (nslots-1) composes
    sq = nudupl_batch(base, spec, delta4_mag)
    tab = [base]
    for _ in range(nslots - 1):
        tab.append(compose_batch(tab[-1], sq, spec, delta4_mag))
    bank = BForm(jnp.stack([t.a for t in tab]), jnp.stack([t.b_sign for t in tab]),
                 jnp.stack([t.b for t in tab]), jnp.stack([t.c for t in tab]))

    r = identity_bform(spec, delta4_mag, batch)
    sched = jnp.asarray(sched, jnp.int32)

    def body(r, d):
        r = nudupl_batch(r, spec, delta4_mag)

        def with_compose(rr):
            idx = (jnp.abs(d) - 1) // 2
            t = BForm(bank.a[idx], bank.b_sign[idx], bank.b[idx], bank.c[idx])
            t = bform_select(jnp.broadcast_to(d < 0, t.b_sign.shape),
                             bform_neg(t), t)
            return compose_batch(rr, t, spec, delta4_mag)

        r = jax.lax.cond(d != 0, with_compose, lambda rr: rr, r)
        return r, None

    r, _ = jax.lax.scan(body, r, sched)
    return r


def nupow_batch_binary(base: BForm, exp_limbs, spec: FormSpec, delta4_mag,
                       exp_bits: int) -> BForm:
    """base^e with per-element exponents. exp_limbs: (batch, Lk) int32
    magnitude limbs; exp_bits: static bound on exponent bit length.
    Uniform ladder: per bit, square then compose with (base | identity)."""
    batch = base.a.shape[0]
    ident = identity_bform(spec, delta4_mag, batch)
    js = jnp.arange(exp_bits - 1, -1, -1, dtype=jnp.int32)

    def body(r, j):
        limb_idx = j // lb.BASE_BITS
        bit_idx = j % lb.BASE_BITS
        col = jnp.take(exp_limbs, limb_idx, axis=1)  # (batch,)
        bit = (col >> bit_idx) & 1
        r = nudupl_batch(r, spec, delta4_mag)
        sel = bform_select(bit == 1, base, ident)
        r = compose_batch(r, sel, spec, delta4_mag)
        return r, None

    r, _ = jax.lax.scan(body, ident, js)
    return r


def pick_window(exp_bits: int) -> int:
    """Window width minimizing ceil(bits/w) + 2^(w+1) - 4 composes."""
    best, best_cost = 1, exp_bits
    for w in (2, 3, 4, 5):
        cost = -(-exp_bits // w) + (1 << (w + 1)) - 4
        if cost < best_cost:
            best, best_cost = w, cost
    return best


def _extract_window(exp_limbs, bitpos, w: int):
    """w bits of each exponent starting at (traced) bit index `bitpos`
    (LSB-first). Windows may straddle a 16-bit limb boundary."""
    Lk = exp_limbs.shape[-1]
    limb_idx = bitpos // lb.BASE_BITS
    bit_idx = bitpos % lb.BASE_BITS
    lo = jnp.take(exp_limbs, jnp.clip(limb_idx, 0, Lk - 1), axis=-1)
    hi = jnp.where(limb_idx + 1 < Lk,
                   jnp.take(exp_limbs, jnp.clip(limb_idx + 1, 0, Lk - 1), axis=-1), 0)
    # hi < 2^16 and shift <= 15 keep the int32 shift exact; clamp the
    # bit_idx == 0 lane (shift by 16 is undefined) — its value is masked out
    shift = jnp.where(bit_idx > 0, lb.BASE_BITS - bit_idx, 0)
    val = (lo >> bit_idx) | jnp.where(bit_idx > 0, hi << shift, 0)
    return val & ((1 << w) - 1)


def _slot(bank: BForm, v: int) -> BForm:
    return BForm(bank.a[v], bank.b_sign[v], bank.b[v], bank.c[v])


def nupow_batch(base: BForm, exp_limbs, spec: FormSpec, delta4_mag,
                exp_bits: int, window: int | None = None,
                base_map=None) -> BForm:
    """base^e, Yao right-to-left windowed ladder (see module docstring).

    base:      (Bb, L) reduced forms.
    exp_limbs: (B, Lk) int32 magnitude limbs, B >= Bb.
    base_map:  static int array (B,) mapping exponent row -> base row, or
               None when B == Bb (elementwise). With a map, the doubling
               chain runs once per DISTINCT base and is gathered per
               exponent — the matmul case where each ciphertext meets p
               scalars.
    """
    B = exp_limbs.shape[0]
    w = window if window is not None else pick_window(exp_bits)
    S = 1 << w
    nwind = -(-exp_bits // w)
    if base_map is None:
        assert base.a.shape[0] == B, (base.a.shape, B)
    else:
        base_map = jnp.asarray(base_map, jnp.int32)

    ident = identity_bform(spec, delta4_mag, B)
    bank = BForm(jnp.broadcast_to(ident.a[None], (S,) + ident.a.shape),
                 jnp.broadcast_to(ident.b_sign[None], (S,) + ident.b_sign.shape),
                 jnp.broadcast_to(ident.b[None], (S,) + ident.b.shape),
                 jnp.broadcast_to(ident.c[None], (S,) + ident.c.shape))
    slots = jnp.arange(S, dtype=jnp.int32)[:, None]  # (S, 1)

    def body(carry, t):
        bank, d = carry
        digit = _extract_window(exp_limbs, t * w, w)  # (B,)
        dg = d if base_map is None else BForm(
            jnp.take(d.a, base_map, axis=0), jnp.take(d.b_sign, base_map, axis=0),
            jnp.take(d.b, base_map, axis=0), jnp.take(d.c, base_map, axis=0))
        idx3 = digit[None, :, None]
        sel = BForm(jnp.take_along_axis(bank.a, idx3, axis=0)[0],
                    jnp.take_along_axis(bank.b_sign, digit[None, :], axis=0)[0],
                    jnp.take_along_axis(bank.b, idx3, axis=0)[0],
                    jnp.take_along_axis(bank.c, idx3, axis=0)[0])
        comp = compose_batch(sel, dg, spec, delta4_mag)
        m2 = slots == digit[None, :]  # (S, B)
        m3 = m2[..., None]
        bank = BForm(jnp.where(m3, comp.a[None], bank.a),
                     jnp.where(m2, comp.b_sign[None], bank.b_sign),
                     jnp.where(m3, comp.b[None], bank.b),
                     jnp.where(m3, comp.c[None], bank.c))
        # advance the shared doubling chain d <- d^(2^w)
        for _ in range(w):
            d = nudupl_batch(d, spec, delta4_mag)
        return (bank, d), None

    (bank, _), _ = jax.lax.scan(
        body, (bank, base), jnp.arange(nwind, dtype=jnp.int32))

    # Yao finalization: result = prod_{v=1}^{S-1} bank[v]^v via running
    # suffix products (bank[0] collects digit-0 updates and is ignored).
    T = _slot(bank, S - 1)
    R = T
    for v in range(S - 2, 0, -1):
        T = compose_batch(T, _slot(bank, v), spec, delta4_mag)
        R = compose_batch(R, T, spec, delta4_mag)
    return R
