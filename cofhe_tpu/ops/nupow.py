"""Batched class-group exponentiation (the reference's hot-loop primitive:
qfi_nupow wNAF ladder, x86_64/qfi.inl:1-135).

Two variants:
  * nupow_shared: one host-known exponent for the whole batch (the
    part_decrypt / decrypt / power_of_h case). Left-to-right binary ladder
    as a lax.scan over a static bit schedule; zero bits skip the compose via
    lax.cond, so the cost is ~bits nudupls + hamming-weight composes.
  * nupow_batch: per-element exponents as limb arrays (the scal_ciphertext /
    matmul case). Uniform masked ladder: each step squares and composes with
    either the base or the identity (selected per element), costing
    2 group-ops per bit.

Both keep everything reduced after every step, so results are bit-exact
with core.qfi.nupow (unique reduced representative)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limb as lb
from .forms import BForm, FormSpec, bform_select, compose_batch, nudupl_batch


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


def nupow_batch(base: BForm, exp_limbs, spec: FormSpec, delta4_mag,
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
