"""v2 kernel stack (ops/rl.py, ops/xgcd2.py, ops/forms2.py): bit-exact vs
the Python oracle (core.qfi / python ints).

These kernels replace the v1 hot path for the workloads behind the
reference's qfi.inl / cpu_cryptosystem_tensor_ops.inl call sites.
"""

import math
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofhe_tpu.core.qfi import (Form, compose, identity_form, neg, nupow,
                                reduce_form)
from cofhe_tpu.ops import limb as lb
from cofhe_tpu.ops import rl
from cofhe_tpu.ops.forms import bform_from_forms, bform_to_forms
from cofhe_tpu.ops.forms2 import CG, CGCtx
from cofhe_tpu.ops.xgcd2 import xgcd_coeff_g


def test_mod_topdown():
    random.seed(1)
    L, B = 40, 64
    xs = [random.randrange(-(1 << 500), 1 << 500) for _ in range(B)]
    ms = [random.randrange(1, 1 << 300) for _ in range(B)]
    xs[0], ms[0] = 0, 1
    xs[1], ms[1] = -1, 1
    xs[2], ms[2] = 12345, 1
    xs[3], ms[3] = -(1 << 400), 3
    xs[4], ms[4] = (1 << 499) + 7, (1 << 499) + 7
    xs[5], ms[5] = (1 << 499) + 6, (1 << 499) + 7
    xs[6], ms[6] = -((1 << 499) + 8), (1 << 499) + 7
    sx, mx = lb.ints_to_signed(xs, L + 4)  # x needs guard limbs over m
    mm = lb.ints_to_limbs(ms, L)
    xin = jnp.asarray(sx)[:, None] * jnp.asarray(mx)
    out = rl.mod_topdown(xin, jnp.asarray(mm), max_iters=600)
    got = lb.limbs_to_ints(np.asarray(out))
    assert all(got[i] == xs[i] % ms[i] for i in range(B))


def test_redc_pow16():
    random.seed(2)
    L, B, K = 40, 64, 30
    ss = [random.randrange(0, 1 << 450) for _ in range(B)]
    ds = [random.randrange(1, 1 << 100) | 1 for _ in range(B)]
    ds[0] = 1
    s_l = jnp.asarray(lb.ints_to_limbs(ss, L))
    dL = jnp.asarray(lb.ints_to_limbs(ds, L))
    d8L = jnp.asarray(lb.ints_to_limbs([d << 8 for d in ds], L))
    dinv = lb.modinv16(dL[:, 0])
    out = rl.redc_pow16(s_l, dL, d8L, dinv, steps=K)
    sg, mg = lb.canonicalize_fast(out)
    got = [int(a) * b for a, b in zip(np.asarray(sg),
                                      lb.limbs_to_ints(np.asarray(mg)))]
    for i in range(B):
        if ds[i] == 1:
            assert got[i] % 1 == 0
            continue
        exp = (ss[i] * pow(pow(2, 16 * K, ds[i]), -1, ds[i])) % ds[i]
        assert got[i] % ds[i] == exp, i
        assert -2 * ds[i] < got[i] < 2 * ds[i] + 2, i


def test_xgcd_coeff_g():
    random.seed(7)
    L, B, bits = 72, 64, 1000
    fs, gs = [], []
    for _ in range(B):
        fs.append(random.randrange(1 << (bits - 1), 1 << bits) | 1)
        gs.append(random.randrange(0, 1 << bits))
    fs[0], gs[0] = 1, 0
    fs[1], gs[1] = 1, 5
    fs[2], gs[2] = 3, 0
    fs[3], gs[3] = 3, 6
    fs[4], gs[4] = (1 << 999) + 1, ((1 << 999) + 1) * 3
    fs[5], gs[5] = 2 ** 999 + 5, 2
    k = random.randrange(1, 1 << 400) | 1
    fs[6], gs[6] = k * 9, k * 6
    f_l = jnp.asarray(lb.ints_to_limbs(fs, L))
    g_l = jnp.asarray(lb.ints_to_limbs(gs, L))
    fn = jax.jit(lambda f, g: xgcd_coeff_g(f, g, f, 1010, need_u=True))
    d, cg, cu = fn(f_l, g_l)
    dv = lb.limbs_to_ints(np.asarray(d))
    cgv = lb.limbs_to_ints(np.asarray(cg))
    cuv = lb.limbs_to_ints(np.asarray(cu))
    for i in range(B):
        want = math.gcd(fs[i], gs[i])
        assert dv[i] == want, i
        assert (cuv[i] * fs[i] + cgv[i] * gs[i] - want) % fs[i] == 0, i
        assert 0 <= cgv[i] < fs[i], i


def _make_cg(hsm):
    disc_bits = (-hsm.Delta).bit_length()
    L, _ = CGCtx.widths_for_disc_bits(disc_bits)
    delta4 = lb.ints_to_limbs([(-hsm.Delta) // 4], 2 * L)[0]
    h_bf = bform_from_forms([hsm.h], L)
    return CG(disc_bits, delta4,
              (h_bf.a[0], h_bf.b_sign[0], h_bf.b[0], h_bf.c[0])), L


def test_compose2_vs_oracle(toy_hsm):
    hsm = toy_hsm
    cg, L = _make_cg(hsm)
    random.seed(3)
    ident = identity_form(hsm.Delta)
    pool = [nupow(hsm.h, random.randrange(1, 1 << 60)) for _ in range(24)]
    B = 64
    f1 = [pool[random.randrange(len(pool))] for _ in range(B)]
    f2 = [pool[random.randrange(len(pool))] for _ in range(B)]
    # edge cases: identities, squares, inverse pairs, small-a / F-subgroup
    # forms with even a (rotation blowup), skewed power-of-f operands
    f1[0] = ident
    f2[1] = ident
    f1[2] = ident
    f2[2] = ident
    f1[3] = f2[3]
    f1[4] = reduce_form(neg(f2[4]))
    f1[5] = hsm.f
    f2[6] = hsm.f
    f1[7] = hsm.power_of_f(5)
    f2[7] = hsm.power_of_f(9)
    bf1 = bform_from_forms(f1, L)
    bf2 = bform_from_forms(f2, L)
    out = jax.tree.map(np.asarray, jax.jit(cg.compose2)(bf1, bf2))
    got = bform_to_forms(type(out)(*out))
    for i in range(B):
        assert got[i] == compose(f1[i], f2[i]), i


def test_compose2_two_tier_xgcd():
    """Mid-width params where Lxn < L so the two-tier first-xgcd split is
    live: random lanes ride the narrow pass; power-of-f operands (a = 4^j
    even, rotated-in c ~ full discriminant width) exceed the narrow bound
    and take the full-width pass. Both must stay bit-exact."""
    from conftest import toy_prime
    from cofhe_tpu.core.cl_hsm2k import CLHSM2k

    hsm = CLHSM2k(128, 32, p=toy_prime(731))
    cg, L = _make_cg(hsm)
    assert cg.Lxn < cg.L, (cg.Lxn, cg.L)  # the split must be live here
    random.seed(11)
    pool = [nupow(hsm.h, random.randrange(1, 1 << 60)) for _ in range(8)]
    B = 12
    f1 = [pool[random.randrange(len(pool))] for _ in range(B)]
    f2 = [pool[random.randrange(len(pool))] for _ in range(B)]
    f1[0] = hsm.power_of_f(5)        # wide lane (one side)
    f2[1] = hsm.power_of_f(9)        # wide lane (other side)
    f1[2] = hsm.power_of_f(3)
    f2[2] = hsm.power_of_f(7)        # wide lane (both sides)
    f1[3] = identity_form(hsm.Delta)
    f1[4] = f2[4]                    # self-compose
    bf1 = bform_from_forms(f1, L)
    bf2 = bform_from_forms(f2, L)
    out = jax.tree.map(np.asarray, jax.jit(cg.compose2)(bf1, bf2))
    got = bform_to_forms(type(out)(*out))
    for i in range(B):
        assert got[i] == compose(f1[i], f2[i]), i


def test_mod_topdown28():
    """28-bit-digit variant: same contract as mod_topdown (x mod m for
    signed redundant x), incl. the degenerate/boundary cases."""
    random.seed(3)
    L, B = 40, 64
    xs = [random.randrange(-(1 << 500), 1 << 500) for _ in range(B)]
    ms = [random.randrange(1, 1 << 300) for _ in range(B)]
    xs[0], ms[0] = 0, 1
    xs[1], ms[1] = -1, 1
    xs[2], ms[2] = 12345, 1
    xs[3], ms[3] = -(1 << 400), 3
    xs[4], ms[4] = (1 << 499) + 7, (1 << 499) + 7
    xs[5], ms[5] = (1 << 499) + 6, (1 << 499) + 7
    xs[6], ms[6] = -((1 << 499) + 8), (1 << 499) + 7
    xs[7], ms[7] = (1 << 500) - 1, 5
    sx, mx = lb.ints_to_signed(xs, L + 4)
    mm = lb.ints_to_limbs(ms, L)
    xin = jnp.asarray(sx)[:, None] * jnp.asarray(mx)
    out = rl.mod_topdown28(xin, jnp.asarray(mm), max_iters=600)
    got = lb.limbs_to_ints(np.asarray(out))
    assert all(got[i] == xs[i] % ms[i] for i in range(B))


def test_reduce2_modes_match_oracle(toy_hsm):
    """Both reduction modes (grouped-rho sim and per-quotient loop) must
    produce the oracle's unique reduced representative on adversarial
    operand classes: inverse pairs (giant CF 'freak' quotients that drop
    to the exact tail), self-composes (full-width second-gcd rare path),
    identities, and skewed power-of-f forms."""
    hsm = toy_hsm
    cg, L = _make_cg(hsm)
    random.seed(11)
    ident = identity_form(hsm.Delta)
    pool = [nupow(hsm.h, random.randrange(1, 1 << 60)) for _ in range(16)]
    B = 32
    f1 = [pool[random.randrange(len(pool))] for _ in range(B)]
    f2 = [pool[random.randrange(len(pool))] for _ in range(B)]
    f1[0] = ident
    f2[1] = ident
    f1[2] = f2[2]                         # self-compose
    f1[3] = reduce_form(neg(f2[3]))       # inverse pair -> freak quotient
    f1[4] = reduce_form(neg(f2[4]))
    f1[5] = hsm.power_of_f(3)
    f2[5] = hsm.power_of_f(7)
    bf1 = bform_from_forms(f1, L)
    bf2 = bform_from_forms(f2, L)
    want = [compose(a, b) for a, b in zip(f1, f2)]
    for grouped in (True, False):
        fn = jax.jit(lambda x, y, g=grouped: cg.compose2(x, y, grouped=g))
        out = jax.tree.map(np.asarray, fn(bf1, bf2))
        got = bform_to_forms(type(out)(*out))
        for i in range(B):
            assert got[i] == want[i], (grouped, i)
