"""Property tests of the batched limb arithmetic against Python ints."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cofhe_tpu.ops import limb

random.seed(2024)

_mag_mul = jax.jit(limb.mag_mul, static_argnames=("L_out",))
_divexact = jax.jit(limb.mag_divexact_odd, static_argnames=("L_out",))
_divmod = jax.jit(limb.mag_divmod, static_argnames=("Lq",))
_canon = jax.jit(limb.canonicalize)
_add = jax.jit(limb.sm_add)
_sub = jax.jit(limb.sm_sub)
_cmp = jax.jit(limb.sm_cmp)
_mcmp = jax.jit(limb.mag_cmp)
_smul = jax.jit(limb.sm_mul, static_argnames=("L_out",))
_scmul = jax.jit(limb.sm_scalar_mul, static_argnames=("L_out",))
_shl = jax.jit(limb.mag_shl_bits, static_argnames=("bits", "L_out"))
_shr = jax.jit(limb.mag_shr_bits, static_argnames=("bits",))
_shrd = jax.jit(limb.mag_shr_bits_dyn)
_bitlen = jax.jit(limb.mag_bitlen)
_mfloat = jax.jit(limb.mag_float)


def rand_ints(n, bits, signed=False, allow_zero=True):
    out = []
    for _ in range(n):
        b = random.randrange(1, bits + 1)
        v = random.getrandbits(b)
        if not allow_zero and v == 0:
            v = 1
        if signed and random.random() < 0.5:
            v = -v
        out.append(v)
    # throw in edge cases
    out[0] = 0 if allow_zero else 1
    if n > 2:
        out[1] = (1 << bits) - 1
        out[2] = 1 << (bits - 1)
    return out


def test_roundtrip():
    vals = rand_ints(32, 500, signed=True)
    s, m = limb.ints_to_signed(vals, 40)
    back = limb.limbs_to_ints(m, s)
    assert back == vals


def test_canonicalize_redundant():
    L = 20
    for _ in range(5):
        red = np.random.randint(-2**28, 2**28, size=(16, L)).astype(np.int32)
        red[:, -2:] = 0  # headroom: contract requires |value| < 2^(16 L)
        vals = [sum(int(red[i, j]) << (16 * j) for j in range(L)) for i in range(16)]
        s, m = _canon(jnp.array(red))
        got = limb.limbs_to_ints(np.array(m), np.array(s))
        assert got == vals


def test_add_sub_cmp():
    a = rand_ints(64, 700, signed=True)
    b = rand_ints(64, 700, signed=True)
    A = limb.ints_to_signed(a, 46)
    B = limb.ints_to_signed(b, 46)
    A = (jnp.array(A[0]), jnp.array(A[1]))
    B = (jnp.array(B[0]), jnp.array(B[1]))
    s, m = _add(A, B)
    assert limb.limbs_to_ints(np.array(m), np.array(s)) == [x + y for x, y in zip(a, b)]
    s, m = _sub(A, B)
    assert limb.limbs_to_ints(np.array(m), np.array(s)) == [x - y for x, y in zip(a, b)]
    c = _cmp(A, B)
    assert list(np.array(c)) == [(x > y) - (x < y) for x, y in zip(a, b)]


def test_mag_cmp():
    a = [abs(x) for x in rand_ints(64, 300)]
    b = [abs(x) for x in rand_ints(64, 300)]
    b[0] = a[0]  # equal case
    ma = jnp.array(limb.ints_to_limbs(a, 20))
    mb = jnp.array(limb.ints_to_limbs(b, 20))
    c = _mcmp(ma, mb)
    assert list(np.array(c)) == [(x > y) - (x < y) for x, y in zip(a, b)]


def test_mul():
    a = [abs(x) for x in rand_ints(48, 1100)]
    b = [abs(x) for x in rand_ints(48, 1100)]
    ma = jnp.array(limb.ints_to_limbs(a, 70))
    mb = jnp.array(limb.ints_to_limbs(b, 70))
    m = _mag_mul(ma, mb)
    assert limb.limbs_to_ints(np.array(m)) == [x * y for x, y in zip(a, b)]


def test_mul_signed():
    a = rand_ints(32, 400, signed=True)
    b = rand_ints(32, 400, signed=True)
    A = tuple(map(jnp.array, limb.ints_to_signed(a, 26)))
    B = tuple(map(jnp.array, limb.ints_to_signed(b, 26)))
    s, m = _smul(A, B)
    assert limb.limbs_to_ints(np.array(m), np.array(s)) == [x * y for x, y in zip(a, b)]


def test_scalar_mul():
    a = rand_ints(32, 600, signed=True)
    sc = [random.randrange(-2**14, 2**14) for _ in range(32)]
    A = tuple(map(jnp.array, limb.ints_to_signed(a, 42)))
    s, m = _scmul(A, jnp.array(sc, dtype=jnp.int32))
    assert limb.limbs_to_ints(np.array(m), np.array(s)) == [x * y for x, y in zip(a, sc)]


def test_shifts():
    a = [abs(x) for x in rand_ints(16, 500)]
    ma = jnp.array(limb.ints_to_limbs(a, 40))
    for bits in (0, 1, 7, 16, 23, 48, 100):
        m = _shl(ma, bits=bits, L_out=48)
        assert limb.limbs_to_ints(np.array(m)) == [x << bits for x in a]
        m = _shr(ma, bits=bits)
        assert limb.limbs_to_ints(np.array(m)) == [x >> bits for x in a]
    dyn = jnp.array([i * 3 % 120 for i in range(16)], dtype=jnp.int32)
    m = _shrd(ma, dyn)
    assert limb.limbs_to_ints(np.array(m)) == [x >> (i * 3 % 120) for i, x in enumerate(a)]


def test_bitlen_float():
    a = [abs(x) for x in rand_ints(64, 900)]
    ma = jnp.array(limb.ints_to_limbs(a, 60))
    bl = np.array(_bitlen(ma))
    assert list(bl) == [x.bit_length() for x in a]
    mant, exp = _mfloat(ma)
    mant, exp = np.array(mant), np.array(exp)
    for i, x in enumerate(a):
        if x == 0:
            continue
        approx = float(mant[i]) * 2.0 ** int(exp[i])
        assert abs(approx - x) <= max(x * 1e-6, 2 ** max(0, x.bit_length() - 40))


def test_divexact_odd():
    qs = [abs(x) for x in rand_ints(48, 600)]
    ys = [abs(x) | 1 for x in rand_ints(48, 500, allow_zero=False)]
    xs = [q * y for q, y in zip(qs, ys)]
    mx = jnp.array(limb.ints_to_limbs(xs, 80))
    my = jnp.array(limb.ints_to_limbs(ys, 80))
    q = _divexact(mx, my, 40)
    assert limb.limbs_to_ints(np.array(q)) == qs


def test_divmod():
    xs = [abs(x) for x in rand_ints(64, 1200)]
    ys = [abs(x) for x in rand_ints(64, 700, allow_zero=False)]
    ys = [max(y, 1) for y in ys]
    mx = jnp.array(limb.ints_to_limbs(xs, 80))
    my = jnp.array(limb.ints_to_limbs(ys, 80))
    Lq = (1200 - 1) // 16 + 2
    q, r = _divmod(mx, my, Lq)
    qh = limb.limbs_to_ints(np.array(q))
    rh = limb.limbs_to_ints(np.array(r))
    for x, y, qq, rr in zip(xs, ys, qh, rh):
        assert qq == x // y, (x, y, qq, x // y)
        assert rr == x % y


def test_divmod_adversarial():
    """Near-boundary quotients: x = q*y + {0, 1, y-1}."""
    cases = []
    for _ in range(40):
        y = random.getrandbits(random.randrange(2, 500)) + 1
        q = random.getrandbits(random.randrange(1, 500))
        for r in (0, 1, y - 1):
            cases.append((q * y + r, y))
    xs = [c[0] for c in cases]
    ys = [c[1] for c in cases]
    L = (1000 // 16) + 4
    mx = jnp.array(limb.ints_to_limbs(xs, L))
    my = jnp.array(limb.ints_to_limbs(ys, L))
    q, r = _divmod(mx, my, L)
    qh = limb.limbs_to_ints(np.array(q))
    rh = limb.limbs_to_ints(np.array(r))
    for (x, y), qq, rr in zip(cases, qh, rh):
        assert qq == x // y and rr == x % y, (x, y)
