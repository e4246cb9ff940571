"""Unit tests for the class-group (QFI) core: group laws, reduction,
independent CRT cross-check of composition, and power consistency."""

import random

import pytest

from cofhe_tpu.core.intmath import gcd, invmod, xgcd
from cofhe_tpu.core.qfi import (
    Form,
    compose,
    enumerate_reduced_forms,
    form_from_ab,
    identity_form,
    is_reduced,
    neg,
    nudupl,
    nupow,
    prime_form,
    reduce_form,
)

random.seed(1234)


@pytest.fixture(scope="module", params=[-10804, -83427, -184400, -67531])
def group(request):
    D = request.param
    return D, enumerate_reduced_forms(D)


def test_identity_reduced(group):
    D, forms = group
    e = identity_form(D)
    assert is_reduced(e)
    assert e in forms


def test_group_laws(group):
    D, forms = group
    e = identity_form(D)
    for _ in range(30):
        f1, f2, f3 = (random.choice(forms) for _ in range(3))
        a = compose(f1, f2)
        assert is_reduced(a) and a.disc == D
        assert compose(f2, f1) == a
        assert compose(compose(f1, f2), f3) == compose(f1, compose(f2, f3))
        assert compose(f1, e) == reduce_form(f1)
        assert compose(f1, reduce_form(neg(f1))) == e
        assert nudupl(f1) == compose(f1, f1)


def test_compose_matches_crt_path(group):
    """Independent validation: for coprime a1,a2 composition is CRT on b."""
    D, forms = group
    checked = 0
    for _ in range(200):
        f1, f2 = random.choice(forms), random.choice(forms)
        if gcd(f1.a, f2.a) != 1:
            continue
        a3 = f1.a * f2.a
        b3 = (f1.b + 2 * f1.a * ((f2.b - f1.b) // 2 * invmod(f1.a, f2.a) % f2.a)) % (2 * a3)
        assert (b3 * b3 - D) % (4 * a3) == 0
        assert compose(f1, f2) == reduce_form(form_from_ab(a3, b3, D))
        checked += 1
    assert checked > 20


def test_nupow_vs_iterated(group):
    D, forms = group
    e = identity_form(D)
    for _ in range(8):
        f = random.choice(forms)
        n = random.randrange(0, 200)
        r = e
        for _ in range(n):
            r = compose(r, f)
        assert nupow(f, n) == r
        assert nupow(f, -n) == reduce_form(neg(r))


def test_prime_form():
    D = -184400
    for l in (3, 7, 11, 13, 17):
        pf = prime_form(D, l)
        if pf is None:
            continue
        assert pf.disc == D
        assert is_reduced(pf)


def test_large_disc_roundtrip():
    """Big-number smoke test: ~600-bit discriminant."""
    from cofhe_tpu.core.rng import RandGen

    rg = RandGen(b"big-disc")
    p = rg.random_bits(600) | (1 << 599) | 1
    D = -8 * p if p % 4 == 3 else -4 * p  # not nec. fundamental; fine for group laws
    if D % 4 not in (0, 1):
        D -= 1
    f = prime_form(D, 3) or prime_form(D, 5) or prime_form(D, 7)
    assert f is not None
    g = nupow(f, 12345)
    assert compose(nupow(f, 12000), nupow(f, 345)) == g
    assert compose(g, reduce_form(neg(g))) == identity_form(D)
