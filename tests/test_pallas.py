"""Pallas kernel vs pure-JAX path bit-exactness (interpret mode on CPU;
the same kernels run compiled on real TPUs, selected by JaxEngine)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from cofhe_tpu.ops import pallas_group, xgcd2
from cofhe_tpu.ops import limb as lb

random.seed(23)


def _mags(vals, L):
    return jnp.asarray(lb.ints_to_limbs(vals, L))


@pytest.mark.skipif(not pallas_group.HAVE_PALLAS, reason="no pallas")
@pytest.mark.parametrize("need_u", [False, True])
def test_pallas_xgcd_matches_plain(need_u):
    L = 16
    nbits = 200
    B = 6  # forces padding to one 128-lane tile
    fs, gs = [], []
    for _ in range(B):
        f = random.getrandbits(190) | (1 << 189) | 1  # odd
        g = random.getrandbits(188)
        fs.append(f)
        gs.append(g)
    f_mag = _mags(fs, L)
    g_mag = _mags(gs, L)
    plain = xgcd2.xgcd_coeff_g(f_mag, g_mag, f_mag, nbits, need_u=need_u)
    pall = pallas_group.xgcd_coeff_g(f_mag, g_mag, f_mag, nbits,
                                     need_u=need_u, interpret=True)
    for a, b in zip(plain, pall):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not pallas_group.HAVE_PALLAS, reason="no pallas")
def test_pallas_mod_topdown_matches_plain():
    """VMEM-resident mu loop == rl.mod_topdown == python %, incl. signed x,
    tiny/huge moduli, and tile padding."""
    from cofhe_tpu.ops import rl

    L, Lm, B = 40, 24, 9  # pads to one tile
    xs = [random.randrange(-(1 << 600), 1 << 600) for _ in range(B)]
    ms = [random.randrange(1, 1 << 300) * 2 for _ in range(B)]
    xs[0], ms[0] = 0, 2
    xs[1], ms[1] = -1, 2
    xs[2], ms[2] = (1 << 630) - 1, 3
    sx, mx = lb.ints_to_signed(xs, L)
    xin = jnp.asarray(sx)[:, None] * jnp.asarray(mx)
    mm = jnp.asarray(lb.ints_to_limbs(ms, Lm))
    plain = rl.mod_topdown(xin, mm, max_iters=300)
    pall = pallas_group.mod_topdown(xin, mm, max_iters=300, tile=128,
                                    interpret=True)
    assert np.array_equal(np.asarray(plain), np.asarray(pall))
    got = lb.limbs_to_ints(np.asarray(pall))
    assert all(got[i] == xs[i] % ms[i] for i in range(B))


@pytest.mark.skipif(not pallas_group.HAVE_PALLAS, reason="no pallas")
def test_pallas_xgcd_bezout_oracle():
    """cg * g0 ≡ d (mod m) with m = f0, against python math.gcd."""
    import math

    L = 16
    B = 4
    fs = [random.getrandbits(150) | 1 for _ in range(B)]
    gs = [random.getrandbits(150) for _ in range(B)]
    f_mag = _mags(fs, L)
    g_mag = _mags(gs, L)
    d, cg = pallas_group.xgcd_coeff_g(f_mag, g_mag, f_mag, 160,
                                      interpret=True)
    d_i = lb.limbs_to_ints(np.asarray(d))
    cg_i = lb.limbs_to_ints(np.asarray(cg))
    for i in range(B):
        assert d_i[i] == math.gcd(fs[i], gs[i])
        assert (cg_i[i] * gs[i] - d_i[i]) % fs[i] == 0
        assert 0 <= cg_i[i] < fs[i]
