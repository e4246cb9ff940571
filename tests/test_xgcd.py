"""Tests for the batched divstep extended-GCD against Python's math.gcd."""

import random
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofhe_tpu.ops import limb, xgcd

random.seed(77)

_xgcd = jax.jit(xgcd.xgcd_mod, static_argnames=("nbits",))


def run_batch(fs, gs, ms, L, nbits):
    mf = jnp.array(limb.ints_to_limbs(fs, L))
    mg = jnp.array(limb.ints_to_limbs(gs, L))
    mm = jnp.array(limb.ints_to_limbs(ms, L))
    d, u, v = _xgcd(mf, mg, mm, nbits)
    dh = limb.limbs_to_ints(np.array(d))
    uh = limb.limbs_to_ints(np.array(u))
    vh = limb.limbs_to_ints(np.array(v))
    for i in range(len(fs)):
        dref = gcd(fs[i], gs[i])
        assert dh[i] == dref, (i, fs[i], gs[i])
        assert (uh[i] * fs[i] + vh[i] * gs[i] - dref) % ms[i] == 0, i
        assert 0 <= uh[i] < ms[i] and 0 <= vh[i] < ms[i], i


def test_random_500b():
    B = 48
    fs = [random.getrandbits(random.randrange(2, 500)) | 1 for _ in range(B)]
    gs = [random.getrandbits(random.randrange(1, 500)) for _ in range(B)]
    ms = [max(random.getrandbits(random.randrange(2, 500)) | 1, 3) for _ in range(B)]
    run_batch(fs, gs, ms, 40, 500)


def test_edges():
    m = (1 << 200) + 1  # odd
    f1 = random.getrandbits(300) | 1
    cases = [
        (f1, 0, m),            # g = 0
        (f1, f1, m),           # equal
        (1, random.getrandbits(290), m),  # f = 1
        (3, 6, m),
        (f1, f1 * 2, m),       # g multiple of f
        ((1 << 299) + 1, (1 << 298), m),
        (f1, 1, m),
        (5, 0, 5),             # modulus equal gcd
        (f1, random.getrandbits(300), 3),  # tiny modulus
    ]
    # shared gcd structure: d * coprimes
    d = random.getrandbits(80) | 1
    a = random.getrandbits(100) | 1
    b = random.getrandbits(100)
    cases.append((d * a, d * b, m))
    fs = [c[0] for c in cases]
    gs = [c[1] for c in cases]
    ms = [c[2] for c in cases]
    run_batch(fs, gs, ms, 26, 310)


@pytest.mark.slow
def test_production_size():
    """~1100-bit operands as in the sec-128/k-128 parameter set."""
    B = 8
    fs = [random.getrandbits(1100) | 1 for _ in range(B)]
    gs = [random.getrandbits(random.randrange(500, 1100)) for _ in range(B)]
    ms = [random.getrandbits(1090) | 1 for _ in range(B)]
    run_batch(fs, gs, ms, 75, 1100)
