"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
matmul step (tp-sharded contraction + all_gather combine) and the threshold
combine collective must match the host oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofhe_tpu.core.qfi import Form, compose, neg, nupow, reduce_form
from cofhe_tpu.ops import limb as lb
from cofhe_tpu.ops.forms import FormSpec, bform_from_forms, bform_to_forms
from cofhe_tpu.parallel import sharded

random.seed(17)


@pytest.fixture(scope="module")
def setup(toy_hsm):
    hsm = toy_hsm
    disc_bits = (-hsm.Delta).bit_length()
    spec = FormSpec.for_disc_bits(disc_bits)
    delta4 = lb.ints_to_limbs([(-hsm.Delta) // 4], 2 * spec.L)[0]  # np constant
    return hsm, spec, delta4


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_sharded_matmul_step(setup):
    hsm, spec, delta4 = setup
    mesh = sharded.make_mesh(dp=1, tp=4)
    n, m, p = 1, 4, 1
    exp_bits = 16
    from cofhe_tpu.core.rng import RandGen

    rng = RandGen(b"shard-test")
    base = hsm.power_of_h(rng.random_mpz(1 << 24))
    cts = [nupow(base, 2 * i + 3) for i in range(n * m)]  # one "row" of c1 forms
    # treat the same forms as both c1 and c2 halves (cells = 2*n*p)
    exps = [random.randrange(1 << exp_bits) for _ in range(m)]
    # layout: flat = j * (2*n*p) + cell ; cells = 2 (c1-half, c2-half)
    cells = 2 * n * p
    flat_forms = []
    flat_exps = []
    for j in range(m):
        for cell in range(cells):
            flat_forms.append(cts[j])
            flat_exps.append(exps[j])
    bf = bform_from_forms(flat_forms, spec.L)
    Lk = (exp_bits + 15) // 16
    e = jnp.asarray(lb.ints_to_limbs(flat_exps, Lk))
    step = sharded.sharded_scal_matmul_step(mesh, spec, delta4, exp_bits, n, m, p)
    out = step(bf, e)
    got = bform_to_forms(jax.tree.map(np.asarray, out))
    # oracle: prod_j cts[j]^exps[j]
    expect = None
    for j in range(m):
        t = nupow(cts[j], exps[j])
        expect = t if expect is None else compose(expect, t)
    assert got[0] == expect
    assert got[1] == expect


@pytest.mark.slow
def test_sharded_threshold_combine(setup):
    hsm, spec, delta4 = setup
    t = 2
    mesh = sharded.make_mesh(dp=1, tp=t)
    from cofhe_tpu.core.rng import RandGen
    from cofhe_tpu.core import liss

    rng = RandGen(b"thresh-shard")
    sk = hsm.keygen(rng)
    pk = hsm.pk_from_sk(sk)
    m_vals = [random.randrange(hsm.M) for _ in range(2)]
    cts = [hsm.encrypt(pk, v, rng) for v in m_vals]
    shares = liss.share_secret(sk, 3, t, hsm.encrypt_randomness_bound(), rng)
    combo = (0, 1)
    sh = [shares[pm][liss.share_index_for_party(pm, combo, 3)] for pm in combo]
    # device i computes d_i = c1^s_i (host here; the collective combine is
    # what's under test) — stacked share-major
    ds = []
    for si in sh:
        for ct in cts:
            ds.append(hsm.part_decrypt(ct, si))
    bf = bform_from_forms(ds, spec.L)
    combine = sharded.sharded_threshold_combine(mesh, spec, delta4)
    out = combine(bf)
    got = bform_to_forms(jax.tree.map(np.asarray, out))
    for i, ct in enumerate(cts):
        d_oracle = hsm.part_decrypt(ct, sh[0])
        d_oracle = compose(d_oracle, reduce_form(neg(hsm.part_decrypt(ct, sh[1]))))
        assert got[i] == d_oracle
        # full decrypt via the collective's output
        fm = compose(ct.c2, neg(got[i]))
        assert hsm.dlog_in_F(reduce_form(fm)) == m_vals[i]
