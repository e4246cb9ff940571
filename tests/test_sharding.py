"""Multi-chip sharding on the virtual 8-device CPU mesh, v2 kernel stack:
the dp x tp sharded fused matmul through the PRODUCTION engine API, the
threshold-combine collective, and the masked scan composition tree — all
bit-exact vs the host oracle. (Fast tier: toy params, tiny shapes.)"""

import random

import jax
import numpy as np
import pytest

from cofhe_tpu.core.qfi import compose, neg, reduce_form
from cofhe_tpu.ops.forms import BForm, bform_from_forms, bform_to_forms
from cofhe_tpu.parallel import sharded
from cofhe_tpu.tensor import Tensor

random.seed(17)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_scan_tree_compose(toy_cs):
    """Odd-width stack (exercises identity padding) vs sequential oracle."""
    hsm = toy_cs.hsm2k
    from cofhe_tpu.core.rng import RandGen
    from cofhe_tpu.ops.engine import JaxEngine

    eng = JaxEngine(hsm)
    rng = RandGen(b"tree-test")
    t, rows = 3, 2
    forms = [[hsm.power_of_h(rng.random_mpz(1 << 24)) for _ in range(rows)]
             for _ in range(t)]
    stacks = [bform_from_forms(f, eng.L) for f in forms]
    import jax.numpy as jnp

    stacked = BForm(*(jnp.stack([np.asarray(getattr(s, f)) for s in stacks])
                      for f in ("a", "b_sign", "b", "c")))
    out = jax.jit(lambda s: sharded._scan_tree_compose(eng.cg, s, t))(stacked)
    got = bform_to_forms(jax.tree.map(np.asarray, out))
    for r in range(rows):
        expect = forms[0][r]
        for i in range(1, t):
            expect = compose(expect, forms[i][r])
        assert got[r] == expect, r


@pytest.fixture(scope="module")
def mesh_cs(toy_cs):
    """CryptoSystem on a dp=2 x tp=2 mesh (4 of the 8 virtual devices)."""
    from cofhe_tpu.api import CryptoSystem
    from conftest import toy_prime

    mesh = sharded.make_mesh(devices=jax.devices()[:4], dp=2, tp=2)
    cs = CryptoSystem(128, 32, p=toy_prime(100), seed=b"shard-seed",
                      device="tpu", mesh=mesh)
    sk = cs.keygen()
    pk = cs.keygen(sk)
    return cs, sk, pk


def test_sharded_matmul_through_engine(mesh_cs):
    """scal_ciphertext_tensors on the mesh: ct rows dp-sharded, contraction
    tp-sharded, one jit; decrypts to the plaintext matmul."""
    cs, sk, pk = mesh_cs
    M = cs.hsm2k.M
    n, m, p = 2, 4, 2            # 2n % dp == 0, m % tp == 0
    ctv = [random.randrange(1000) for _ in range(n * m)]
    sv = [random.randrange(1000) for _ in range(m * p)]
    ct = cs.encrypt_tensor(pk, Tensor(ctv, (n, m)))
    res = cs.scal_ciphertext_tensors(pk, Tensor(sv, (m, p)), ct)
    dec = cs.decrypt_tensor(sk, res)
    for i in range(n):
        for kk in range(p):
            expect = sum(ctv[i * m + j] * sv[j * p + kk]
                         for j in range(m)) % M
            assert dec.at(i, kk) == expect, (i, kk)


def test_sharded_threshold_combine(toy_cs):
    """combine_batch with mesh tp == t: one device per party's shares,
    all_gather + masked-inverse tree; full decrypt matches."""
    from cofhe_tpu.api import CryptoSystem
    from cofhe_tpu.core import liss
    from cofhe_tpu.ops.engine import JaxEngine
    from conftest import toy_prime

    t = 2
    mesh = sharded.make_mesh(devices=jax.devices()[:t], dp=1, tp=t)
    hsm = toy_cs.hsm2k
    eng = JaxEngine(hsm, mesh=mesh)
    from cofhe_tpu.core.rng import RandGen

    rng = RandGen(b"thresh-shard")
    sk = hsm.keygen(rng)
    pk = hsm.pk_from_sk(sk)
    m_vals = [random.randrange(hsm.M) for _ in range(3)]
    cts = [hsm.encrypt(pk, v, rng) for v in m_vals]
    shares = liss.share_secret(sk, 3, t, hsm.encrypt_randomness_bound(), rng)
    combo = (0, 1)
    sh = [shares[pm][liss.share_index_for_party(pm, combo, 3)]
          for pm in combo]
    pdrs = [[hsm.part_decrypt(ct, si) for ct in cts] for si in sh]
    got = eng.combine_batch(cts, pdrs)
    assert got == m_vals
    # engine-level result equals the host final_decrypt oracle
    for i, ct in enumerate(cts):
        assert hsm.final_decrypt(ct, [p[i] for p in pdrs]) == m_vals[i]


def test_local_combine_batch(toy_cs):
    """combine_batch without a mesh (local scan tree), t=3 odd."""
    from cofhe_tpu.core import liss
    from cofhe_tpu.ops.engine import JaxEngine
    from cofhe_tpu.core.rng import RandGen

    hsm = toy_cs.hsm2k
    eng = JaxEngine(hsm)
    rng = RandGen(b"thresh-local")
    sk = hsm.keygen(rng)
    pk = hsm.pk_from_sk(sk)
    m_vals = [random.randrange(hsm.M) for _ in range(2)]
    cts = [hsm.encrypt(pk, v, rng) for v in m_vals]
    t, np_ = 3, 4
    shares = liss.share_secret(sk, np_, t, hsm.encrypt_randomness_bound(),
                               rng)
    combo = (0, 2, 3)
    sh = [shares[pm][liss.share_index_for_party(pm, combo, np_)]
          for pm in combo]
    pdrs = [[hsm.part_decrypt(ct, si) for ct in cts] for si in sh]
    assert eng.combine_batch(cts, pdrs) == m_vals
