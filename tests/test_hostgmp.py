"""Native GMP host backend (csrc/classgroup.cpp) vs the pure-Python oracle.

The backend replicates the reference's CPU cost model (BICYCL nucomp/nupow
under OpenMP loops, reference include/x86_64/qfi.inl:1-135, openmp.hpp:4-11)
and must be bit-exact with cofhe_tpu.core.qfi on every op.
"""

import random

import pytest

from cofhe_tpu.core import qfi

pytestmark = pytest.mark.skipif(
    __import__("cofhe_tpu.ops.hostgmp", fromlist=["get_lib"]).get_lib() is None,
    reason="native classgroup backend unavailable")


@pytest.fixture(scope="module")
def cg_and_forms(toy_hsm):
    from cofhe_tpu.ops.hostgmp import GmpClassGroup

    cg = GmpClassGroup(toy_hsm.Delta)
    forms = [qfi.nupow(toy_hsm.h, 3 + 2 * i) for i in range(16)]
    return cg, forms


def test_compose_batch_matches_oracle(cg_and_forms):
    cg, fs = cg_and_forms
    out = cg.compose_batch(fs[:8], fs[8:])
    assert out == [qfi.compose(a, b) for a, b in zip(fs[:8], fs[8:])]


def test_nudupl_batch_matches_oracle(cg_and_forms):
    cg, fs = cg_and_forms
    assert cg.nudupl_batch(fs) == [qfi.nudupl(f) for f in fs]


def test_nupow_batch_matches_oracle(cg_and_forms):
    cg, fs = cg_and_forms
    random.seed(7)
    exps = [0, 1, -3, 16, 255, random.randrange(1 << 96), -(1 << 64) - 9, 2]
    out = cg.nupow_batch(fs[:8], exps)
    assert out == [qfi.nupow(f, e) for f, e in zip(fs[:8], exps)]


def test_gmp_engine_end_to_end(toy_cs):
    """encrypt -> scal_matmul + add -> decrypt through the GmpEngine
    (device="host" default now selects it when the lib builds)."""
    from cofhe_tpu.ops.hostgmp import GmpEngine
    from cofhe_tpu.tensor import Tensor

    cs = toy_cs
    assert isinstance(cs._engine, GmpEngine)
    sk = cs.keygen()
    pk = cs.keygen(sk)
    random.seed(3)
    M = cs.hsm2k.M
    n, m, p = 2, 3, 2
    vals = [random.randrange(M) for _ in range(n * m)]
    svals = [random.randrange(1 << 16) for _ in range(m * p)]
    ct = cs.encrypt_tensor(pk, Tensor(vals, (n, m)))
    res = cs.scal_ciphertext_tensors(pk, Tensor(svals, (m, p)), ct)
    dec = cs.decrypt_tensor(sk, res)
    for i in range(n):
        for kk in range(p):
            want = sum(vals[i * m + j] * svals[j * p + kk]
                       for j in range(m)) % M
            assert dec.at(i, kk) == want
