"""Multi-chip execution: sharded homomorphic ops over a jax.sharding.Mesh.

The reference's "distributed" axes (SURVEY.md §2.6) map onto the mesh as:

  * dp — the ciphertext-element axis (OpenMP-parallel loops in the
    reference, C17): output cells of a matmul / elements of a batch are
    split across devices; no cross-device traffic.
  * tp — the contraction axis m of ct(n,m) x pt(m,p) (the reference's
    sequential row-sum nucomp chains, cpu_cryptosystem_tensor_ops.inl:
    403-417): each device exponentiates and locally composes its slice of
    j's, and the per-device partial products meet in an all_gather over the
    ICI followed by a log-depth local composition tree.
  * threshold — partial decryptions d_i = c1^{s_i} computed on the device
    holding share i (the reference's t TLS fan-outs, smpc_client.hpp:
    153-159), then combined with an all_gather + masked-inverse composition
    (lambda = (1, -1, ..., -1)).

Group composition is NOT an arithmetic psum, so reductions use
all_gather + O(log t) local compositions instead of psum; gathers ride the
ICI when the mesh axes are laid out inside a pod slice.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import limb as lb
from ..ops.forms import BForm, FormSpec, bform_select, compose_batch
from ..ops.nupow import identity_bform, nupow_batch


def make_mesh(devices=None, dp: int | None = None, tp: int | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)
    if dp is None and tp is None:
        tp = 1 << ((ndev.bit_length() - 1) // 2)
        dp = ndev // tp
    elif dp is None:
        dp = ndev // tp
    elif tp is None:
        tp = ndev // dp
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def _tree_compose_axis(bf: BForm, groups: int, spec: FormSpec, delta4) -> BForm:
    """bf has batch = groups * width; compose pairwise along the width axis
    until one form per group remains. width must be a power of two."""
    batch = bf.a.shape[0]
    width = batch // groups
    cur = bf
    while width > 1:
        half = width // 2

        def split(x):
            r = x.reshape(groups, width, *x.shape[1:])
            return (r[:, :half].reshape(groups * half, *x.shape[1:]),
                    r[:, half:].reshape(groups * half, *x.shape[1:]))

        A = BForm(*(split(x)[0] for x in cur))
        B = BForm(*(split(x)[1] for x in cur))
        cur = compose_batch(A, B, spec, delta4)
        width = half
    return cur


def sharded_scal_matmul_step(mesh: Mesh, spec: FormSpec, delta4, exp_bits: int,
                             n: int, m: int, p: int):
    """Builds the jitted multi-chip matmul step.

    Inputs (device arrays):
      bf:   BForm batch of 2*n*m*p product operands with flat index
            j * (2*n*p) + cell  (contraction index j is the SLOW axis, so a
            'tp' shard of the leading axis is an m/tp slab covering every
            output cell).
      exps: (2*n*m*p, Lk) exponent limbs in the same layout.
    Output: BForm batch of 2*n*p accumulated results (replicated over tp).

    The step = batched ladder exponentiation (local) -> local composition
    tree over the device's m-slice -> all_gather over 'tp' -> local tree
    over the tp partials. One jit; collectives are XLA all_gathers.
    """
    tp = mesh.shape["tp"]
    assert m % tp == 0, "contraction axis must divide tp"
    cells = 2 * n * p

    from jax.experimental.shard_map import shard_map

    def step(bf: BForm, exps):
        def local(bf_loc: BForm, exps_loc):
            powed = nupow_batch(bf_loc, exps_loc, spec, delta4, exp_bits)
            m_loc = m // tp
            # (m_loc*cells, ...) j-major -> cell-major (cells, m_loc) flat
            def to_cell_major(x):
                r = x.reshape(m_loc, cells, *x.shape[1:])
                return jnp.moveaxis(r, 0, 1).reshape(m_loc * cells, *x.shape[1:])

            cm = BForm(*(to_cell_major(x) for x in powed))
            partial = _tree_compose_axis(cm, cells, spec, delta4)  # (cells,)
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tp", axis=0), partial)

            def regroup(x):  # (tp, cells, ...) -> (cells*tp, ...) group-major
                return jnp.moveaxis(x, 0, 1).reshape(cells * tp, *x.shape[2:])

            G = BForm(*(regroup(x) for x in gathered))
            out = _tree_compose_axis(G, cells, spec, delta4)
            return out

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(BForm(P("tp"), P("tp"), P("tp"), P("tp")), P("tp")),
            out_specs=BForm(P(None), P(None), P(None), P(None)),
            check_rep=False)
        return fn(bf, exps)

    return jax.jit(step)


def sharded_threshold_combine(mesh: Mesh, spec: FormSpec, delta4):
    """Threshold combine over the 'tp' axis: device i holds its partial
    decryption d_i (batch of forms); combine d = d_0 * (d_1 * ... )^-1 via
    all_gather + local masked-inverse composition tree."""
    from jax.experimental.shard_map import shard_map
    from ..ops.forms import bform_neg

    tp = mesh.shape["tp"]

    def step(ds: BForm):
        def local(d_loc: BForm):
            idx = jax.lax.axis_index("tp")
            # lambda = (1, -1, ..., -1): invert every share but the first
            inv = bform_neg(d_loc)
            d_signed = bform_select(jnp.full(d_loc.a.shape[:1], idx == 0), d_loc, inv)
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tp", axis=0), d_signed)

            def regroup(x):
                return jnp.moveaxis(x, 0, 1).reshape(-1, *x.shape[2:])

            G = BForm(*(regroup(x) for x in gathered))
            groups = d_loc.a.shape[0]
            return _tree_compose_axis(G, groups, spec, delta4)

        fn = shard_map(local, mesh=mesh,
                       in_specs=(BForm(P("tp"), P("tp"), P("tp"), P("tp")),),
                       out_specs=BForm(P(None), P(None), P(None), P(None)),
                       check_rep=False)
        return fn(ds)

    return jax.jit(step)
