"""Multi-chip execution: sharded homomorphic ops over a jax.sharding.Mesh,
built on the v2 kernel stack (ops/forms2.CG + ops/matmul2 pool machine).

The reference's "distributed" axes (SURVEY.md §2.6) map onto the mesh as:

  * dp — the ciphertext-row axis (OpenMP-parallel element loops in the
    reference, openmp.hpp:4-11): stacked (c1,c2) ct rows of a matmul are
    split across devices; zero-collective.
  * tp — the contraction axis m of ct(n,m) x pt(m,p) (the reference's
    sequential row-sum nucomp chains, cpu_cryptosystem_tensor_ops.inl:
    403-417): each device ladders and locally contracts its j-slice into a
    per-slot Yao bank, the per-device banks meet in an all_gather over the
    ICI + a log-depth masked composition tree, and the finalization runs on
    the combined bank (valid because contraction commutes with the Yao
    identity in the abelian class group — see ops/matmul2.py).
  * threshold — partial decryptions d_i = c1^{s_i} computed on the device
    holding share i (the reference's t TLS fan-outs, smpc_client.hpp:
    153-159), then combined with an all_gather + masked-inverse composition
    (lambda = (1, -1, ..., -1)).

Group composition is NOT an arithmetic psum, so reductions use
all_gather + O(log t) masked local compositions (ONE compose instance via
lax.scan) instead of psum; gathers ride the ICI inside a pod slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.forms import BForm, bform_neg, bform_select
from ..ops.forms2 import CG
from ..ops.matmul2 import MatmulPlan, make_phase1, make_phase2
from ..ops.nupow2 import identity_bform2


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


def _scan_tree_compose(cg: CG, stacked: BForm, t: int):
    """Compose a (t, rows, ...) stack down to (rows, ...) with ONE compose2
    instance: log2ceil(t) scan steps of fixed width ceil(t/2)*rows; inactive
    lanes compose identities and are masked back."""
    rows = stacked.a.shape[1]
    th = (t + 1) // 2
    levels = max(1, (t - 1).bit_length())
    ident1 = identity_bform2(cg, 1)

    def pad_to(bf, size):
        padn = size - bf.a.shape[0]
        if padn <= 0:
            return bf
        return BForm(
            jnp.concatenate([bf.a, jnp.broadcast_to(ident1.a, (padn,) + bf.a.shape[1:])]),
            jnp.concatenate([bf.b_sign, jnp.zeros((padn,) + bf.b_sign.shape[1:], bf.b_sign.dtype)]),
            jnp.concatenate([bf.b, jnp.zeros((padn,) + bf.b.shape[1:], bf.b.dtype)]),
            jnp.concatenate([bf.c, jnp.broadcast_to(ident1.c, (padn,) + bf.c.shape[1:])]))

    # flatten (t, rows) -> (t*rows); lane layout slot-major in t
    def flat(bf):
        return BForm(bf.a.reshape(-1, bf.a.shape[-1]), bf.b_sign.reshape(-1),
                     bf.b.reshape(-1, bf.b.shape[-1]),
                     bf.c.reshape(-1, bf.c.shape[-1]))

    t_pad = 1 << levels
    cur = flat(pad_to(stacked, t_pad))  # identity-padded to power of two

    # per-level gather indices (static): pairs (2i, 2i+1) over the t axis
    gA = np.zeros((levels, (t_pad // 2) * rows), dtype=np.int32)
    gB = np.zeros((levels, (t_pad // 2) * rows), dtype=np.int32)
    keep = np.zeros((levels, (t_pad // 2) * rows), dtype=np.int32)
    cnt = t_pad
    lane = np.arange((t_pad // 2) * rows, dtype=np.int32)
    i_t, r = lane // rows, lane % rows
    for l in range(levels):
        gA[l] = np.where(i_t < cnt // 2, 2 * i_t * rows + r, 0)
        gB[l] = np.where(i_t < cnt // 2, (2 * i_t + 1) * rows + r, 0)
        keep[l] = (i_t < cnt // 2).astype(np.int32)
        cnt //= 2

    def body(cur, xs):
        ga, gb, kp = xs
        A = BForm(cur.a[ga], cur.b_sign[ga], cur.b[ga], cur.c[ga])
        Bv = BForm(cur.a[gb], cur.b_sign[gb], cur.b[gb], cur.c[gb])
        comp = cg.compose2(A, Bv, grouped=False)
        kb = kp.astype(bool)
        comp = bform_select(kb, comp, A)
        # write back to the first-half lanes
        half = comp.a.shape[0]
        cur = BForm(cur.a.at[:half].set(comp.a),
                    cur.b_sign.at[:half].set(comp.b_sign),
                    cur.b.at[:half].set(comp.b),
                    cur.c.at[:half].set(comp.c))
        return cur, None

    cur, _ = jax.lax.scan(body, cur, (jnp.asarray(gA), jnp.asarray(gB),
                                      jnp.asarray(keep)))
    return BForm(cur.a[:rows], cur.b_sign[:rows], cur.b[:rows], cur.c[:rows])


def sharded_matmul_fn(mesh: Mesh, cg: CG, plan_loc: MatmulPlan):
    """Builds the jitted dp x tp sharded fused matmul.

    plan_loc describes ONE shard: rows2_loc = 2*nr/dp stacked ct rows,
    m_loc = m/tp contraction columns, full p.

    Inputs (leading shard axes):
      cells_g: BForm (dp, tp, Bb_loc, ...) — shard (d,t)'s cell block.
      zero_g:  BForm (dp, Bo_loc, ...) — Enc(0) rows per dp shard.
      jobs_g:  (dp, tp, nsteps, 4, B_loc) int32 — per-shard job streams.
    Output: BForm (dp, Bo_loc, ...) result rows per dp shard.

    Graph: phase1 locally (ladder + local j-contraction) -> all_gather of
    the per-slot contracted banks over 'tp' -> masked scan tree -> phase2
    (finalization + Enc(0)) locally. 4 compose instances total.
    """
    tp = mesh.shape["tp"]
    p1 = make_phase1(cg, plan_loc)
    p2 = make_phase2(cg, plan_loc)

    def local(cells, zero, jobs):
        sq = lambda x: x.reshape(x.shape[2:])  # drop (1,1) shard dims
        sqz = lambda x: x.reshape(x.shape[1:])
        sb = p1(BForm(sq(cells.a), sq(cells.b_sign), sq(cells.b),
                      sq(cells.c)), jobs.reshape(jobs.shape[2:]))
        if tp > 1:
            g = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "tp", axis=0), sb)
            sb = _scan_tree_compose(cg, g, tp)
        out = p2(sb, BForm(sqz(zero.a), sqz(zero.b_sign), sqz(zero.b),
                           sqz(zero.c)))
        return jax.tree.map(lambda x: x[None], out)

    bsh2 = BForm(P("dp", "tp"), P("dp", "tp"), P("dp", "tp"), P("dp", "tp"))
    bsh1 = BForm(P("dp"), P("dp"), P("dp"), P("dp"))
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(bsh2, bsh1, P("dp", "tp")),
                       out_specs=bsh1, check_vma=False)
    return jax.jit(fn)


def sharded_threshold_combine(mesh: Mesh, cg: CG):
    """Threshold combine over the 'tp' axis: device i holds its
    LAMBDA-SIGNED partial decryption (the caller applies
    lambda = (1, -1, ..., -1) — engine.combine_batch inverts every party's
    shares but the first host-side); layout (tp, batch, ...). Returns the
    composed d replicated on every device (final_decrypt,
    cpu_cryptosystem_distributed.inl:256-270; the t TLS fan-ins of
    smpc_client.hpp:153-159 become one ICI all_gather)."""
    tp = mesh.shape["tp"]

    def local(d_loc: BForm):
        d = jax.tree.map(lambda x: x.reshape(x.shape[1:]), d_loc)
        g = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tp", axis=0), d)
        out = _scan_tree_compose(cg, g, tp)
        return jax.tree.map(lambda x: x[None], out)

    bsh = BForm(P("tp"), P("tp"), P("tp"), P("tp"))
    # replicate the combined result over tp so every shard returns it
    osh = BForm(P("tp"), P("tp"), P("tp"), P("tp"))
    fn = jax.shard_map(local, mesh=mesh, in_specs=(bsh,), out_specs=osh,
                       check_vma=False)
    return jax.jit(fn)
