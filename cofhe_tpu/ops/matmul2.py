"""Fused homomorphic scal-matmul as a 3-instance "compose job stream".

The reference's hot path for ct(n,m) x pt(m,p) is one qfi_nupow wNAF ladder
per ciphertext cell (amortizing a doubling cache across the p exponents of a
row) followed by m-fold nucomp accumulation loops
(/root/reference/include/x86_64/cpu_cryptosystem_tensor_ops.inl:342-462,
qfi.inl:1-135). The v2 TPU engine (ops/engine.py round 2) fused the whole
matmul into one jit, but inlined ~10 separate compose graphs (4 unrolled
doubling steps, 2 finalization composes, 3 contraction stages) — XLA compile
was measured at 145 s on-TPU / >9.5 min on a 2-core CPU host, which broke
both the bench driver and the fast test tier (VERDICT round 2).

v3 (this module) lowers the ENTIRE matmul onto THREE compose instances,
each driven by `lax.scan` over a precomputed job stream:

  scan A  (nudupl @ Bb=2*n*m lanes)   — the doubling chain of every cell,
                                        collected as a (nwind, Bb) stack.
  scan B  (compose @ B=2*n*m*p lanes) — generic pool machine: each step
                                        gathers two row sets from a form
                                        pool, composes, scatters back.
                                        Steps: nwind Yao-ladder bank updates
                                        + the m-contraction tree applied
                                        PER BANK SLOT (see below).
  scan C  (compose @ 2*n*p lanes)     — Yao finalization + Enc(0) fold on
                                        the contracted bank.

Bank-first contraction: the Yao identity R_r = prod_v bank_r[v]^v commutes
with the m-contraction (the group is abelian), so contracting each bank
slot over j FIRST shrinks the finalization batch from B rows to 2*n*p rows:
~14 B-wide finalization steps become ~14 (B/m)-wide ones, saving ~8/50 of
the total compose work at the reference shape, and the job-stream form cuts
the compiled graph from ~10 compose instances to 3.

Everything is bit-exact with the previous path (unique reduced forms).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .forms import BForm, bform_neg, bform_select
from .forms2 import CG
from .nupow2 import identity_bform2


def _gather(bf: BForm, idx) -> BForm:
    return BForm(bf.a[idx], bf.b_sign[idx], bf.b[idx], bf.c[idx])


def _scatter(bf: BForm, idx, val: BForm) -> BForm:
    return BForm(bf.a.at[idx].set(val.a),
                 bf.b_sign.at[idx].set(val.b_sign),
                 bf.b.at[idx].set(val.b),
                 bf.c.at[idx].set(val.c))


def _tree_concat(bfs):
    return BForm(*(jnp.concatenate([getattr(b, f) for b in bfs], axis=0)
                   for f in ("a", "b_sign", "b", "c")))


class MatmulPlan:
    """Static layout + job templates for one (rows2, m, p, nwind, w) shape.
    `rows2` counts the stacked (c1, c2) ciphertext rows — 2*nr on a single
    device, 2*nr/dp per shard under a dp mesh split.

    Pool-B row map: [0]=identity  [1]=scatter dump  [CH:]=doubling-chain
    stack (nwind x Bb)  [BK:]=bank (S x B).
    Pool-C row map: [0]=identity  [1]=dump  [ZO:]=Enc(0) rows (rows2*p)
    [SB:]=contracted bank slots 1..S-1  [T:], [R:]=finalization state.
    """

    def __init__(self, rows2: int, m: int, p: int, nwind: int, w: int):
        self.rows2, self.m, self.p, self.nwind, self.w = rows2, m, p, nwind, w
        self.half = 1 << (w - 1)
        self.S = self.half + 1
        self.Bb = rows2 * m
        self.B = rows2 * m * p
        self.Bo = rows2 * p
        B, Bb, S = self.B, self.Bb, self.S
        self.CH = 2
        self.BK = self.CH + nwind * Bb
        self.NP = self.BK + S * B

        lane = np.arange(B, dtype=np.int32)
        # exponent lane r = ((hi*m + j)*p + kk); its base cell = hi*m + j
        self.base_map = lane // p
        self.lane = lane

        # ---- static scan-B contraction steps: per-slot binary tree over j
        steps = []
        hi = np.arange(rows2, dtype=np.int32)
        kk = np.arange(p, dtype=np.int32)
        v = np.arange(1, S, dtype=np.int32)
        l = 0
        while (1 << l) < m:
            stride = 1 << l
            j0 = np.arange(0, m - stride, 2 * stride, dtype=np.int32)
            if j0.size:
                # grid (v, hi, j0, kk) -> flat lanes
                ia = (self.BK + v[:, None, None, None] * B
                      + (hi[None, :, None, None] * m
                         + j0[None, None, :, None]) * p
                      + kk[None, None, None, :]).ravel()
                ib = (self.BK + v[:, None, None, None] * B
                      + (hi[None, :, None, None] * m
                         + (j0[None, None, :, None] + stride)) * p
                      + kk[None, None, None, :]).ravel()
                steps.extend(self._pack(ia, ib, ia))
            l += 1
        self.contract_steps = steps  # list of (4, B) int32

        # ---- static scan-C jobs: Yao finalization + Enc(0) fold
        Bo = self.Bo
        self.ZO = 2
        self.SB = self.ZO + Bo
        self.Tr = self.SB + (S - 1) * Bo
        self.Rr = self.Tr + Bo
        self.NPC = self.Rr + Bo
        laneo = np.arange(Bo, dtype=np.int32)

        def sb(vv):  # rows of contracted bank slot vv (1-indexed)
            return self.SB + (vv - 1) * Bo + laneo

        jc = []
        zero4 = np.zeros(Bo, dtype=np.int32)
        T, R = self.Tr + laneo, self.Rr + laneo
        if self.half == 1:
            # R = bank[1]; just fold Enc(0)
            jc.append(np.stack([sb(1), self.ZO + laneo, zero4, R]))
        else:
            for vv in range(self.half - 1, 0, -1):
                first = vv == self.half - 1
                jc.append(np.stack([sb(self.half) if first else T,
                                    sb(vv), zero4, T]))
                jc.append(np.stack([sb(self.half) if first else R,
                                    T, zero4, R]))
            jc.append(np.stack([R, self.ZO + laneo, zero4, R]))
        self.fin_jobs = np.stack(jc).astype(np.int32)  # (nstepsC, 4, Bo)

        # output rows (after scan C): R in (hi, kk) order
        self.out_rows = (self.Rr + laneo).astype(np.int32)
        # contracted-bank gather rows out of pool B (slot-major)
        self.sb_rows = (self.BK + v[:, None] * B
                        + (hi[None, :] * m + 0) * p)[..., None] \
            + kk[None, None, :]
        self.sb_rows = self.sb_rows.reshape(-1).astype(np.int32)

    def _pack(self, ia, ib, io, nb=None):
        """Pack flat lane lists into full-width (4, B) steps; pad with
        identity∘identity -> dump."""
        B = self.B
        cnt = ia.size
        nsteps = max(1, (cnt + B - 1) // B)
        pad = nsteps * B - cnt
        z = np.zeros(pad, dtype=np.int32)
        ia = np.concatenate([ia.astype(np.int32), z])
        ib = np.concatenate([ib.astype(np.int32), z])
        io = np.concatenate([io.astype(np.int32), z + 1])
        nb = (np.zeros(nsteps * B, dtype=np.int32) if nb is None
              else np.concatenate([nb.astype(np.int32), z]))
        return [np.stack([ia[s * B:(s + 1) * B], ib[s * B:(s + 1) * B],
                          nb[s * B:(s + 1) * B], io[s * B:(s + 1) * B]])
                for s in range(nsteps)]

    def jobs_b(self, digits: np.ndarray) -> np.ndarray:
        """Full scan-B job array for one call. digits: (nwind, B) signed."""
        nwind, B = digits.shape
        assert nwind == self.nwind and B == self.B
        slot = np.abs(digits).astype(np.int32)
        ia = self.BK + slot * B + self.lane[None, :]
        ib = (self.CH + (np.arange(nwind, dtype=np.int32) * self.Bb)[:, None]
              + self.base_map[None, :])
        nb = (digits < 0).astype(np.int32)
        ladder = np.stack([ia, ib, nb, ia], axis=1)  # (nwind, 4, B)
        if self.contract_steps:
            return np.concatenate(
                [ladder, np.stack(self.contract_steps)], axis=0)
        return ladder


@functools.lru_cache(maxsize=16)
def get_plan(rows2: int, m: int, p: int, nwind: int, w: int) -> MatmulPlan:
    return MatmulPlan(rows2, m, p, nwind, w)


def _make_step(cg: CG):
    def step(pool, job):
        ia, ib, nb, io = job[0], job[1], job[2], job[3]
        A = _gather(pool, ia)
        Bv = _gather(pool, ib)
        Bv = bform_select(nb.astype(bool), bform_neg(Bv), Bv)
        return _scatter(pool, io, cg.compose2(A, Bv, grouped=False)), None

    return step


def make_chain(cg: CG, plan: MatmulPlan):
    """cells -> doubling-chain stack (nwind * Bb rows): chain_t = cells ^
    (2^(w t)), collected by a single-nudupl-instance scan."""
    nwind, w, Bb = plan.nwind, plan.w, plan.Bb

    def fn(bf_cells):
        _, stack = jax.lax.scan(
            lambda c, _: (cg.nudupl2(c, grouped=False), c), bf_cells, None,
            length=nwind * w)
        return jax.tree.map(
            lambda x: x[::w].reshape((nwind * Bb,) + x.shape[2:]), stack)

    return fn


def make_chain_stack(cg: CG, nwind: int, w: int):
    """Doubling-chain scan over an ARBITRARY cell batch, returning the
    unflattened (nwind, batch, ...) stack. The engine runs this ONCE over
    every chunk's cells concatenated (chain cost at a few hundred lanes is
    launch-latency-bound, so 4 chunk chains at Bb=256 cost ~4x one chain
    at 1024 — measured 26 ms vs 32 ms per compose on a v5e) and slices
    per-chunk (nwind*Bb) views for the ladder pools."""

    def fn(bf_cells):
        _, stack = jax.lax.scan(
            lambda c, _: (cg.nudupl2(c, grouped=False), c), bf_cells, None,
            length=nwind * w)
        return jax.tree.map(lambda x: x[::w], stack)

    return fn


def make_ladder(cg: CG, plan: MatmulPlan):
    """chain stack -> contracted bank: the pool machine (Yao ladder bank
    updates + per-slot m-contraction), ONE compose instance."""
    S, B = plan.S, plan.B
    sb_rows = jnp.asarray(plan.sb_rows)
    step = _make_step(cg)

    def fn(chain, jobs_b):
        # pool B: [identity, dump, chain, bank(identity-init)]
        head = identity_bform2(cg, 2)
        bank0 = identity_bform2(cg, S * B)
        pool = _tree_concat([head, chain, bank0])
        pool, _ = jax.lax.scan(step, pool, jobs_b)
        return _gather(pool, sb_rows)

    return fn


def make_phase1(cg: CG, plan: MatmulPlan):
    """cells -> contracted bank (chain + ladder in one graph; the sharded
    shard_map path uses this single-jit form). Returns
    fn(bf_cells, jobs_b) -> BForm of (S-1)*Bo rows: slot-major contracted
    bank, slot v's Bo rows holding prod_j bank[(hi,j,kk)][v] at (hi, kk).

    bf_cells: (Bb,) stacked [c1 of cell(hi=0..rows2/2-1, j)..., c2...].
    jobs_b:   (nsteps, 4, B) int32 from plan.jobs_b(digits).
    """
    chain_fn = make_chain(cg, plan)
    ladder_fn = make_ladder(cg, plan)

    def fn(bf_cells, jobs_b):
        return ladder_fn(chain_fn(bf_cells), jobs_b)

    return fn


def make_phase2(cg: CG, plan: MatmulPlan):
    """Contracted bank -> result: Yao finalization + Enc(0) fold.
    fn(bf_smallbank, bf_zero) -> BForm of Bo rows [c1 x Bo/2, c2 x Bo/2]."""
    fin_jobs = jnp.asarray(plan.fin_jobs)
    out_rows = jnp.asarray(plan.out_rows)
    step = _make_step(cg)

    def fn(bf_smallbank, bf_zero):
        headc = identity_bform2(cg, 2)
        tr0 = identity_bform2(cg, 2 * plan.Bo)
        poolc = _tree_concat([headc, bf_zero, bf_smallbank, tr0])
        poolc, _ = jax.lax.scan(step, poolc, fin_jobs)
        return _gather(poolc, out_rows)

    return fn


def make_matmul_fn(cg: CG, plan: MatmulPlan):
    """Single-device fused matmul: phase1 then phase2 in one graph.
    fn(bf_cells, bf_zero, jobs_b) -> BForm of Bo result rows."""
    p1 = make_phase1(cg, plan)
    p2 = make_phase2(cg, plan)

    def fn(bf_cells, bf_zero, jobs_b):
        return p2(p1(bf_cells, jobs_b), bf_zero)

    return fn
