"""JaxEngine: the TPU compute path behind the CryptoSystem facade.

Maps the reference's OpenMP-parallel per-element loops
(cpu_cryptosystem_vector_ops.inl / cpu_cryptosystem_tensor_ops.inl) onto
batched JAX kernels over limb arrays — v2: everything routes through the
redundant-limb compose kernels (ops/forms2.py) and the signed-digit Yao
ladder (ops/nupow2.py):

  * add_batch      — one batched composition over the stacked (c1, c2) pairs
                     (2N forms in a single kernel).
  * scal_batch     — Yao ladder with per-element host-recoded digits.
  * part_decrypt / decrypt — shared-exponent wNAF ladder (the exponent is
                     the host-known share/secret key), then a host-side
                     closed-form dlog for decrypt.
  * scal_matmul    — ct (n,m) x pt (m,p) via the pool-machine job stream
                     (ops/matmul2.py): per row chunk a doubling-chain scan
                     (the TPU form of the reference's cross-exponent
                     doubling cache, qfi.inl:28-62) and a gather/compose/
                     scatter ladder+contraction scan, dispatched async per
                     chunk; ONE batched Yao finalization + Enc(0) fold
                     (cpu_cryptosystem_tensor_ops.inl:352-356) over all
                     chunks, one fetch. One compose/nudupl instance per
                     jit (the remote compile worker faults on larger
                     graphs).

Batch shapes are bucketed to powers of two (pad with identity forms) to
bound recompilation. Results are bit-exact with the host path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cl_hsm2k import CipherText, CLHSM2k
from ..core.qfi import Form
from . import limb as lb
from .forms import BForm, bform_from_forms, bform_to_forms
from .forms2 import CG, CGCtx
from .nupow2 import (identity_bform2, nupow_shared_wnaf2, nupow_yao2,
                     nwind_for_bits, signed_windows, wnaf_digits)

YAO_W = 4  # signed-digit window for per-element exponents

# Process-wide dispatch serialization: one batched op on the device at a
# time. The shared TPU runtime intermittently crashes under concurrent
# dispatch from multiple threads (e.g. an in-process network's threshold
# fan-out driving two CoFHE-node engines at once — docs/RUNTIME_FAULTS.md);
# on real multi-host deployments each host has its own runtime and this is
# moot. AUTO default (round 5): serialize exactly when >1 engine shares
# this process and the backend is a non-CPU accelerator — so
# network_prod.py-style runs are safe with no env knobs, while the
# single-engine production path and CPU tests stay lock-free. Overrides:
# COFHE_ENGINE_SERIALIZE=1 forces on, =0 forces off.
import threading as _threading
from contextlib import nullcontext as _nullcontext

_DISPATCH_LOCK = _threading.RLock()
_ENGINE_COUNT = 0
_PLATFORM_IS_CPU = None


def _dispatch_guard():
    import os

    env = os.environ.get("COFHE_ENGINE_SERIALIZE")
    if env == "1":
        return _DISPATCH_LOCK
    if env == "0":
        return _nullcontext()
    if _ENGINE_COUNT > 1:
        global _PLATFORM_IS_CPU
        if _PLATFORM_IS_CPU is None:
            try:
                _PLATFORM_IS_CPU = jax.devices()[0].platform == "cpu"
            except Exception:
                return _nullcontext()
        if not _PLATFORM_IS_CPU:
            return _DISPATCH_LOCK
    return _nullcontext()



def _serialized(fn):
    """Optional process-wide dispatch serialization (see _dispatch_guard)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with _dispatch_guard():
            return fn(*a, **kw)

    return wrapper

def _bucket(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class JaxEngine:
    """Batched TPU engine. With `mesh`, kernels shard their batch axis over
    every mesh device (PartitionSpec ("dp","tp")): the matmul's ladder,
    bank updates and m-contraction tree are all elementwise along the row
    axis once rows are blocked by ciphertext row i, so dp sharding runs
    zero-collective — the TPU form of the reference's OpenMP element loops
    (openmp.hpp:4-11) scaled across chips instead of cores."""

    def __init__(self, hsm2k: CLHSM2k, mesh=None):
        global _ENGINE_COUNT
        _ENGINE_COUNT += 1
        self.hsm = hsm2k
        self.mesh = mesh
        disc_bits = (-hsm2k.Delta).bit_length()
        L, _ = CGCtx.widths_for_disc_bits(disc_bits)
        self.L = L
        # numpy (not device) constants: closure-captured device arrays can
        # deadlock during lowering (observed on jax 0.9 cpu)
        delta4 = lb.ints_to_limbs([(-hsm2k.Delta) // 4], 2 * L)[0]
        from ..core.qfi import nudupl as _qnudupl

        h2_form = _qnudupl(hsm2k.h)
        h_bf = bform_from_forms([hsm2k.h, h2_form], L)

        def _row(i):
            return (np.asarray(h_bf.a[i]), np.asarray(h_bf.b_sign[i]),
                    np.asarray(h_bf.b[i]), np.asarray(h_bf.c[i]))

        # Pallas xgcd kernel: OPT-IN (COFHE_PALLAS=1). It lowers and is
        # bit-exact on real TPUs, but measures ~2x slower than the XLA
        # while-loop at every VMEM tile size tried (XLA already runs this
        # loop near state-bandwidth); kept as the foundation for moving
        # LARGER compose segments into single kernels.
        from .pallas_group import env_enabled

        self.cg = CG(disc_bits, delta4, _row(0), _row(1),
                     use_pallas=env_enabled(False))
        self._identity_form = hsm2k.identity

    # ------------------------------------------------------------- transport
    @staticmethod
    def _fetch(tree):
        """Device->host transfer that also works when outputs span multiple
        jax.distributed processes (global mesh): every host receives the
        FULL result, matching the reference's semantics where each party
        holds whole ciphertext tensors (smpc_client.hpp:125-159)."""
        def one(x):
            if getattr(x, "is_fully_addressable", True):
                return np.asarray(x)
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))

        return jax.tree.map(one, tree)

    def _forms_to_bform(self, forms, batch: int) -> BForm:
        padded = list(forms) + [self._identity_form] * (batch - len(forms))
        return bform_from_forms(padded, self.L)

    def _cts_to_bform(self, cts) -> tuple[BForm, int, int]:
        """Stack [c1s..., c2s...] into one padded BForm batch."""
        n = len(cts)
        batch = _bucket(2 * n)
        forms = [ct.c1 for ct in cts] + [ct.c2 for ct in cts]
        return self._forms_to_bform(forms, batch), n, batch

    def _bform_to_cts(self, bf: BForm, n: int):
        out = bform_to_forms(bf)
        return [CipherText(out[i], out[n + i]) for i in range(n)]

    def _digits_for(self, scalars, rows: int, nwind: int,
                    row_map) -> np.ndarray:
        """(nwind, rows) signed digit array; row_map[r] indexes scalars (or
        -1 for identity-pad rows, digit 0)."""
        recoded = np.zeros((len(scalars), nwind), dtype=np.int32)
        for i, s in enumerate(scalars):
            recoded[i] = signed_windows(int(s), YAO_W, nwind)
        out = np.zeros((rows, nwind), dtype=np.int32)
        live = row_map >= 0
        out[live] = recoded[row_map[live]]
        return np.ascontiguousarray(out.T)

    # --------------------------------------------------------------- kernels
    def _row_sharding(self):
        """NamedSharding splitting a leading batch axis over all mesh
        devices, or None when no mesh is attached."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(tuple(self.mesh.axis_names)))

    def _jit_rows(self, fn, n_bform_args: int, extra_specs=()):
        """jit `fn` whose first n_bform_args are row-major BForms (leading
        batch axis) sharded over the mesh; extra_specs gives PartitionSpecs
        for the remaining args. Falls back to plain jit without a mesh."""
        sh = self._row_sharding()
        if sh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding

        bform_sh = BForm(sh, sh, sh, sh)
        in_sh = tuple([bform_sh] * n_bform_args) + tuple(
            NamedSharding(self.mesh, s) for s in extra_specs)
        return jax.jit(fn, in_shardings=in_sh, out_shardings=bform_sh)

    def _rows_divisible(self, *ns: int) -> bool:
        if self.mesh is None:
            return False
        d = self.mesh.devices.size
        return all(n % d == 0 for n in ns)

    @functools.lru_cache(maxsize=32)
    def _add_kernel(self, batch: int):
        if self._rows_divisible(batch):
            return self._jit_rows(self.cg.compose2, 2)
        return jax.jit(self.cg.compose2)

    @functools.lru_cache(maxsize=32)
    def _scal_kernel(self, batch: int, nwind: int):
        cg = self.cg

        def k(base, digits):
            return nupow_yao2(cg, base, digits, w=YAO_W)

        if self._rows_divisible(batch):
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = self._row_sharding()
            bsh = BForm(sh, sh, sh, sh)
            dsh = NamedSharding(self.mesh,
                                P(None, tuple(self.mesh.axis_names)))
            return jax.jit(k, in_shardings=(bsh, dsh), out_shardings=bsh)
        return jax.jit(k)

    # fixed wNAF segment length: the TPU runtime crashes on single
    # ~1500-step scans (k=256 part_decrypt, round 4); chained fixed
    # segments keep the accumulator on device and cache ONE kernel per
    # (batch, WNAF_SEG, w) for every exponent length
    WNAF_SEG = 128

    @functools.lru_cache(maxsize=16)
    def _wnaf_bank_kernel(self, batch: int, w: int):
        from .nupow2 import make_wnaf_bank

        cg = self.cg
        return jax.jit(lambda base: make_wnaf_bank(cg, base, w=w))

    @functools.lru_cache(maxsize=16)
    def _wnaf_segment_kernel(self, batch: int, w: int):
        import os

        from .nupow2 import wnaf_segment

        cg = self.cg
        # Grouped-rho inside the segment scan: DEFAULT ON. This scan
        # carries only the accumulator (the odd-power bank is a closure
        # input, not a scan carry), so it escapes the carried-bank
        # scheduling pathology — measured 1.69x on a v5e: 3.74 vs 6.32 s
        # per 128-step segment @4096, k=128 (micro.py --what wnaf).
        # COFHE_WNAF_GROUPED=0 restores the per-quotient loop.
        grouped = os.environ.get("COFHE_WNAF_GROUPED", "1") == "1"
        return jax.jit(lambda bank, r, seg: wnaf_segment(cg, bank, r, seg,
                                                         w=w,
                                                         grouped=grouped))

    def _mesh_dims(self):
        if self.mesh is None:
            return 1, 1
        shape = dict(self.mesh.shape)
        return shape.get("dp", 1), shape.get("tp", 1)

    @functools.lru_cache(maxsize=16)
    def _matmul_kernel_sharded(self, rows2_loc: int, m_loc: int, p: int,
                               nwind: int):
        """dp x tp sharded pool-machine matmul (parallel/sharded.py)."""
        from ..parallel.sharded import sharded_matmul_fn
        from .matmul2 import get_plan

        plan = get_plan(rows2_loc, m_loc, p, nwind, YAO_W)
        return plan, sharded_matmul_fn(self.mesh, self.cg, plan)

    @functools.lru_cache(maxsize=16)
    def _matmul_kernel2(self, nr: int, m: int, p: int, nwind: int):
        """Pool-machine fused matmul (ops/matmul2.py): 3 compose instances
        driven by job-stream scans instead of the ~10-instance v2 graph.
        Returns (plan, jitted chain, jitted ladder, jitted phase2) — one
        compose/nudupl instance per jit ON PURPOSE: larger combined graphs
        repeatedly crashed the TPU runtime's remote compile worker, while
        single-instance graphs compile reliably; the inter-jit values
        (chain stack, contracted bank) stay on device."""
        from .matmul2 import get_plan, make_chain, make_ladder, make_phase2

        plan = get_plan(2 * nr, m, p, nwind, YAO_W)
        return (plan, jax.jit(make_chain(self.cg, plan)),
                jax.jit(make_ladder(self.cg, plan)),
                jax.jit(make_phase2(self.cg, plan)))

    # batched encrypt only pays off once the compose compile amortizes
    min_batch_encrypt = 64

    # Kernel batches are capped: one jit at B>32k (and sometimes >16k)
    # crashes the remote compile worker / OOMs the bank state, and the
    # cap means large network workloads reuse ONE compiled kernel per
    # chunk instead of compiling per bucket size. Env: COFHE_MAX_BATCH.
    max_batch = int(__import__("os").environ.get("COFHE_MAX_BATCH", "16384"))

    def _chunks(self, n: int, step: int | None = None):
        step = step or self.max_batch
        return [(s, min(s + step, n)) for s in range(0, n, step)]

    # ------------------------------------------------------------------- ops
    @_serialized
    def compose_forms_batch(self, forms1, forms2):
        """Elementwise class-group composition over raw forms (batched
        encrypt / combine paths)."""
        n = len(forms1)
        if n > self.max_batch:
            out = []
            for s, e in self._chunks(n):
                out.extend(self.compose_forms_batch(forms1[s:e], forms2[s:e]))
            return out
        batch = _bucket(n)
        bf1 = self._forms_to_bform(forms1, batch)
        bf2 = self._forms_to_bform(forms2, batch)
        out = self._add_kernel(batch)(bf1, bf2)
        return bform_to_forms(self._fetch(out))[:n]

    @_serialized
    def add_batch(self, cts1, cts2):
        if 2 * len(cts1) > self.max_batch:
            out = []
            # ct batches stack (c1, c2) -> 2n rows: chunk at max_batch/2
            for s, e in self._chunks(len(cts1), self.max_batch // 2):
                out.extend(self.add_batch(cts1[s:e], cts2[s:e]))
            return out
        bf1, n, batch = self._cts_to_bform(cts1)
        bf2, _, _ = self._cts_to_bform(cts2)
        out = self._add_kernel(batch)(bf1, bf2)
        return self._bform_to_cts(self._fetch(out), n)

    @_serialized
    def scal_batch(self, scalars, cts):
        n = len(cts)
        if 2 * n > self.max_batch:
            out = []
            for s, e in self._chunks(n, self.max_batch // 2):
                out.extend(self.scal_batch(scalars[s:e], cts[s:e]))
            return out
        bf, _, batch = self._cts_to_bform(cts)
        nwind = nwind_for_bits(self.hsm.k, YAO_W)
        # layout from _cts_to_bform: [c1 x n, c2 x n, identity pad...]
        row_map = np.full(batch, -1, dtype=np.int64)
        row_map[:n] = np.arange(n)
        row_map[n:2 * n] = np.arange(n)
        digits = self._digits_for(list(scalars), batch, nwind, row_map)
        out = self._scal_kernel(batch, nwind)(bf, jnp.asarray(digits))
        return self._bform_to_cts(self._fetch(out), n)

    @_serialized
    def part_decrypt_batch(self, share: int, cts):
        """d_i = c1^share for every ct (shared exponent)."""
        n = len(cts)
        if n > self.max_batch:
            out = []
            for s, e in self._chunks(n):
                out.extend(self.part_decrypt_batch(share, cts[s:e]))
            return out
        batch = _bucket(n)
        bf = self._forms_to_bform([ct.c1 for ct in cts], batch)
        if share == 0:
            return [self._identity_form] * n
        neg = share < 0
        e = abs(share)
        # width-5 wNAF schedule, front-padded to a multiple of WNAF_SEG
        # (leading zero digits on an identity accumulator are harmless
        # nudupls of the identity); chained fixed-length segments, result
        # resident on device between segments
        w = 5
        sched = wnaf_digits(e, w)
        sched = [0] * ((-len(sched)) % self.WNAF_SEG) + sched
        bank = self._wnaf_bank_kernel(batch, w)(bf)
        seg_k = self._wnaf_segment_kernel(batch, w)
        r = identity_bform2(self.cg, batch)
        for s in range(0, len(sched), self.WNAF_SEG):
            r = seg_k(bank, r, jnp.asarray(sched[s:s + self.WNAF_SEG],
                                           jnp.int32))
        forms = bform_to_forms(self._fetch(r))[:n]
        if neg:
            from ..core.qfi import neg as qneg, reduce_form

            forms = [reduce_form(qneg(f)) for f in forms]
        return forms

    @functools.lru_cache(maxsize=8)
    def _combine_kernel(self, t: int, batch: int):
        """Masked-inverse threshold-combine tree over a (t, batch) PDR
        stack. With a mesh whose tp axis == t, each party's shares live on
        their own device and the combine all_gathers over ICI (the TPU form
        of the reference's t TLS fan-ins, smpc_client.hpp:153-159); else a
        local scan tree."""
        from ..parallel.sharded import (_scan_tree_compose,
                                        sharded_threshold_combine)

        cg = self.cg
        dp, tp = self._mesh_dims()
        if tp == t and t > 1:
            return sharded_threshold_combine(self.mesh, cg)

        def k(stacked):
            return _scan_tree_compose(cg, stacked, t)

        return jax.jit(k)

    @_serialized
    def combine_batch(self, cts, pdrs_per_party):
        """final_decrypt over a batch: d = d_0 ∘ (d_1 ∘ ... ∘ d_{t-1})^-1
        (lambda = (1,-1,...,-1)), m = dlog(c2 ∘ d^-1) — batched tree +
        batched compose, host dlog (reference finalDecrypt,
        cpu_cryptosystem_distributed.inl:256-270)."""
        from ..core.qfi import neg as qneg, reduce_form

        t = len(pdrs_per_party)
        n = len(cts)
        if n > self.max_batch:
            out = []
            for s, e in self._chunks(n):
                out.extend(self.combine_batch(
                    cts[s:e], [p[s:e] for p in pdrs_per_party]))
            return out
        batch = _bucket(n)
        # lambda applied host-side: invert every party's shares but the
        # first (form negation = b sign flip + boundary re-reduce)
        rows = [pdrs_per_party[0]] + [
            [reduce_form(qneg(f)) for f in p] for p in pdrs_per_party[1:]]
        stacks = [self._forms_to_bform(r, batch) for r in rows]
        stacked = BForm(*(jnp.stack([np.asarray(getattr(s, f)) for s in stacks])
                          for f in ("a", "b_sign", "b", "c")))
        d_bf = self._combine_kernel(t, batch)(stacked)
        d_np = self._fetch(d_bf)
        if d_np.a.ndim == 3:  # sharded combine returns (tp, batch, L) copies
            d_np = BForm(d_np.a[0], d_np.b_sign[0], d_np.b[0], d_np.c[0])
        d_forms = bform_to_forms(d_np)[:n]
        inv = [reduce_form(qneg(f)) for f in d_forms]
        bf_inv = self._forms_to_bform(inv, batch)
        bf_c2 = self._forms_to_bform([ct.c2 for ct in cts], batch)
        fm = self._add_kernel(batch)(bf_c2, bf_inv)
        forms = bform_to_forms(self._fetch(fm))[:n]
        return [self.hsm.dlog_in_F(f) for f in forms]

    @_serialized
    def decrypt_batch(self, sk: int, cts):
        """m = dlog(c2 * (c1^sk)^-1): batched shared-exponent pow + batched
        compose, then the O(1) host dlog per element."""
        from ..core.qfi import neg as qneg, reduce_form

        n = len(cts)
        if n > self.max_batch:
            out = []
            for s, e in self._chunks(n):
                out.extend(self.decrypt_batch(sk, cts[s:e]))
            return out
        c1sk = self.part_decrypt_batch(sk, cts)
        batch = _bucket(n)
        inv = [reduce_form(qneg(f)) for f in c1sk]
        bf_inv = self._forms_to_bform(inv, batch)
        bf_c2 = self._forms_to_bform([ct.c2 for ct in cts], batch)
        fm = self._add_kernel(batch)(bf_c2, bf_inv)
        forms = bform_to_forms(self._fetch(fm))[:n]
        return [self.hsm.dlog_in_F(f) for f in forms]

    # ct rows per fused-jit call: rows are independent, so large matmuls
    # run as row chunks through ONE compiled kernel (bounds XLA compile
    # memory — the 8x64x64 reference shape as a single 65k-row jit OOMs
    # the TPU compiler). Env override: COFHE_MATMUL_CHUNK_ROWS.
    @staticmethod
    def _chunk_rows(m: int, p: int) -> int:
        import os

        env = os.environ.get("COFHE_MATMUL_CHUNK_ROWS")
        if env:
            return max(1, int(env))
        # target <= ~16k exponent rows per call (2 * rows * m * p):
        # measured 3.4 ms/scal-op at B=16384 vs 15 ms at B=8192 on a v5e
        # (per-pass fixed costs amortize with batch); beyond that the
        # remote compile worker becomes unreliable
        rows = max(1, 8192 // max(1, m * p))
        return rows

    @_serialized
    def scal_matmul(self, s_tensor, ct_tensor, zero_ct: CipherText):
        """ct (n,m) x s (m,p) -> (n,p); row-chunked fused jits (module doc)."""
        from ..tensor import Tensor

        n, m = ct_tensor.shape
        m2, p = s_tensor.shape
        chunk = min(n, self._chunk_rows(m, p))
        nwind = nwind_for_bits(self.hsm.k, YAO_W)
        # recode every scalar ONCE per matmul (not once per chunk)
        recoded = np.zeros((m * p, nwind), dtype=np.int32)
        for idx in range(m * p):
            recoded[idx] = signed_windows(int(s_tensor.data[idx]), YAO_W,
                                          nwind)
        dp, tp = self._mesh_dims()
        if dp * tp > 1 and (2 * n) % dp == 0 and m % tp == 0:
            return self._scal_matmul_sharded(recoded, ct_tensor, zero_ct,
                                             n, m, p, nwind, dp, tp)
        # Dispatch every chunk's chain+ladder ASYNC (device queue stays
        # full while the host preps the next chunk), then run ONE batched
        # finalization over all chunks' contracted banks and ONE fetch —
        # per-chunk finalization at 2*nr*p lanes is latency-bound and was
        # ~1/3 of wall-clock at the reference shape.
        chunk_rows = []
        for start in range(0, n, chunk):
            rows = list(range(start, min(start + chunk, n)))
            chunk_rows.append(rows + [rows[0]] * (chunk - len(rows)))
        nchunks = len(chunk_rows)
        # Hoist the doubling chains of ALL chunks into as few wide scans as
        # possible: a chain step at a few hundred lanes is kernel-launch
        # bound, so nchunks scans at Bb lanes cost ~nchunks x one scan at
        # nchunks*Bb (measured 26 ms @256 vs 32 ms @1024 per compose on a
        # v5e) — this was ~35% of matmul wall-clock at the reference shape.
        Bbc = 2 * chunk * m
        group = max(1, self.max_batch // Bbc)
        # jobs depend only on the (j, kk) digit tile — identical across
        # chunks; build once
        digits = np.ascontiguousarray(np.tile(recoded.T, (1, 2 * chunk)))
        # Build each group's wide chain stack, then dispatch that group's
        # ladders IMMEDIATELY (still async) and drop the chain refs —
        # holding every group's stack alive until all ladders are enqueued
        # grows peak device memory ~linearly with row count (can OOM a
        # 16 GB chip for n in the few-hundreds).
        sbs = []
        for g0 in range(0, nchunks, group):
            grp = chunk_rows[g0:g0 + group]
            forms = []
            for rows_p in grp:
                cells = [ct_tensor.at(i, j) for i in rows_p
                         for j in range(m)]
                forms.extend(ct.c1 for ct in cells)
                forms.extend(ct.c2 for ct in cells)
            bf = bform_from_forms(forms, self.L)
            stack = self._chain_stack_kernel(len(grp) * Bbc, nwind)(bf)
            for ci, rows_p in enumerate(grp):
                sl = slice(ci * Bbc, (ci + 1) * Bbc)
                chain = jax.tree.map(
                    lambda x, sl=sl: x[:, sl].reshape(
                        (nwind * Bbc,) + x.shape[2:]), stack)
                sbs.append(self._scal_matmul_rows(
                    rows_p, recoded, ct_tensor, zero_ct, m, p,
                    smallbank_only=True, chain=chain, digits=digits))
                del chain
            del stack
        S1 = (1 << (YAO_W - 1))  # S - 1 contracted slots
        n_pad = nchunks * chunk
        # chunk sb: ((S-1)*2*chunk*p, L...) viewed (S1, 2, chunk, p);
        # global hi = h * n_pad + (c*chunk + i_local)
        def to_global(xs):
            st = jnp.stack([x.reshape((S1, 2, chunk, p) + x.shape[1:])
                            for x in xs])           # (C, S1, 2, nr, p, ...)
            # insert the chunk axis BETWEEN h and i_local so global row
            # i = c*chunk + i_local (moveaxis to position 2, not 3 — the
            # off-by-one silently permuted output rows for multi-chunk
            # matmuls; caught by test_scal_matmul_partial_chunk)
            st = jnp.moveaxis(st, 0, 2)             # (S1, 2, C, nr, p, ...)
            return st.reshape((S1 * 2 * n_pad * p,) + st.shape[5:])

        sb_full = BForm(to_global([s.a for s in sbs]),
                        to_global([s.b_sign for s in sbs]),
                        to_global([s.b for s in sbs]),
                        to_global([s.c for s in sbs]))
        p2 = self._phase2_kernel(2 * n_pad, m, p, nwind)
        bf_zero = bform_from_forms(
            [zero_ct.c1] * (n_pad * p) + [zero_ct.c2] * (n_pad * p), self.L)
        final = p2(sb_full, bf_zero)
        forms = bform_to_forms(self._fetch(final))
        cts = [CipherText(forms[i * p + kk], forms[n_pad * p + i * p + kk])
               for i in range(n) for kk in range(p)]
        return Tensor(cts, (n, p))

    @functools.lru_cache(maxsize=16)
    def _chain_stack_kernel(self, batch: int, nwind: int):
        from .matmul2 import make_chain_stack

        return jax.jit(make_chain_stack(self.cg, nwind, YAO_W))

    @functools.lru_cache(maxsize=16)
    def _phase2_kernel(self, rows2: int, m: int, p: int, nwind: int):
        from .matmul2 import get_plan, make_phase2

        plan = get_plan(rows2, m, p, nwind, YAO_W)
        return jax.jit(make_phase2(self.cg, plan))

    def _scal_matmul_sharded(self, recoded, ct_tensor, zero_ct,
                             n: int, m: int, p: int, nwind: int,
                             dp: int, tp: int):
        """All-rows matmul over the mesh: ct rows dp-sharded, contraction
        axis tp-sharded (reference semantics:
        cpu_cryptosystem_tensor_ops.inl:403-417 row sums; OpenMP loops
        openmp.hpp:4-11). One jit; collectives ride the mesh."""
        from ..tensor import Tensor
        import time as _time

        t_start = _time.time()
        rows2_loc = 2 * n // dp
        m_loc = m // tp
        plan, fn = self._matmul_kernel_sharded(rows2_loc, m_loc, p, nwind)
        cells = [ct_tensor.at(i, j) for i in range(n) for j in range(m)]
        bf_all = bform_from_forms(
            [ct.c1 for ct in cells] + [ct.c2 for ct in cells], self.L)
        # shard (d, t): hi in d-block, j in t-block
        hi_g = np.arange(2 * n).reshape(dp, rows2_loc)
        j_g = np.arange(m).reshape(tp, m_loc)
        idx = (hi_g[:, None, :, None] * m
               + j_g[None, :, None, :]).reshape(dp, tp, rows2_loc * m_loc)
        cells_g = BForm(np.asarray(bf_all.a)[idx],
                        np.asarray(bf_all.b_sign)[idx],
                        np.asarray(bf_all.b)[idx],
                        np.asarray(bf_all.c)[idx])
        bf_zero = bform_from_forms(
            [zero_ct.c1] * (n * p) + [zero_ct.c2] * (n * p), self.L)
        zero_g = BForm(*(np.asarray(x).reshape((dp, rows2_loc * p)
                                               + x.shape[1:])
                         for x in bf_zero))
        # digits depend only on (j, kk): same jobs for every dp shard
        rec3 = recoded.reshape(m, p, nwind)
        jobs_t = []
        for t in range(tp):
            digits_t = np.ascontiguousarray(
                np.tile(rec3[t * m_loc:(t + 1) * m_loc].reshape(
                    m_loc * p, nwind).T, (1, rows2_loc)))
            jobs_t.append(plan.jobs_b(digits_t))
        jobs_g = np.stack([np.stack(jobs_t)] * dp)
        t_packed = _time.time()
        out = fn(cells_g, zero_g, jnp.asarray(jobs_g))
        fetched = self._fetch(out)
        t_device = _time.time()
        flat = BForm(*(np.asarray(x).reshape((2 * n * p,) + x.shape[2:])
                       for x in fetched))
        forms = bform_to_forms(flat)
        cts = [CipherText(forms[i], forms[n * p + i]) for i in range(n * p)]
        # phase breakdown for the scaling harness (benchmarks/scaling.py):
        # "pack" (host NumPy packing + form conversion) is single-host work
        # that does NOT shard with the mesh and caps scaling efficiency
        self.last_sharded_phases = {
            "pack_s": t_packed - t_start,
            "device_s": t_device - t_packed,
            "rebuild_s": _time.time() - t_device,
        }
        return Tensor(cts, (n, p))

    def _scal_matmul_rows(self, rows, recoded, ct_tensor, zero_ct,
                          m: int, p: int, smallbank_only: bool = False,
                          chain=None, digits=None):
        """One fused-kernel call over `rows` ct rows. Returns (c1, c2)
        pairs in (row, k) order — or, with smallbank_only, the chunk's
        contracted-bank DEVICE array (no sync; scal_matmul batches the
        finalization across chunks). `recoded`: (m*p, nwind) signed digits
        of the scalar matrix (row-major (j, kk)). `chain`/`digits` let
        scal_matmul pass a pre-hoisted chain slice / the shared digit tile
        (identical for every chunk)."""
        nr = len(rows)
        nwind = recoded.shape[1]
        plan, chain_k, ladder_k, p2 = self._matmul_kernel2(nr, m, p, nwind)
        if digits is None:
            # digit lane r = ((hi*m + j)*p + kk) -> scalar (j*p + kk)
            digits = np.ascontiguousarray(
                np.tile(recoded.T, (1, 2 * nr)))  # (nwind, 2*nr*m*p)
        jobs = plan.jobs_b(digits)
        if chain is None:
            cells = [ct_tensor.at(i, j) for i in rows for j in range(m)]
            bf_cells = bform_from_forms(
                [ct.c1 for ct in cells] + [ct.c2 for ct in cells], self.L)
            chain = chain_k(bf_cells)
        smallbank = ladder_k(chain, jnp.asarray(jobs))
        if smallbank_only:
            return smallbank
        bf_zero = bform_from_forms(
            [zero_ct.c1] * (nr * p) + [zero_ct.c2] * (nr * p), self.L)
        final = p2(smallbank, bf_zero)
        forms = bform_to_forms(self._fetch(final))
        return [(forms[i], forms[nr * p + i]) for i in range(nr * p)]
