#!/usr/bin/env python
"""Microbenchmarks for the batched class-group kernels (compose / nudupl /
xgcd / reduce) at production parameters.

Usage:
    python benchmarks/micro.py [--batch 4096] [--sec 128] [--k 128] \
        [--what compose,nudupl,xgcd]

Prints per-op wall clock, per-element throughput, and compile time. This is
the kernel-level view of the reference's hot loop (BICYCL nucomp/nupow behind
x86_64/qfi.inl); the end-to-end view is benchmarks/local.py and bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--sec", type=int, default=128)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--what", default="compose")
    ap.add_argument("--profile-dir", default=None,
                    help="if set, capture a jax.profiler trace of the timed runs")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from cofhe_tpu.core.cl_hsm2k import CLHSM2k
    from cofhe_tpu.core.qfi import nupow
    from cofhe_tpu.core.rng import RandGen
    from cofhe_tpu.ops import limb as lb
    from cofhe_tpu.ops.forms import (FormSpec, bform_from_forms, compose_batch,
                                     nudupl_batch)

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    hsm = CLHSM2k(args.sec, args.k)
    spec = FormSpec.for_disc_bits((-hsm.Delta).bit_length())
    delta4 = lb.ints_to_limbs([(-hsm.Delta) // 4], 2 * spec.L)[0]
    print(f"# params {time.time()-t0:.1f}s  disc_bits={(-hsm.Delta).bit_length()} "
          f"L={spec.L} n_bits={spec.n_bits}", file=sys.stderr)

    # random-ish reduced forms: powers of h (cheap to vary)
    t0 = time.time()
    rng = RandGen(b"micro")
    seeds = [nupow(hsm.h, 3 + 2 * i) for i in range(8)]
    B = args.batch
    forms1 = [seeds[i % 8] for i in range(B)]
    forms2 = [seeds[(i + 3) % 8] for i in range(B)]
    bf1 = bform_from_forms(forms1, spec.L)
    bf2 = bform_from_forms(forms2, spec.L)
    print(f"# form setup {time.time()-t0:.1f}s", file=sys.stderr)

    what = args.what.split(",")

    def bench(name, fn, *xs):
        t0 = time.time()
        out = fn(*xs)
        jax.block_until_ready(out)
        compile_t = time.time() - t0
        times = []
        prof = None
        if args.profile_dir:
            jax.profiler.start_trace(args.profile_dir)
        for _ in range(args.iters):
            t0 = time.time()
            out = fn(*xs)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        if args.profile_dir:
            jax.profiler.stop_trace()
        best = min(times)
        print(f"{name}: batch={B} best={best*1e3:.1f}ms "
              f"({B/best:.0f} elem/s) compile={compile_t:.1f}s")

    if "compose" in what:
        kern = jax.jit(lambda a, b: compose_batch(a, b, spec, delta4))
        bench("compose_batch", kern, bf1, bf2)
    if "nudupl" in what:
        kern = jax.jit(lambda a: nudupl_batch(a, spec, delta4))
        bench("nudupl_batch", kern, bf1)
    if "xgcd" in what:
        from cofhe_tpu.ops.xgcd import xgcd_mod

        kern = jax.jit(lambda f, g, m: xgcd_mod(f, g, m, spec.n_bits))
        # odd f (the rotate in compose guarantees this; here just force it)
        f = bf1.a.at[..., 0].set(bf1.a[..., 0] | 1)
        bench("xgcd_mod(full)", kern, f, bf2.a, f)

    if "compose2" in what or "nudupl2" in what or "reduce2" in what:
        from cofhe_tpu.ops.forms2 import CG, CGCtx

        disc_bits = (-hsm.Delta).bit_length()
        L, _ = CGCtx.widths_for_disc_bits(disc_bits)
        d4 = lb.ints_to_limbs([(-hsm.Delta) // 4], 2 * L)[0]
        from cofhe_tpu.core.qfi import nudupl as _qnudupl

        h_bf = bform_from_forms([hsm.h, _qnudupl(hsm.h)], L)

        def _row(i):
            return (np.asarray(h_bf.a[i]), np.asarray(h_bf.b_sign[i]),
                    np.asarray(h_bf.b[i]), np.asarray(h_bf.c[i]))

        cg = CG(disc_bits, d4, _row(0), _row(1))
        b1 = bform_from_forms(forms1, L)
        b2 = bform_from_forms(forms2, L)
        if "compose2" in what:
            bench("compose2", jax.jit(cg.compose2), b1, b2)
        if "nudupl2" in what:
            bench("nudupl2", jax.jit(cg.nudupl2), b1)
        if "reduce2" in what:
            # phase split: the pre-reduction pipeline vs the rho-descent
            # (72% of compose2 device time in the round-4 trace)
            unred = jax.jit(cg.compose2_unreduced)
            bench("compose2_unreduced", unred, b1, b2)
            a3, b3s, b3m, c3 = [jax.block_until_ready(x)
                                for x in unred(b1, b2)[:4]]
            b3r = (b3s[..., None] * b3m).astype(jnp.int32)
            bench("reduce2", jax.jit(cg.reduce2),
                  a3.astype(jnp.int32), b3r, c3.astype(jnp.int32))

    if "wnaf" in what:
        # the part_decrypt ladder: one 128-step shared-exponent wNAF
        # segment at this batch (threshold-decrypt hot path). Env
        # COFHE_WNAF_GROUPED=1 switches the in-scan reduction mode.
        from cofhe_tpu.ops.engine import JaxEngine
        from cofhe_tpu.ops.nupow2 import make_wnaf_bank, wnaf_segment

        eng = JaxEngine(hsm)
        grouped = os.environ.get("COFHE_WNAF_GROUPED", "0") == "1"
        bf = bform_from_forms([seeds[i % 8] for i in range(B)], eng.L)
        bank = jax.jit(lambda b: make_wnaf_bank(eng.cg, b, 5))(bf)
        from cofhe_tpu.ops.nupow2 import identity_bform2, wnaf_digits

        r0 = identity_bform2(eng.cg, B)
        rng2 = RandGen(b"wnafexp")
        e = int(rng2.random_mpz(1 << (16 * eng.L // 2)))
        sched = wnaf_digits(e, 5)[:128]
        sched = [0] * (128 - len(sched)) + sched
        seg = jnp.asarray(sched, jnp.int32)
        kern = jax.jit(lambda b, r, s: wnaf_segment(eng.cg, b, r, s, w=5,
                                                    grouped=grouped))
        bench(f"wnaf-seg128(grouped={grouped})", kern, bank, r0, seg)

    if "yao2" in what:
        # the matmul's ladder in isolation: B exponent rows over 8 shared
        # bases (the doubling chain advances on 8 rows only)
        import jax as _jax

        from cofhe_tpu.ops.engine import JaxEngine, YAO_W
        from cofhe_tpu.ops.nupow2 import nupow_yao2, nwind_for_bits

        eng = JaxEngine(hsm)
        nwind = nwind_for_bits(args.k, YAO_W)
        base = bform_from_forms(seeds, eng.L)
        base_map = np.arange(B, dtype=np.int32) % 8
        exps = [int(rng.random_mpz(1 << args.k)) for _ in range(B)]
        digits = eng._digits_for(exps, B, nwind,
                                 np.arange(B, dtype=np.int64))
        kern = _jax.jit(lambda d: nupow_yao2(eng.cg, base, d,
                                             base_map=base_map, w=YAO_W))
        bench("yao2-ladder", kern, jnp.asarray(digits))


if __name__ == "__main__":
    main()
