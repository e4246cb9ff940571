#!/usr/bin/env python
"""Benchmark: homomorphic ciphertext matmul throughput at the reference's
`local scal_matmul` configuration (benchmarks/local.cpp:140-215, 9-12):
ct (8x64) * pt (64x64), cs = (sec 128, k = 128).

Measures the fused TPU/JAX v2 engine against the native GMP+OpenMP host
backend (csrc/classgroup.cpp — the same cost model as the reference's
BICYCL+OpenMP hot loops) on this machine and prints json lines

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

INCREMENTALLY: a line is emitted as soon as the first timed measurement
exists and refined lines follow as coverage grows (a driver that takes the
last line gets the best number; one that takes the first still gets an
honest measured one). Stages are budgeted so a hard driver timeout cannot
eat the result: set COFHE_BENCH_BUDGET_S (default 1500) to the wall-clock
the driver allows.

value       = homomorphic scalar-multiplications per second (n*m*p ct^s
              ladder ops per matmul) on the accelerator path.
vs_baseline = speedup over the measured GMP+OpenMP CPU path on this host
              (the reference publishes no numbers — BASELINE.md), scaled to
              the full matmul from a timed subsample.

Env knobs: COFHE_BENCH_SEC (128), COFHE_BENCH_K (128), COFHE_BENCH_SHAPE
("8x64x64" = n,m,p), COFHE_BENCH_ITERS (2), COFHE_BENCH_HOST_SAMPLE (4
columns of one baseline matmul row), COFHE_BENCH_BUDGET_S (1500).
"""

import json
import os
import sys
import time

T0 = time.time()


def note(msg):
    print(f"# [{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(metric, value, unit, vs_baseline, **extra):
    rec = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }
    for kk, v in extra.items():
        rec[kk] = round(v, 3) if isinstance(v, float) else v
    print(json.dumps(rec), flush=True)


def main():
    sec = int(os.environ.get("COFHE_BENCH_SEC", "128"))
    k = int(os.environ.get("COFHE_BENCH_K", "128"))
    shape = os.environ.get("COFHE_BENCH_SHAPE", "8x64x64")
    iters = int(os.environ.get("COFHE_BENCH_ITERS", "2"))
    host_sample = int(os.environ.get("COFHE_BENCH_HOST_SAMPLE", "4"))
    budget = float(os.environ.get("COFHE_BENCH_BUDGET_S", "1500"))
    n, m, p = (int(x) for x in shape.split("x"))

    def left():
        return budget - (time.time() - T0)

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    platform = jax.devices()[0].platform
    note(f"devices: {jax.devices()}")

    # First device->host fetch pays the backend's one-time transfer-path
    # init (measured ~2 min on a cold axon tunnel; seconds when warm). Do it
    # HERE, single-threaded, so later stages are pure compute. Concurrent
    # first-fetches from two threads can deadlock the tunnel — never warm
    # in a background thread. A TPU worker that is still restarting from an
    # earlier fault raises FAILED_PRECONDITION/UNAVAILABLE for a while —
    # retry with backoff instead of losing the round's number.
    for attempt in range(6):
        try:
            np.asarray(jnp.arange(1))
            break
        except Exception as e:
            note(f"warm fetch attempt {attempt} failed ({type(e).__name__}); "
                 f"retrying in 60s")
            time.sleep(60)
    else:
        raise RuntimeError("TPU backend unavailable after retries")
    note("first-fetch warm done")

    from cofhe_tpu.api import CryptoSystem
    from cofhe_tpu.tensor import Tensor

    cs = CryptoSystem(sec, k, device="tpu", seed=b"bench")
    sk = cs.keygen()
    pk = cs.keygen(sk)
    note(f"setup done (sec={sec} k={k} "
         f"disc_bits={(-cs.hsm2k.Delta).bit_length()})")

    import random

    random.seed(42)
    M = cs.hsm2k.M
    ct_vals = [random.randrange(M) for _ in range(n * m)]
    s_vals = [random.randrange(M) for _ in range(m * p)]
    s_t = Tensor(s_vals, (m, p))

    # ---- honest CPU baseline FIRST (cheap, known cost): the native
    # GMP+OpenMP backend's own matmul path (shared doubling chain per cell +
    # batched log-tree accumulation, the reference's qfi_nupow cache
    # structure) on a (1, m) x (m, p_s) subsample, extrapolated linearly.
    metric = f"scal_matmul_{shape}_k{k}_sec{sec}_{platform}"
    ops = n * m * p
    host_ops_per_s = None
    host_kind = "none"
    try:
        from cofhe_tpu.ops.hostgmp import GmpEngine

        heng = GmpEngine(cs.hsm2k)
        p_s = max(1, min(host_sample, p))
        s_sub = Tensor([s_vals[j * p + kk] for j in range(m)
                        for kk in range(p_s)], (m, p_s))
        ct_row_cts = [cs.encrypt(pk, ct_vals[j]) for j in range(m)]
        ct_row = Tensor(ct_row_cts, (1, m))
        zero_h = cs.encrypt(pk, 0)
        t0 = time.time()
        heng.scal_matmul(s_sub, ct_row, zero_h)
        host_time = time.time() - t0
        host_ops_per_s = (m * p_s) / host_time
        host_kind = (f"GMP+OpenMP NUCOMP x{heng.cg.lib.cg_num_threads()} "
                     f"threads, 1x{m}x{p_s} sample")
        note(f"host(GMP+OpenMP x{heng.cg.lib.cg_num_threads()}): "
             f"{host_ops_per_s:.1f} scal-ops/s (1x{m}x{p_s} sample, "
             f"{host_time:.1f}s)")
    except Exception as e:  # no g++/libgmp: fall back to pure-Python sample
        note(f"native baseline unavailable ({e}); pure-Python fallback")
        hsm = cs.hsm2k
        ct0 = cs.encrypt(pk, ct_vals[0])
        t0 = time.time()
        acc = None
        sample = 4
        for j in range(sample):
            term = hsm.scal_ciphertext(ct0, s_vals[j])
            acc = term if acc is None else hsm.add_ciphertexts(acc, term)
        host_ops_per_s = sample / (time.time() - t0)
        host_kind = "pure-python fallback"
        note(f"host(python): {host_ops_per_s:.1f} scal-ops/s")

    def vs(accel):
        return accel / host_ops_per_s if host_ops_per_s else 0.0

    # ---- encrypt the ct tensor (engine-batched). The first call pays the
    # compose-kernel compile for this bucket size; time a second call too
    # so the steady encrypt rate is recorded separately (round-4's
    # "encrypt regression" was compile-time variance: warm encrypt of
    # 4608 k=256 elements measures ~0.5 ms/element).
    t0 = time.time()
    ct = cs.encrypt_tensor(pk, Tensor(ct_vals, (n, m)))
    note(f"encrypt_tensor {time.time() - t0:.1f}s (incl. kernel compile)")
    t0 = time.time()
    ct = cs.encrypt_tensor(pk, Tensor(ct_vals, (n, m)))
    enc_steady = time.time() - t0
    note(f"encrypt_tensor steady {enc_steady:.2f}s "
         f"({n * m / enc_steady:.0f} elems/s)")
    zero = cs.encrypt(pk, 0)

    eng = cs._engine

    # ---- stage 1: ONE row chunk of the matmul, timed after its compile.
    # This is the same fused kernel the full matmul runs row-chunked, so
    # its steady-state rate IS the full-matmul rate; emit it immediately.
    from cofhe_tpu.ops.engine import YAO_W
    from cofhe_tpu.ops.nupow2 import nwind_for_bits, signed_windows

    chunk = min(n, eng._chunk_rows(m, p))
    rows = list(range(chunk))
    nwind = nwind_for_bits(cs.hsm2k.k, YAO_W)
    recoded = np.zeros((m * p, nwind), dtype=np.int32)
    for idx in range(m * p):
        recoded[idx] = signed_windows(int(s_vals[idx]), YAO_W, nwind)

    def with_retries(fn, what, attempts=3):
        # the remote compile service / TPU worker fault intermittently on
        # big fresh compiles; a retry after recovery usually succeeds (and
        # partial compiles land in the persistent cache)
        for a in range(attempts):
            try:
                return fn()
            except Exception as e:
                if a == attempts - 1:
                    raise
                note(f"{what} attempt {a} failed ({type(e).__name__}: "
                     f"{str(e)[:120]}); retrying in 90s")
                time.sleep(90)

    t0 = time.time()
    with_retries(lambda: eng._scal_matmul_rows(rows, recoded, ct, zero,
                                               m, p), "matmul chunk")
    note(f"matmul chunk ({chunk}x{m}x{p}) compile+run {time.time() - t0:.1f}s")
    t0 = time.time()
    out_rows = eng._scal_matmul_rows(rows, recoded, ct, zero, m, p)
    chunk_time = time.time() - t0
    accel_ops_per_s = (chunk * m * p) / chunk_time
    note(f"matmul chunk steady: {chunk_time:.2f}s "
         f"({accel_ops_per_s:.1f} scal-ops/s)")

    # correctness spot check on the chunk
    dec = cs.hsm2k.decrypt(sk, CipherText_from(out_rows[0]))
    expect = sum(ct_vals[j] * s_vals[j * p] for j in range(m)) % M
    assert dec == expect, "bench chunk decrypts incorrectly"
    emit(metric, accel_ops_per_s, "ct_scal_ops/s", vs(accel_ops_per_s))

    # ---- stage 2 (budget permitting): full matmuls end-to-end, which adds
    # host-side orchestration (recode, transport) to the measured rate
    est_full = chunk_time * (n / chunk) * 1.3 + 5
    iter_times = []
    for it in range(iters):
        if left() < est_full * 1.2:
            note(f"budget: skipping full-matmul iter {it} "
                 f"(left {left():.0f}s, est {est_full:.0f}s)")
            break
        try:
            t0 = time.time()
            res = cs.scal_ciphertext_tensors(pk, s_t, ct)
            t_iter = time.time() - t0
        except Exception as e:
            # a worker fault mid-run must not lose the stage-1 number;
            # recovery takes ~5-10 min, rarely worth the budget
            note(f"full matmul iter {it} failed ({type(e).__name__}: "
                 f"{str(e)[:120]}); keeping stage-1 result")
            break
        iter_times.append(t_iter)
        full_rate = ops / t_iter
        note(f"full matmul iter {it}: {t_iter:.1f}s this iter, "
             f"{sum(iter_times) / len(iter_times):.1f}s avg "
             f"({full_rate:.1f} scal-ops/s)")
        dec = cs.hsm2k.decrypt(sk, res.at(0, 0))
        assert dec == expect, "bench result decrypts incorrectly"
        # also check a LAST-row cell: catches chunk/row permutation bugs
        # that a (0,0) check cannot see
        dec2 = cs.hsm2k.decrypt(sk, res.at(n - 1, p - 1))
        expect2 = sum(ct_vals[(n - 1) * m + j] * s_vals[j * p + (p - 1)]
                      for j in range(m)) % M
        assert dec2 == expect2, "bench result row permutation detected"
        emit(metric, full_rate, "ct_scal_ops/s", vs(full_rate),
             kind="full_iter", iter=it)

    # ---- FINAL line (the driver takes the last one): a steady-state
    # end-to-end estimate that excludes only iteration 0's one-time kernel
    # compiles, with full provenance so the ratio is a reproducible claim
    # (steady chunk rate vs end-to-end, denominator and host load) rather
    # than a best-iteration sample.
    if len(iter_times) >= 2:
        headline = ops * (len(iter_times) - 1) / sum(iter_times[1:])
        kind = "end_to_end_steady"
    elif iter_times:
        headline = ops / iter_times[0]
        kind = "end_to_end_with_compile"
    else:
        headline = accel_ops_per_s
        kind = "chunk_steady_only"
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    emit(metric, headline, "ct_scal_ops/s", vs(headline),
         kind=kind,
         chunk_steady_ops_s=accel_ops_per_s,
         end_to_end_iters=[round(ops / t, 1) for t in iter_times],
         host_baseline_ops_s=host_ops_per_s,
         host_baseline_kind=host_kind,
         host_loadavg1=load1)
    note(f"done ({len(iter_times)} full iters)")


def CipherText_from(pair):
    from cofhe_tpu.core.cl_hsm2k import CipherText

    return CipherText(pair[0], pair[1])


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        # scaling-efficiency mode: delegate to the mesh harness (virtual
        # CPU mesh by default; --real for actual multi-chip hardware)
        sys.argv.remove("--mesh")
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        import scaling

        scaling.main()
    else:
        main()
