#!/usr/bin/env python
"""Benchmark: homomorphic ciphertext matmul throughput at the reference's
`local scal_matmul` configuration (benchmarks/local.cpp:140-215, 9-12):
ct (8x64) * pt (64x64), cs = (sec 128, k = 128).

Measures the fused TPU/JAX v2 engine against the native GMP+OpenMP host
backend (csrc/classgroup.cpp — the same cost model as the reference's
BICYCL+OpenMP hot loops) on this machine and prints ONE json line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

value      = homomorphic scalar-multiplications per second (n*m*p ct^s ladder
             ops per matmul) on the accelerator path.
vs_baseline= speedup over the measured GMP+OpenMP CPU path on this host
             (the reference publishes no numbers — BASELINE.md), scaled to
             the full matmul from a timed subsample.

Env knobs: COFHE_BENCH_SEC (128), COFHE_BENCH_K (128), COFHE_BENCH_SHAPE
("8x64x64" = n,m,p), COFHE_BENCH_ITERS (2), COFHE_BENCH_HOST_SAMPLE (64
output cells of the baseline matmul).
"""

import json
import os
import sys
import time


def main():
    sec = int(os.environ.get("COFHE_BENCH_SEC", "128"))
    k = int(os.environ.get("COFHE_BENCH_K", "128"))
    shape = os.environ.get("COFHE_BENCH_SHAPE", "8x64x64")
    iters = int(os.environ.get("COFHE_BENCH_ITERS", "2"))
    host_sample = int(os.environ.get("COFHE_BENCH_HOST_SAMPLE", "64"))
    n, m, p = (int(x) for x in shape.split("x"))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    platform = jax.devices()[0].platform
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    from cofhe_tpu.api import CryptoSystem
    from cofhe_tpu.tensor import Tensor

    t0 = time.time()
    cs = CryptoSystem(sec, k, device="tpu", seed=b"bench")
    sk = cs.keygen()
    pk = cs.keygen(sk)
    print(f"# setup {time.time() - t0:.1f}s (sec={sec} k={k} "
          f"disc_bits={(-cs.hsm2k.Delta).bit_length()})", file=sys.stderr)

    import random

    random.seed(42)
    M = cs.hsm2k.M
    ct_vals = [random.randrange(M) for _ in range(n * m)]
    s_vals = [random.randrange(M) for _ in range(m * p)]
    t0 = time.time()
    ct = cs.encrypt_tensor(pk, Tensor(ct_vals, (n, m)))
    s_t = Tensor(s_vals, (m, p))
    print(f"# encrypt {time.time() - t0:.1f}s", file=sys.stderr)

    # warmup (compile; persistent cache makes reruns cheap)
    t0 = time.time()
    res = cs.scal_ciphertext_tensors(pk, s_t, ct)
    compile_time = time.time() - t0
    print(f"# warmup/compile+run {compile_time:.1f}s", file=sys.stderr)

    # timed runs
    t0 = time.time()
    for _ in range(iters):
        res = cs.scal_ciphertext_tensors(pk, s_t, ct)
    accel_time = (time.time() - t0) / iters
    ops = n * m * p
    accel_ops_per_s = ops / accel_time
    print(f"# accel: {accel_time:.3f}s per matmul ({accel_ops_per_s:.1f} scal-ops/s)",
          file=sys.stderr)

    # correctness spot check
    dec = cs.hsm2k.decrypt(sk, res.at(0, 0))
    expect = sum(ct_vals[j] * s_vals[j * p] for j in range(m)) % M
    assert dec == expect, "bench result decrypts incorrectly"

    # honest CPU baseline: the native GMP+OpenMP backend's OWN matmul path
    # (shared doubling chain per cell + batched log-tree accumulation, the
    # reference's qfi_nupow cache structure) on a (1, m) x (m, p_s)
    # subsample, extrapolated linearly
    host_ops_per_s = None
    try:
        from cofhe_tpu.ops.hostgmp import GmpEngine

        heng = GmpEngine(cs.hsm2k)
        p_s = max(1, min(host_sample, p))
        s_sub = Tensor([s_vals[j * p + kk] for j in range(m)
                        for kk in range(p_s)], (m, p_s))
        ct_row = Tensor([ct.at(0, j) for j in range(m)], (1, m))
        zero = cs.encrypt(pk, 0)
        t0 = time.time()
        heng.scal_matmul(s_sub, ct_row, zero)
        host_time = time.time() - t0
        full_est = host_time * n * (p / p_s)
        host_ops_per_s = ops / full_est
        print(f"# host(GMP+OpenMP x{heng.cg.lib.cg_num_threads()}): "
              f"{host_ops_per_s:.1f} scal-ops/s "
              f"(1x{m}x{p_s} sample, {host_time:.1f}s)",
              file=sys.stderr)
    except Exception as e:  # no g++/libgmp: fall back to pure-Python sample
        print(f"# native baseline unavailable ({e}); pure-Python fallback",
              file=sys.stderr)
        hsm = cs.hsm2k
        t0 = time.time()
        acc = None
        sample = min(8, ops)
        for j in range(sample):
            term = hsm.scal_ciphertext(ct.at(0, j % m), s_vals[j % (m * p)])
            acc = term if acc is None else hsm.add_ciphertexts(acc, term)
        host_ops_per_s = sample / (time.time() - t0)
        print(f"# host(python): {host_ops_per_s:.1f} scal-ops/s", file=sys.stderr)

    vs_baseline = accel_ops_per_s / host_ops_per_s if host_ops_per_s else 0.0

    print(json.dumps({
        "metric": f"scal_matmul_{shape}_k{k}_sec{sec}_{platform}",
        "value": round(accel_ops_per_s, 3),
        "unit": "ct_scal_ops/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
