#!/usr/bin/env python
"""Benchmark: homomorphic ciphertext matmul throughput (the reference's
`local scal_matmul` configuration, benchmarks/local.cpp:140-215, scaled by
env vars).

Measures the TPU/JAX batched engine against the pure-host (Python
class-group) path on the same machine and prints ONE json line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

value      = homomorphic scalar-multiplications per second (ct^s ladder ops,
             i.e. n*m*p per matmul) on the accelerator path.
vs_baseline= speedup over the single-threaded host implementation (the
             reference's published baseline is empty — BASELINE.md — so the
             host class-group path stands in as the 1.0x reference point).

Env knobs: COFHE_BENCH_SEC (128), COFHE_BENCH_K (32), COFHE_BENCH_SHAPE
("8x8x8" = n,m,p), COFHE_BENCH_ITERS (3), COFHE_BENCH_HOST_SAMPLE (8).
"""

import json
import os
import sys
import time


def main():
    sec = int(os.environ.get("COFHE_BENCH_SEC", "128"))
    k = int(os.environ.get("COFHE_BENCH_K", "32"))
    shape = os.environ.get("COFHE_BENCH_SHAPE", "8x8x8")
    iters = int(os.environ.get("COFHE_BENCH_ITERS", "3"))
    host_sample = int(os.environ.get("COFHE_BENCH_HOST_SAMPLE", "8"))
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

    # warmup (compile)
    t0 = time.time()
    res = cs.scal_ciphertext_tensors(pk, s_t, ct)
    compile_time = time.time() - t0
    print(f"# warmup/compile {compile_time:.1f}s", file=sys.stderr)

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

    # host baseline on a subsample, extrapolated linearly
    sample = min(host_sample, ops)
    hsm = cs.hsm2k
    t0 = time.time()
    done = 0
    acc = None
    for i in range(n):
        for kk in range(p):
            for j in range(m):
                if done >= sample:
                    break
                term = hsm.scal_ciphertext(ct.at(i, j), s_vals[j * p + kk])
                acc = term if acc is None else hsm.add_ciphertexts(acc, term)
                done += 1
    host_time_sample = time.time() - t0
    host_ops_per_s = sample / host_time_sample if host_time_sample > 0 else float("inf")
    vs_baseline = accel_ops_per_s / host_ops_per_s if host_ops_per_s > 0 else 0.0
    print(f"# host: {host_ops_per_s:.1f} scal-ops/s (sampled {sample})", file=sys.stderr)

    print(json.dumps({
        "metric": f"scal_matmul_{shape}_k{k}_sec{sec}_{platform}",
        "value": round(accel_ops_per_s, 3),
        "unit": "ct_scal_ops/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
