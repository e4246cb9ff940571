#!/usr/bin/env python
"""Local (single-process) benchmarks, mirroring the reference's
benchmarks/local.cpp modes:

    python benchmarks/local.py encrypt_decrypt   [--rows 64 --cols 64]
    python benchmarks/local.py ciphertext_matadd [--chain 50]
    python benchmarks/local.py scal_matmul       [--n 8 --m 64 --p 64 --chain 50]

Reference configs: encrypt_decrypt 64x64 (local.cpp:22-63), matadd 64x64 with
50 chained adds (:65-138), scal_matmul ct(8x64) x pt(64x64), 50 chained
(:140-215), cs = make_cryptosystem(128, 128, CPU) (:9-12). Sizes/params are
flags here so the same program scales from toy to production.
"""

from __future__ import annotations

import argparse
import random
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["encrypt_decrypt", "ciphertext_matadd", "scal_matmul"])
    ap.add_argument("--security-level", type=int, default=128)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=64)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--p", type=int, default=64)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--device", default="tpu", choices=["host", "tpu", "cpu-jax"])
    ap.add_argument("--toy", action="store_true", help="k=32 + small shapes")
    args = ap.parse_args()
    if args.toy:
        args.k = 32
        args.rows = args.cols = 8
        args.m = args.p = 8
        args.chain = 2

    from cofhe_tpu.api import CryptoSystem
    from cofhe_tpu.tensor import Tensor
    from cofhe_tpu.utils.benchmark import Benchmark

    random.seed(0)
    cs = CryptoSystem(args.security_level, args.k, device=args.device)
    sk = cs.keygen()
    pk = cs.keygen(sk)
    M = cs.hsm2k.M
    bench = Benchmark(tag=f"{args.mode}_")

    if args.mode == "encrypt_decrypt":
        pt = Tensor([random.randrange(M) for _ in range(args.rows * args.cols)],
                    (args.rows, args.cols))

        def job():
            ct = cs.encrypt_tensor(pk, pt)
            out = cs.decrypt_tensor(sk, ct)
            assert out.data == pt.data
            return out

    elif args.mode == "ciphertext_matadd":
        pt = Tensor([random.randrange(M) for _ in range(args.rows * args.cols)],
                    (args.rows, args.cols))
        ct = cs.encrypt_tensor(pk, pt)

        def job():
            acc = ct
            for _ in range(args.chain):
                acc = cs.add_ciphertext_tensors(pk, acc, ct)
            return acc

    else:  # scal_matmul
        ct = cs.encrypt_tensor(pk, Tensor(
            [random.randrange(M) for _ in range(args.n * args.m)], (args.n, args.m)))
        s = Tensor([random.randrange(M) for _ in range(args.m * args.p)],
                   (args.m, args.p))

        def job():
            acc = ct
            for _ in range(args.chain):
                acc = cs.scal_ciphertext_tensors(pk, s, acc)
                # keep shapes chainable: reference chains (n,m)x(m,p) with m==p
            return acc

        if args.m != args.p:
            print("warning: chaining requires m == p; running a single matmul per run",
                  file=sys.stderr)
            def job():  # noqa: F811
                return cs.scal_ciphertext_tensors(pk, s, ct)

    bench.run(job, n=args.runs)
    print(bench.summary())


if __name__ == "__main__":
    main()
