#!/usr/bin/env python
"""Network benchmarks against a running CoFHE-TPU network (the reference's
benchmarks/network.cpp modes; default setup node 127.0.0.1:4455):

    python benchmarks/network.py ciphertext_matmul        [--n 8 --m 64 --p 64]
    python benchmarks/network.py scalar_ciphertext_matmul [--n 8 --m 64 --p 64]
    python benchmarks/network.py ciphertext_matadd        [--rows 64 --cols 64]
    python benchmarks/network.py decrypt                  [--rows 64 --cols 64]

Start a network first: python scripts/start_network.py [--toy].
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["ciphertext_matmul", "scalar_ciphertext_matmul",
                                     "ciphertext_matadd", "decrypt"])
    ap.add_argument("--setup-ip", default="127.0.0.1")
    ap.add_argument("--setup-port", default="4455")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--p", type=int, default=64)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=64)
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--chain", type=int, default=1)
    ap.add_argument("--tls", action="store_true")
    ap.add_argument("--toy", action="store_true")
    args = ap.parse_args()
    if args.toy:
        args.n = args.m = args.p = 4
        args.rows = args.cols = 4

    from cofhe_tpu import serialize as ser
    from cofhe_tpu.node import wire
    from cofhe_tpu.node.network_details import NodeDetails, NodeType
    from cofhe_tpu.node.nodes import ClientNode
    from cofhe_tpu.tensor import Tensor
    from cofhe_tpu.utils.benchmark import Benchmark

    random.seed(0)
    setup = NodeDetails(args.setup_ip, args.setup_port, NodeType.SETUP_NODE)
    client = ClientNode(setup, use_tls=args.tls)
    cs, pk = client.crypto_system, client.public_key
    M = cs.hsm2k.M
    bench = Benchmark(tag=f"net_{args.mode}_")

    def op(o_type, operation, operands):
        return client.compute(wire.ComputeRequest(o_type, operation, operands))

    def tensor_operand(t, enc):
        data = (ser.serialize_ciphertext_tensor(t) if enc == wire.DataEncryptionType.CIPHERTEXT
                else ser.serialize_plaintext_tensor(t))
        return wire.ComputeOperand(wire.DataType.TENSOR, enc, data)

    if args.mode in ("ciphertext_matmul", "scalar_ciphertext_matmul"):
        ct1 = cs.encrypt_tensor(pk, Tensor(
            [random.randrange(M) for _ in range(args.n * args.m)], (args.n, args.m)))
        t2 = Tensor([random.randrange(M) for _ in range(args.m * args.p)],
                    (args.m, args.p))
        if args.mode == "ciphertext_matmul":
            operand2 = tensor_operand(cs.encrypt_tensor(pk, t2), wire.DataEncryptionType.CIPHERTEXT)
        else:
            operand2 = tensor_operand(t2, wire.DataEncryptionType.PLAINTEXT)
        o1 = tensor_operand(ct1, wire.DataEncryptionType.CIPHERTEXT)

        def job():
            resp = op(wire.ComputeOperationType.BINARY, wire.ComputeOperation.MULTIPLY,
                      [o1, operand2])
            assert resp.status == wire.Status.OK, resp.data[:200]
            return resp

    elif args.mode == "ciphertext_matadd":
        ct = cs.encrypt_tensor(pk, Tensor(
            [random.randrange(M) for _ in range(args.rows * args.cols)],
            (args.rows, args.cols)))
        o1 = tensor_operand(ct, wire.DataEncryptionType.CIPHERTEXT)

        def job():
            resp = op(wire.ComputeOperationType.BINARY, wire.ComputeOperation.ADD, [o1, o1])
            assert resp.status == wire.Status.OK
            return resp

    else:  # decrypt
        ct = cs.encrypt_tensor(pk, Tensor(
            [random.randrange(M) for _ in range(args.rows * args.cols)],
            (args.rows, args.cols)))
        o1 = tensor_operand(ct, wire.DataEncryptionType.CIPHERTEXT)

        def job():
            resp = op(wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT, [o1])
            assert resp.status == wire.Status.OK
            return resp

    bench.run(job, n=args.runs)
    print(bench.summary())
    client.close()


if __name__ == "__main__":
    main()
