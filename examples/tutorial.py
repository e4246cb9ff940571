#!/usr/bin/env python
"""End-to-end client tutorial (the reference's examples/tutorial.cpp):
encrypt float tensors, send a homomorphic matmul to the compute node,
threshold-decrypt over the network, print the result.

Run a network first:  python scripts/start_network.py --toy
Then:                 python examples/tutorial.py --toy
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setup-ip", default="127.0.0.1")
    ap.add_argument("--setup-port", default="4455")
    ap.add_argument("--size", type=int, default=8)
    ap.add_argument("--tls", action="store_true")
    ap.add_argument("--toy", action="store_true")
    args = ap.parse_args()
    if args.toy:
        args.size = 4

    from cofhe_tpu import serialize as ser
    from cofhe_tpu.node import wire
    from cofhe_tpu.node.network_details import NodeDetails, NodeType
    from cofhe_tpu.node.nodes import ClientNode
    from cofhe_tpu.tensor import Tensor

    n = args.size
    random.seed(7)
    setup = NodeDetails(args.setup_ip, args.setup_port, NodeType.SETUP_NODE)
    client = ClientNode(setup, use_tls=args.tls)
    cs, pk = client.crypto_system, client.public_key

    xs = [[float(random.randrange(10)) for _ in range(n)] for _ in range(n)]
    ws = [[float(random.randrange(10)) for _ in range(n)] for _ in range(n)]
    print("encrypting", n, "x", n, "tensor...")
    ct = cs.encrypt_tensor(pk, Tensor(
        [cs.make_plaintext(v) for row in xs for v in row], (n, n)))
    w = Tensor([cs.make_plaintext(v) for row in ws for v in row], (n, n))

    print("requesting homomorphic matmul...")
    resp = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.BINARY, wire.ComputeOperation.MULTIPLY,
        [wire.ComputeOperand(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
                             ser.serialize_ciphertext_tensor(ct)),
         wire.ComputeOperand(wire.DataType.TENSOR, wire.DataEncryptionType.PLAINTEXT,
                             ser.serialize_plaintext_tensor(w))]))
    prod = ser.deserialize_ciphertext_tensor(resp.data)

    print("requesting threshold decryption...")
    dec = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
        [wire.ComputeOperand(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
                             ser.serialize_ciphertext_tensor(prod))]))
    out = ser.deserialize_plaintext_tensor(dec.data)

    ok = True
    for i in range(n):
        row = []
        for k in range(n):
            got = cs.get_float_from_plaintext(out.at(i, k))
            want = sum(xs[i][j] * ws[j][k] for j in range(n))
            ok &= got == want
            row.append(got)
        print(row)
    print("matches plaintext matmul:", ok)
    client.close()


if __name__ == "__main__":
    main()
