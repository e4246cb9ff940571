#!/usr/bin/env python
"""Reference network benchmark at FULL shape, in one process.

Runs the reference's `network ciphertext_matmul` workload
(/root/reference/benchmarks/network.cpp:19-101): ct(n x m) * ct(m x p)
Beaver matmul through a compute node, at the reference's network crypto
config sec=128, k=256, t=2, n=3 (examples/node.cpp:30-36) — with the
5-node topology as IN-PROCESS servers over real loopback TCP + the real
wire protocol (the start_network.sh analogue; separate processes would
each need their own TPU tunnel, which this runtime cannot multiplex).

The setup node (dealer: keygen, triplets) runs on the host GMP backend;
the CoFHE nodes and compute node run their data planes on the TPU engine
(--device tpu). Defaults to the reference shape 8x64x64 (= 32,768 Beaver
triplets per matmul); --toy shrinks it.

Prints one JSON line per phase and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()


def note(msg):
    print(f"# [{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--p", type=int, default=64)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--sec", type=int, default=128)
    ap.add_argument("--device", default="tpu",
                    help="data-plane device for the compute node")
    ap.add_argument("--cofhe-device", default=None,
                    help="data-plane device for CoFHE nodes (default: same "
                         "as --device; 'host' sidesteps the TPU runtime's "
                         "crash on ~1500-step wNAF scans at k=256/B>=8192)")
    ap.add_argument("--toy", action="store_true")
    args = ap.parse_args()
    if args.toy:
        args.n = args.m = args.p = 2
    n, m, p = args.n, args.m, args.p
    os.environ.setdefault("COFHE_TRIPLET_CACHE", str(n * m * p))
    # a 32k-element threshold decrypt legitimately takes tens of minutes
    # on one chip; the default 120 s RPC timeout would declare the node
    # dead mid-compute (must be set before cofhe_tpu.node.client imports)
    os.environ.setdefault("COFHE_RPC_TIMEOUT", "7200")

    if args.device == "tpu":
        # warm the first device->host fetch ONCE, single-threaded, before
        # any server thread can race it (two concurrent first-fetches
        # deadlock the axon tunnel — bench.py learned this in round 3)
        import jax
        import jax.numpy as jnp
        import numpy as np

        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/root/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        t0 = time.time()
        np.asarray(jnp.arange(1))
        note(f"TPU first-fetch warm {time.time()-t0:.1f}s")

    from cofhe_tpu import serialize as ser
    from cofhe_tpu.node import wire
    from cofhe_tpu.node.network_details import (CryptoSystemDetails,
                                                NodeDetails, NodeType)
    from cofhe_tpu.node.nodes import (ClientNode, make_cofhe_node,
                                      make_compute_node, make_setup_node)
    from cofhe_tpu.tensor import Tensor

    ports = [free_port() for _ in range(5)]
    setup_nd = NodeDetails("127.0.0.1", str(ports[0]), NodeType.SETUP_NODE)
    cs_details = CryptoSystemDetails(type="CoFHE_TPU", public_key="",
                                     security_level=args.sec, k=args.k,
                                     threshold=2, total_nodes=3)
    servers = []
    t0 = time.time()
    setup_server, setup_handler = make_setup_node(setup_nd, cs_details,
                                                  device="host")
    setup_server.run_in_thread()
    servers.append(setup_server)
    note(f"setup node up (dealer keygen) {time.time()-t0:.1f}s")
    cofhe_dev = args.cofhe_device or args.device
    for i in range(1, 4):
        nd = NodeDetails("127.0.0.1", str(ports[i]), NodeType.COFHE_NODE)
        s = make_cofhe_node(nd, setup_nd, device=cofhe_dev)
        s.run_in_thread()
        servers.append(s)
    comp_nd = NodeDetails("127.0.0.1", str(ports[4]), NodeType.COMPUTE_NODE)
    s = make_compute_node(comp_nd, setup_nd, device=args.device)
    s.run_in_thread()
    servers.append(s)
    note("network up: 1 setup + 3 CoFHE + 1 compute")

    try:
        client = ClientNode(setup_nd, use_tls=False)
        cs, pk = client.crypto_system, client.public_key
        M = cs.hsm2k.M
        random.seed(7)
        xs = [random.randrange(64) for _ in range(n * m)]
        ys = [random.randrange(64) for _ in range(m * p)]
        t0 = time.time()
        ct1 = cs.encrypt_tensor(pk, Tensor(xs, (n, m)))
        ct2 = cs.encrypt_tensor(pk, Tensor(ys, (m, p)))
        t_enc = time.time() - t0
        print(json.dumps({"phase": "client_encrypt", "elems": n*m + m*p,
                          "wall_s": round(t_enc, 1)}), flush=True)

        t0 = time.time()
        resp = client.compute(wire.ComputeRequest(
            wire.ComputeOperationType.BINARY, wire.ComputeOperation.MULTIPLY,
            [wire.ComputeOperand(wire.DataType.TENSOR,
                                 wire.DataEncryptionType.CIPHERTEXT,
                                 ser.serialize_ciphertext_tensor(ct1)),
             wire.ComputeOperand(wire.DataType.TENSOR,
                                 wire.DataEncryptionType.CIPHERTEXT,
                                 ser.serialize_ciphertext_tensor(ct2))]))
        t_mm = time.time() - t0
        assert resp.status == wire.Status.OK, resp.data[:300]
        prod = ser.deserialize_ciphertext_tensor(resp.data)
        print(json.dumps({"phase": "ciphertext_matmul",
                          "shape": f"{n}x{m}x{p}", "k": args.k,
                          "beaver_triplets": n * m * p,
                          "wall_s": round(t_mm, 1)}), flush=True)

        # verify against the dealer's secret key (spot-check a row to keep
        # the check itself off the critical path measurement)
        t0 = time.time()
        sk = setup_handler.sk
        dec = setup_handler.cs.decrypt_tensor(sk, Tensor(
            [prod.at(0, kk) for kk in range(p)], (p,)))
        for kk in range(p):
            want = sum(xs[j] * ys[j * p + kk] for j in range(m)) % M
            assert dec.at(kk) == want, kk
        note(f"row-0 decrypt verified ({time.time()-t0:.1f}s)")

        # the reference's network `decrypt` mode: threshold-decrypt the
        # (n, p) result through the compute node
        t0 = time.time()
        dresp = client.compute(wire.ComputeRequest(
            wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
            [wire.ComputeOperand(wire.DataType.TENSOR,
                                 wire.DataEncryptionType.CIPHERTEXT,
                                 ser.serialize_ciphertext_tensor(prod))]))
        t_dec = time.time() - t0
        assert dresp.status == wire.Status.OK
        out = ser.deserialize_plaintext_tensor(dresp.data)
        for i in range(n):
            for kk in range(p):
                want = sum(xs[i*m+j] * ys[j*p+kk] for j in range(m)) % M
                assert out.at(i, kk) % M == want, (i, kk)
        print(json.dumps({"phase": "network_decrypt", "shape": f"{n}x{p}",
                          "wall_s": round(t_dec, 1)}), flush=True)
        print(json.dumps({
            "metric": f"network_ciphertext_matmul_{n}x{m}x{p}_k{args.k}",
            "value": round(t_mm, 1), "unit": "s_per_matmul",
            "verified": True}), flush=True)
        client.close()
    finally:
        for s in servers:
            s.stop()


if __name__ == "__main__":
    main()
