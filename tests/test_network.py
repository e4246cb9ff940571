"""End-to-end multi-node network test: 1 setup + 3 CoFHE + 1 compute node as
in-process servers (the start_network.sh analogue, reference
scripts/start_network.sh:7-30), exercising join, topology, Beaver triplets,
homomorphic ops and threshold decryption over the real wire protocol."""

import os
import socket
import threading

import pytest

from cofhe_tpu.node import wire
from cofhe_tpu.node.handlers import SetupNodeHandler
from cofhe_tpu.node.network_details import CryptoSystemDetails, NodeDetails, NodeType
from cofhe_tpu.node.nodes import ClientNode, make_cofhe_node, make_compute_node, make_setup_node
from cofhe_tpu.node.server import Server


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def network(toy_hsm):
    os.environ["COFHE_P_OVERRIDE"] = hex(toy_hsm.p)
    # clear the params cache so the override takes effect
    from cofhe_tpu.core import cl_hsm2k

    cl_hsm2k._cached_params.cache_clear()
    ports = [free_port() for _ in range(5)]
    setup_nd = NodeDetails("127.0.0.1", str(ports[0]), NodeType.SETUP_NODE)
    cs_details = CryptoSystemDetails(type="CoFHE_TPU", public_key="",
                                     security_level=128, k=32, threshold=2, total_nodes=3)
    servers = []
    setup_server, setup_handler = make_setup_node(setup_nd, cs_details)
    setup_server.run_in_thread()
    servers.append(setup_server)
    for i in range(1, 4):
        nd = NodeDetails("127.0.0.1", str(ports[i]), NodeType.COFHE_NODE)
        s = make_cofhe_node(nd, setup_nd)
        s.run_in_thread()
        servers.append(s)
    comp_nd = NodeDetails("127.0.0.1", str(ports[4]), NodeType.COMPUTE_NODE)
    s = make_compute_node(comp_nd, setup_nd)
    s.run_in_thread()
    servers.append(s)
    client = ClientNode(setup_nd, use_tls=False)
    yield client, setup_handler
    client.close()
    for s in servers:
        s.stop()
    os.environ.pop("COFHE_P_OVERRIDE", None)
    cl_hsm2k._cached_params.cache_clear()


def _op(dt, et, data):
    return wire.ComputeOperand(dt, et, data)


def test_single_ct_ct_multiply_and_decrypt(network):
    client, _ = network
    cs, pk = client.crypto_system, client.public_key
    ct1 = cs.encrypt(pk, cs.make_plaintext(2.0))
    ct2 = cs.encrypt(pk, cs.make_plaintext(3.0))
    req = wire.ComputeRequest(
        wire.ComputeOperationType.BINARY, wire.ComputeOperation.MULTIPLY,
        [_op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
             cs.serialize_ciphertext(ct1).encode()),
         _op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
             cs.serialize_ciphertext(ct2).encode())])
    resp = client.compute(req)
    assert resp.status == wire.Status.OK
    ct_prod = cs.deserialize_ciphertext(resp.data.decode())
    dec = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
        [_op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
             cs.serialize_ciphertext(ct_prod).encode())]))
    assert dec.status == wire.Status.OK
    value = cs.get_float_from_plaintext(cs.deserialize_plaintext(dec.data.decode()))
    assert value == 6.0


def test_tensor_add_and_decrypt(network):
    from cofhe_tpu import serialize as ser
    from cofhe_tpu.tensor import Tensor

    client, _ = network
    cs, pk = client.crypto_system, client.public_key
    a = [cs.make_plaintext(float(i)) for i in range(4)]
    b = [cs.make_plaintext(float(10 * i)) for i in range(4)]
    ca = cs.encrypt_tensor(pk, Tensor(a, (2, 2)))
    cb = cs.encrypt_tensor(pk, Tensor(b, (2, 2)))
    resp = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.BINARY, wire.ComputeOperation.ADD,
        [_op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(ca)),
         _op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(cb))]))
    assert resp.status == wire.Status.OK
    csum = ser.deserialize_ciphertext_tensor(resp.data)
    dec = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
        [_op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(csum))]))
    out = ser.deserialize_plaintext_tensor(dec.data)
    assert [cs.get_float_from_plaintext(v) for v in out.data] == [0.0, 11.0, 22.0, 33.0]


def test_tensor_ct_pt_matmul(network):
    from cofhe_tpu import serialize as ser
    from cofhe_tpu.tensor import Tensor

    client, setup_handler = network
    cs, pk = client.crypto_system, client.public_key
    # ct (2,2) x pt (2,2)
    xs = [[1.0, 2.0], [3.0, 4.0]]
    ws = [[5.0, 6.0], [7.0, 8.0]]
    ct = cs.encrypt_tensor(pk, Tensor([cs.make_plaintext(v) for r in xs for v in r], (2, 2)))
    pt = Tensor([cs.make_plaintext(v) for r in ws for v in r], (2, 2))
    resp = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.BINARY, wire.ComputeOperation.MULTIPLY,
        [_op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(ct)),
         _op(wire.DataType.TENSOR, wire.DataEncryptionType.PLAINTEXT,
             ser.serialize_plaintext_tensor(pt))]))
    assert resp.status == wire.Status.OK
    prod = ser.deserialize_ciphertext_tensor(resp.data)
    # verify against the dealer's secret key
    sk = setup_handler.sk
    dec = setup_handler.cs.decrypt_tensor(sk, prod)
    want = [[sum(xs[i][j] * ws[j][k] for j in range(2)) for k in range(2)] for i in range(2)]
    got = [[cs.get_float_from_plaintext(dec.at(i, k)) for k in range(2)] for i in range(2)]
    assert got == want


def test_tensor_ct_ct_beaver_matmul(network):
    from cofhe_tpu import serialize as ser
    from cofhe_tpu.tensor import Tensor

    client, setup_handler = network
    cs, pk = client.crypto_system, client.public_key
    xs = [[1.0, 2.0], [3.0, 4.0]]
    ys = [[2.0, 0.0], [1.0, 3.0]]
    ct1 = cs.encrypt_tensor(pk, Tensor([cs.make_plaintext(v) for r in xs for v in r], (2, 2)))
    ct2 = cs.encrypt_tensor(pk, Tensor([cs.make_plaintext(v) for r in ys for v in r], (2, 2)))
    resp = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.BINARY, wire.ComputeOperation.MULTIPLY,
        [_op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(ct1)),
         _op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(ct2))]))
    assert resp.status == wire.Status.OK, resp.data[:200]
    prod = ser.deserialize_ciphertext_tensor(resp.data)
    dec = client.compute(wire.ComputeRequest(
        wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
        [_op(wire.DataType.TENSOR, wire.DataEncryptionType.CIPHERTEXT,
             ser.serialize_ciphertext_tensor(prod))]))
    out = ser.deserialize_plaintext_tensor(dec.data)
    want = [[sum(xs[i][j] * ys[j][k] for j in range(2)) for k in range(2)] for i in range(2)]
    got = [[cs.get_float_from_plaintext(out.at(i, k)) for k in range(2)] for i in range(2)]
    assert got == want


def test_elastic_recovery_and_full_network(toy_hsm):
    """Kill a CoFHE node MID-SESSION and assert the compute node's next
    threshold decrypt recovers: the fan-out drops the dead client,
    refetches topology, reconnects to the surviving combination and — the
    load-bearing part — recomputes the lexicographic combination rank so
    the right share bundle is used (smpc/client.py:151-181; reference
    smpc_client.hpp:232-295). A wrong rank decrypts to garbage, so the
    value check is the proof. Also covers the setup node's "network full"
    join arm (reference join_as_node.hpp:387-399)."""
    os.environ["COFHE_P_OVERRIDE"] = hex(toy_hsm.p)
    from cofhe_tpu.core import cl_hsm2k

    cl_hsm2k._cached_params.cache_clear()
    ports = [free_port() for _ in range(5)]
    setup_nd = NodeDetails("127.0.0.1", str(ports[0]), NodeType.SETUP_NODE)
    cs_details = CryptoSystemDetails(type="CoFHE_TPU", public_key="",
                                     security_level=128, k=32, threshold=2,
                                     total_nodes=3)
    servers = []
    cofhe_servers = []
    try:
        setup_server, setup_handler = make_setup_node(setup_nd, cs_details)
        setup_server.run_in_thread()
        servers.append(setup_server)
        for i in range(1, 4):
            nd = NodeDetails("127.0.0.1", str(ports[i]), NodeType.COFHE_NODE)
            s = make_cofhe_node(nd, setup_nd)
            s.run_in_thread()
            servers.append(s)
            cofhe_servers.append(s)
        comp_nd = NodeDetails("127.0.0.1", str(ports[4]), NodeType.COMPUTE_NODE)
        s = make_compute_node(comp_nd, setup_nd)
        s.run_in_thread()
        servers.append(s)

        # the network is at total_nodes=3: one more CoFHE join must be
        # rejected with "network full"
        from cofhe_tpu.node.nodes import _join

        extra_nd = NodeDetails("127.0.0.1", str(free_port()), NodeType.COFHE_NODE)
        with pytest.raises(RuntimeError, match="network full"):
            _join(setup_nd, extra_nd, wire.JoinType.JOIN_AS_COFHE_NODE,
                  use_tls=False, retries=1)

        client = ClientNode(setup_nd, use_tls=False)
        cs, pk = client.crypto_system, client.public_key

        def net_decrypt(value):
            ct = cs.encrypt(pk, cs.make_plaintext(value))
            dec = client.compute(wire.ComputeRequest(
                wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
                [_op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
                     cs.serialize_ciphertext(ct).encode())]))
            assert dec.status == wire.Status.OK
            return cs.get_float_from_plaintext(
                cs.deserialize_plaintext(dec.data.decode()))

        # first decrypt pins the SMPC client to combination (0, 1)
        assert net_decrypt(11.0) == 11.0
        # kill the FIRST CoFHE node (member of the active combination)
        cofhe_servers[0].stop()
        # next decrypt must ride the elastic path: dead RPC -> drop client
        # -> topology refresh -> combination (1, 2) -> rank recompute
        assert net_decrypt(23.0) == 23.0
        client.close()
    finally:
        for s in servers:
            s.stop()
        os.environ.pop("COFHE_P_OVERRIDE", None)
        cl_hsm2k._cached_params.cache_clear()


def test_tls_end_to_end(toy_hsm, tmp_path):
    """A setup + CoFHE + compute trio over REAL TLS (self-signed cert,
    client verify_none like the reference, server.hpp:163-168 /
    client.hpp:30-36): join, topology fetch, homomorphic add, threshold
    decrypt — all over encrypted sockets."""
    from cofhe_tpu.node.server import generate_self_signed_cert

    os.environ["COFHE_P_OVERRIDE"] = hex(toy_hsm.p)
    from cofhe_tpu.core import cl_hsm2k

    cl_hsm2k._cached_params.cache_clear()
    cert = str(tmp_path / "server.pem")
    key = str(tmp_path / "server_key.pem")
    generate_self_signed_cert(cert, key)
    from cofhe_tpu.node.nodes import (ClientNode, make_cofhe_node,
                                      make_compute_node, make_setup_node)

    ports = [free_port() for _ in range(5)]
    setup_nd = NodeDetails("127.0.0.1", str(ports[0]), NodeType.SETUP_NODE)
    cs_details = CryptoSystemDetails(type="CoFHE_TPU", public_key="",
                                     security_level=128, k=32, threshold=2,
                                     total_nodes=3)
    servers = []
    try:
        setup_server, setup_handler = make_setup_node(
            setup_nd, cs_details, certfile=cert, keyfile=key)
        setup_server.run_in_thread()
        servers.append(setup_server)
        for i in range(1, 4):
            nd = NodeDetails("127.0.0.1", str(ports[i]), NodeType.COFHE_NODE)
            s = make_cofhe_node(nd, setup_nd, certfile=cert, keyfile=key)
            s.run_in_thread()
            servers.append(s)
        comp_nd = NodeDetails("127.0.0.1", str(ports[4]), NodeType.COMPUTE_NODE)
        s = make_compute_node(comp_nd, setup_nd, certfile=cert, keyfile=key)
        s.run_in_thread()
        servers.append(s)
        client = ClientNode(setup_nd, use_tls=True)
        cs, pk = client.crypto_system, client.public_key
        ct1 = cs.encrypt(pk, cs.make_plaintext(4.0))
        ct2 = cs.encrypt(pk, cs.make_plaintext(5.0))
        resp = client.compute(wire.ComputeRequest(
            wire.ComputeOperationType.BINARY, wire.ComputeOperation.ADD,
            [_op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
                 cs.serialize_ciphertext(ct1).encode()),
             _op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
                 cs.serialize_ciphertext(ct2).encode())]))
        assert resp.status == wire.Status.OK
        ct_sum = cs.deserialize_ciphertext(resp.data.decode())
        dec = client.compute(wire.ComputeRequest(
            wire.ComputeOperationType.UNARY, wire.ComputeOperation.DECRYPT,
            [_op(wire.DataType.SINGLE, wire.DataEncryptionType.CIPHERTEXT,
                 cs.serialize_ciphertext(ct_sum).encode())]))
        assert dec.status == wire.Status.OK
        value = cs.get_float_from_plaintext(
            cs.deserialize_plaintext(dec.data.decode()))
        assert value == 9.0
        client.close()
    finally:
        for s in servers:
            s.stop()
        os.environ.pop("COFHE_P_OVERRIDE", None)
        cl_hsm2k._cached_params.cache_clear()
