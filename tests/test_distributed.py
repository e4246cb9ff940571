"""jax.distributed control plane: single-process semantics + a REAL
2-process CPU run (one process per logical party host, the analogue of the
reference's multi-machine deployment, include/node/* + smpc_client.hpp).
"""

import os
import socket
import subprocess
import sys

import pytest

from cofhe_tpu.parallel import distributed as dist


def test_init_single_process_noop():
    # single-process call is a no-op and must NOT latch (a later genuine
    # multi-process init must still run) — ADVICE r2
    dist.init(num_processes=1)
    assert not dist._initialized


def test_init_multi_process_requires_coordinator():
    with pytest.raises(ValueError):
        dist.init(num_processes=2, coordinator=None)


def test_global_mesh_axes():
    dist.init(num_processes=1)
    m = dist.global_mesh()
    assert set(m.axis_names) == {"dp", "tp"}
    assert m.devices.size >= 1


def test_parse_flag():
    assert dist.parse_flag("h:1,4,2") == {
        "coordinator": "h:1", "num_processes": 4, "process_id": 2}
    with pytest.raises(ValueError):
        dist.parse_flag("h:1,4")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_add():
    """Two jax.distributed processes on the CPU backend build one global
    mesh and run a dp-sharded engine op, bit-exact on both ranks."""
    from conftest import toy_prime

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    phex = hex(toy_prime(100))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(rank), phex],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK process {rank}: 2 local / 4 global devices" in out, out
