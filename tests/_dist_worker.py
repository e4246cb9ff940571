"""Worker for tests/test_distributed.py::test_two_process_dp_add.

Runs as one of two `jax.distributed` processes on the CPU backend (the
multi-host control-plane analogue of the reference's multi-machine node
deployment, include/node/*): initializes the runtime, builds the GLOBAL
mesh spanning both processes' devices, and runs a dp-sharded add_batch
through JaxEngine(mesh=...), checking bit-exactness vs the Python oracle.

argv: <coordinator> <num_processes> <process_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_NUM_CPU_DEVICES"] = "2"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cofhe_tpu.parallel import distributed as dist

    dist.init(coordinator=coordinator, num_processes=nproc, process_id=pid)
    assert dist._initialized, "multi-process init must actually initialize"
    ndev = len(jax.devices())
    nloc = len(jax.local_devices())
    assert ndev == 2 * nloc, (ndev, nloc)

    mesh = dist.global_mesh()
    assert mesh.devices.size == ndev

    from cofhe_tpu.api import CryptoSystem

    cs = CryptoSystem(128, 32, p=int(sys.argv[4], 16), device="tpu",
                      seed=b"dist-test", mesh=mesh)
    sk = cs.keygen()
    pk = cs.keygen(sk)
    M = cs.hsm2k.M
    vals1 = [(7 * i + 1) % M for i in range(8)]
    vals2 = [(11 * i + 5) % M for i in range(8)]
    cts1 = [cs.hsm2k.encrypt(pk, v, cs.rand_gen) for v in vals1]
    cts2 = [cs.hsm2k.encrypt(pk, v, cs.rand_gen) for v in vals2]
    out = cs._engine.add_batch(cts1, cts2)
    for i in range(8):
        expect = cs.hsm2k.add_ciphertexts(cts1[i], cts2[i])
        assert out[i] == expect, f"mismatch at {i} (process {pid})"
    print(f"OK process {pid}: {nloc} local / {ndev} global devices", flush=True)


if __name__ == "__main__":
    main()
