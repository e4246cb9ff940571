"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths compile and run without TPU hardware."""

import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("COFHE_TEST_PLATFORM", "cpu")
if os.environ["JAX_PLATFORMS"] == "cpu":
    # keep the axon TPU-tunnel plugin fully out of CPU test runs: its
    # remote-compile/transport threads intermittently deadlock jit compiles
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")  # jax >= 0.5 spelling

import faulthandler
import signal

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

import pytest

import jax

# the axon sitecustomize imports jax at interpreter startup, so env vars are
# too late — use config.update (works pre-backend-init)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"] or None)
if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_num_cpu_devices", int(os.environ.get("JAX_NUM_CPU_DEVICES", "8")))
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cofhe_tpu.core.cl_hsm2k import CLHSM2k
from cofhe_tpu.core.intmath import is_prime
from cofhe_tpu.core.rng import RandGen

# Toy primes (deterministic) for fast tests; production-size params are
# exercised in the slow/bench paths only.
_TOY_P_CACHE: dict[int, int] = {}


def toy_prime(bits: int) -> int:
    if bits not in _TOY_P_CACHE:
        rg = RandGen(f"toy-prime:{bits}".encode())
        while True:
            c = rg.random_bits(bits) | (1 << (bits - 1)) | 1
            if is_prime(c):
                _TOY_P_CACHE[bits] = c
                break
    return _TOY_P_CACHE[bits]


@pytest.fixture(scope="session")
def toy_hsm():
    """CLHSM2k with k=32 and a 100-bit p (fast, still exercises all paths)."""
    return CLHSM2k(128, 32, p=toy_prime(100))


@pytest.fixture(scope="session")
def toy_cs():
    from cofhe_tpu.api import CryptoSystem

    return CryptoSystem(128, 32, p=toy_prime(100), seed=b"test-seed")


@pytest.fixture(scope="session")
def toy_keys(toy_cs):
    sk = toy_cs.keygen()
    pk = toy_cs.keygen(sk)
    return sk, pk
