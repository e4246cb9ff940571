"""Multi-host control plane: jax.distributed + cross-host meshes.

The reference's multi-node story is t processes on different machines behind
TLS (smpc_client.hpp:125-159). On TPU the data plane is a pod slice: one
jax.distributed job spanning hosts, a Mesh over all global devices, and the
engine's dp-sharded kernels running under it (ICI/DCN collectives inserted
by XLA). The node runtime (cofhe_tpu/node/) remains the control plane for
cross-party protocol steps (join/topology/triplets/partial decryptions);
THIS module wires the intra-party chips of one logical node together.

Usage (per host of one logical party):

    from cofhe_tpu.parallel import distributed as dist
    dist.init(coordinator="10.0.0.1:8476", num_processes=4, process_id=i)
    mesh = dist.global_mesh()                 # all chips across the hosts
    cs = CryptoSystem(128, 128, device="tpu", mesh=mesh)

Single-process calls are no-ops, so the same node CLI flags work from a
laptop to a pod slice.
"""

from __future__ import annotations

import logging

log = logging.getLogger("cofhe_tpu.distributed")

_initialized = False        # jax.distributed.initialize actually ran


def init(coordinator: str | None = None, num_processes: int = 1,
         process_id: int = 0) -> None:
    """Initialize the jax.distributed runtime (idempotent). A single-process
    call is a no-op that does NOT latch, so a later genuine multi-process
    init still runs; a multi-process misconfiguration raises instead of
    silently degrading to single-host operation."""
    global _initialized
    if num_processes <= 1:
        return
    if _initialized:
        return
    if coordinator is None:
        raise ValueError(
            f"multi-process init (num_processes={num_processes}) requires a "
            "coordinator address")
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    log.info("jax.distributed up: process %d/%d, %d local / %d global devices",
             process_id, num_processes,
             len(jax.local_devices()), len(jax.devices()))


def global_mesh(dp: int | None = None, tp: int | None = None):
    """Mesh over ALL global devices (call after init())."""
    from .sharded import make_mesh

    return make_mesh(devices=None, dp=dp, tp=tp)


def parse_flag(value: str) -> dict:
    """Parse the node CLI --distributed flag "coordinator:port,nproc,pid"."""
    parts = value.split(",")
    if len(parts) != 3:
        raise ValueError("--distributed expects coordinator:port,nproc,pid")
    return {"coordinator": parts[0], "num_processes": int(parts[1]),
            "process_id": int(parts[2])}
