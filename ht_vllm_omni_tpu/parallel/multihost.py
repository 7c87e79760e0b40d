"""Multi-host (DCN) bring-up: jax multi-controller init + mesh rules.

TPU-native replacement for the reference's multi-node story (Ray
placement groups + NCCL process groups + Mooncake transport;
vllm_omni/distributed/omni_coordinator/omni_coordinator.py:19-75): every
host runs the SAME engine binary, `jax.distributed.initialize` forms one
multi-controller runtime, and a single global `jax.sharding.Mesh` spans
all hosts.  Axis-to-network mapping (the scaling-book recipe):

- dp is the LEADING mesh axis and `jax.devices()` lists processes in
  rank order, so dp is the axis that crosses host boundaries — at
  inference steady state dp exchanges nothing but the (tiny) gathered
  output pack, which is what DCN is good for;
- tp / pp / ep must divide the per-host device count so their heavy
  collectives (psum per layer, decode ring) never leave ICI —
  `validate_host_locality` enforces this at engine construction.

Cross-host stage-to-stage traffic (PD disaggregation, talker handoff)
stays on the connector layer: `connector_for_peer` picks the in-process
/ shm transports for same-host peers and the TCP store (Python or
native C++) across hosts.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def ensure_initialized(parallel_cfg=None) -> bool:
    """Idempotently join the multi-controller runtime.

    Reads ParallelConfig fields when given, else the environment
    (OMNI_COORDINATOR / OMNI_NUM_PROCESSES / OMNI_PROCESS_ID — set the
    same way on every host, as the reference does with its serving
    env).  Returns True when running multi-process."""
    global _INITIALIZED
    num = int(
        getattr(parallel_cfg, "num_processes", 0)
        or os.environ.get("OMNI_NUM_PROCESSES", 1)
    )
    if num <= 1:
        return False
    if _INITIALIZED:
        return True
    coord = getattr(parallel_cfg, "coordinator_address", None) or (
        os.environ.get("OMNI_COORDINATOR")
    )
    pid = int(
        getattr(parallel_cfg, "process_id", None)
        if getattr(parallel_cfg, "process_id", None) is not None
        else os.environ.get("OMNI_PROCESS_ID", 0)
    )
    if coord is None:
        raise ValueError(
            "multi-process engine needs coordinator_address "
            "(or OMNI_COORDINATOR) — host:port of process 0"
        )
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num, process_id=pid
    )
    _INITIALIZED = True
    return True


def validate_host_locality(mesh_cfg) -> None:
    """ICI-only axes (tp, pp, ep) must not straddle a host boundary.

    The global device list is process-ordered, and make_mesh reshapes it
    (dp, pp, ep, tp) — so the trailing pp*ep*tp block must tile evenly
    into each process's local devices for those axes' collectives to
    stay on-host."""
    nproc = jax.process_count()
    if nproc <= 1:
        return
    local = len(jax.local_devices())
    inner = (
        mesh_cfg.pipeline_parallel_size
        * mesh_cfg.expert_parallel_size
        * mesh_cfg.tensor_parallel_size
    )
    if inner > local or local % inner:
        raise ValueError(
            f"tp*pp*ep={inner} must divide the per-host device count "
            f"{local}: these axes' collectives must stay on ICI — put "
            f"the cross-host factor on dp (have dp="
            f"{mesh_cfg.data_parallel_size}, {nproc} hosts)"
        )
    if mesh_cfg.data_parallel_size * inner < nproc * inner:
        raise ValueError(
            f"dp={mesh_cfg.data_parallel_size} cannot cover {nproc} "
            "hosts: dp is the DCN axis and must be a multiple of the "
            "host count"
        )


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def connector_for_peer(peer_host: str | None) -> str:
    """Transport selection by peer locality (reference: Mooncake across
    nodes, shm within one): in-process/shm stay on-host, the TCP store
    crosses DCN.  Callers pass the peer stage's host (None/"" = local).
    """
    import socket

    if not peer_host or peer_host in (
        "localhost", "127.0.0.1", socket.gethostname()
    ):
        return "SharedMemoryConnector"
    return "TcpConnector"
