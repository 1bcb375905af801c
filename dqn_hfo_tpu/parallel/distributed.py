"""Multi-host initialization and mesh construction.

The reference has no distributed runtime at all — its "cluster" story is
many independent condor jobs (scripts/train.sh).  Here multi-host scale-out
is the JAX distributed runtime: one process per host, a global
Mesh(('data',)) spanning every chip, the same shard_map DP program
(parallel/mesh.py), with gradient psums riding ICI within a slice and DCN
across hosts (SURVEY.md §2 P5).

Single-host runs need none of this; `maybe_initialize()` is a no-op unless
the standard cluster env vars (or explicit args) are present.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    Uses explicit args if given, else the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU
    pod's automatic configuration).  Returns True if distributed mode is on.
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    if not coord and nproc <= 1:
        return False
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc > 0:
        kwargs["num_processes"] = nproc
    if pid >= 0:
        kwargs["process_id"] = pid
    jax.distributed.initialize(**kwargs)
    return True


def global_mesh():
    """Mesh over every device in the (possibly multi-host) system."""
    from jax.sharding import Mesh
    return Mesh(jax.devices(), ("data",))


def is_coordinator() -> bool:
    return jax.process_index() == 0
