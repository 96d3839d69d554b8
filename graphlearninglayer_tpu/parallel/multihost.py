"""Multi-host initialization and cross-host mesh construction.

Single-host slices need nothing; across hosts, ``jax.distributed`` runs the
coordination service over DCN while all collective traffic inside the jit
program rides ICI.  This wrapper standardizes environment-driven init
(coordinator address / process id / count from the usual TPU pod env vars)
and builds meshes spanning every host's devices.

The reference has no multi-host story at all (SURVEY.md §2.3); this is the
framework's scale-out entry point: data-parallel batches shard across
hosts, the per-batch graph op shards its node dimension over the global
('data','graph') mesh, and the big transductive CG uses
parallel/graph_shard.py over the same mesh.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize_multihost", "global_mesh", "is_multihost"]


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed if a multi-process setup is configured.

    Resolution order: explicit args, then the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or their
    COORDINATOR_ADDRESS etc. variants).  Returns True if distributed mode
    was initialized, False for single-process runs.  Safe to call twice.
    """
    coordinator = coordinator or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator is None:
        return False
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES",
                       os.environ.get("NUM_PROCESSES", "1")))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", os.environ.get("PROCESS_ID", "0")))
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_mesh(axes: tuple[str, ...] = ("data", "graph"),
                shape: tuple[int, ...] | None = None) -> Mesh:
    """Mesh over ALL devices (across hosts).  Default 2-axis factorization
    puts hosts on the leading ('data') axis so cross-host traffic is the
    data-parallel gradient psum while graph-axis collectives stay intra
    -host on ICI."""
    devices = jax.devices()
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            hosts = max(jax.process_count(), 1)
            per = n // hosts
            shape = (hosts, per) if len(axes) == 2 else None
            if shape is None or shape[0] * shape[1] != n:
                raise ValueError("provide an explicit shape")
    return Mesh(np.asarray(devices).reshape(shape), axes)
