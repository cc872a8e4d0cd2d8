"""Mesh construction + sharding rules for the DP scaling axis.

Scaling story (SURVEY.md §2.6): scenarios-per-chip data parallelism over a
1-D ('dp',) mesh; networks are <=512-wide MLPs, so parameters replicate and
the only collectives are gradient/metric all-reduces riding ICI within a
slice and DCN across hosts.  `multihost_init` wraps
`jax.distributed.initialize` for pod-slice runs; single-host virtual meshes
(xla_force_host_platform_device_count) use the same code paths, which is how
tests and the driver's dryrun validate multi-chip compilation without
hardware.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (v5e-16 style pods).

    No-op when running single-process (the common case under tests / bench).
    """
    if num_processes is None:
        num_processes = int(os.environ.get("POINTFOOT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def env_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for (B, ...) env-batched arrays: batch split over dp."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place a pytree of (B, ...) arrays with batch sharded over the mesh.

    Scalars / rank-0 leaves replicate."""
    shard = env_sharding(mesh, axis)
    repl = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] >= mesh.size:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)
