"""Multi-host initialization + scaling helpers.

The distributed design (SURVEY.md §2.4/§5): `jax.distributed.initialize`
brings up N hosts; the global mesh spans all chips; ray/track batches
shard over `('data',)`; field parameters replicate; gradient psum rides
ICI within a slice and DCN across hosts (inserted by XLA from the
sharding annotations). Host-side SfM state (CameraSet/PointSet, RANSAC)
lives on process 0 and broadcasts pose/point updates via
`multihost_utils.broadcast_one_to_all`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from . import mesh as pmesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Bring up jax.distributed when env/args indicate a multi-host run.

    No-op for single-process runs (the common case and all tests).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)))
    return True


def global_data_mesh() -> "pmesh.Mesh":
    """1-D mesh over every addressable chip across all hosts."""
    return pmesh.make_mesh(devices=jax.devices())


def is_primary() -> bool:
    return jax.process_index() == 0


def broadcast_host_array(x: np.ndarray) -> np.ndarray:
    """Share host-side scalars/arrays (poses, point updates) from process 0
    to all hosts."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.broadcast_one_to_all(x))


def rays_per_chip(global_rays: int) -> int:
    """Scale knob: the reference's global batch (8192 rays) divided over
    chips (SURVEY.md §7.1 item 6)."""
    return max(global_rays // jax.device_count(), 1)


def fetch_host(x) -> np.ndarray:
    """Device→host pull that works on multi-process global arrays.

    Single-process (every test/CLI run today): plain ``np.asarray`` —
    zero behavior change. Multi-process: an array sharded over the global
    mesh is not fully addressable, so ``np.asarray`` raises; all-gather
    the shards first (`multihost_utils.process_allgather(tiled=True)`
    concatenates along the sharded leading axis). The orchestrator's
    write-back sites (BA point carry, triangulated point pulls) route
    through this so the host SfM state stays identical on every process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    import jax.numpy as jnp
    xj = jnp.asarray(x)
    if getattr(xj, "is_fully_addressable", True):
        return np.asarray(xj)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(xj, tiled=True))
