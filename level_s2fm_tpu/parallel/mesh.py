"""Device mesh + sharding helpers (the distributed backend).

The reference is single-GPU by construction (`utils/options.py:110`,
SURVEY.md §2.4); the TPU-native design shards the embarrassingly parallel
axes — rays and feature-track points — over a 1-D ``('data',)`` mesh with
replicated field parameters. XLA inserts the gradient all-reduce (psum)
over ICI automatically from the sharding annotations; no NCCL-style
hand-written collectives are needed.

Usage: ``set_mesh(make_mesh())`` (or the ``use_mesh`` context manager);
phase steps then route ray/point tensors through ``constrain`` so the
compiler keeps the batch axis distributed.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Optional[Mesh] = None
DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def set_mesh(mesh: Optional[Mesh]):
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    prev = get_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def constrain(x, axis: int = 0):
    """Constrain array x to be sharded along `axis` over the data mesh.

    No-op when no mesh is active or the dim doesn't divide, so phase code
    can call this unconditionally.
    """
    mesh = get_mesh()
    if mesh is None:
        return x
    n = mesh.devices.size
    if x.ndim <= axis or x.shape[axis] % n != 0:
        return x
    spec = [None] * x.ndim
    spec[axis] = DATA_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate(tree, mesh: Optional[Mesh] = None):
    """Place every leaf replicated on the mesh."""
    mesh = mesh or get_mesh()
    if mesh is None:
        return tree
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_leading(tree, mesh: Optional[Mesh] = None, axis: int = 0):
    """Place array leaves sharded along their leading axis (padding must
    already make it divisible); non-divisible leaves are replicated."""
    mesh = mesh or get_mesh()
    if mesh is None:
        return tree
    n = mesh.devices.size

    def place(x):
        x = np.asarray(x) if not hasattr(x, "sharding") else x
        if getattr(x, "ndim", 0) > axis and x.shape[axis] % n == 0:
            spec = [None] * x.ndim
            spec[axis] = DATA_AXIS
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, tree)
