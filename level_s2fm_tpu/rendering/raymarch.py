"""Occupancy-grid ray marching + hard-stop compositing (XLA).

Parity module for the reference's wrapped-but-unused vren kernels
(`utils/custom_functions.py:57-160`: RayMarcher, VolumeRenderer,
TruncExp — SURVEY.md §2.3 "optional occupancy-grid ray marcher +
hard-stop compositor"). The torch-scatter `segment_csr` backward becomes
native `jax.ops.segment_sum`.

Design: fixed samples-per-ray (static shapes), occupancy-grid skipping by
zeroing the step contribution in empty cells, early-stop compositing by
transmittance masking — all branch-free.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import aabb as aabb_mod


def trunc_exp(x, clip: float = 15.0):
    """exp with clipped gradient (ref `TruncExp`, `custom_functions.py:163-174`)."""
    @jax.custom_vjp
    def _te(x):
        return jnp.exp(x)

    def fwd(x):
        return jnp.exp(x), x

    def bwd(x, g):
        return (g * jnp.exp(jnp.clip(x, -clip, clip)),)

    _te.defvjp(fwd, bwd)
    return _te(x)


class OccupancyGrid(NamedTuple):
    """Binary occupancy over a cubic grid inside the AABB."""
    occ: jnp.ndarray          # [G,G,G] bool
    center: jnp.ndarray       # [3]
    half_size: jnp.ndarray    # [3]

    @property
    def resolution(self) -> int:
        return self.occ.shape[0]


def build_occupancy_grid(sdf_fn, center, half_size, resolution: int = 64,
                         threshold: float = 0.05, chunk: int = 131072,
                         one_sided: bool = False):
    """Occupancy from the SDF at cell centers.

    one_sided=False: |sdf| < threshold (surface band — sphere-trace
    skipping). one_sided=True: sdf < threshold (band + interior — the
    right criterion for VolSDF compositing, where sigma -> alpha inside
    the surface and occluded interior bins still absorb).
    """
    center = jnp.asarray(center, jnp.float32)
    half_size = jnp.asarray(half_size, jnp.float32)
    g = (jnp.arange(resolution) + 0.5) / resolution * 2.0 - 1.0
    pts = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"), axis=-1)
    pts = pts * half_size + center
    flat = pts.reshape(-1, 3)
    vals = []
    for i in range(0, flat.shape[0], chunk):
        vals.append(sdf_fn(flat[i:i + chunk])[..., 0])
    sdf = jnp.concatenate(vals).reshape(resolution, resolution, resolution)
    occ = (sdf < threshold) if one_sided else (jnp.abs(sdf) < threshold)
    return OccupancyGrid(occ=occ, center=center, half_size=half_size)


def march_rays(grid: OccupancyGrid, rays_o, rays_d, n_samples: int = 128,
               perturb_key: Optional[jax.Array] = None):
    """Sample depths along rays, masking samples in unoccupied cells.

    rays_o/rays_d [N,3]. Returns (depths [N,S], deltas [N,S], valid [N,S]).
    (Functional analogue of vren.raymarching_train — fixed sample count
    instead of compacted variable-length output, the XLA-friendly shape.)
    """
    t0, t1, hit = aabb_mod.ray_aabb_intersect(rays_o, rays_d, grid.center,
                                              grid.half_size)
    u = (jnp.arange(n_samples, dtype=rays_o.dtype) + 0.5) / n_samples
    if perturb_key is not None:
        u = u + (jax.random.uniform(perturb_key, (rays_o.shape[0], n_samples))
                 - 0.5) / n_samples
    depths = t0[:, None] + u * (t1 - t0)[:, None]                  # [N,S]
    deltas = jnp.gradient(depths, axis=1)
    pts = rays_o[:, None, :] + depths[..., None] * rays_d[:, None, :]
    # occupancy lookup
    rel = (pts - grid.center) / (2 * grid.half_size) + 0.5
    cell = jnp.clip((rel * grid.resolution).astype(jnp.int32), 0,
                    grid.resolution - 1)
    occ = grid.occ[cell[..., 0], cell[..., 1], cell[..., 2]]
    valid = occ & hit[:, None]
    return depths, deltas, valid


def composite_hard_stop(sigmas, rgbs, deltas, valid,
                        T_threshold: float = 1e-4,
                        bg_color: Optional[jnp.ndarray] = None):
    """Front-to-back compositing with transmittance early-stop masking.

    sigmas [N,S]; rgbs [N,S,3]; deltas [N,S]; valid [N,S].
    Functional analogue of vren.composite_train_fw/bw
    (`custom_functions.py:116-160`); gradients flow natively.
    Returns dict(opacity [N], depth [N], rgb [N,3], ws [N,S]).
    """
    sig = jnp.where(valid, sigmas, 0.0)
    alpha = 1.0 - jnp.exp(-sig * deltas)
    zeros = jnp.zeros_like(alpha[:, :1])
    T = jnp.exp(-jnp.cumsum(
        jnp.concatenate([zeros, sig * deltas], axis=1), axis=1))[:, :-1]
    # hard stop: zero contributions once transmittance falls below threshold
    alive = T > T_threshold
    w = jnp.where(alive, T * alpha, 0.0)
    opacity = w.sum(axis=1)
    # depth expects midpoints; reuse the sample depths weighting
    rgb = jnp.sum(w[..., None] * rgbs, axis=1)
    if bg_color is not None:
        rgb = rgb + (1 - opacity)[:, None] * bg_color
    return {"opacity": opacity, "rgb": rgb, "ws": w}


def segment_mean(values, segment_ids, num_segments: int):
    """torch_scatter.segment_csr('mean') equivalent on sorted segment ids."""
    s = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    c = jax.ops.segment_sum(jnp.ones_like(values), segment_ids,
                            num_segments=num_segments)
    return s / jnp.maximum(c, 1.0)
