"""Ray–AABB intersection (slab method), fully vectorized XLA.

TPU-native replacement for the reference's CUDA `vren.ray_aabb_intersect`
(`utils/custom_functions.py:10-31`, SURVEY.md §2.3): single box, branch-free,
static shapes. Also provides ray–sphere intersection for parity with the
wrapped-but-unused `RaySphereIntersector` (`utils/custom_functions.py:34-54`).
"""
from __future__ import annotations

import jax.numpy as jnp


def ray_aabb_intersect(rays_o, rays_d, center, half_size, eps=1e-10):
    """Slab-method intersection with one axis-aligned box.

    rays_o/rays_d: [N,3]; center/half_size: [3].
    Returns (t_near [N], t_far [N], valid [N] bool). For missed rays both
    t's are -1 (vren's convention). t_near is clamped to >= 0.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < eps, jnp.where(rays_d >= 0, eps, -eps), rays_d)
    lo = (center - half_size - rays_o) * inv_d
    hi = (center + half_size - rays_o) * inv_d
    t1 = jnp.minimum(lo, hi).max(axis=-1)
    t2 = jnp.maximum(lo, hi).min(axis=-1)
    t1 = jnp.maximum(t1, 0.0)
    valid = t2 > t1
    t_near = jnp.where(valid, t1, -1.0)
    t_far = jnp.where(valid, t2, -1.0)
    return t_near, t_far, valid


def ray_sphere_intersect(rays_o, rays_d, center, radius):
    """Ray–sphere intersection. Returns (t_near, t_far, valid)."""
    oc = rays_o - center
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = 2.0 * jnp.sum(oc * rays_d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - 4 * a * c
    valid = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    t1 = jnp.maximum(t1, 0.0)
    valid = valid & (t2 > t1)
    return jnp.where(valid, t1, -1.0), jnp.where(valid, t2, -1.0), valid
