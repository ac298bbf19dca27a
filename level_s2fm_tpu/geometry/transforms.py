"""Coordinate transforms, ray generation, alignment/eval (pure JAX).

Equivalent surface to the reference's `utils/camera.py:199-323`:
world/cam/img transforms, pixel-grid ray generation, depth->points,
Procrustes sim(3) alignment, and novel-view pose synthesis.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import lie


def to_hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X, pose):
    """X [...,N,3], pose [...,3,4] (w2c) -> camera-frame points."""
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2img(X, K):
    return X @ jnp.swapaxes(K, -1, -2)


def img2cam(X, K):
    return X @ jnp.swapaxes(jnp.linalg.inv(K), -1, -2)


def cam2world(X, pose):
    pose_inv = lie.pose_invert(pose)
    return to_hom(X) @ jnp.swapaxes(pose_inv, -1, -2)


def mesh_grid(H: int, W: int):
    """Pixel-center grid [HW,2] in (x,y) order."""
    y = jnp.arange(H, dtype=jnp.float32) + 0.5
    x = jnp.arange(W, dtype=jnp.float32) + 0.5
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def get_center_and_ray(pose, intr, xy_grid):
    """Camera centers + (unnormalized) ray directions in world frame.

    pose [B,3,4] w2c, intr [B,3,3] or [3,3], xy_grid [N,2] pixel coords.
    Returns center [B,N,3], ray [B,N,3]. Ray length equals the depth scale:
    point = center + d * ray where d is z-depth (ref `camera.py:230-252`).
    """
    if intr.ndim == 2:
        intr = intr[None]
    B = pose.shape[0]
    grid = jnp.broadcast_to(xy_grid[None], (B, *xy_grid.shape))
    grid_3D = img2cam(to_hom(grid), intr)
    center_3D = jnp.zeros_like(grid_3D)
    grid_3D = cam2world(grid_3D, pose)
    center_3D = cam2world(center_3D, pose)
    return center_3D, grid_3D - center_3D


def get_3D_points_from_depth(center, ray, depth, multi_samples=False):
    if multi_samples:
        center, ray = center[:, :, None], ray[:, :, None]
    return center + ray * depth


def project_points(pts, pose, K, eps=1e-6):
    """World points [...,N,3] -> pixel uv [...,N,2] and depth [...,N,1].

    The divisor is clamped away from zero on BOTH sides: a plain
    ``depth + eps`` still crosses zero for points near/behind the image
    plane, overflowing uv and NaN-ing gradients through the projection.
    """
    Xc = world2cam(pts, pose)
    uvw = cam2img(Xc, K)
    depth = uvw[..., 2:]
    denom = jnp.where(depth >= 0, jnp.maximum(depth, eps),
                      jnp.minimum(depth, -eps))
    uv = uvw[..., :2] / denom
    return uv, depth


class Sim3(NamedTuple):
    t0: jnp.ndarray
    t1: jnp.ndarray
    s0: jnp.ndarray
    s1: jnp.ndarray
    R: jnp.ndarray


def procrustes_analysis(X0, X1):
    """Similarity transform aligning X1 to X0 (both [N,3]).

    X1to0 = (X1-t1)/s1 @ R.T * s0 + t0 (ref `camera.py:294-311`).
    """
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c ** 2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c ** 2).sum(axis=-1).mean())
    U, S, Vt = jnp.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = U @ Vt
    det = jnp.linalg.det(R)
    U = U.at[:, 2].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = U @ Vt
    return Sim3(t0=t0[0], t1=t1[0], s0=s0, s1=s1, R=R)


def prealign_cameras(pose, pose_GT):
    """Sim3-align predicted w2c poses to GT via camera centers.

    Returns (pose_aligned, sim3). Ref `pipelines/Camera.py:565-581`.
    """
    center = jnp.zeros((1, 1, 3))
    center_pred = cam2world(center, pose)[:, 0]
    center_GT = cam2world(center, pose_GT)[:, 0]
    sim3 = procrustes_analysis(center_GT, center_pred)
    center_aligned = (center_pred - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
    R_aligned = pose[..., :3] @ sim3.R.T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return lie.pose_from_Rt(R_aligned, t_aligned), sim3


def evaluate_camera_alignment(pose_aligned, pose_GT):
    """Rotation (rad), translation-norm errors and ATE between c2w poses.

    Ref `pipelines/Camera.py:609-620`.
    """
    R_aligned, t_aligned = pose_aligned[..., :3], pose_aligned[..., 3:]
    R_GT, t_GT = pose_GT[..., :3], pose_GT[..., 3:]
    R_error = lie.rotation_distance(R_aligned, R_GT)
    t_error = jnp.linalg.norm((t_aligned - t_GT)[..., 0], axis=-1)
    ate = jnp.sqrt(((t_aligned - t_GT)[..., 0] ** 2).sum(axis=-1).mean())
    return R_error, t_error, ate


def convert_NDC(center, ray, intr, near=1.0):
    """Reparametrize rays into normalized device coordinates
    (ref `camera.py:268-285`; +z-facing convention)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = intr[:, 0, 0] / intr[:, 0, 2]
    scale_y = intr[:, 1, 1] / intr[:, 1, 2]
    cnx = scale_x[:, None] * (cx / cz)
    cny = scale_y[:, None] * (cy / cz)
    cnz = 1 - 2 * near / cz
    rnx = scale_x[:, None] * (rx / rz - cx / cz)
    rny = scale_y[:, None] * (ry / rz - cy / cz)
    rnz = 2 * near / cz
    center_ndc = jnp.stack([cnx, cny, cnz], axis=-1)
    ray_ndc = jnp.stack([rnx, rny, rnz], axis=-1)
    return center_ndc, ray_ndc


def get_novel_view_poses(pose_anchor, N=60, scale=1.0):
    """Circular oscillating novel-view trajectory (ref `camera.py:313-323`)."""
    theta = jnp.arange(N) / N * 2 * jnp.pi
    R_x = lie.angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.008), "X")
    R_y = lie.angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.008), "Y")
    pose_rot = lie.pose_from_Rt(R=R_y @ R_x)
    pose_shift = lie.pose_from_Rt(t=jnp.array([0, 0, -0.5 * scale]))
    pose_shift2 = lie.pose_from_Rt(t=jnp.array([0, 0, 0.2 * scale]))
    pose_oscil = lie.pose_compose([pose_shift, pose_rot, pose_shift2])
    return lie.pose_compose([pose_oscil, pose_anchor[None]])
