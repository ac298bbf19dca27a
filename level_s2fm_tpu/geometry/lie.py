"""Lie-group camera pose math in pure JAX.

Functional equivalents of the reference's pose utilities
(`utils/camera.py:13-197`): [R|t] pose composition/inversion, so3/SO3 and
se3/SE3 exp/log maps, and quaternion ops. All functions are batched over
leading dims, jit/grad-safe (closed-form with small-angle-safe Taylor
branches via jnp.where rather than data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp

# ----------------------------------------------------------------------------- poses


def pose_from_Rt(R=None, t=None):
    """Build [...,3,4] pose from R [...,3,3] and/or t [...,3]."""
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_invert(pose):
    """Invert a [...,3,4] rigid pose (R orthonormal)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -(R_inv @ t)[..., 0]
    return pose_from_Rt(R_inv, t_inv)


def pose_compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return pose_from_Rt(R_new, t_new)


def pose_compose(pose_list):
    p = pose_list[0]
    for q in pose_list[1:]:
        p = pose_compose_pair(p, q)
    return p


# ----------------------------------------------------------------------------- so3/se3

def skew(w):
    """[...,3] -> [...,3,3] skew-symmetric matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack([
        jnp.stack([O, -w2, w1], axis=-1),
        jnp.stack([w2, O, -w0], axis=-1),
        jnp.stack([-w1, w0, O], axis=-1),
    ], axis=-2)


# The three standard exp-map coefficient functions, written closed-form
# with a where-protected small-angle series (NOT the reference's unrolled
# Taylor loops): A = sin(x)/x, B = (1-cos x)/x^2, C = (x-sin x)/x^3.
# The substituted operand inside jnp.where keeps grads (and second-order
# grads, needed when poses sit inside rendered losses) NaN-free at x=0.

_SMALL = 1e-4


def _sinc(x):
    safe = jnp.where(jnp.abs(x) < _SMALL, jnp.ones_like(x), x)
    return jnp.where(jnp.abs(x) < _SMALL, 1.0 - x * x / 6.0,
                     jnp.sin(safe) / safe)


def _cosc(x):
    safe = jnp.where(jnp.abs(x) < _SMALL, jnp.ones_like(x), x)
    return jnp.where(jnp.abs(x) < _SMALL, 0.5 - x * x / 24.0,
                     (1.0 - jnp.cos(safe)) / (safe * safe))


def _sinc3(x):
    safe = jnp.where(jnp.abs(x) < _SMALL, jnp.ones_like(x), x)
    return jnp.where(jnp.abs(x) < _SMALL, 1.0 / 6.0 - x * x / 120.0,
                     (safe - jnp.sin(safe)) / (safe * safe * safe))


def so3_to_SO3(w):
    """Exponential map so(3) [...,3] -> SO(3) [...,3,3] (Rodrigues)."""
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    return I + _sinc(theta) * wx + _cosc(theta) * (wx @ wx)


def SO3_to_so3(R, eps=1e-7):
    """Log map SO(3) -> so(3): w = theta / (2 sin theta) * vee(R - R^T).

    The arccos argument is clipped to (-1+eps, 1-eps), so theta stays in
    the open interval (0, pi) and the division is well-posed (near-pi
    rotations saturate rather than wrap, matching the reference's
    behavior under its clip)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    scale = 0.5 / jnp.maximum(_sinc(theta), 1e-8)
    return scale[..., None] * v


def se3_to_SE3(wu):
    """Exp map se(3) [...,6] (w|u) -> [...,3,4] pose: [exp(w) | V u]."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    R = I + _sinc(theta) * wx + _cosc(theta) * (wx @ wx)
    V = I + _cosc(theta) * wx + _sinc3(theta) * (wx @ wx)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SE3_to_se3(Rt, eps=1e-8):
    """Log map [...,3,4] pose -> se(3) [...,6] via the closed-form V^-1 =
    I - wx/2 + (1 - A/(2B)) / theta^2 * wx^2."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    coef = (1 - _sinc(theta) / (2 * _cosc(theta))) / (theta ** 2 + eps)
    invV = I - 0.5 * wx + coef * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# ----------------------------------------------------------------------------- quaternions

def q_to_R(q):
    """Quaternion (w,x,y,z) [...,4] -> rotation matrix [...,3,3]."""
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (qc ** 2 + qd ** 2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], axis=-1),
        jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb ** 2 + qd ** 2), 2 * (qc * qd - qa * qb)], axis=-1),
        jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb ** 2 + qc ** 2)], axis=-1),
    ], axis=-2)


def R_to_q(R, eps=1e-8):
    """Rotation matrix -> quaternion (w,x,y,z); principal branch."""
    R00, R11, R22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    t = R00 + R11 + R22
    r = jnp.sqrt(jnp.clip(1 + t, eps, None))
    qa = 0.5 * r
    qb = jnp.sign(R[..., 2, 1] - R[..., 1, 2]) * 0.5 * jnp.sqrt(jnp.clip(1 + R00 - R11 - R22, eps, None))
    qc = jnp.sign(R[..., 0, 2] - R[..., 2, 0]) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 + R11 - R22, eps, None))
    qd = jnp.sign(R[..., 1, 0] - R[..., 0, 1]) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 - R11 + R22, eps, None))
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q):
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    norm2 = jnp.sum(q * q, axis=-1, keepdims=True)
    return jnp.stack([qa, -qb, -qc, -qd], axis=-1) / norm2


def q_product(q1, q2):
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
        a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
        a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
        a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
    ], axis=-1)


def slerp_pose(pose0, pose1, t):
    """Spherical interpolation between two [3,4] poses (ref `LevelS2fM.py:24-31`)."""
    q0 = R_to_q(pose0[:3, :3])
    q1 = R_to_q(pose1[:3, :3])
    dot = jnp.sum(q0 * q1)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    w0 = jnp.where(sin_theta > 1e-6, jnp.sin((1 - t) * theta) / jnp.maximum(sin_theta, 1e-12), 1 - t)
    w1 = jnp.where(sin_theta > 1e-6, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12), t)
    q = w0 * q0 + w1 * q1
    q = q / jnp.linalg.norm(q)
    R = q_to_R(q)
    T = (1 - t) * pose0[:3, 3] + t * pose1[:3, 3]
    return jnp.concatenate([R, T[:, None]], axis=1)


def angle_to_rotation_matrix(a, axis: str):
    """Euler-angle rotation about axis 'X'|'Y'|'Z' (ref `camera.py:219-228`)."""
    a = jnp.asarray(a, jnp.float32)
    roll = dict(X=1, Y=2, Z=0)[axis]
    O = jnp.zeros_like(a)
    I = jnp.ones_like(a)
    M = jnp.stack([
        jnp.stack([jnp.cos(a), -jnp.sin(a), O], axis=-1),
        jnp.stack([jnp.sin(a), jnp.cos(a), O], axis=-1),
        jnp.stack([O, O, I], axis=-1),
    ], axis=-2)
    return jnp.roll(M, (roll, roll), axis=(-2, -1))


def rotation_distance(R1, R2, eps=1e-7):
    """Geodesic angle between rotations (radians)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def translation_angle_deg(t1, t2):
    """Angle (deg) between two translation directions (ref `camera.py:203-205`)."""
    cosang = jnp.sum(t1 * t2) / (jnp.linalg.norm(t1) * jnp.linalg.norm(t2))
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0)) / jnp.pi * 180.0
