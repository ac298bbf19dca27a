"""Unit tests for Lie/pose math against scipy.spatial.transform oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from level_s2fm_tpu.geometry import lie


def random_se3(rng, n=8, scale=1.0):
    w = rng.normal(size=(n, 3)) * scale
    u = rng.normal(size=(n, 3))
    return np.concatenate([w, u], axis=-1).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32)
    R = np.asarray(lie.so3_to_SO3(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32) * 0.8
    R = lie.so3_to_SO3(jnp.asarray(w))
    w2 = np.asarray(lie.SO3_to_so3(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_small_angle(rng):
    w = rng.normal(size=(4, 3)).astype(np.float32) * 1e-8
    R = np.asarray(lie.so3_to_SO3(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    wu = random_se3(rng, scale=0.7)
    Rt = lie.se3_to_SE3(jnp.asarray(wu))
    wu2 = np.asarray(lie.SE3_to_se3(Rt))
    np.testing.assert_allclose(wu2, wu, atol=1e-4)


def test_se3_exp_is_rigid(rng):
    wu = random_se3(rng)
    Rt = np.asarray(lie.se3_to_SE3(jnp.asarray(wu)))
    R = Rt[..., :3]
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_pose_invert_compose(rng):
    wu = random_se3(rng)
    P = lie.se3_to_SE3(jnp.asarray(wu))
    I = lie.pose_compose_pair(P, lie.pose_invert(P))
    np.testing.assert_allclose(np.asarray(I[..., :3]),
                               np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(I[..., 3]), np.zeros((8, 3)), atol=1e-5)


def test_quaternion_matches_scipy(rng):
    w = rng.normal(size=(8, 3)).astype(np.float32)
    R_ref = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(lie.R_to_q(jnp.asarray(R_ref)))
    # scipy uses (x,y,z,w) ordering
    q_ref = Rotation.from_rotvec(w).as_quat()
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=-1)
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-4)
    R2 = np.asarray(lie.q_to_R(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R_ref, atol=1e-5)


def test_rotation_distance(rng):
    w = rng.normal(size=(8, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * 0.3
    R1 = lie.so3_to_SO3(jnp.zeros((8, 3), jnp.float32))
    R2 = lie.so3_to_SO3(jnp.asarray(w, dtype=jnp.float32))
    ang = np.asarray(lie.rotation_distance(R1, R2))
    np.testing.assert_allclose(ang, 0.3, atol=1e-4)


def test_se3_grad_flows(rng):
    wu = jnp.asarray(random_se3(rng, n=1))

    def f(x):
        return jnp.sum(lie.se3_to_SE3(x) ** 2)

    g = jax.grad(f)(wu)
    assert np.isfinite(np.asarray(g)).all()


def test_slerp_endpoints(rng):
    wu = random_se3(rng, n=2)
    P = np.asarray(lie.se3_to_SE3(jnp.asarray(wu)))
    p_half = np.asarray(lie.slerp_pose(jnp.asarray(P[0]), jnp.asarray(P[1]), 0.0))
    np.testing.assert_allclose(p_half, P[0], atol=1e-5)
    p1 = np.asarray(lie.slerp_pose(jnp.asarray(P[0]), jnp.asarray(P[1]), 1.0))
    np.testing.assert_allclose(p1, P[1], atol=1e-5)


@pytest.mark.parametrize("axis", ["X", "Y", "Z"])
def test_angle_to_rotation_matrix(axis, rng):
    a = jnp.asarray(rng.normal(size=(1,)).astype(np.float32))
    M = np.asarray(lie.angle_to_rotation_matrix(a, axis))[0]
    assert np.allclose(M @ M.T, np.eye(3), atol=1e-5)
    assert np.allclose(np.linalg.det(M), 1.0, atol=1e-5)
