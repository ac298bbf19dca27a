"""Tests for coordinate transforms, rays, and Procrustes alignment."""
import jax.numpy as jnp
import numpy as np

from level_s2fm_tpu.geometry import lie, transforms as T


def make_pose(rng, n=1):
    w = rng.normal(size=(n, 3)) * 0.4
    u = rng.normal(size=(n, 3))
    return lie.se3_to_SE3(jnp.asarray(np.concatenate([w, u], -1), dtype=jnp.float32))


def test_world_cam_roundtrip(rng):
    pose = make_pose(rng)
    X = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    Xc = T.world2cam(X, pose)
    Xw = T.cam2world(Xc, pose)
    np.testing.assert_allclose(np.asarray(Xw), np.asarray(X), atol=1e-5)


def test_img_cam_roundtrip(rng):
    K = jnp.asarray([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]])
    X = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32)) + 5.0
    uvw = T.cam2img(X, K)
    X2 = T.img2cam(uvw, K)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), atol=1e-4)


def test_rays_reproject_to_pixels(rng):
    """center + d*ray must project back to the generating pixel."""
    H, W = 12, 16
    pose = make_pose(rng)
    K = jnp.asarray([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
    grid = T.mesh_grid(H, W)
    center, ray = T.get_center_and_ray(pose, K, grid)
    d = jnp.asarray(rng.uniform(0.5, 3.0, size=(1, H * W, 1)).astype(np.float32))
    pts = T.get_3D_points_from_depth(center, ray, d)
    uv, depth = T.project_points(pts, pose, K[None])
    np.testing.assert_allclose(np.asarray(uv)[0], np.asarray(grid), atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth)[0, :, 0], np.asarray(d)[0, :, 0], atol=1e-4)


def test_procrustes_recovers_sim3(rng):
    X0 = rng.normal(size=(64, 3)).astype(np.float32)
    R = np.asarray(lie.so3_to_SO3(jnp.asarray(rng.normal(size=(3,)).astype(np.float32))))
    s, t = 2.5, rng.normal(size=(3,)).astype(np.float32)
    X1 = (X0 @ R.T) * s + t
    sim3 = T.procrustes_analysis(jnp.asarray(X0), jnp.asarray(X1))
    X1to0 = (jnp.asarray(X1) - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
    np.testing.assert_allclose(np.asarray(X1to0), X0, atol=1e-4)


def test_prealign_and_eval_zero_error(rng):
    pose = make_pose(rng, n=5)
    aligned, _ = T.prealign_cameras(pose, pose)
    R_err, t_err, ate = T.evaluate_camera_alignment(
        lie.pose_invert(aligned), lie.pose_invert(pose))
    assert float(jnp.max(R_err)) < 1e-3
    assert float(jnp.max(t_err)) < 1e-3
    assert float(ate) < 1e-3


def test_novel_view_poses_shape(rng):
    anchor = make_pose(rng)[0]
    poses = T.get_novel_view_poses(anchor, N=10, scale=0.1)
    assert poses.shape == (10, 3, 4)
    R = np.asarray(poses[..., :3])
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
