"""End-to-end incremental SfM on the synthetic sphere scene.

The closest analogue of the reference's de-facto smoke test (the two-view
init notebook, SURVEY.md §4) — but automated, with numeric oracles:
triangulation count, decreasing reprojection error, relative pose error.
Budgets are tiny so this stays a minutes-scale CPU test.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from level_s2fm_tpu.config import build_options
from level_s2fm_tpu.data import synthetic
from level_s2fm_tpu.geometry import lie
from level_s2fm_tpu.sfm.pipeline import LevelSfM

ARGS = [
    "--yaml=configs/synthetic.yaml",
    "--optim.init.max_iter=40",
    "--optim.geoinit.max_iter=4",
    "--optim.ba.max_iter=25",
    "--optim.refine.max_iter=10",
    "--sfm_mode=fast",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    opt = build_options(ARGS + [f"--output_root={out}"])
    scene = synthetic.make_scene(n_views=3, H=64, W=64, n_points=256, seed=0)
    var = synthetic.scene_to_var(scene)
    m = LevelSfM(opt, seed=0)
    m.load_data(var)
    ok = m.train(max_views=3, verbose=False)
    return m, scene, ok


def rel_rot_err_deg(m, scene, i, j):
    se3 = m.camera_set.all_se3()
    poses = np.asarray(lie.se3_to_SE3(jnp.asarray(se3)))
    gt = scene.poses_gt[m.camera_set.cam_ids]
    rel_est = lie.pose_compose_pair(lie.pose_invert(jnp.asarray(poses[i])),
                                    jnp.asarray(poses[j]))
    rel_gt = lie.pose_compose_pair(lie.pose_invert(jnp.asarray(gt[i])),
                                   jnp.asarray(gt[j]))
    return float(np.rad2deg(np.asarray(
        lie.rotation_distance(rel_gt[:3, :3], rel_est[:3, :3]))))


def test_pipeline_completes(trained):
    m, scene, ok = trained
    assert ok
    assert m.camera_set.cam_ids == [0, 1, 2]


def test_triangulated_points(trained):
    m, scene, ok = trained
    assert len(m.point_set) > 30
    # points should lie near the GT sphere surface (radius 0.5) after
    # scale-consistent init; generous tolerance at tiny iteration budget
    r = np.linalg.norm(m.point_set.all_xyzs(), axis=-1)
    assert np.median(np.abs(r - 0.5)) < 0.15


def test_relative_poses(trained):
    m, scene, ok = trained
    assert rel_rot_err_deg(m, scene, 0, 1) < 5.0
    assert rel_rot_err_deg(m, scene, 0, 2) < 8.0


def test_checkpoint_roundtrip(trained, tmp_path):
    m, scene, ok = trained
    from level_s2fm_tpu.utils import checkpoint as ck
    path = str(tmp_path / "model.ckpt")
    ck.save_checkpoint_sfm(path, m.params, m.camera_set, m.point_set, it=7)
    params, cam_info, pts_info, it = ck.restore_checkpoint_sfm(path)
    assert it == 7
    assert cam_info["cam_id"] == m.camera_set.cam_ids
    np.testing.assert_allclose(pts_info["xyzs"], m.point_set.all_xyzs())
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(m.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
