"""2D/3D visualization helpers (utils/vis.py) + TB image logging."""
import os

import numpy as np

from level_s2fm_tpu.utils import vis
from level_s2fm_tpu.utils.obs import MetricRecorder


def _pose(Rz=0.0, t=(0, 0, 2.0)):
    c, s = np.cos(Rz), np.sin(Rz)
    R = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)
    return np.concatenate([R, np.asarray(t, np.float64)[:, None]], 1)


def test_camera_wireframe_geometry():
    pose = _pose(0.3, (0.1, -0.2, 1.5))
    w = vis.get_camera_wireframe(pose, depth=0.2)
    assert w.shape == (10, 3)
    C = vis.camera_centers(pose[None])[0]
    # the apex (camera center) appears at strip positions 0,3,6,9
    for i in (0, 3, 6, 9):
        np.testing.assert_allclose(w[i], C, atol=1e-12)
    # corners sit at depth 0.2 in the camera frame
    R, t = pose[:, :3], pose[:, 3]
    for i in (1, 2, 4, 5, 7, 8):
        np.testing.assert_allclose(R @ w[i] + t, np.append(
            (R @ w[i] + t)[:2], 0.2), atol=1e-12)


def test_plot_poses_wireframes(tmp_path):
    poses = np.stack([_pose(0.0), _pose(0.5, (0.3, 0, 2.0))])
    gt = np.stack([_pose(0.02), _pose(0.52, (0.31, 0, 2.0))])
    out = os.path.join(str(tmp_path), "poses.png")
    vis.plot_poses(poses, gt, store_path=out)
    assert os.path.getsize(out) > 1000


def test_colorize_and_dump(tmp_path):
    depth = np.linspace(0, 1, 64).reshape(8, 8)
    depth[0, 0] = np.nan
    rgb = vis.colorize(depth)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.float32
    assert np.isfinite(rgb).all()
    assert (rgb[0, 0] == 0).all()  # non-finite -> black
    # batch dump of scalar maps
    paths = vis.dump_images(str(tmp_path), "depth",
                            np.stack([depth, depth]), cmap="magma")
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_tb_log_image(tmp_path):
    tb_dir = os.path.join(str(tmp_path), "tb")
    rec = MetricRecorder(tb_dir=tb_dir)
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(np.float32)
    rec.log_image(1, "render/rgb", img)
    if rec._tb is not None:  # SummaryWriter ships in the image
        files = os.listdir(tb_dir)
        assert any("tfevents" in f for f in files)
