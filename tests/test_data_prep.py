"""Dataset loader + preparation round trip on a disk-written DTU-format scene."""
import os
import subprocess
import sys

import numpy as np
import pytest

from level_s2fm_tpu.config import Opt
from level_s2fm_tpu.data import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dtu_scene(tmp_path_factory):
    """Write the synthetic sphere scene to disk in DTU layout."""
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("dtu_root")
    scene_dir = root / "scanX"
    img_dir = scene_dir / "images"
    img_dir.mkdir(parents=True)
    scene = synthetic.make_scene(n_views=3, H=96, W=96, n_points=400, seed=1)
    cams = {}
    for i in range(3):
        imageio.imwrite(img_dir / f"{i:06d}.png",
                        (scene.images[i] * 255).astype(np.uint8))
        # P = K @ w2c ; store as world_mat with identity scale_mat
        K4 = np.eye(4, dtype=np.float32)
        K4[:3, :3] = scene.intrs[i]
        W4 = np.eye(4, dtype=np.float32)
        W4[:3, :4] = scene.poses_gt[i]
        cams[f"world_mat_{i}"] = K4 @ W4
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
    np.savez(scene_dir / "cameras.npz", **cams)
    return root, scene


def test_dtu_loader_roundtrip(dtu_scene):
    root, scene = dtu_scene
    from level_s2fm_tpu.data import loaders
    opt = Opt({"data": {"root": str(root), "scene": "scanX", "dataset": "DTU",
                        "image_size": [96, 96]}})
    # raw DTU is 1200x1600; our synthetic is 96x96 -> override factors via
    # monkeypatched raw size by loading at stored resolution
    loaders._raw_size_orig = loaders._raw_size
    try:
        loaders._raw_size = lambda d, opt=None: (96, 96)
        out = loaders.load_dtu(opt)
    finally:
        loaders._raw_size = loaders._raw_size_orig
    assert out["images"].shape == (3, 96, 96, 3)
    np.testing.assert_allclose(out["intrs"][0], scene.intrs[0], atol=1e-2)
    # recovered w2c pose should match GT up to numerical precision
    np.testing.assert_allclose(out["poses_gt"][0], scene.poses_gt[0], atol=1e-3)


def test_sift_preparation_and_prepared_load(dtu_scene):
    root, scene = dtu_scene
    scene_dir = os.path.join(str(root), "scanX")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, os.path.join(REPO, "preparation", "main.py"),
                        "--data", str(root), "--scene", "scanX",
                        "--backend", "sift", "--max_kypts", "512"],
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(scene_dir, "n_views.npy"))
    assert os.path.exists(os.path.join(scene_dir, "pose_graph.npy"))

    n_views = np.load(os.path.join(scene_dir, "n_views.npy"), allow_pickle=True)
    assert len(n_views) == 3
    for d in n_views:
        assert d["kypts"].shape[1] == 2
        assert len(d["indxes"]) == 2          # n_views - 1 match lists
        assert len(d["mask"]) == 2
    pg = np.load(os.path.join(scene_dir, "pose_graph.npy"), allow_pickle=True)
    assert sorted(pg.tolist()) == [0, 1, 2]

    # symmetric match lists (pipeline relies on it)
    m01 = n_views[0]["indxes"][0]   # image 0 vs image 1
    m10 = n_views[1]["indxes"][0]   # image 1 vs image 0
    assert m01.shape == m10.shape
    np.testing.assert_array_equal(m01[:, 0], m10[:, 1])


def test_parse_mapper_log_fixture():
    """Mapper-log parse recovers the true registration order (init pair
    first, then Registering lines, dedup first-wins)."""
    import sys, os
    sys.path.insert(0, os.path.join(REPO, "preparation"))
    from main import parse_mapper_log
    log = """
==============================================================================
Finding good initial image pair
==============================================================================
  Initializing with image pair #7 and #3
==============================================================================
Registering image #5 (3)
==============================================================================
  => Image sees 182 / 257 points
Registering image #1 (4)
  => Image sees 120 / 200 points
Retriangulation
Registering image #5 (4)
Registering image #9 (5)
"""
    assert parse_mapper_log(log) == [7, 3, 5, 1, 9]


def test_synthetic_texture_is_sift_friendly():
    """Regression guard: the procedural texture must keep its contrast in
    GRAYSCALE (SIFT's detection plane). Per-channel-independent noise
    cancels ~1/sqrt(3) in gray and starves the detector (measured: 13 vs
    ~400 keypoints at 320px) — which silently breaks the whole
    preparation pipeline on freshly generated scenes."""
    cv2 = pytest.importorskip("cv2")
    from level_s2fm_tpu.data import synthetic
    scene = synthetic.make_scene(n_views=1, H=320, W=320, n_points=8,
                                 seed=3, detail=0.5)
    img = (np.clip(scene.images[0], 0, 1) * 255).astype(np.uint8)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    kp = cv2.SIFT_create().detect(gray, None)
    assert len(kp) >= 150, f"texture regressed: only {len(kp)} SIFT keypoints"
