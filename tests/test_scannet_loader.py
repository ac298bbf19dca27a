"""ScanNet-layout loader test (color/ + intrinsic/ + pose/ dirs)."""
import numpy as np
import pytest

from level_s2fm_tpu.config import Opt
from level_s2fm_tpu.data import loaders, synthetic


@pytest.fixture(scope="module")
def scannet_scene(tmp_path_factory):
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("sn_root")
    scene_dir = root / "scene0000_00"
    (scene_dir / "color").mkdir(parents=True)
    (scene_dir / "pose").mkdir()
    (scene_dir / "intrinsic").mkdir()
    (scene_dir / "depth").mkdir()
    scene = synthetic.make_scene(n_views=6, H=48, W=48, n_points=64, seed=3)
    K4 = np.eye(4)
    K4[:3, :3] = scene.intrs[0]
    np.savetxt(scene_dir / "intrinsic" / "intrinsic_color.txt", K4)
    for i in range(6):
        imageio.imwrite(scene_dir / "color" / f"{i}.jpg",
                        (scene.images[i] * 255).astype(np.uint8))
        c2w = np.eye(4, dtype=np.float32)
        R = scene.poses_gt[i][:, :3]
        t = scene.poses_gt[i][:, 3]
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        np.savetxt(scene_dir / "pose" / f"{i}.txt", c2w)
        # uint16 mm depth, value = (1000 + 100*i) mm => (1.0 + 0.1*i) m
        depth_mm = np.full((48, 48), 1000 + 100 * i, np.uint16)
        depth_mm[0, 0] = 0  # missing-measurement pixel
        imageio.imwrite(scene_dir / "depth" / f"{i}.png", depth_mm)
    return root, scene


def test_scannet_loader_subsampling(scannet_scene, monkeypatch):
    root, scene = scannet_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    opt = Opt({"data": {"root": str(root), "scene": "scene0000_00",
                        "dataset": "scannet", "image_size": [48, 48],
                        "freq_frame": 2}})
    out = loaders.load_scannet(opt)
    assert out["images"].shape[0] == 3          # 6 frames / freq 2
    np.testing.assert_allclose(out["intrs"][0], scene.intrs[0], atol=1e-4)
    # frames 0,2,4 retained (sorted names 0,1,2,3,4,5)
    np.testing.assert_allclose(out["poses_gt"][1], scene.poses_gt[2], atol=1e-4)
    # gt depth carried, uint16 mm -> meters, subsampled in lockstep
    # (ref data/scannet.py:76)
    assert out["depth_gt"].shape == (3, 48, 48)
    np.testing.assert_allclose(out["depth_gt"][1][1, 1], 1.2, atol=1e-6)
    assert out["depth_gt"][0][0, 0] == 0.0      # missing pixel stays 0


def test_scannet_recenter_rescale(scannet_scene, monkeypatch):
    """data.center support on ScanNet (ref data/scannet.py:87-98)."""
    root, scene = scannet_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    opt = Opt({"rad": 2.0,
               "data": {"root": str(root), "scene": "scene0000_00",
                        "dataset": "scannet", "image_size": [48, 48],
                        "center": True}})
    out = loaders.load_scannet(opt)
    centers = np.stack([-p[:3, :3].T @ p[:3, 3] for p in out["poses_gt"]])
    np.testing.assert_allclose(centers.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1).max(),
                               2.0 / 1.1, rtol=1e-5)
    # depth intentionally NOT rescaled (reference parity, scannet.py:110-117)
    np.testing.assert_allclose(out["depth_gt"][0][1, 1], 1.0, atol=1e-6)
