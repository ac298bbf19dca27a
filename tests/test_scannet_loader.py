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
