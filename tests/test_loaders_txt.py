"""ETH3D/BlendedMVS txt-layout loader tests on a disk fixture."""
import os

import numpy as np
import pytest

from level_s2fm_tpu.config import Opt
from level_s2fm_tpu.data import loaders, synthetic


@pytest.fixture(scope="module")
def txt_scene(tmp_path_factory):
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("eth_root")
    scene_dir = root / "courty"
    (scene_dir / "images").mkdir(parents=True)
    (scene_dir / "pose").mkdir()
    scene = synthetic.make_scene(n_views=3, H=48, W=48, n_points=64, seed=2)
    np.savetxt(scene_dir / "intrinsics.txt",
               np.block([[scene.intrs[0], np.zeros((3, 1))],
                         [np.zeros((1, 3)), np.ones((1, 1))]]))
    for i in range(3):
        imageio.imwrite(scene_dir / "images" / f"{i:04d}.png",
                        (scene.images[i] * 255).astype(np.uint8))
        c2w = np.eye(4, dtype=np.float32)
        R = scene.poses_gt[i][:, :3]
        t = scene.poses_gt[i][:, 3]
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        np.savetxt(scene_dir / "pose" / f"{i:04d}.txt", c2w)
    return root, scene


def _opt(root, dataset):
    return Opt({"data": {"root": str(root), "scene": "courty",
                         "dataset": dataset, "image_size": [48, 48]}})


def test_eth3d_loader(txt_scene, monkeypatch):
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    out = loaders.load_eth3d(_opt(root, "ETH3D"))
    assert out["images"].shape == (3, 48, 48, 3)
    np.testing.assert_allclose(out["intrs"][0], scene.intrs[0], atol=1e-4)
    np.testing.assert_allclose(out["poses_gt"][1], scene.poses_gt[1], atol=1e-4)


def test_blendedmvs_loader_bg_fixup(txt_scene, monkeypatch):
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    out = loaders.load_blendedmvs(_opt(root, "BlendedMVS"))
    # black background pixels lifted to white
    img = out["images"][0]
    dark_src = np.all(scene.images[0] <= 0.1, axis=-1)
    assert img[dark_src].min() >= 0.9


def test_unknown_dataset_raises(txt_scene):
    root, _ = txt_scene
    with pytest.raises(ValueError):
        loaders.load_prepared_scene(_opt(root, "nope"))
