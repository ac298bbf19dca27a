"""ETH3D/BlendedMVS txt-layout loader tests on a disk fixture."""
import os

import numpy as np
import pytest

from level_s2fm_tpu.config import Opt
from level_s2fm_tpu.data import loaders, synthetic


@pytest.fixture(scope="module")
def txt_scene(tmp_path_factory):
    """Two scene dirs: `courty` stores c2w pose txts (BlendedMVS
    convention, ref `data/BlendedMVS.py:49`); `courty_w2c` stores w2c
    pose txts (ETH3D convention — the reference INVERTS the file,
    `data/ETH3D.py:50`) plus a `.cam` colmap-init dir covering only the
    first two frames (ref `data/ETH3D.py:55-69`)."""
    import imageio.v2 as imageio
    root = tmp_path_factory.mktemp("eth_root")
    scene = synthetic.make_scene(n_views=3, H=48, W=48, n_points=64, seed=2)
    K4 = np.block([[scene.intrs[0], np.zeros((3, 1))],
                   [np.zeros((1, 3)), np.ones((1, 1))]])
    for name, file_is_w2c in (("courty", False), ("courty_w2c", True)):
        scene_dir = root / name
        (scene_dir / "images").mkdir(parents=True)
        (scene_dir / "pose").mkdir()
        np.savetxt(scene_dir / "intrinsics.txt", K4)
        for i in range(3):
            imageio.imwrite(scene_dir / "images" / f"{i:04d}.png",
                            (scene.images[i] * 255).astype(np.uint8))
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, :4] = scene.poses_gt[i]
            c2w = np.eye(4, dtype=np.float32)
            R, t = scene.poses_gt[i][:, :3], scene.poses_gt[i][:, 3]
            c2w[:3, :3] = R.T
            c2w[:3, 3] = -R.T @ t
            np.savetxt(scene_dir / "pose" / f"{i:04d}.txt",
                       w2c if file_is_w2c else c2w)
    # .cam colmap-init files for frames 0,1 only: "t(3) R(9 row-major)" w2c
    cam_dir = root / "courty_w2c" / "cams"
    cam_dir.mkdir()
    for i in range(2):
        R, t = scene.poses_gt[i][:, :3], scene.poses_gt[i][:, 3]
        vals = list(t.ravel()) + list(R.ravel())
        (cam_dir / f"{i:04d}.cam").write_text(
            " ".join(f"{v:.9f}" for v in vals) + "\n0 0 0\n")
    return root, scene


def _opt(root, dataset, scene_name="courty"):
    return Opt({"data": {"root": str(root), "scene": scene_name,
                         "dataset": dataset, "image_size": [48, 48]}})


def test_eth3d_loader(txt_scene, monkeypatch):
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    out = loaders.load_eth3d(_opt(root, "ETH3D", "courty_w2c"))
    assert out["images"].shape == (3, 48, 48, 3)
    np.testing.assert_allclose(out["intrs"][0], scene.intrs[0], atol=1e-4)
    np.testing.assert_allclose(out["poses_gt"][1], scene.poses_gt[1], atol=1e-4)


def test_eth3d_cam_init_poses(txt_scene, monkeypatch):
    """data.init loads poses from .cam files and drops frames without one
    (ref `data/ETH3D.py:55-69`)."""
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    opt = _opt(root, "ETH3D", "courty_w2c")
    opt.data.init = True
    opt.data.cam_dir = str(root / "courty_w2c" / "cams")
    out = loaders.load_eth3d(opt)
    assert out["images"].shape[0] == 2          # frame 2 has no .cam
    for i in range(2):
        np.testing.assert_allclose(out["poses_gt"][i], scene.poses_gt[i],
                                   atol=1e-5)


def test_eth3d_recenter_rescale(txt_scene, monkeypatch):
    """data.center recenters camera centers to their mean and rescales
    the farthest to rad/1.1 (ref `data/ETH3D.py:80-91`)."""
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    opt = _opt(root, "ETH3D", "courty_w2c")
    opt.data.center = True
    opt.rad = 3.0
    out = loaders.load_eth3d(opt)
    # camera centers from returned w2c: c = -R^T t
    centers = np.stack([-p[:3, :3].T @ p[:3, 3] for p in out["poses_gt"]])
    np.testing.assert_allclose(centers.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(centers, axis=-1).max(),
                               3.0 / 1.1, rtol=1e-5)
    # rotations untouched by the similarity rescale
    np.testing.assert_allclose(out["poses_gt"][1][:3, :3],
                               scene.poses_gt[1][:3, :3], atol=1e-4)


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


# ------------------------------------------------- crop/augment preprocessing
# Reference `data/base.py:74-117`: color jitter -> center crop -> resize,
# intrinsics shifted by the crop and rescaled by the resize. Shipped
# off-by-default exactly as the reference does (`options/base.yaml:23-24`).

def test_center_crop_loader_intrinsics(txt_scene, monkeypatch):
    from level_s2fm_tpu.data import base as dbase
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    opt = _opt(root, "ETH3D")
    opt.data.image_size = [24, 24]
    opt.data.center_crop = 0.5
    out = loaders.load_eth3d(opt)
    assert out["images"].shape == (3, 24, 24, 3)
    # crop keeps the central 24x24 of the 48x48 raw frame, then resizes
    # 24->24 (identity): fx unchanged, principal point shifted by 12
    K_ref = scene.intrs[0].copy()
    K_ref[0, 2] -= 12.0
    K_ref[1, 2] -= 12.0
    np.testing.assert_allclose(out["intrs"][0], K_ref, atol=1e-4)
    # the cropped image is the center of the raw one
    np.testing.assert_allclose(out["images"][0], scene.images[0][12:36, 12:36],
                               atol=2e-2)


def test_color_jitter_ranges():
    from level_s2fm_tpu.data import base as dbase
    rng = np.random.default_rng(0)
    img = np.linspace(0, 1, 48 * 48 * 3, dtype=np.float32).reshape(48, 48, 3)
    out = dbase.color_jitter(img, rng, brightness=0.4, contrast=0.4,
                             saturation=0.4, hue=0.1)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)  # jitter actually applied
    # zero-strength jitter is the identity
    out0 = dbase.color_jitter(img, rng)
    np.testing.assert_allclose(out0, img)


def test_augment_loader_is_seeded(txt_scene, monkeypatch):
    root, scene = txt_scene
    monkeypatch.setattr(loaders, "_raw_size", lambda d, opt=None: (48, 48))
    opt = _opt(root, "ETH3D")
    opt.data.augment = {"brightness": 0.3, "contrast": 0.2}
    opt.seed = 7
    a = loaders.load_eth3d(opt)
    b = loaders.load_eth3d(opt)
    np.testing.assert_allclose(a["images"], b["images"])  # same seed, same draw
    assert not np.allclose(a["images"], scene.images[:3])
    # intrinsics untouched by photometric-only augmentation
    np.testing.assert_allclose(a["intrs"][0], scene.intrs[0], atol=1e-4)


def test_center_crop_rejected_with_prepared_keypoints(txt_scene):
    root, _ = txt_scene
    opt = _opt(root, "ETH3D")
    opt.data.center_crop = 0.5
    with pytest.raises(ValueError, match="center_crop"):
        loaders.load_prepared_scene(opt)
