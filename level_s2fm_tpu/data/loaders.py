"""Per-dataset scene loaders + prepared-matches plumbing.

Covers the reference's four dataset formats (SURVEY.md §2.1 L6):
  * DTU (`data/DTU.py`): `cameras.npz` with scale_mat_%d/world_mat_%d,
    raw 1200x1600 images downscaled to opt.data.image_size.
  * ETH3D (`data/ETH3D.py`): `intrinsics.txt` + per-image `pose/*.txt`
    (c2w), raw 4134x6204.
  * BlendedMVS (`data/BlendedMVS.py`): same txt layout, raw 576x768,
    black background lifted to white.
  * ScanNet (`data/scannet.py`): `intrinsic/intrinsic_color.txt` +
    `pose/*.txt`, frame subsampling by opt.data.freq_frame.

`load_prepared_scene` additionally reads the offline preprocessing
artifacts (`n_views.npy`, `pose_graph.npy` — produced by our
`preparation/main.py` or the reference's) and returns the pipeline `var`
dict (keypoints are rescaled by the image downscale factors, ref
`pipelines/LevelS2fM.py:76-90`).
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from . import base


def _frame_preproc(opt):
    """(center_crop, augment, rng) from opt.data — None/None when the
    default fast path applies (reference ships both off:
    `options/base.yaml:23-24`). The augment rng is seeded from opt.seed
    so a resumed run re-draws the same jitter."""
    dc = opt.data
    crop = dc.get("center_crop", None) or None
    aug = dc.get("augment", None) or None
    if aug is not None and not any(aug.get(k, None)
                                   for k in ("brightness", "contrast",
                                             "saturation", "hue")):
        aug = None
    rng = np.random.default_rng(int(opt.get("seed") or 0)) if aug else None
    return crop, aug, rng


def _raw_size(dataset: str, opt=None) -> Tuple[int, int]:
    """Native capture resolution per dataset. ``opt.data.raw_size``
    overrides (needed for self-rendered DTU-format scenes whose images
    are not 1200x1600)."""
    if opt is not None:
        rs = opt.data.get("raw_size") or None
        if rs:
            return tuple(rs)
    return {"DTU": (1200, 1600), "ETH3D": (4134, 6204),
            "BlendedMVS": (576, 768), "scannet": (968, 1296)}.get(
        dataset, (None, None))


def load_dtu(opt) -> Dict:
    root = opt.data.get("root") or "data/DTU"
    path = os.path.join(root, opt.data.scene)
    inner = os.path.join(path, opt.data.scene)
    root_data = inner if os.path.exists(inner) else path
    img_dir = os.path.join(root_data, "images")
    fnames = base.sorted_images(img_dir)
    n = len(fnames)
    cams = np.load(os.path.join(root_data, "cameras.npz"))
    H, W = opt.data.image_size
    rawH, rawW = _raw_size("DTU", opt)
    fx, fy = rawW / W, rawH / H
    intrs, poses, images = [], [], []
    crop, aug, rng = _frame_preproc(opt)
    for i in range(n):
        P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"]).astype(np.float32)[:3, :4]
        intr, c2w = base.decompose_projection(P)
        poses.append(base.w2c_from_c2w(c2w))
        if crop or aug:
            img, K = base.preprocess_frame(fnames[i], intr[:3, :3], (H, W),
                                           center_crop=crop, augment=aug, rng=rng)
        else:
            img = base.load_rgb(fnames[i], (H, W))
            K = base.scale_intrinsics(intr[:3, :3], fx, fy)
        intrs.append(K)
        images.append(img)
    return {"images": np.stack(images), "intrs": np.stack(intrs),
            "poses_gt": np.stack(poses), "factor_x": fx, "factor_y": fy}


def _load_txt_scene(opt, raw_hw, bg_white=False) -> Dict:
    root = opt.data.get("root")
    path = os.path.join(root, opt.data.scene)
    img_dir = os.path.join(path, "images")
    fnames = base.sorted_images(img_dir)
    H, W = opt.data.image_size
    rawH, rawW = raw_hw
    fx, fy = rawW / W, rawH / H
    K_raw = np.loadtxt(os.path.join(path, "intrinsics.txt")).astype(np.float32)[:3, :3]
    K = base.scale_intrinsics(K_raw, fx, fy)
    crop, aug, rng = _frame_preproc(opt)
    intrs, poses, images = [], [], []
    for f in fnames:
        stem = os.path.splitext(os.path.basename(f))[0]
        c2w = np.loadtxt(os.path.join(path, "pose", stem + ".txt")).astype(np.float32)
        poses.append(base.w2c_from_c2w(c2w))
        if crop or aug:
            img, Ki = base.preprocess_frame(f, K_raw, (H, W),
                                            center_crop=crop, augment=aug, rng=rng)
        else:
            img, Ki = base.load_rgb(f, (H, W)), K
        if bg_white:
            dark = np.all(img <= 0.1, axis=-1)
            img[dark] = 1.0
        images.append(img)
        intrs.append(Ki)
    return {"images": np.stack(images), "intrs": np.stack(intrs),
            "poses_gt": np.stack(poses), "factor_x": fx, "factor_y": fy}


def load_eth3d(opt) -> Dict:
    return _load_txt_scene(opt, _raw_size("ETH3D", opt))


def load_blendedmvs(opt) -> Dict:
    return _load_txt_scene(opt, _raw_size("BlendedMVS", opt), bg_white=True)


def load_scannet(opt) -> Dict:
    root = opt.data.get("root")
    path = os.path.join(root, opt.data.scene)
    img_dir = os.path.join(path, "color")
    fnames = base.sorted_images(img_dir)
    freq = int(opt.data.get("freq_frame", 1))
    fnames = fnames[::freq]
    H, W = opt.data.image_size
    rawH, rawW = _raw_size("scannet", opt)
    fx, fy = rawW / W, rawH / H
    K_raw = np.loadtxt(os.path.join(path, "intrinsic",
                                    "intrinsic_color.txt")).astype(np.float32)[:3, :3]
    K = base.scale_intrinsics(K_raw, fx, fy)
    crop, aug, rng = _frame_preproc(opt)
    intrs, poses, images = [], [], []
    for f in fnames:
        stem = os.path.splitext(os.path.basename(f))[0]
        c2w = np.loadtxt(os.path.join(path, "pose", stem + ".txt")).astype(np.float32)
        poses.append(base.w2c_from_c2w(c2w))
        if crop or aug:
            img, Ki = base.preprocess_frame(f, K_raw, (H, W),
                                            center_crop=crop, augment=aug, rng=rng)
        else:
            img, Ki = base.load_rgb(f, (H, W)), K
        images.append(img)
        intrs.append(Ki)
    return {"images": np.stack(images), "intrs": np.stack(intrs),
            "poses_gt": np.stack(poses), "factor_x": fx, "factor_y": fy}


LOADERS = {"DTU": load_dtu, "ETH3D": load_eth3d,
           "BlendedMVS": load_blendedmvs, "scannet": load_scannet}


def load_prepared_scene(opt) -> Dict:
    """Full pipeline `var`: images/intrinsics/GT poses + keypoints/matches/
    inlier masks/pose graph from the preparation artifacts."""
    dataset = opt.data.dataset
    if dataset not in LOADERS:
        raise ValueError(f"unknown dataset {dataset!r}; options: {list(LOADERS)}")
    if opt.data.get("center_crop", None):
        raise ValueError(
            "data.center_crop is incompatible with the SfM pipeline: the "
            "preparation keypoints were extracted on uncropped frames. "
            "Crop support exists for the render-only data surface "
            "(reference parity, data/base.py:92-117); re-run "
            "preparation/main.py on cropped images instead.")
    scene_data = LOADERS[dataset](opt)

    prep_dir = opt.data.get("prep_dir") or os.path.join(
        "data", dataset, opt.data.scene)
    n_views_path = os.path.join(prep_dir, "n_views.npy")
    if not os.path.exists(n_views_path):
        raise FileNotFoundError(
            f"{n_views_path} not found — run preparation/main.py first "
            "(COLMAP keypoints/matches + pose graph)")
    n_views_geo = np.load(n_views_path, allow_pickle=True)
    dsamp = np.asarray([scene_data["factor_x"], scene_data["factor_y"]]).reshape(1, 2)
    kypts = [np.asarray(d["kypts"]) / dsamp for d in n_views_geo]
    matches = [d["indxes"] for d in n_views_geo]
    masks = [d["mask"] for d in n_views_geo]

    pg_path = os.path.join(prep_dir, "pose_graph.npy")
    if os.path.exists(pg_path):
        pose_graph = list(np.load(pg_path, allow_pickle=True)[:])
    else:
        pose_graph = [i for i in range(len(scene_data["images"])) if i % 3 == 0]

    return {"images": scene_data["images"], "intrs": scene_data["intrs"],
            "poses_gt": scene_data["poses_gt"], "kypts": kypts,
            "matches": matches, "masks": masks, "pose_graph": pose_graph}
