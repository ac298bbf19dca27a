"""Dataset base utilities: image IO, resizing, K/Rt decomposition.

Replaces the reference's torch Dataset machinery (`data/base.py`) with
plain numpy preloading — the pipeline consumes whole-scene arrays, so a
DataLoader abstraction buys nothing on TPU (host assembles batches,
device gets padded arrays).
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None
import imageio.v2 as imageio


def load_rgb(path: str, target_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load an image as float32 [H,W,3] in [0,1], optionally resized."""
    img = imageio.imread(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img[..., :3].astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if target_hw is not None and img.shape[:2] != tuple(target_hw):
        H, W = target_hw
        if cv2 is not None:
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        else:
            ys = (np.arange(H) * img.shape[0] / H).astype(int)
            xs = (np.arange(W) * img.shape[1] / W).astype(int)
            img = img[ys][:, xs]
    return np.clip(img, 0.0, 1.0)


def load_depth(path: str) -> np.ndarray:
    """Load a ScanNet-style uint16 depth PNG as float32 meters
    (ref `data/scannet.py:76`: ``cv2.imread(..., -1) / 1000``). Zero
    means no measurement; kept as 0 (mask downstream)."""
    raw = imageio.imread(path)
    return np.asarray(raw, np.float32) / 1000.0


def decompose_projection(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """P [3,4] -> (K [4,4 upper-left 3x3 normalized], c2w pose [4,4]).

    RQ decomposition equivalent of the reference's
    `load_K_Rt_from_P` (`data/DTU.py:122-140`, via cv2).
    """
    if cv2 is not None:
        out = cv2.decomposeProjectionMatrix(P)
        K, R, t = out[0], out[1], out[2]
        K = K / K[2, 2]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = R.T
        pose[:3, 3] = (t[:3] / t[3])[:, 0]
        intr = np.eye(4)
        intr[:3, :3] = K
        return intr.astype(np.float32), pose
    # numpy RQ fallback
    M = P[:, :3]
    Q, R_ = np.linalg.qr(np.flipud(M).T)
    Rq = np.flipud(R_.T)[:, ::-1]
    Qq = np.flipud(Q.T)
    D = np.diag(np.sign(np.diag(Rq)))
    K = Rq @ D
    Rw = D @ Qq
    if np.linalg.det(Rw) < 0:
        Rw, K = -Rw, -K
    K = K / K[2, 2]
    cam_t = np.linalg.inv(K) @ P[:, 3]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rw.T
    pose[:3, 3] = (-Rw.T @ cam_t)
    intr = np.eye(4)
    intr[:3, :3] = K
    return intr.astype(np.float32), pose.astype(np.float32)


def scale_intrinsics(K: np.ndarray, factor_x: float, factor_y: float) -> np.ndarray:
    K = K.copy()
    K[0, 0] /= factor_x
    K[0, 2] /= factor_x
    K[1, 1] /= factor_y
    K[1, 2] /= factor_y
    return K


def w2c_from_c2w(c2w: np.ndarray) -> np.ndarray:
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    w2c = np.zeros((3, 4), np.float32)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = -R.T @ t
    return w2c


def center_crop_with_K(img: np.ndarray, K: np.ndarray,
                       frac: float) -> Tuple[np.ndarray, np.ndarray]:
    """Center-crop to ``frac`` of each raw dimension and shift the
    principal point accordingly (reference `data/base.py:92-117`:
    crop happens at raw resolution, before the resize; the intrinsics
    shift is ``(raw - crop)/2`` on each axis)."""
    rawH, rawW = img.shape[:2]
    cH, cW = int(rawH * frac), int(rawW * frac)
    y0, x0 = (rawH - cH) // 2, (rawW - cW) // 2
    out = img[y0:y0 + cH, x0:x0 + cW]
    K = K.copy()
    K[0, 2] -= (rawW - cW) / 2
    K[1, 2] -= (rawH - cH) / 2
    return out, K


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0) -> np.ndarray:
    """Photometric augmentation (reference `data/base.py:74-90`,
    torchvision ColorJitter semantics: each factor drawn uniformly from
    ``(1-x, 1+x)``, hue from ``(-h, h)``).

    Deviation: the reference's ``hflip``/``rotate`` geometric
    augmentations are NOT carried — this pipeline's SIFT keypoints and
    match graph are extracted at preparation time, so geometric
    augmentation would silently decouple pixels from keypoints. The
    reference ships them disabled in every config (`options/base.yaml:23`).
    """
    out = img.astype(np.float32)
    if brightness:
        out = out * rng.uniform(1 - brightness, 1 + brightness)
    if contrast:
        mean = out.mean(axis=(0, 1), keepdims=True)
        out = (out - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    if saturation:
        gray = (out * np.array([0.299, 0.587, 0.114], np.float32)).sum(-1, keepdims=True)
        out = gray + (out - gray) * rng.uniform(1 - saturation, 1 + saturation)
    if hue and cv2 is not None:
        hsv = cv2.cvtColor(np.clip(out, 0, 1), cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue, hue) * 360.0) % 360.0
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return np.clip(out, 0.0, 1.0)


def preprocess_frame(path: str, K_raw: np.ndarray, target_hw: Tuple[int, int],
                     center_crop: Optional[float] = None,
                     augment: Optional[dict] = None,
                     rng: Optional[np.random.Generator] = None,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Load one frame through the full reference preprocessing chain
    (`data/base.py:92-117`): [color jitter] -> [center crop] -> resize,
    with the intrinsics scaled from the (cropped) raw frame to
    ``target_hw``. Returns (image [H,W,3] in [0,1], K [3,3])."""
    img = load_rgb(path)
    K = K_raw.copy().astype(np.float32)
    if augment:
        img = color_jitter(img, rng or np.random.default_rng(),
                           brightness=float(augment.get("brightness") or 0.0),
                           contrast=float(augment.get("contrast") or 0.0),
                           saturation=float(augment.get("saturation") or 0.0),
                           hue=float(augment.get("hue") or 0.0))
    if center_crop:
        img, K = center_crop_with_K(img, K, float(center_crop))
    cH, cW = img.shape[:2]
    H, W = target_hw
    img = load_resize(img, (H, W))
    K = scale_intrinsics(K, cW / W, cH / H)
    return img, K


def load_resize(img: np.ndarray, target_hw: Tuple[int, int]) -> np.ndarray:
    """Resize an already-loaded [H,W,3] float image."""
    if img.shape[:2] == tuple(target_hw):
        return img
    H, W = target_hw
    if cv2 is not None:
        return np.clip(cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA), 0.0, 1.0)
    ys = (np.arange(H) * img.shape[0] / H).astype(int)
    xs = (np.arange(W) * img.shape[1] / W).astype(int)
    return img[ys][:, xs]


def sorted_images(path: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".JPG", ".PNG")
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(exts))
