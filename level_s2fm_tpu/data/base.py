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


def sorted_images(path: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".JPG", ".PNG")
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(exts))
