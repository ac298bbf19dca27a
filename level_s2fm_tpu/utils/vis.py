"""2D visualization utilities: match drawing, PnP overlays, pose plots.

Covers the reference's visualization surface used in the live pipeline
(`utils/util_vis.py:906-944` draw_matches, `Registration.py:117-125` PnP
keypoint overlay, `util_vis.py:185-257` matplotlib pose plots).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _to_u8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return np.ascontiguousarray(img)


def draw_matches(img0, img1, kp0, kp1, store_path: Optional[str] = None,
                 vis_num: Optional[int] = None):
    """Side-by-side match visualization (ref `util_vis.py:906-944`)."""
    img0, img1 = _to_u8(img0), _to_u8(img1)
    H = max(img0.shape[0], img1.shape[0])
    W = img0.shape[1] + img1.shape[1]
    canvas = np.zeros((H, W, 3), np.uint8)
    canvas[:img0.shape[0], :img0.shape[1]] = img0
    canvas[:img1.shape[0], img0.shape[1]:] = img1
    kp0 = np.asarray(kp0)
    kp1 = np.asarray(kp1)
    n = len(kp0) if vis_num is None else min(vis_num, len(kp0))
    if cv2 is not None:
        rng = np.random.default_rng(0)
        for i in range(n):
            c = tuple(int(x) for x in rng.integers(60, 255, 3))
            p0 = tuple(np.round(kp0[i]).astype(int))
            p1 = tuple(np.round(kp1[i] + [img0.shape[1], 0]).astype(int))
            cv2.circle(canvas, p0, 2, c, -1)
            cv2.circle(canvas, p1, 2, c, -1)
            cv2.line(canvas, p0, p1, c, 1)
    if store_path:
        os.makedirs(os.path.dirname(store_path) or ".", exist_ok=True)
        if cv2 is not None:
            cv2.imwrite(store_path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        else:
            import imageio.v2 as imageio
            imageio.imwrite(store_path, canvas)
    return canvas


def draw_keypoints(img, kypts, store_path: Optional[str] = None,
                   color=(255, 0, 0)):
    """Keypoint overlay (the PnP inlier dump, ref `Registration.py:117-125`)."""
    canvas = _to_u8(img).copy()
    if cv2 is not None:
        for p in np.round(np.asarray(kypts)).astype(int):
            cv2.circle(canvas, tuple(p), 2, color, 2)
    if store_path:
        os.makedirs(os.path.dirname(store_path) or ".", exist_ok=True)
        if cv2 is not None:
            cv2.imwrite(store_path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        else:
            import imageio.v2 as imageio
            imageio.imwrite(store_path, canvas)
    return canvas


def plot_poses(poses_pred: np.ndarray, poses_gt: Optional[np.ndarray] = None,
               store_path: Optional[str] = None, frustum_scale: float = 0.1):
    """3D camera-pose plot (w2c [N,3,4] arrays; ref `util_vis.py:185-257`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def centers(poses):
        R = poses[:, :, :3]
        t = poses[:, :, 3]
        return -np.einsum("nij,ni->nj", R, t)

    fig = plt.figure(figsize=(5, 5), dpi=90)
    ax = fig.add_subplot(111, projection="3d")
    c_pred = centers(np.asarray(poses_pred))
    ax.plot(c_pred[:, 0], c_pred[:, 1], c_pred[:, 2], "o-", c="#1f4e79",
            label="pred", ms=3)
    if poses_gt is not None:
        c_gt = centers(np.asarray(poses_gt))
        ax.plot(c_gt[:, 0], c_gt[:, 1], c_gt[:, 2], "o--", c="#c0392b",
                label="gt", ms=3)
    ax.legend()
    if store_path:
        os.makedirs(os.path.dirname(store_path) or ".", exist_ok=True)
        fig.savefig(store_path)
    plt.close(fig)
    return fig
