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


def camera_centers(poses: np.ndarray) -> np.ndarray:
    """w2c [N,3,4] -> camera centers [N,3]."""
    poses = np.asarray(poses)
    R = poses[:, :, :3]
    t = poses[:, :, 3]
    return -np.einsum("nij,ni->nj", R, t)


def get_camera_wireframe(pose: np.ndarray, depth: float = 0.1) -> np.ndarray:
    """Pyramid wireframe polyline [10,3] for one w2c pose [3,4]
    (ref `util_vis.py:149-171` get_camera_mesh/merge_wireframes: apex +
    image-plane rectangle, drawn as a single connected line strip)."""
    pose = np.asarray(pose, np.float64)
    R, t = pose[:, :3], pose[:, 3]
    C = -R.T @ t
    # image-plane corners in the camera frame (unit-ish pyramid)
    corners_c = np.asarray([[-0.5, -0.5, 1], [0.5, -0.5, 1],
                            [0.5, 0.5, 1], [-0.5, 0.5, 1]]) * depth
    corners = corners_c @ R + C  # R.T @ c, vectorized
    # strip: apex->c0->c1->apex->c1... use the ref's closed path:
    # c0 c1 c2 c3 c0 apex c1, apex c2, apex c3 — compact strip below
    return np.asarray([C, corners[0], corners[1], C, corners[1], corners[2],
                       C, corners[2], corners[3], C])


def plot_poses(poses_pred: np.ndarray, poses_gt: Optional[np.ndarray] = None,
               store_path: Optional[str] = None, frustum_scale: float = 0.1):
    """3D camera-pose plot with frustum wireframes; pred/GT pairs are
    linked by dotted lines (w2c [N,3,4] arrays; ref `util_vis.py:185-257`
    plot_save_poses)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(5, 5), dpi=90)
    ax = fig.add_subplot(111, projection="3d")
    poses_pred = np.asarray(poses_pred)
    c_pred = camera_centers(poses_pred)
    for p in poses_pred:
        w = get_camera_wireframe(p, depth=frustum_scale)
        ax.plot(w[:, 0], w[:, 1], w[:, 2], c="#1f4e79", lw=0.8)
    ax.plot(c_pred[:, 0], c_pred[:, 1], c_pred[:, 2], "o-", c="#1f4e79",
            label="pred", ms=3)
    if poses_gt is not None:
        poses_gt = np.asarray(poses_gt)
        c_gt = camera_centers(poses_gt)
        for p in poses_gt:
            w = get_camera_wireframe(p, depth=frustum_scale)
            ax.plot(w[:, 0], w[:, 1], w[:, 2], c="#c0392b", lw=0.8, alpha=0.6)
        ax.plot(c_gt[:, 0], c_gt[:, 1], c_gt[:, 2], "o--", c="#c0392b",
                label="gt", ms=3)
        for a, b in zip(c_pred, c_gt):  # pred<->gt correspondence links
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], ":",
                    c="#777777", lw=0.7)
    ax.legend()
    if store_path:
        os.makedirs(os.path.dirname(store_path) or ".", exist_ok=True)
        fig.savefig(store_path)
    plt.close(fig)
    return fig


def colorize(gray: np.ndarray, cmap: str = "viridis",
             vmin: Optional[float] = None,
             vmax: Optional[float] = None) -> np.ndarray:
    """Scalar map [H,W] -> RGB float [H,W,3] via a matplotlib colormap
    (ref `util_vis.py:51-55` get_heatmap; used for depth/error dumps).
    Non-finite pixels map to black."""
    import matplotlib
    gray = np.asarray(gray, np.float64)
    finite = np.isfinite(gray)
    lo = vmin if vmin is not None else (gray[finite].min() if finite.any() else 0.0)
    hi = vmax if vmax is not None else (gray[finite].max() if finite.any() else 1.0)
    norm = np.zeros_like(gray)
    if hi > lo:
        norm = np.clip((gray - lo) / (hi - lo), 0, 1)
    rgb = matplotlib.colormaps[cmap](norm)[..., :3]
    rgb[~finite] = 0.0
    return rgb.astype(np.float32)


def dump_images(out_dir: str, name: str, images, cmap: Optional[str] = None):
    """Save a batch of images [N,H,W(,3)] as PNGs ``<name>_<i>.png``
    (ref `util_vis.py:43-50`); scalar maps are colorized via `colorize`."""
    import imageio.v2 as imageio
    os.makedirs(out_dir, exist_ok=True)
    images = np.asarray(images)
    if images.ndim == 3:  # scalar maps
        images = np.stack([colorize(im, cmap or "viridis") for im in images])
    paths = []
    for i, im in enumerate(images):
        p = os.path.join(out_dir, f"{name}_{i}.png")
        imageio.imwrite(p, _to_u8(im))
        paths.append(p)
    return paths
