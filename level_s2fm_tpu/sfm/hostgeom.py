"""Host-side minimal-solver geometry: essential matrix, PnP, triangulation.

Replaces the reference's pycolmap C++ bindings
(`Initialization.py:88-97`, `Registration.py:93-107`; SURVEY.md §2.3).
These are small-N, branch-heavy RANSAC problems that belong on the host
CPU, not in XLA. The default backend here uses OpenCV's calibrated
solvers; `level_s2fm_tpu.cpp.minigeom` (our own C++ five-point/P3P/LM
library) is preferred when built, with this as fallback.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:
    from ..cpp import minigeom as _mg
    _HAS_MINIGEOM = _mg.available()
except Exception:  # pragma: no cover
    _HAS_MINIGEOM = False


@dataclasses.dataclass
class TwoViewResult:
    success: bool
    R: Optional[np.ndarray] = None      # [3,3], X_c1 = R X_c0 + t
    t: Optional[np.ndarray] = None      # [3]
    inliers: Optional[np.ndarray] = None


@dataclasses.dataclass
class PnPResult:
    success: bool
    R: Optional[np.ndarray] = None      # [3,3] w2c
    t: Optional[np.ndarray] = None      # [3]
    inliers: Optional[np.ndarray] = None


def estimate_essential(kp0: np.ndarray, kp1: np.ndarray, K: np.ndarray,
                       threshold_px: float = 1.0, prob: float = 0.9999) -> TwoViewResult:
    """Relative pose from calibrated 2D-2D matches (5-point RANSAC +
    cheirality). Equivalent surface to pycolmap.essential_matrix_estimation."""
    kp0 = np.ascontiguousarray(kp0, np.float64)
    kp1 = np.ascontiguousarray(kp1, np.float64)
    if kp0.shape[0] < 5:
        return TwoViewResult(False)
    if _HAS_CV2:
        cv2.setRNGSeed(0)  # deterministic RANSAC
    if _HAS_MINIGEOM:
        ok, R, t, inl = _mg.essential_ransac(kp0, kp1, np.asarray(K, np.float64),
                                             threshold_px, prob)
        if ok:
            return TwoViewResult(True, R, t, inl)
        return TwoViewResult(False)
    if not _HAS_CV2:
        return TwoViewResult(False)
    E, mask = cv2.findEssentialMat(kp0, kp1, np.asarray(K, np.float64),
                                   method=cv2.RANSAC, prob=prob,
                                   threshold=threshold_px)
    if E is None or E.shape[0] < 3:
        return TwoViewResult(False)
    E = E[:3, :3]
    n_good, R, t, mask_pose = cv2.recoverPose(E, kp0, kp1, np.asarray(K, np.float64),
                                              mask=mask.copy())
    if n_good < 5:
        return TwoViewResult(False)
    return TwoViewResult(True, np.asarray(R, np.float32), np.asarray(t, np.float32)[:, 0],
                         mask_pose[:, 0].astype(bool))


def pnp_ransac(p2d: np.ndarray, p3d: np.ndarray, K: np.ndarray,
               max_error_px: float = 3.0, refine: bool = True) -> PnPResult:
    """Absolute pose from 2D-3D matches (P3P RANSAC + LM refinement).
    Equivalent surface to pycolmap.absolute_pose_estimation +
    pose_refinement (`Registration.py:96-107`)."""
    p2d = np.ascontiguousarray(p2d, np.float64)
    p3d = np.ascontiguousarray(p3d, np.float64)
    if p3d.shape[0] < 4:
        return PnPResult(False)
    if _HAS_CV2:
        cv2.setRNGSeed(0)  # deterministic RANSAC
    if _HAS_MINIGEOM:
        ok, R, t, inl = _mg.pnp_ransac(p2d, p3d, np.asarray(K, np.float64),
                                       max_error_px, refine)
        if ok:
            return PnPResult(True, R, t, inl)
        return PnPResult(False)
    if not _HAS_CV2:
        return PnPResult(False)
    ok, rvec, tvec, inliers = cv2.solvePnPRansac(
        p3d, p2d, np.asarray(K, np.float64), None,
        reprojectionError=max_error_px, iterationsCount=1000,
        flags=cv2.SOLVEPNP_EPNP)
    if not ok or inliers is None or len(inliers) < 4:
        return PnPResult(False)
    inl = np.zeros(p3d.shape[0], bool)
    inl[inliers[:, 0]] = True
    if refine:
        ok2, rvec, tvec = cv2.solvePnP(p3d[inl], p2d[inl], np.asarray(K, np.float64),
                                       None, rvec, tvec, useExtrinsicGuess=True,
                                       flags=cv2.SOLVEPNP_ITERATIVE)
        if not ok2:
            return PnPResult(False)
    R, _ = cv2.Rodrigues(rvec)
    return PnPResult(True, np.asarray(R, np.float32),
                     np.asarray(tvec, np.float32)[:, 0], inl)


def triangulate_dlt(kp0: np.ndarray, kp1: np.ndarray,
                    P0: np.ndarray, P1: np.ndarray) -> np.ndarray:
    """Batch DLT triangulation (for the `tri_trad` ablation; replaces
    cv2.triangulatePoints — 20 lines of linear algebra, SURVEY.md §2.3).

    kp0/kp1 [N,2] pixels, P0/P1 [3,4] projection matrices (K @ [R|t]).
    Returns [N,3] world points.
    """
    N = kp0.shape[0]
    A = np.zeros((N, 4, 4))
    A[:, 0] = kp0[:, 0, None] * P0[2] - P0[0]
    A[:, 1] = kp0[:, 1, None] * P0[2] - P0[1]
    A[:, 2] = kp1[:, 0, None] * P1[2] - P1[0]
    A[:, 3] = kp1[:, 1, None] * P1[2] - P1[1]
    _, _, Vt = np.linalg.svd(A)
    X = Vt[:, -1]
    return (X[:, :3] / (X[:, 3:4] + 1e-12)).astype(np.float32)
