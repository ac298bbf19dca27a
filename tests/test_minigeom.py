"""Native C++ minigeom solvers vs synthetic ground truth (and cv2)."""
import os
import subprocess

import numpy as np
import pytest

from level_s2fm_tpu.cpp import minigeom

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def built():
    if not minigeom.available():
        r = subprocess.run(["sh", os.path.join(
            REPO, "level_s2fm_tpu", "cpp", "native", "build.sh")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        minigeom._LIB = None
    assert minigeom.available()


def make_two_view(n=200, outlier_frac=0.2, seed=0):
    rng = np.random.default_rng(seed)
    K = np.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    X = rng.uniform(-1, 1, size=(n, 3))
    X[:, 2] += 4.0
    # camera0 at identity; camera1 rotated+translated
    w = np.asarray([0.05, -0.1, 0.04])
    th = np.linalg.norm(w)
    k = w / th
    Kx = np.asarray([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
    t = np.asarray([0.5, 0.05, 0.02])
    X1 = X @ R.T + t
    uv0 = (X / X[:, 2:]) @ K.T
    uv1 = (X1 / X1[:, 2:]) @ K.T
    kp0, kp1 = uv0[:, :2], uv1[:, :2]
    n_out = int(n * outlier_frac)
    kp1[:n_out] += rng.uniform(30, 90, size=(n_out, 2))
    return kp0, kp1, K, R, t, X, n_out


def test_essential_ransac_recovers_pose():
    kp0, kp1, K, R_gt, t_gt, X, n_out = make_two_view()
    ok, R, t, inl = minigeom.essential_ransac(kp0, kp1, K, threshold_px=1.0)
    assert ok
    # rotation error
    cosang = (np.trace(R_gt @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.5
    # translation direction error
    tdir = t / np.linalg.norm(t)
    tgt = t_gt / np.linalg.norm(t_gt)
    assert np.degrees(np.arccos(np.clip(abs(tdir @ tgt), -1, 1))) < 1.0
    # outliers rejected
    assert inl[:n_out].mean() < 0.2
    assert inl[n_out:].mean() > 0.9


def test_pnp_ransac_recovers_pose():
    kp0, kp1, K, R_gt, t_gt, X, n_out = make_two_view(outlier_frac=0.3)
    ok, R, t, inl = minigeom.pnp_ransac(kp1, X, K, max_error_px=2.0)
    assert ok
    cosang = (np.trace(R_gt @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.2
    np.testing.assert_allclose(t, t_gt, atol=0.02)
    assert inl[n_out:].mean() > 0.95


def test_pnp_degenerate_too_few():
    K = np.eye(3)
    ok, *_ = minigeom.pnp_ransac(np.zeros((3, 2)), np.zeros((3, 3)), K)
    assert not ok


def test_essential_too_few():
    K = np.eye(3)
    ok, *_ = minigeom.essential_ransac(np.zeros((4, 2)), np.zeros((4, 2)), K)
    assert not ok


def test_hostgeom_prefers_native(monkeypatch):
    """hostgeom should route through minigeom when available."""
    import importlib
    from level_s2fm_tpu.sfm import hostgeom
    importlib.reload(hostgeom)
    assert hostgeom._HAS_MINIGEOM
    kp0, kp1, K, R_gt, t_gt, X, n_out = make_two_view()
    res = hostgeom.estimate_essential(kp0, kp1, K)
    assert res.success
    cosang = (np.trace(R_gt @ res.R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.5
