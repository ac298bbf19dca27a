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


# ---------------------------------------------------------------------------
# pycolmap-grade minimal solvers (round 2: Nister 5pt, Grunert P3P, LO, LM)
# ---------------------------------------------------------------------------

def _rot(ax, th):
    ax = np.asarray(ax, float)
    ax = ax / np.linalg.norm(ax)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def make_planar_two_view(n=150, seed=1, outlier_frac=0.1):
    """All 3D points on one plane: the 8-point solver is degenerate here
    (planar homography ambiguity); the 5-point solver is not."""
    rng = np.random.default_rng(seed)
    K = np.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    # points on the z = 4 plane
    X = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                  np.full(n, 4.0)], -1)
    R = _rot([0.1, -0.9, 0.2], 0.12)
    t = np.asarray([0.4, 0.03, 0.05])
    X1 = X @ R.T + t
    uv0 = (X / X[:, 2:]) @ K.T
    uv1 = (X1 / X1[:, 2:]) @ K.T
    kp0, kp1 = uv0[:, :2].copy(), uv1[:, :2].copy()
    n_out = int(n * outlier_frac)
    kp1[:n_out] += rng.uniform(30, 90, size=(n_out, 2))
    return kp0, kp1, K, R, t, n_out


def test_essential_ransac_planar_scene():
    """5-point handles a fully planar scene (ref: pycolmap 5-pt,
    `Initialization.py:90`); the old 8-point minimal sample could not."""
    kp0, kp1, K, R_gt, t_gt, n_out = make_planar_two_view()
    ok, R, t, inl = minigeom.essential_ransac(kp0, kp1, K, threshold_px=1.0)
    assert ok
    cosang = (np.trace(R_gt @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.5
    t_dir = t / np.linalg.norm(t)
    tg = t_gt / np.linalg.norm(t_gt)
    assert min(np.linalg.norm(t_dir - tg), np.linalg.norm(t_dir + tg)) < 0.02
    assert inl[n_out:].mean() > 0.9


def test_essential_5pt_minimal_direct():
    """Exactly 5 correspondences recover the GT essential matrix."""
    import ctypes
    lib = minigeom._load()
    lib.mg_essential_5pt.restype = ctypes.c_int
    dp = minigeom._dp
    rng = np.random.default_rng(3)
    R = _rot([0.3, 1.0, -0.2], 0.3)
    t = np.asarray([0.6, -0.2, 0.1])
    t = t / np.linalg.norm(t)
    X = rng.normal(size=(5, 3)) + np.array([0, 0, 5.0])
    x0 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    x1 = Xc[:, :2] / Xc[:, 2:]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ R
    E_gt = E_gt / np.linalg.norm(E_gt)
    E_out = np.zeros(90)
    ns = lib.mg_essential_5pt(dp(np.ascontiguousarray(x0)),
                              dp(np.ascontiguousarray(x1)), dp(E_out))
    assert ns >= 1
    best = min(min(np.linalg.norm(E_out[s * 9:(s + 1) * 9].reshape(3, 3) - E_gt),
                   np.linalg.norm(E_out[s * 9:(s + 1) * 9].reshape(3, 3) + E_gt))
               for s in range(ns))
    assert best < 1e-6


def test_p3p_minimal_direct():
    """Grunert P3P returns the GT pose among its (<=4) solutions."""
    import ctypes
    lib = minigeom._load()
    lib.mg_p3p.restype = ctypes.c_int
    dp = minigeom._dp
    rng = np.random.default_rng(5)
    got = 0
    for trial in range(20):
        R = _rot(rng.normal(size=3), rng.uniform(0.1, 1.0))
        t = rng.normal(size=3) * 0.5
        X = rng.normal(size=(3, 3)) + np.array([0, 0, 4.0])
        Xc = X @ R.T + t
        if (Xc[:, 2] <= 0.5).any():
            continue
        p2n = Xc[:, :2] / Xc[:, 2:]
        R_out = np.zeros((4, 9))
        t_out = np.zeros((4, 3))
        ns = lib.mg_p3p(dp(np.ascontiguousarray(p2n)),
                        dp(np.ascontiguousarray(X)), dp(R_out), dp(t_out))
        if ns < 1:
            continue
        best = min(np.linalg.norm(R_out[s].reshape(3, 3) - R)
                   + np.linalg.norm(t_out[s] - t) for s in range(ns))
        if best < 1e-6:
            got += 1
    assert got >= 15


def test_pnp_ransac_small_n():
    """PnP succeeds with 4-5 observations (P3P minimal sample; the old
    P6P-DLT needed 6). Ref surface: pycolmap absolute_pose_estimation."""
    rng = np.random.default_rng(9)
    K = np.asarray([[400.0, 0, 200], [0, 400.0, 150], [0, 0, 1]])
    R_gt = _rot([0.2, 0.5, -1.0], 0.4)
    t_gt = np.asarray([0.1, -0.2, 0.3])
    for n in (4, 5):
        X = rng.normal(size=(n, 3)) + np.array([0, 0, 4.0])
        Xc = X @ R_gt.T + t_gt
        uv = (Xc / Xc[:, 2:]) @ K.T
        ok, R, t, inl = minigeom.pnp_ransac(uv[:, :2], X, K, max_error_px=2.0)
        assert ok, f"n={n}"
        cosang = (np.trace(R_gt @ R.T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.1
        np.testing.assert_allclose(t, t_gt, atol=1e-3)
        assert inl.all()


def test_pnp_lm_refine_converges_from_noisy():
    """LM refinement tightens a pose under noise + outliers."""
    rng = np.random.default_rng(11)
    K = np.asarray([[400.0, 0, 200], [0, 400.0, 150], [0, 0, 1]])
    R_gt = _rot([0.3, -0.2, 0.9], 0.5)
    t_gt = np.asarray([0.3, 0.1, -0.2])
    n = 120
    X = rng.normal(size=(n, 3)) + np.array([0, 0, 5.0])
    Xc = X @ R_gt.T + t_gt
    uv = (Xc / Xc[:, 2:]) @ K.T
    kp = uv[:, :2] + rng.normal(scale=0.3, size=(n, 2))   # 0.3 px noise
    kp[:20] += rng.uniform(20, 60, size=(20, 2))          # 20 outliers
    ok, R, t, inl = minigeom.pnp_ransac(kp, X, K, max_error_px=2.0,
                                        refine=True)
    assert ok
    cosang = (np.trace(R_gt @ R.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 0.1
    np.testing.assert_allclose(t, t_gt, atol=5e-3)
    assert inl[20:].mean() > 0.95
