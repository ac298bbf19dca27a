"""ctypes bindings for the native minigeom library (C++).

The shared library (built from `native/minigeom.cpp` via
`native/build.sh` or `python setup.py build_ext`) provides the
pycolmap-equivalent host geometry: 5-point essential RANSAC with
cheirality, EPnP/P3P LO-RANSAC, and LM pose refinement (SURVEY.md §2.3).
Falls back cleanly when the .so is absent — `available()` gates use.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _lib_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(here, "native", "libminigeom.so")


def _try_build():
    """Build the shared library on demand (g++, no external deps)."""
    import subprocess
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "native", "build.sh")
    try:
        subprocess.run(["sh", script], capture_output=True, timeout=120,
                       check=True)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _lib_path()
    if not os.path.exists(path) and not _try_build():
        return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    dptr = ctypes.POINTER(ctypes.c_double)
    u8ptr = ctypes.POINTER(ctypes.c_uint8)
    lib.mg_essential_ransac.restype = ctypes.c_int
    lib.mg_essential_ransac.argtypes = [
        dptr, dptr, ctypes.c_int, dptr,              # kp0, kp1, n, K
        ctypes.c_double, ctypes.c_double, ctypes.c_int,  # thresh_px, prob, max_iters
        dptr, dptr, u8ptr]                           # out R, t, inliers
    lib.mg_pnp_ransac.restype = ctypes.c_int
    lib.mg_pnp_ransac.argtypes = [
        dptr, dptr, ctypes.c_int, dptr,              # p2d, p3d, n, K
        ctypes.c_double, ctypes.c_int, ctypes.c_int,  # max_err_px, max_iters, refine
        dptr, dptr, u8ptr]                           # out R, t, inliers
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def essential_ransac(kp0: np.ndarray, kp1: np.ndarray, K: np.ndarray,
                     threshold_px: float = 1.0, prob: float = 0.9999,
                     max_iters: int = 1000):
    lib = _load()
    n = kp0.shape[0]
    kp0 = np.ascontiguousarray(kp0, np.float64)
    kp1 = np.ascontiguousarray(kp1, np.float64)
    K = np.ascontiguousarray(K, np.float64)
    R = np.zeros((3, 3), np.float64)
    t = np.zeros(3, np.float64)
    inl = np.zeros(n, np.uint8)
    ok = lib.mg_essential_ransac(_dp(kp0), _dp(kp1), n, _dp(K),
                                 threshold_px, prob, max_iters,
                                 _dp(R), _dp(t),
                                 inl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return bool(ok), R.astype(np.float32), t.astype(np.float32), inl.astype(bool)


def pnp_ransac(p2d: np.ndarray, p3d: np.ndarray, K: np.ndarray,
               max_error_px: float = 3.0, refine: bool = True,
               max_iters: int = 1000):
    lib = _load()
    n = p2d.shape[0]
    p2d = np.ascontiguousarray(p2d, np.float64)
    p3d = np.ascontiguousarray(p3d, np.float64)
    K = np.ascontiguousarray(K, np.float64)
    R = np.zeros((3, 3), np.float64)
    t = np.zeros(3, np.float64)
    inl = np.zeros(n, np.uint8)
    ok = lib.mg_pnp_ransac(_dp(p2d), _dp(p3d), n, _dp(K),
                           max_error_px, max_iters, 1 if refine else 0,
                           _dp(R), _dp(t),
                           inl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return bool(ok), R.astype(np.float32), t.astype(np.float32), inl.astype(bool)
