"""ctypes bindings for the native host geometry kernels (kdtree.cpp).

Auto-builds the shared library on first import if a compiler is present;
callers fall back to scipy implementations when unavailable
(roitr_tpu/data/preprocess.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libroitr_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _HERE],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    # always let make decide (timestamp check is cheap, catches stale .so
    # after source edits)
    if not _build() and not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.roitr_knn.argtypes = [f32p, ctypes.c_int32, f32p, ctypes.c_int32,
                              ctypes.c_int32, i32p, f32p]
    lib.roitr_knn.restype = None
    lib.roitr_estimate_normals.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                           f32p, f32p]
    lib.roitr_estimate_normals.restype = None
    lib.roitr_fps.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.roitr_fps.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def knn(points: np.ndarray, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(idx (m, k) int32, dist (m, k) float32), ascending by distance."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    points = np.ascontiguousarray(points, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    m = queries.shape[0]
    idx = np.empty((m, k), np.int32)
    dist = np.empty((m, k), np.float32)
    lib.roitr_knn(points, points.shape[0], queries, m, k, idx, dist)
    return idx, dist


def fps(points: np.ndarray, num_samples: int) -> np.ndarray:
    """Exact farthest point sampling (seed index 0), (m,) int32."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty((num_samples,), np.int32)
    lib.roitr_fps(points, points.shape[0], num_samples, out)
    return out


def estimate_normals(points: np.ndarray, k: int = 33, view_point=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Viewpoint-oriented PCA normals, (n, 3) float32."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    points = np.ascontiguousarray(points, np.float32)
    vp = np.ascontiguousarray(view_point, np.float32)
    out = np.empty_like(points)
    lib.roitr_estimate_normals(points, points.shape[0], min(k, points.shape[0]), vp, out)
    return out
