"""Native C++ kernels: parity vs scipy/numpy and a build smoke test."""

import numpy as np
import pytest

from roitr_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_knn_matches_scipy(rng):
    from scipy.spatial import cKDTree

    pts = rng.rand(500, 3).astype(np.float32)
    q = rng.rand(50, 3).astype(np.float32)
    idx, dist = native.knn(pts, q, 5)
    d_ref, i_ref = cKDTree(pts).query(q, k=5)
    np.testing.assert_allclose(dist, d_ref, atol=1e-5)
    # indices can differ on exact ties; compare distances per slot instead
    d_mine = np.linalg.norm(q[:, None, :] - pts[idx], axis=-1)
    np.testing.assert_allclose(d_mine, d_ref, atol=1e-5)


def test_native_normals_match_scipy_path(rng):
    uv = rng.randn(400, 2).astype(np.float32)
    basis = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    pts = (uv @ basis[:, :2].T + np.array([0, 0, 4], np.float32)).astype(np.float32)
    plane_n = basis[:, 2]

    normals = native.estimate_normals(pts, k=16)
    assert (np.abs(normals @ plane_n) > 0.99).all()
    # orientation toward origin viewpoint
    dots = np.sum((0 - pts) * normals, axis=-1)
    assert (dots >= -1e-5).all()


def test_native_normals_noisy_cloud_parity(rng):
    """On generic (noisy) clouds the native and scipy PCA normals must agree
    up to sign everywhere (same neighborhoods, same covariance)."""
    from roitr_tpu.data.preprocess import estimate_normals_np

    pts = rng.rand(800, 3).astype(np.float32)
    a = native.estimate_normals(pts, k=12)

    # force the scipy path by calling the internals directly
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=12)
    neigh = pts[idx]
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / 12
    _, vecs = np.linalg.eigh(cov)
    b = vecs[..., 0]

    cos = np.abs(np.sum(a * b, axis=-1))
    assert np.quantile(cos, 0.01) > 0.999


def test_native_speed_vs_scipy(rng):
    """The native path must beat scipy on the real workload size."""
    import time

    from scipy.spatial import cKDTree

    pts = rng.rand(20000, 3).astype(np.float32)

    t0 = time.perf_counter()
    native.estimate_normals(pts, k=33)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=33)
    neigh = pts[idx]
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / 33
    np.linalg.eigh(cov)
    t_scipy = time.perf_counter() - t0

    print(f"native {t_native * 1e3:.0f}ms vs scipy {t_scipy * 1e3:.0f}ms")
    assert t_native < t_scipy * 1.5  # at least competitive; typically faster
