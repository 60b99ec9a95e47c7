"""Tests for PCA normal estimation."""

import numpy as np
import jax.numpy as jnp

from roitr_tpu.ops.normals import estimate_normals


def test_normals_on_plane(rng):
    """Points on a tilted plane must get the plane normal, viewpoint-oriented."""
    n = 200
    uv = rng.randn(n, 2).astype(np.float32)
    basis = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
    plane_n = basis[:, 2]
    pts = uv @ basis[:, :2].T + np.array([0.0, 0.0, 5.0], np.float32)

    normals = np.asarray(estimate_normals(jnp.array(pts), n, k=16))
    # orientation: toward origin view point
    expected = plane_n if np.dot(-pts[0], plane_n) > 0 else -plane_n
    dots = normals @ expected
    assert (dots > 0.99).all()


def test_normals_padded_rows_zero(rng):
    pts = rng.randn(32, 3).astype(np.float32)
    normals = np.asarray(estimate_normals(jnp.array(pts), 20, k=8))
    assert (normals[20:] == 0).all()
    np.testing.assert_allclose(np.linalg.norm(normals[:20], axis=-1), 1.0, atol=1e-5)
