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


def test_closed_form_eigvec_matches_eigh(rng):
    """The closed-form 3x3 solver must agree with LAPACK eigh (up to sign)
    on realistic PSD covariances, including near-degenerate ones."""
    from roitr_tpu.ops.normals import _smallest_eigvec_3x3

    # random PSD covariances with a spread of conditioning
    a = rng.randn(512, 3, 3).astype(np.float64)
    cov = np.einsum("nij,nkj->nik", a, a)
    scales = 10.0 ** rng.uniform(-4, 2, size=(512, 1, 1))
    cov = (cov * scales).astype(np.float32)

    got = np.asarray(_smallest_eigvec_3x3(jnp.array(cov)))
    w, v = np.linalg.eigh(cov.astype(np.float64))
    want = v[..., 0]
    # compare up to sign; skip matrices whose two smallest eigenvalues are
    # nearly tied (eigenvector genuinely ill-defined there)
    well = (w[:, 1] - w[:, 0]) > 1e-4 * np.abs(w[:, 2])
    dots = np.abs(np.sum(got[well] * want[well], axis=-1))
    assert dots.min() > 0.9999, dots.min()


def test_closed_form_eigvec_degenerate_cases():
    from roitr_tpu.ops.normals import _smallest_eigvec_3x3

    iso = np.stack([np.eye(3, dtype=np.float32),          # isotropic
                    np.zeros((3, 3), np.float32),         # all-zero
                    np.diag([1.0, 1.0, 0.0]).astype(np.float32),  # plane
                    np.diag([1.0, 0.0, 0.0]).astype(np.float32)]) # line
    out = np.asarray(_smallest_eigvec_3x3(jnp.array(iso)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)
    # plane cov: normal must be +-z; line cov: any unit vector orthogonal to x
    assert abs(out[2] @ np.array([0, 0, 1.0])) > 0.9999
    assert abs(out[3] @ np.array([1.0, 0, 0])) < 1e-4


def test_device_normals_match_numpy_twin(rng):
    """estimate_normals (device) vs estimate_normals_np (host dataset path)."""
    from roitr_tpu.data.preprocess import estimate_normals_np, normal_redirect_np

    pts = rng.randn(300, 3).astype(np.float32) * 0.5
    host = normal_redirect_np(pts, estimate_normals_np(pts, k=33),
                              np.zeros(3, np.float32))
    dev = np.asarray(estimate_normals(jnp.array(pts), 300, k=33))
    dots = np.sum(host * dev, axis=-1)
    # sign is fixed by the shared viewpoint redirect; require agreement except
    # where the neighborhood is genuinely ambiguous
    assert (dots > 0.999).mean() > 0.98, (dots.min(), (dots > 0.999).mean())


def test_normals_small_cloud_matches_numpy_twin(rng):
    """ADVICE r4 #2: clouds with fewer valid points than normal_knn must not
    pull zero-coordinate pad rows into the PCA covariance. The masked PCA
    reproduces the numpy twin's k=min(k, count) semantics exactly."""
    from roitr_tpu.data.preprocess import estimate_normals_np, normal_redirect_np
    from roitr_tpu.ops.normals import estimate_normals_segmented

    count = 10  # < k=33
    pts = np.zeros((64, 3), np.float32)
    # offset cloud so an origin bias would visibly rotate the normals
    pts[:count] = rng.randn(count, 3).astype(np.float32) * 0.1 + 3.0
    host = normal_redirect_np(
        pts[:count], estimate_normals_np(pts[:count], k=33), np.zeros(3, np.float32)
    )
    dev = np.asarray(estimate_normals(jnp.array(pts), count, k=33))[:count]
    dots = np.sum(host * dev, axis=-1)
    assert dots.min() > 0.999, dots

    # segmented variant: one short segment packed next to a full one
    full = rng.randn(64, 3).astype(np.float32)
    packed = np.concatenate([pts, full], axis=0)
    seg = np.asarray(
        estimate_normals_segmented(jnp.array(packed), jnp.array([count, 64]), k=33)
    )
    dots = np.sum(host * seg[:count], axis=-1)
    assert dots.min() > 0.999, dots
    assert (seg[count:64] == 0).all()  # pad rows stay zeroed
    host_full = normal_redirect_np(
        full, estimate_normals_np(full, k=33), np.zeros(3, np.float32)
    )
    dots_full = np.sum(host_full * seg[64:], axis=-1)
    assert (dots_full > 0.999).mean() > 0.98
