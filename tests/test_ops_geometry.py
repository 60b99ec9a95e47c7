"""Golden tests for geometry primitives vs independent numpy references."""

import numpy as np
import jax.numpy as jnp

from roitr_tpu.ops.geometry import (
    apply_transform,
    calc_ppf,
    pairwise_sq_dist,
    weighted_procrustes,
)


def np_sq_dist(x, y):
    d = x[:, None, :] - y[None, :, :]
    return np.clip((d * d).sum(-1), 1e-12, None)


def random_rotation(rng):
    a = rng.randn(3, 3)
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_pairwise_sq_dist(rng):
    x = rng.randn(17, 3).astype(np.float32)
    y = rng.randn(23, 3).astype(np.float32)
    got = np.asarray(pairwise_sq_dist(jnp.array(x), jnp.array(y)))
    np.testing.assert_allclose(got, np_sq_dist(x, y), rtol=1e-4, atol=1e-5)


def test_ppf_values(rng):
    n, k = 10, 5
    pts = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    gpts = rng.randn(n, k, 3).astype(np.float32)
    gnrm = rng.randn(n, k, 3).astype(np.float32)
    gnrm /= np.linalg.norm(gnrm, axis=-1, keepdims=True)

    ppf = np.asarray(calc_ppf(jnp.array(pts), jnp.array(nrm), jnp.array(gpts), jnp.array(gnrm)))

    # independent scalar implementation
    for i in range(n):
        for j in range(k):
            d = gpts[i, j] - pts[i]
            assert np.isclose(ppf[i, j, 0], np.linalg.norm(d), atol=1e-5)

            def ang(a, b):
                return np.arctan2(np.linalg.norm(np.cross(a, b)), np.dot(a, b))

            assert np.isclose(ppf[i, j, 1], ang(nrm[i], d) / np.pi, atol=1e-5)
            assert np.isclose(ppf[i, j, 2], ang(gnrm[i, j], d) / np.pi, atol=1e-5)
            assert np.isclose(ppf[i, j, 3], ang(nrm[i], gnrm[i, j]) / np.pi, atol=1e-5)


def test_ppf_rotation_invariance(rng):
    """PPFs must be identical under a rigid transform of the whole scene."""
    n, k = 32, 8
    pts = rng.randn(n, 3).astype(np.float32)
    nrm = rng.randn(n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    gsel = rng.randint(0, n, size=(n, k))
    gpts, gnrm = pts[gsel], nrm[gsel]

    r = random_rotation(rng).astype(np.float32)
    t = rng.randn(3).astype(np.float32)

    ppf0 = np.asarray(calc_ppf(jnp.array(pts), jnp.array(nrm), jnp.array(gpts), jnp.array(gnrm)))
    pts_r = pts @ r.T + t
    nrm_r = nrm @ r.T
    ppf1 = np.asarray(
        calc_ppf(jnp.array(pts_r), jnp.array(nrm_r), jnp.array(pts_r[gsel]), jnp.array(nrm_r[gsel]))
    )
    np.testing.assert_allclose(ppf0, ppf1, atol=2e-4)


def test_weighted_procrustes_recovers_transform(rng):
    src = rng.randn(50, 3).astype(np.float32)
    r_gt = random_rotation(rng).astype(np.float32)
    t_gt = rng.randn(3).astype(np.float32)
    tgt = src @ r_gt.T + t_gt
    w = rng.rand(50).astype(np.float32) + 0.1

    r, t = weighted_procrustes(jnp.array(src), jnp.array(tgt), jnp.array(w))
    np.testing.assert_allclose(np.asarray(r), r_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-4)

    out = np.asarray(apply_transform(jnp.array(src), r, t))
    np.testing.assert_allclose(out, tgt, atol=1e-4)
