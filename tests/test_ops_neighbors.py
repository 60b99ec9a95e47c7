"""Golden tests for masked kNN / FPS / interpolation vs numpy references."""

import numpy as np
import jax.numpy as jnp

from roitr_tpu.ops.fps import furthest_point_sampling
from roitr_tpu.ops.neighbors import masked_knn, three_nn_interpolate


def np_knn(queries, keys, k):
    d = ((queries[:, None, :] - keys[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.sqrt(np.take_along_axis(d, idx, axis=1))


def test_masked_knn_matches_numpy(rng):
    q = rng.randn(37, 3).astype(np.float32)
    keys = rng.randn(64, 3).astype(np.float32)
    count = 50
    idx, dist = masked_knn(jnp.array(q), jnp.array(keys), count, 5, query_tile=16)
    ref_idx, ref_dist = np_knn(q, keys[:count], 5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(dist), ref_dist, atol=1e-4)


def test_masked_knn_exclude_self(rng):
    pts = rng.randn(30, 3).astype(np.float32)
    idx, dist = masked_knn(jnp.array(pts), jnp.array(pts), 30, 4, exclude_self=True, query_tile=8)
    ref_idx, ref_dist = np_knn(pts, pts, 5)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx[:, 1:])
    assert (np.asarray(dist) > 0).all()


def test_fps_matches_numpy(rng):
    pts = rng.randn(64, 3).astype(np.float32)
    count, m = 48, 12
    idx = np.asarray(furthest_point_sampling(jnp.array(pts), count, m))

    # independent numpy FPS, seeded at index 0
    dists = np.full(64, 1e10)
    dists[count:] = -np.inf
    picked = [0]
    for _ in range(m - 1):
        d2 = ((pts - pts[picked[-1]]) ** 2).sum(-1)
        d2[count:] = -np.inf
        dists = np.minimum(dists, d2)
        picked.append(int(np.argmax(dists)))
    np.testing.assert_array_equal(idx, np.array(picked))
    assert len(set(picked)) == m  # all distinct while enough valid points


def test_fps_exhausts_valid_points(rng):
    pts = rng.randn(16, 3).astype(np.float32)
    idx = np.asarray(furthest_point_sampling(jnp.array(pts), 5, 8))
    assert (idx[:5] < 5).all()
    assert len(set(idx[:5].tolist())) == 5


def test_three_nn_interpolate(rng):
    parent = rng.randn(20, 3).astype(np.float32)
    child = rng.randn(12, 3).astype(np.float32)
    feats = rng.randn(12, 4).astype(np.float32)
    count = 10
    out = np.asarray(
        three_nn_interpolate(jnp.array(parent), jnp.array(child), jnp.array(feats), count)
    )

    idx, dist = np_knn(parent, child[:count], 3)
    w = 1.0 / np.clip(dist, 1e-8, None)
    w /= w.sum(-1, keepdims=True)
    ref = (feats[idx] * w[..., None]).sum(1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
