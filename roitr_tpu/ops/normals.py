"""Normal estimation: PCA over k nearest neighbors + viewpoint redirection.

TPU/JAX replacement for the reference's Open3D dependency
(dataset/tdmatch.py:120-127: `estimate_normals(KDTreeSearchParamKNN(knn=33))`
followed by `normal_redirect`, dataset/common.py:312-320). The normal of each
point is the eigenvector of the smallest eigenvalue of its neighborhood
covariance, flipped to point toward the view point.

Runs device-side over padded clouds; a numpy twin lives in
roitr_tpu/data/preprocess.py for the host input pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roitr_tpu.ops.geometry import prefix_mask
from roitr_tpu.ops.neighbors import knn_gather, masked_knn


def _pca_normals(points, neigh, valid, k, view_point):
    """Shared tail: neighborhoods (N, k, 3) -> oriented unit normals (N, 3)."""
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    # eigh returns ascending eigenvalues; the smallest-eigenvalue vector is
    # the surface normal
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]
    normals = normals / jnp.clip(jnp.linalg.norm(normals, axis=-1, keepdims=True), min=1e-12)

    vp = jnp.asarray(view_point, points.dtype)
    flip = jnp.sum((vp[None, :] - points) * normals, axis=-1) < 0.0
    normals = jnp.where(flip[:, None], -normals, normals)
    # zero out padded rows so they never contribute spurious geometry
    return jnp.where(valid[:, None], normals, 0.0)


def estimate_normals(
    points: jnp.ndarray,
    count,
    k: int = 33,
    view_point=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """points: (N, 3) prefix-packed -> unit normals (N, 3), viewpoint-oriented.

    The k-neighborhood includes the point itself (Open3D KNN semantics).
    """
    idx, _ = masked_knn(points, points, count, k)
    neigh = knn_gather(points, idx)  # (N, k, 3)
    return _pca_normals(points, neigh, prefix_mask(points.shape[0], count),
                        k, view_point)


def estimate_normals_segmented(
    points: jnp.ndarray,
    counts: jnp.ndarray,
    k: int = 33,
    view_point=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Per-pair normals for a packed flat cloud.

    points: (B*N, 3) — B same-bucket clouds concatenated (data/packing.py
    layout); counts: (B,) valid rows per segment. Each segment's kNN runs
    against its own rows only (neighborhoods must not cross pair
    boundaries). The kNN is batched over B (distances + top_k vectorize;
    the 4.7x batched-gather pathology doesn't apply — the one neighborhood
    gather runs as a FLAT row gather on segment-offset indices, like
    data/packing.py does for the encoder), and the PCA tail runs on all
    B*N covariances at once: measured 28.5 -> ~3 ms per 16x512 side vs the
    former per-segment lax.map (tools/probe_serving_breakdown.py).
    Returns (B*N, 3) flat normals, padded rows zeroed.
    """
    b = counts.shape[0]
    n = points.shape[0] // b
    pts = points.reshape(b, n, 3)
    idx = jax.vmap(lambda p, c: masked_knn(p, p, c, k)[0])(pts, counts)  # (B, n, kk)
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    flat_idx = (idx + off).reshape(b * n, -1)
    neigh = knn_gather(points, flat_idx)  # (B*n, kk, 3) plain row gather
    rank = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = (rank < counts[:, None].astype(jnp.int32)).reshape(-1)
    return _pca_normals(points, neigh, valid, k, view_point)
