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
    return jnp.where(prefix_mask(points.shape[0], count)[:, None], normals, 0.0)


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
    boundaries), sequenced with lax.map — batched neighborhood gathers lower
    poorly on TPU (PERFORMANCE.md), and normals are a prologue, not the hot
    loop. Returns (B*N, 3) flat normals, padded rows zeroed.
    """
    b = counts.shape[0]
    pts = points.reshape(b, -1, 3)
    out = jax.lax.map(
        lambda seg: estimate_normals(seg[0], seg[1], k=k, view_point=view_point),
        (pts, counts),
    )
    return out.reshape(-1, 3)
