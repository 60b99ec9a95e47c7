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


def _smallest_eigvec_3x3(cov: jnp.ndarray) -> jnp.ndarray:
    """Closed-form smallest eigenvector of symmetric (..., 3, 3) matrices.

    Trigonometric eigenvalue form + cross-product eigenvector extraction —
    pure elementwise VPU math instead of jnp.linalg.eigh's iterative
    batched solver (the native host twin, native/kdtree.cpp, uses the same
    closed form). For isotropic neighborhoods (p ~ 0, normal undefined)
    returns +z, matching "arbitrary unit vector" semantics.
    """
    a, b, c = cov[..., 0, 0], cov[..., 1, 1], cov[..., 2, 2]
    d, f, e = cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 2]
    q = (a + b + c) / 3.0
    p2 = (a - q) ** 2 + (b - q) ** 2 + (c - q) ** 2 + 2.0 * (d * d + f * f + e * e)
    p = jnp.sqrt(jnp.clip(p2 / 6.0, min=0.0))
    iso = p < 1e-20
    ps = jnp.where(iso, 1.0, p)
    aq, bq, cq = (a - q) / ps, (b - q) / ps, (c - q) / ps
    dn, fn, en = d / ps, f / ps, e / ps
    detb = (aq * (bq * cq - en * en) - dn * (dn * cq - en * fn)
            + fn * (dn * en - bq * fn))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    def extract(lam, prev):
        # rows of (C - lam I); its null vector = any two rows' cross
        # product (== rows of the adjugate). Pick the largest-norm
        # candidate (robust when one row degenerates); keep `prev` where
        # all candidates vanish (repeated eigenvalue: direction ambiguous).
        m = cov - lam[..., None, None] * jnp.eye(3, dtype=cov.dtype)
        r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
        cands = jnp.stack(
            [jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)], axis=-2)
        norms2 = jnp.sum(cands * cands, axis=-1)
        best = jnp.argmax(norms2, axis=-1)
        vec = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
        good = jnp.take_along_axis(norms2, best[..., None], axis=-1) > 1e-30
        vec = jnp.where(good & ~iso[..., None], vec, prev)
        return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)

    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], cov.dtype), cov.shape[:-1])
    vec = extract(lam_min, z)
    # One inverse-iteration step polishes the adjugate extraction to LAPACK
    # agreement: solving (C - lam I) y = v by Cramer's rule is the classic
    # inverse-iteration move — the near-singular solve's rounding error
    # grows exactly the eigencomponent we want. Measured on real
    # neighborhood covariances vs fp64 eigh (sin metric — arccos(dot)
    # saturates at sqrt(ulp)~3e-4 for fp32 unit vectors and is useless
    # here): unpolished max 6.3e-6 rad, polished max 3.4e-7 vs LAPACK
    # fp32's 3.9e-8. The step keeps device normals within near-tie range
    # of the eigh-based twins for two extra rounds of 3x3 VPU math.
    lam = jnp.einsum("...i,...ij,...j->...", vec, cov, vec)
    m = cov - lam[..., None, None] * jnp.eye(3, dtype=cov.dtype)

    def det3(c0, c1, c2):
        return jnp.sum(c0 * jnp.cross(c1, c2), axis=-1)

    c0, c1, c2 = m[..., :, 0], m[..., :, 1], m[..., :, 2]
    y = jnp.stack([det3(vec, c1, c2), det3(c0, vec, c2), det3(c0, c1, vec)],
                  axis=-1)  # direction of solve(m, vec); det(m) scale cancels
    ny = jnp.sum(y * y, axis=-1, keepdims=True)
    ok = ny > 1e-30
    vec = jnp.where(ok, y / jnp.sqrt(jnp.where(ok, ny, 1.0)), vec)
    # keep orientation stable relative to the pre-polish estimate so the
    # caller's viewpoint flip sees a deterministic sign
    return vec


def _pca_normals(points, neigh, valid, slot_valid, view_point):
    """Shared tail: neighborhoods (N, k, 3) -> oriented unit normals (N, 3).

    slot_valid (N, k) marks REAL neighbor slots: when a cloud has fewer
    valid points than k, masked_knn's trailing slots hold pad-row indices
    (zero coordinates) that would bias the covariance toward the origin.
    Masking them and normalizing by the true slot count reproduces the
    numpy twin's k=min(k, count) semantics exactly (estimate_normals_np);
    for full neighborhoods the weights are all-ones and the math is
    unchanged.
    """
    w = slot_valid[..., None].astype(neigh.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)  # (N, 1, 1)
    mean = jnp.sum(neigh * w, axis=1, keepdims=True) / cnt
    centered = (neigh - mean) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / cnt  # (N,1,1) bcast
    # smallest-eigenvalue vector of the covariance = the surface normal
    normals = _smallest_eigvec_3x3(cov)

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
    # slots are ascending-sorted, so ranks >= count are the +inf-masked pads
    slot_valid = jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :] < jnp.asarray(
        count, jnp.int32
    )
    return _pca_normals(points, neigh, prefix_mask(points.shape[0], count),
                        slot_valid, view_point)


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
    kk = idx.shape[-1]
    slot_valid = jnp.broadcast_to(
        jnp.arange(kk, dtype=jnp.int32)[None, None, :]
        < counts[:, None, None].astype(jnp.int32),
        (b, n, kk),
    ).reshape(b * n, kk)
    return _pca_normals(points, neigh, valid, slot_valid, view_point)
