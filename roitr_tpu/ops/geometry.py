"""Core rotation-invariant geometry primitives (pure JAX, static shapes).

Semantics match the reference implementations (cited per function) but are
written for padded, prefix-packed clouds: a cloud is an `(N, 3)` array whose
first `count` rows are valid. All ops take counts/masks and keep shapes static
so XLA compiles one program per bucket size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e10


def prefix_mask(n: int, count) -> jnp.ndarray:
    """Boolean validity mask for a prefix-packed axis of static length n.

    `count` may be a (B,) vector for a packed batch (data/packing.py): the
    axis is then B aligned segments of n // B rows, each prefix-packed with
    its own count, and the returned mask is still flat (n,).
    """
    count = jnp.asarray(count)
    if count.ndim == 1:
        b = count.shape[0]
        seg = n // b
        return (jnp.arange(seg, dtype=jnp.int32)[None, :] < count[:, None]).reshape(n)
    return jnp.arange(n, dtype=jnp.int32) < count


def index_valid(idx: jnp.ndarray, count, level_size: int) -> jnp.ndarray:
    """Validity of row indices into a prefix-packed axis of `level_size` rows.

    Scalar `count`: idx < count. Vector (B,) `count` (packed batch): the axis
    is B segments of level_size // B rows; an index is valid iff its offset
    within its segment is below that segment's count.
    """
    count = jnp.asarray(count)
    if count.ndim == 1:
        seg = level_size // count.shape[0]
        return (idx % seg) < count[idx // seg]
    return idx < count


def pairwise_sq_dist(x: jnp.ndarray, y: jnp.ndarray, normalized: bool = False) -> jnp.ndarray:
    """Squared Euclidean distances between all row pairs.

    x: (..., N, C), y: (..., M, C) -> (..., N, M).
    Matches reference lib/utils.py:139-156 (`square_distance`), including the
    1e-12 clamp; `normalized=True` uses 2 - 2<x,y> for unit vectors.
    """
    # geometry must be exact: force fp32 MXU passes (default TPU precision is
    # bf16 and the x2 - 2xy + y2 form amplifies the rounding)
    xy = jnp.einsum(
        "...nc,...mc->...nm",
        x,
        y,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if normalized:
        d2 = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x * x, axis=-1)[..., :, None]
        y2 = jnp.sum(y * y, axis=-1)[..., None, :]
        d2 = x2 - 2.0 * xy + y2
    return jnp.clip(d2, min=1e-12)


def masked_pairwise_sq_dist(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: jnp.ndarray | None = None,
    y_mask: jnp.ndarray | None = None,
    fill: float = _INF,
) -> jnp.ndarray:
    """pairwise_sq_dist with invalid rows/cols pushed to `fill`."""
    d2 = pairwise_sq_dist(x, y)
    if y_mask is not None:
        d2 = jnp.where(y_mask[..., None, :], d2, fill)
    if x_mask is not None:
        d2 = jnp.where(x_mask[..., :, None], d2, fill)
    return d2


def _angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unsigned angle between 3-vectors along the last axis, in [0, pi]."""
    y = jnp.sum(a * b, axis=-1)
    x = jnp.linalg.norm(jnp.cross(a, b), axis=-1)
    return jnp.arctan2(x, y)


def calc_ppf(
    points: jnp.ndarray,
    point_normals: jnp.ndarray,
    group_points: jnp.ndarray,
    group_normals: jnp.ndarray,
) -> jnp.ndarray:
    """Point-Pair Features of each point against its neighborhood.

    points: (N, 3), point_normals: (N, 3),
    group_points/group_normals: (N, K, 3) -> ppf (N, K, 4) =
      [||d||, angle(n1, d)/pi, angle(n2, d)/pi, angle(n1, n2)/pi].

    Matches reference lib/utils.py:358-389 (`calc_ppf_gpu`). PPFs are the sole
    geometric input to the network, giving SO(3) invariance.
    """
    c = points[..., :, None, :]
    nc = point_normals[..., :, None, :]
    vec_d = group_points - c
    d = jnp.linalg.norm(vec_d, axis=-1, keepdims=True)
    a1 = _angle(jnp.broadcast_to(nc, vec_d.shape), vec_d)[..., None] / jnp.pi
    a2 = _angle(group_normals, vec_d)[..., None] / jnp.pi
    a3 = _angle(jnp.broadcast_to(nc, group_normals.shape), group_normals)[..., None] / jnp.pi
    return jnp.concatenate([d, a1, a2, a3], axis=-1)


def apply_transform(points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """points (..., 3) x rot (3,3) + trans (3,) or (3,1) -> (..., 3)."""
    t = trans.reshape(3)
    return points @ rot.T + t


def weighted_procrustes(
    src_points: jnp.ndarray,
    tgt_points: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
):
    """Weighted rigid alignment (Kabsch/SVD) src -> tgt.

    src_points/tgt_points: (M, 3) (or batched (B, M, 3)); weights: (M,).
    Returns (R (3,3), t (3,)). Matches reference lib/utils.py:159-218.
    """
    batched = src_points.ndim == 3
    if not batched:
        src_points, tgt_points = src_points[None], tgt_points[None]
        if weights is not None:
            weights = weights[None]
    if weights is None:
        weights = jnp.ones(src_points.shape[:2], src_points.dtype)
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    wn = weights / (jnp.sum(weights, axis=1, keepdims=True) + eps)

    src_c = jnp.sum(src_points * wn[..., None], axis=1, keepdims=True)
    tgt_c = jnp.sum(tgt_points * wn[..., None], axis=1, keepdims=True)
    src0 = src_points - src_c
    tgt0 = tgt_points - tgt_c
    h = jnp.einsum("bmi,bm,bmj->bij", src0, weights, tgt0)
    u, _, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(v @ ut)
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1)
    r = v @ (d[..., :, None] * ut)
    # TPU's fp32 SVD is iterative and leaves ~1e-3 orthonormality error;
    # two Newton-Schulz steps polish R back onto SO(3) at negligible cost.
    eye = jnp.eye(3, dtype=r.dtype)
    for _ in range(2):
        r = r @ (1.5 * eye - 0.5 * (jnp.swapaxes(r, -1, -2) @ r))
    t = jnp.squeeze(jnp.swapaxes(tgt_c, -1, -2) - r @ jnp.swapaxes(src_c, -1, -2), -1)
    if not batched:
        return r[0], t[0]
    return r, t
