"""Host-side preprocessing: normals, augmentation, bucketed padding (numpy).

Replaces the reference's dataloader-worker stage (dataset/tdmatch.py:50-135:
torch.load -> cap 30k -> random SO(3) augment -> Open3D kNN-33 normals ->
redirect) with a numpy/scipy implementation that emits fixed-shape
prefix-packed arrays for the static-shape device pipeline. Open3D is
replaced by a scipy cKDTree + PCA normal estimator (and optionally the
native C++ helper in roitr_tpu/native once built).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from scipy.spatial import cKDTree


def estimate_normals_np(points: np.ndarray, k: int = 33) -> np.ndarray:
    """PCA normals over the k-neighborhood (incl. self), unoriented.

    Matches Open3D estimate_normals(KDTreeSearchParamKNN(knn=k)) up to sign:
    the smallest-eigenvalue eigenvector of the neighborhood covariance.
    Uses the native C++ KD-tree when built (roitr_tpu/native); the scipy
    path below is the reference implementation and fallback.
    """
    try:
        from roitr_tpu import native

        if native.available():
            # native output is already viewpoint-oriented toward the origin;
            # callers re-orient via normal_redirect_np, which is idempotent
            return native.estimate_normals(points, k=k)
    except Exception:
        pass
    n = points.shape[0]
    k = min(k, n)
    tree = cKDTree(points)
    _, idx = tree.query(points, k=k)
    if k == 1:
        idx = idx[:, None]
    neigh = points[idx]  # (N, k, 3)
    centered = neigh - neigh.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[..., 0]
    norms = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.clip(norms, 1e-12, None)).astype(np.float32)


def normal_redirect_np(points: np.ndarray, normals: np.ndarray, view_point) -> np.ndarray:
    """Flip normals toward the view point (reference dataset/common.py:312-320)."""
    vp = np.asarray(view_point, np.float32)
    flip = np.sum((vp - points) * normals, axis=-1) < 0.0
    out = normals.copy()
    out[flip] *= -1.0
    return out


def random_so3_augment(
    rng: np.random.RandomState,
    src_pcd: np.ndarray,
    tgt_pcd: np.ndarray,
    rot: np.ndarray,
    trans: np.ndarray,
    noise: float,
    rot_factor: float = 1.0,
):
    """Random full-SO(3) rotation of one side + GT fix-up + uniform noise
    (reference dataset/tdmatch.py:82-97). Mutates nothing; returns copies."""
    from scipy.spatial.transform import Rotation

    euler = rng.rand(3) * 2.0 * np.pi / rot_factor
    rot_ab = Rotation.from_euler("zyx", euler).as_matrix().astype(np.float32)
    src_pcd, tgt_pcd = src_pcd.copy(), tgt_pcd.copy()
    if rng.rand(1)[0] > 0.5:
        src_pcd = src_pcd @ rot_ab.T
        rot = rot @ rot_ab.T
    else:
        tgt_pcd = tgt_pcd @ rot_ab.T
        rot = rot_ab @ rot
        trans = rot_ab @ trans
    src_pcd = src_pcd + (rng.rand(*src_pcd.shape).astype(np.float32) - 0.5) * noise
    tgt_pcd = tgt_pcd + (rng.rand(*tgt_pcd.shape).astype(np.float32) - 0.5) * noise
    return src_pcd, tgt_pcd, rot.astype(np.float32), trans.astype(np.float32)


def seeded_so3_rotation(index: int, src_pcd, tgt_pcd, rot, trans, rot_factor: float = 1.0):
    """Deterministic per-index rotation for the `rotated` benchmark
    (reference dataset/tdmatch.py:99-112)."""
    rng = np.random.RandomState(index)
    from scipy.spatial.transform import Rotation

    euler = rng.rand(3) * 2.0 * np.pi / rot_factor
    rot_ab = Rotation.from_euler("zyx", euler).as_matrix().astype(np.float32)
    src_pcd, tgt_pcd = src_pcd.copy(), tgt_pcd.copy()
    if rng.rand(1)[0] > 0.5:
        src_pcd = src_pcd @ rot_ab.T
        rot = rot @ rot_ab.T
    else:
        tgt_pcd = tgt_pcd @ rot_ab.T
        rot = rot_ab @ rot
        trans = rot_ab @ trans
    return src_pcd, tgt_pcd, rot.astype(np.float32), trans.astype(np.float32)


def cap_points(rng: np.random.RandomState, pcd: np.ndarray, limit: int) -> np.ndarray:
    """Random subsample to the point cap (reference tdmatch.py:72-78)."""
    if pcd.shape[0] > limit:
        idx = rng.permutation(pcd.shape[0])[:limit]
        return pcd[idx]
    return pcd


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket (multiple of 64) holding n points."""
    for b in sorted(buckets):
        if n <= b:
            return b
    return sorted(buckets)[-1]


def pad_cloud(pcd: np.ndarray, normals: np.ndarray, bucket: int):
    """Prefix-pack into the bucket; returns (points, normals, feats, count)."""
    n = pcd.shape[0]
    pts = np.zeros((bucket, 3), np.float32)
    nrm = np.zeros((bucket, 3), np.float32)
    pts[:n] = pcd
    nrm[:n] = normals
    feats = np.ones((bucket, 1), np.float32)
    return pts, nrm, feats, np.int32(n)


def preprocess_pair(
    rng: np.random.RandomState,
    src_pcd: np.ndarray,
    tgt_pcd: np.ndarray,
    rot: np.ndarray,
    trans: np.ndarray,
    buckets: Sequence[int],
    points_limit: int = 30000,
    augment: bool = False,
    augment_noise: float = 0.005,
    rotated_index: Optional[int] = None,
    normal_knn: int = 33,
    view_point=(0.0, 0.0, 0.0),
    src_raw_pcd: Optional[np.ndarray] = None,
    metric_index: Optional[np.ndarray] = None,
    build_pyramid: bool = False,
    device_prep: bool = False,
) -> Dict[str, np.ndarray]:
    """Full host pipeline for one pair -> dict of padded arrays.

    `src_raw_pcd` (4DMatch): raw source geometry when `src_pcd` is the
    flow-deformed cloud; defaults to src_pcd (rigid).
    `device_prep` skips the expensive host stages (normal estimation and the
    pyramid build) — the consumer's jitted program recomputes both on device
    (ops/pyramid.py device_prep_pair); the zero normals placeholders are
    overwritten in-program before the model reads them.
    """
    if trans.ndim == 1:
        trans = trans[:, None]
    src_pcd = cap_points(rng, src_pcd, points_limit)
    tgt_pcd = cap_points(rng, tgt_pcd, points_limit)

    if augment:
        src_pcd, tgt_pcd, rot, trans = random_so3_augment(
            rng, src_pcd, tgt_pcd, rot, trans, augment_noise
        )
    elif rotated_index is not None:
        src_pcd, tgt_pcd, rot, trans = seeded_so3_rotation(
            rotated_index, src_pcd, tgt_pcd, rot, trans
        )
    if src_raw_pcd is None:
        src_raw_pcd = src_pcd

    if device_prep:
        src_normals = np.zeros_like(src_raw_pcd)
        tgt_normals = np.zeros_like(tgt_pcd)
    else:
        src_normals = normal_redirect_np(
            src_raw_pcd, estimate_normals_np(src_raw_pcd, normal_knn), view_point
        )
        tgt_normals = normal_redirect_np(
            tgt_pcd, estimate_normals_np(tgt_pcd, normal_knn), view_point
        )

    bucket = pick_bucket(max(src_pcd.shape[0], tgt_pcd.shape[0]), buckets)
    s_pts, s_nrm, s_feats, s_cnt = pad_cloud(src_pcd, src_normals, bucket)
    t_pts, t_nrm, t_feats, t_cnt = pad_cloud(tgt_pcd, tgt_normals, bucket)
    raw_pts = np.zeros((bucket, 3), np.float32)
    raw_pts[: src_raw_pcd.shape[0]] = src_raw_pcd

    out = {
        "src_points": s_pts,
        "src_raw_points": raw_pts,
        "src_normals": s_nrm,
        "src_feats": s_feats,
        "src_count": s_cnt,
        "tgt_points": t_pts,
        "tgt_normals": t_nrm,
        "tgt_feats": t_feats,
        "tgt_count": t_cnt,
        "rot": rot.astype(np.float32),
        "trans": trans.astype(np.float32),
    }
    if metric_index is not None:
        out["metric_index"] = metric_index
    if build_pyramid and not device_prep:
        from roitr_tpu.data.pyramid import build_cloud_pyramid

        # the backbone's pyramid is built on the raw source geometry
        # (reference RIGA_v2.py:62 runs the backbone on src_raw_pcd)
        out["src_pyramid"] = build_cloud_pyramid(raw_pts, s_cnt)
        out["tgt_pyramid"] = build_cloud_pyramid(t_pts, t_cnt)
    return out
