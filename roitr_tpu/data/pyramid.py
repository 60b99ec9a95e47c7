"""Host-side precomputation of the backbone's geometric pyramid.

FPS is inherently sequential (O(m) dependent steps) and kNN is heavy at
30k points — both are pure geometry, independent of model parameters. This
module computes the per-level FPS indices and kNN neighborhoods on the host
(native C++ KD-tree/FPS with scipy fallback) so the loader can overlap them
with device compute; the device-side ops in the backbone remain the
fallback when no pyramid is attached.

Index semantics mirror the device path exactly (roitr_tpu/models/backbone.py):
- level l>1 points are FPS samples of level l-1, seeded at index 0
  (reference sampling_cuda_kernel.cu:39), count_l = count_{l-1} // 4;
- cross kNN: nsample nearest level-(l-1) points of each level-l point,
  excluding the point itself (reference functions/pointops.py:88-89);
- self kNN: same within the level.
Short neighbor lists (fewer than nsample+1 valid points in a level) pad
with index 0 — the reference kernel's segment-start padding — and those
phantom duplicates participate in attention (no neighbor mask), matching
pointops exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class CloudPyramid(NamedTuple):
    fps_idx2: np.ndarray  # (B/4,) int32 into level 1
    fps_idx3: np.ndarray  # (B/16,) into level 2
    fps_idx4: np.ndarray  # (B/64,) into level 3
    cross_idx1: np.ndarray  # (B, k1) level-1 self-set (stride 1)
    cross_idx2: np.ndarray  # (B/4, k2) level-2 queries among level-1 keys
    cross_idx3: np.ndarray
    cross_idx4: np.ndarray
    self_idx1: np.ndarray  # (B, k1)
    self_idx2: np.ndarray  # (B/4, k2)
    self_idx3: np.ndarray
    self_idx4: np.ndarray
    # decoder 3-NN upsampling (queries = level l-1, keys = level l):
    # idx (M_{l-1}, 3) + inverse-distance weights (M_{l-1}, 3)
    up_idx2: np.ndarray  # level 2 -> level 1
    up_w2: np.ndarray
    up_idx3: np.ndarray  # level 3 -> level 2
    up_w3: np.ndarray
    up_idx4: np.ndarray  # level 4 -> level 3
    up_w4: np.ndarray


def _knn_host(keys: np.ndarray, queries: np.ndarray, k: int, key_bucket: int) -> np.ndarray:
    """Self-excluded kNN with the device path's exact semantics
    (ops/neighbors.py masked_knn): always k columns; when fewer than k+1
    valid keys exist, trailing slots duplicate key index 0 — the reference
    kernel's short-segment padding (knnquery_cuda_kernel.cu:65-108), which
    participates in attention as a real neighbor."""
    count = keys.shape[0]
    kk = min(k + 1, count)
    try:
        from roitr_tpu import native

        if native.available():
            idx, _ = native.knn(keys, queries, kk)
            idx = np.where(idx < 0, 0, idx)
        else:
            raise RuntimeError
    except Exception:
        from scipy.spatial import cKDTree

        _, idx = cKDTree(keys).query(queries, k=kk)
        if kk == 1:
            idx = idx[:, None]
    idx = idx[:, 1:] if kk > 1 else idx[:, :0]
    missing = k - idx.shape[1]
    if missing > 0:
        idx = np.concatenate(
            [idx, np.zeros((idx.shape[0], missing), np.int64)], axis=1)
    return idx.astype(np.int32)


def _fps_host(points: np.ndarray, m: int) -> np.ndarray:
    try:
        from roitr_tpu import native

        if native.available():
            return native.fps(points, m)
    except Exception:
        pass
    n = points.shape[0]
    dist = np.full(n, np.inf, np.float64)
    out = np.zeros(m, np.int32)
    last = 0
    for s in range(1, m):
        d = ((points - points[last]) ** 2).sum(-1)
        np.minimum(dist, d, out=dist)
        last = int(np.argmax(dist))
        out[s] = last
    return out


def build_cloud_pyramid(
    points: np.ndarray,
    count: int,
    strides=(1, 4, 4, 4),
    nsample=(8, 16, 16, 16),
) -> CloudPyramid:
    """points: (bucket, 3) prefix-packed with `count` valid rows."""
    bucket = points.shape[0]
    count = int(count)
    cur = np.ascontiguousarray(points[:count], np.float32)
    cur_bucket = bucket

    fps_list, cross_list, self_list, up_list = [], [], [], []
    for lvl, (stride, k) in enumerate(zip(strides, nsample)):
        new_bucket = cur_bucket // stride
        if stride != 1:
            m = max(len(cur) // stride, 1)
            idx_valid = _fps_host(cur, m)
            new = cur[idx_valid]
            fps_idx = np.zeros(new_bucket, np.int32)
            fps_idx[:m] = idx_valid
            fps_list.append(fps_idx)

            # decoder 3-NN interpolation: queries = this level's parents (cur),
            # keys = the sampled set (new); matches three_nn_interpolate
            kk = min(3, len(new))
            try:
                from roitr_tpu import native

                if native.available():
                    up_i, up_d = native.knn(new, cur, kk)
                    up_i = np.where(up_i < 0, 0, up_i)
                else:
                    raise RuntimeError
            except Exception:
                from scipy.spatial import cKDTree

                up_d, up_i = cKDTree(new).query(cur, k=kk)
                if kk == 1:
                    up_d, up_i = up_d[:, None], up_i[:, None]
            if kk < 3:
                up_i = np.pad(up_i, ((0, 0), (0, 3 - kk)), mode="edge")
                up_d = np.pad(up_d, ((0, 0), (0, 3 - kk)), constant_values=1e10)
            recip = 1.0 / np.clip(up_d, 1e-8, None)
            w = (recip / recip.sum(-1, keepdims=True)).astype(np.float32)
            up_idx = np.zeros((cur_bucket, 3), np.int32)
            up_w = np.zeros((cur_bucket, 3), np.float32)
            up_idx[: len(cur)] = up_i
            up_w[: len(cur)] = w
            up_list.append((up_idx, up_w))
        else:
            new = cur

        cross_valid = _knn_host(cur, new, k, cur_bucket)
        cross = np.zeros((new_bucket, cross_valid.shape[1]), np.int32)
        cross[: len(new)] = cross_valid
        cross_list.append(cross)

        self_valid = _knn_host(new, new, k, new_bucket)
        self_idx = np.zeros((new_bucket, self_valid.shape[1]), np.int32)
        self_idx[: len(new)] = self_valid
        self_list.append(self_idx)

        cur = new
        cur_bucket = new_bucket

    return CloudPyramid(
        fps_idx2=fps_list[0],
        fps_idx3=fps_list[1],
        fps_idx4=fps_list[2],
        cross_idx1=cross_list[0],
        cross_idx2=cross_list[1],
        cross_idx3=cross_list[2],
        cross_idx4=cross_list[3],
        self_idx1=self_list[0],
        self_idx2=self_list[1],
        self_idx3=self_list[2],
        self_idx4=self_list[3],
        up_idx2=up_list[0][0],
        up_w2=up_list[0][1],
        up_idx3=up_list[1][0],
        up_w3=up_list[1][1],
        up_idx4=up_list[2][0],
        up_w4=up_list[2][1],
    )
