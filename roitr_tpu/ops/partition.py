"""Point-to-node partition and ground-truth patch correspondence generation.

Static-shape equivalents of reference lib/utils.py:428-614. The reference
uses `nonzero` to produce variable-length correspondence lists; here every
output is a fixed-capacity buffer plus a validity mask, so the whole pipeline
stays inside one jitted XLA program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from roitr_tpu.ops.geometry import (
    apply_transform,
    masked_pairwise_sq_dist,
    pairwise_sq_dist,
    prefix_mask,
)
from roitr_tpu.ops.neighbors import masked_knn

_BIG = 1e12


class Partition(NamedTuple):
    point_to_node: jnp.ndarray  # (N,) int32
    node_masks: jnp.ndarray  # (M,) bool — node owns >= 1 point
    node_knn_indices: jnp.ndarray  # (M, K) int32, padded entries = N
    node_knn_masks: jnp.ndarray  # (M, K) bool


def point_to_node_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_limit: int,
    point_count=None,
    node_count=None,
) -> Partition:
    """Assign each point to its nearest node; per node keep <= point_limit own
    points (nearest first). Matches reference lib/utils.py:428-471 including
    the "fixed knn bug" masking: a node's kNN list only contains points whose
    argmin node is that node; other slots are masked and index N (the padded
    row of a points array extended by one zero row).
    """
    n, m = points.shape[0], nodes.shape[0]
    pmask = prefix_mask(n, point_count) if point_count is not None else jnp.ones(n, bool)
    nmask = prefix_mask(m, node_count) if node_count is not None else jnp.ones(m, bool)

    sq = masked_pairwise_sq_dist(nodes, points, x_mask=nmask, y_mask=pmask, fill=_BIG)  # (M, N)
    point_to_node = jnp.argmin(sq, axis=0).astype(jnp.int32)  # (N,)
    # padded points must not claim ownership anywhere
    point_to_node = jnp.where(pmask, point_to_node, m)

    # node_masks: nodes that own at least one valid point
    owners = jax.nn.one_hot(point_to_node, m, dtype=jnp.int32)  # (N, M)
    node_masks = jnp.sum(owners, axis=0) > 0

    matching = (point_to_node[None, :] == jnp.arange(m, dtype=jnp.int32)[:, None]) & pmask[None, :]
    sq_masked = jnp.where(matching, sq, _BIG)
    neg, node_knn_indices = jax.lax.top_k(-sq_masked, point_limit)  # (M, K)
    node_knn_indices = node_knn_indices.astype(jnp.int32)
    node_knn_masks = (-neg) < _BIG
    node_knn_indices = jnp.where(node_knn_masks, node_knn_indices, n)
    return Partition(point_to_node, node_masks, node_knn_indices, node_knn_masks)


class NodeCorrespondences(NamedTuple):
    indices: jnp.ndarray  # (C, 2) int32 [ref, src]
    overlaps: jnp.ndarray  # (C,) float
    masks: jnp.ndarray  # (C,) bool


def node_correspondences(
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    pos_radius: float,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    max_candidates: int = 16384,
    chunk: int = 2048,
) -> NodeCorrespondences:
    """Ground-truth patch overlaps between all node pairs (train/metrics).

    Matches reference lib/utils.py:530-614: src geometry is moved into ref
    frame by the GT transform, candidate pairs are prefiltered by
    enclosing-sphere intersection, and per-pair overlap = mean of the two
    directed fractions of patch points having a counterpart within
    pos_radius.

    The reference extracts a ragged candidate list with `nonzero`; here the
    top `max_candidates` pairs by intersection margin form a fixed-shape
    batch, processed in chunks of (chunk, K, K) distance blocks. Pairs beyond
    capacity are dropped — with M, N <= 512 and default capacity 16384 this
    only truncates degenerate all-overlapping scenes.
    """
    m, k = ref_knn_points.shape[0], ref_knn_points.shape[1]
    n = src_knn_points.shape[0]

    src_nodes = apply_transform(src_nodes, rot, trans)
    src_knn_points = apply_transform(src_knn_points, rot, trans)

    node_mask_mat = ref_masks[:, None] & src_masks[None, :]  # (M, N)

    ref_knn_dists = jnp.linalg.norm(ref_knn_points - ref_nodes[:, None, :], axis=-1)
    ref_knn_dists = jnp.where(ref_knn_masks, ref_knn_dists, 0.0)
    ref_max = jnp.max(ref_knn_dists, axis=1)  # (M,)
    src_knn_dists = jnp.linalg.norm(src_knn_points - src_nodes[:, None, :], axis=-1)
    src_knn_dists = jnp.where(src_knn_masks, src_knn_dists, 0.0)
    src_max = jnp.max(src_knn_dists, axis=1)  # (N,)

    dist = jnp.sqrt(pairwise_sq_dist(ref_nodes, src_nodes))  # (M, N)
    margin = ref_max[:, None] + src_max[None, :] + pos_radius - dist
    intersect = (margin > 0) & node_mask_mat

    c = min(max_candidates, m * n)
    flat_margin = jnp.where(intersect, margin, -_BIG).reshape(-1)
    top_margin, flat_idx = jax.lax.top_k(flat_margin, c)
    cand_mask = top_margin > -_BIG
    ref_idx = (flat_idx // n).astype(jnp.int32)
    src_idx = (flat_idx % n).astype(jnp.int32)

    def overlap_chunk(args):
        ri, si = args
        rkp = ref_knn_points[ri]  # (c, K, 3)
        skp = src_knn_points[si]
        rkm = ref_knn_masks[ri]
        skm = src_knn_masks[si]
        pmask = rkm[:, :, None] & skm[:, None, :]
        d2 = pairwise_sq_dist(rkp, skp)
        d2 = jnp.where(pmask, d2, _BIG)
        hit = d2 < pos_radius**2  # (c, K, K)
        ref_cnt = jnp.sum(jnp.any(hit, axis=-1), axis=-1).astype(jnp.float32)
        src_cnt = jnp.sum(jnp.any(hit, axis=-2), axis=-1).astype(jnp.float32)
        ref_tot = jnp.clip(jnp.sum(rkm, axis=-1).astype(jnp.float32), min=1.0)
        src_tot = jnp.clip(jnp.sum(skm, axis=-1).astype(jnp.float32), min=1.0)
        return (ref_cnt / ref_tot + src_cnt / src_tot) / 2.0

    if c > chunk and c % chunk == 0:
        ri_c = ref_idx.reshape(c // chunk, chunk)
        si_c = src_idx.reshape(c // chunk, chunk)
        overlaps = jax.lax.map(overlap_chunk, (ri_c, si_c)).reshape(c)
    else:
        overlaps = overlap_chunk((ref_idx, src_idx))

    valid = cand_mask & (overlaps > 0)
    overlaps = jnp.where(valid, overlaps, 0.0)
    indices = jnp.stack([ref_idx, src_idx], axis=1)
    # neutralize indices of invalid slots so scatter consumers stay in-bounds
    indices = jnp.where(valid[:, None], indices, 0)
    return NodeCorrespondences(indices, overlaps, valid)


def node_occlusion_score(
    ref_knn_point_ids: jnp.ndarray,
    src_knn_point_ids: jnp.ndarray,
    ref_points: jnp.ndarray,
    src_points: jnp.ndarray,
    ref_count,
    src_count,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    overlap_thres: float = 0.0375,
    knn_method: str = "exact",
):
    """Per-node visibility in [0, 1] via 1-NN cross-cloud distances.

    Matches reference lib/utils.py:474-527. `ref_points`/`src_points` are the
    *padded* point arrays (N+1 rows, last row zero) indexed by the partition's
    kNN ids.
    """
    src_points_t = apply_transform(src_points, rot, trans)

    _, ref_d = masked_knn(ref_points, src_points_t, src_count, 1, method=knn_method)
    _, src_d = masked_knn(src_points_t, ref_points, ref_count, 1, method=knn_method)
    ref_overlap = (ref_d[:, 0] < overlap_thres).astype(jnp.float32)
    src_overlap = (src_d[:, 0] < overlap_thres).astype(jnp.float32)

    ref_knn_overlap = jnp.take(ref_overlap, ref_knn_point_ids, axis=0)
    src_knn_overlap = jnp.take(src_overlap, src_knn_point_ids, axis=0)

    rkm = ref_knn_masks.astype(jnp.float32)
    skm = src_knn_masks.astype(jnp.float32)
    ref_score = jnp.sum(ref_knn_overlap * rkm, axis=1) / (jnp.sum(rkm, axis=1) + 1e-10)
    src_score = jnp.sum(src_knn_overlap * skm, axis=1) / (jnp.sum(skm, axis=1) + 1e-10)
    return ref_score * ref_masks, src_score * src_masks
