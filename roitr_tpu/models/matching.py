"""Coarse and fine matching heads with static-shape, fixed-capacity outputs.

Rebuilds reference model/modules.py:75-324. The reference relies on
`nonzero`/ragged outputs; here every head emits fixed-size index/score
buffers plus validity masks so the whole pipeline jits:

- coarse matching: global top-k is already fixed-size (k=256);
- GT correspondence sampling: Gumbel top-k without replacement over the
  masked candidate set (equivalent in distribution to np.random.choice
  without replacement);
- fine matching: mutual top-k bounds the matches per patch at K*topk, so a
  per-patch top-(K*topk) extraction is *exact* — no truncation, no raggedness.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from roitr_tpu.models.attention import masked_softmax  # noqa: F401  (re-export convenience)
from roitr_tpu.ops.geometry import pairwise_sq_dist


class CoarseCorr(NamedTuple):
    ref_indices: jnp.ndarray  # (P,) int32
    src_indices: jnp.ndarray  # (P,) int32
    scores: jnp.ndarray  # (P,)
    masks: jnp.ndarray  # (P,) bool


def coarse_matching(
    ref_feats: jnp.ndarray,
    src_feats: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    num_correspondences: int,
    dual_normalization: bool = True,
) -> CoarseCorr:
    """Top-k superpoint matching by exp(-feature distance) similarity with
    optional dual row/col normalization (reference modules.py:135-178).

    Invalid rows/cols contribute zero similarity, which reproduces the
    reference's remove-empty-then-topk behavior without index compaction.
    """
    d2 = pairwise_sq_dist(ref_feats, src_feats)
    scores = jnp.exp(-d2)
    pair_mask = ref_masks[:, None] & src_masks[None, :]
    scores = jnp.where(pair_mask, scores, 0.0)
    if dual_normalization:
        ref_scores = scores / (jnp.sum(scores, axis=1, keepdims=True) + 1e-8)
        src_scores = scores / (jnp.sum(scores, axis=0, keepdims=True) + 1e-8)
        scores = ref_scores * src_scores

    n = scores.shape[1]
    k = min(num_correspondences, scores.size)
    corr_scores, flat_idx = jax.lax.top_k(scores.reshape(-1), k)
    ref_idx = (flat_idx // n).astype(jnp.int32)
    src_idx = (flat_idx % n).astype(jnp.int32)
    valid = corr_scores > 0.0
    return CoarseCorr(ref_idx, src_idx, corr_scores, valid)


def adaptive_superpoint_matching(
    src_feats: jnp.ndarray,
    tgt_feats: jnp.ndarray,
    src_masks: jnp.ndarray,
    tgt_masks: jnp.ndarray,
    min_num_correspondences: int,
    capacity: int,
    similarity_threshold: float = 0.75,
) -> CoarseCorr:
    """Threshold-adaptive superpoint matching for non-rigid benchmarks
    (reference modules.py:75-124): keep every pair whose normalized feature
    distance <= threshold; if fewer than `min_num_correspondences`, fall back
    to the smallest distances. The reference output is ragged; here the
    `capacity` smallest distances form the fixed buffer and slots are valid
    if they pass the threshold or rank below the minimum count.

    Returns CoarseCorr with (src, tgt) in the reference's argument order:
    ref_indices=src, src_indices=tgt (the caller re-orients).
    """
    d2 = pairwise_sq_dist(src_feats, tgt_feats, normalized=True)
    dist = jnp.sqrt(d2)
    pair_mask = src_masks[:, None] & tgt_masks[None, :]
    dist = jnp.where(pair_mask, dist, jnp.inf)

    n = dist.shape[1]
    cap = min(capacity, dist.size)
    neg, flat_idx = jax.lax.top_k(-dist.reshape(-1), cap)
    corr_dist = -neg
    src_idx = (flat_idx // n).astype(jnp.int32)
    tgt_idx = (flat_idx % n).astype(jnp.int32)

    min_k = min(min_num_correspondences, cap)
    rank = jnp.arange(cap)
    finite = jnp.isfinite(corr_dist)
    valid = finite & ((corr_dist <= similarity_threshold) | (rank < min_k))
    scores = jnp.where(valid, jnp.exp(-corr_dist), 0.0)
    return CoarseCorr(src_idx, tgt_idx, scores, valid)


def gt_coarse_corr_generator(
    rng: jax.Array,
    gt_corr_indices: jnp.ndarray,  # (C, 2) [ref, src]
    gt_corr_overlaps: jnp.ndarray,  # (C,)
    gt_corr_masks: jnp.ndarray,  # (C,)
    num_targets: int,
    overlap_threshold: float,
) -> CoarseCorr:
    """Randomly select up to `num_targets` GT correspondences with overlap
    above the threshold (reference modules.py:181-213). Sampling without
    replacement is done with the Gumbel top-k trick over the eligible set.
    """
    eligible = gt_corr_masks & (gt_corr_overlaps > overlap_threshold)
    gumbel = jax.random.gumbel(rng, gt_corr_overlaps.shape)
    keys = jnp.where(eligible, gumbel, -jnp.inf)
    num_targets = min(num_targets, keys.shape[0])
    _, sel = jax.lax.top_k(keys, num_targets)
    valid = eligible[sel]
    sel_safe = jnp.where(valid, sel, 0)
    ref_idx = jnp.where(valid, gt_corr_indices[sel_safe, 0], 0)
    src_idx = jnp.where(valid, gt_corr_indices[sel_safe, 1], 0)
    overlaps = jnp.where(valid, gt_corr_overlaps[sel_safe], 0.0)
    return CoarseCorr(ref_idx.astype(jnp.int32), src_idx.astype(jnp.int32), overlaps, valid)


class FineCorr(NamedTuple):
    ref_points: jnp.ndarray  # (P * cap, 3)
    src_points: jnp.ndarray  # (P * cap, 3)
    scores: jnp.ndarray  # (P * cap,)
    masks: jnp.ndarray  # (P * cap,) bool


def _topk_scatter_mask(scores: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Boolean mask marking the top-k entries of `scores` along `axis`,
    scatter-style (exact reference semantics incl. tie handling via index
    order, modules.py:251-264)."""
    moved = jnp.moveaxis(scores, axis, -1)
    _, idx = jax.lax.top_k(moved, k)
    onehot = jax.nn.one_hot(idx, moved.shape[-1], dtype=bool)  # (..., k, D)
    mask = jnp.any(onehot, axis=-2)
    return jnp.moveaxis(mask, -1, axis)


# Module A/B switch for the fast mutual extraction path (profiling tools
# flip this to measure the slow exact-cap path on identical inputs).
FAST_FINE_MATCHING = True


def fine_matching(
    ref_knn_points: jnp.ndarray,  # (P, K, 3)
    src_knn_points: jnp.ndarray,  # (P, K, 3)
    ref_knn_masks: jnp.ndarray,  # (P, K)
    src_knn_masks: jnp.ndarray,  # (P, K)
    score_mat: jnp.ndarray,  # (P, K, K) — or (P, K+1, K+1) with use_dustbin
    patch_masks: jnp.ndarray,  # (P,) validity of each patch correspondence
    global_scores: Optional[jnp.ndarray] = None,  # (P,)
    k: int = 3,
    mutual: bool = True,
    confidence_threshold: float = 0.05,
    use_global_score: bool = False,
    use_dustbin: bool = False,
    allow_fast: bool = True,
) -> FineCorr:
    """Point matching inside matched patches (reference modules.py:216-324).

    A point pair matches when its exp-score is in the row top-k (and, if
    mutual, the column top-k) and above the confidence threshold. Extraction
    uses a per-patch top-(K*k) — an upper bound on matches per patch under
    mutual/or merging, so the fixed buffer is exact.

    `use_dustbin=True` keeps the dustbin row/column in the top-k competition
    (a point whose best matches land in the dustbin yields no
    correspondence), then strips it before extraction. This is the INTENDED
    semantics of reference modules.py:272-273 — the reference's own branch
    slices `corr_mat[:, -1:, -1]`, a typo of GeoTransformer's
    `[:, :-1, :-1]` that crashes at runtime on any shipped shape (it is
    dead code: every config sets fine_matching_use_dustbin false).
    """
    p = score_mat.shape[0]

    # Fast mutual extraction, entirely in slot space: every kept pair lies
    # in its ref row's top-k BY CONSTRUCTION (mutual requires ref_top), so
    # the (P, K, k) row-top-k layout holds the exact correspondence set —
    # same K*k buffer, but NO (P, K*K)-wide global top-k (a 1.05 ms full
    # sort at the 4DMatch-2048 point), no full-domain corr matrix, no
    # one-hot scatter masks, and no scalar gathers (a 196k-element f32/bool
    # gather lowers as a 1-2.4 ms custom fusion — element gathers miss the
    # row-gather path). Column (src-side) top-k membership is tested as
    # `logit >= k-th largest of the column`, and that per-column threshold
    # rides THE SAME width-5 row gather as the src points and masks (rows
    # are the cost, width is free — CLAUDE.md). Ties at the column k-th
    # value admit every tied entry where the reference's scatter keeps the
    # lowest-index k; real logits are tie-free almost surely and padded
    # duplicates are masked, so set parity holds (asserted vs the torch
    # oracle and the slow path in tests/test_matching_heads.py).
    # Consumers treat the buffer as a masked set (tester/serving/eval),
    # so slot order is free. Selection runs in LOGIT space (exp is
    # monotonic); only the k kept slot scores get exponentiated.
    # allow_fast=False: the TRAIN step measured the fast path ~4 ms/step
    # SLOWER at the 2048 bucket (fast med 25.8 vs slow 21.8 ms/step,
    # tools/bisect_train_regression.py on-chip, 2026-08-19; 32k unchanged) —
    # inside value_and_grad the extraction's packed 5-wide table gather
    # costs more than the slow path's flat top-k, the exact opposite of the
    # inference profile it was built from. Training callers pass
    # allow_fast=False; inference keeps the fast path (-1.05 ms at 4D 2k).
    fast = (allow_fast and FAST_FINE_MATCHING and mutual and not use_dustbin
            and k <= score_mat.shape[-1])
    if fast:
        kk = score_mat.shape[1]
        logits_top, ridx = jax.lax.top_k(score_mat, k)  # (P, K, k), axis=2
        col_sorted, _ = jax.lax.top_k(jnp.swapaxes(score_mat, 1, 2), k)
        col_kth = col_sorted[..., -1]  # (P, K): k-th largest per src column
        table = jnp.concatenate(
            [src_knn_points.reshape(p * kk, 3),
             src_knn_masks.reshape(p * kk, 1).astype(jnp.float32),
             col_kth.reshape(p * kk, 1)], axis=1)
        base = (jnp.arange(p, dtype=jnp.int32) * kk)[:, None, None]
        g = table[base + ridx]  # (P, K, k, 5) — one packed row gather
        log_thr = float(np.log(confidence_threshold)) \
            if confidence_threshold > 0 else -np.inf
        keep = (
            (logits_top > log_thr)
            & (logits_top >= g[..., 4])
            & (g[..., 3] > 0.0)
            & ref_knn_masks[:, :, None]
            & patch_masks[:, None, None]
        )
        val = jnp.exp(logits_top)
        if use_global_score and global_scores is not None:
            val = val * global_scores[:, None, None]
        val = jnp.where(keep, val, 0.0)
        ref_pts = jnp.broadcast_to(
            ref_knn_points[:, :, None, :], (p, kk, k, 3))
        return FineCorr(
            ref_pts.reshape(-1, 3),
            g[..., :3].reshape(-1, 3),
            val.reshape(-1),
            (val > 0.0).reshape(-1),
        )

    scores = jnp.exp(score_mat)
    ref_top = _topk_scatter_mask(scores, k, axis=2)
    src_top = _topk_scatter_mask(scores, k, axis=1)
    above = scores > confidence_threshold
    ref_corr = ref_top & above
    src_corr = src_top & above
    corr_mat = (ref_corr & src_corr) if mutual else (ref_corr | src_corr)
    if use_dustbin:
        corr_mat = corr_mat[:, :-1, :-1]
        scores = scores[:, :-1, :-1]
    kk = corr_mat.shape[1]

    mask_mat = ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]
    corr_mat = corr_mat & mask_mat & patch_masks[:, None, None]

    if use_global_score and global_scores is not None:
        scores = scores * global_scores[:, None, None]

    scores = jnp.where(corr_mat, scores, 0.0)

    # max matches per patch: <= K*k under AND (row top-k bound); <= 2*K*k
    # under OR (row bound + column bound)
    cap = min(kk * k if mutual else 2 * kk * k, kk * kk)
    flat = scores.reshape(p, kk * kk)
    top_scores, flat_idx = jax.lax.top_k(flat, cap)  # (P, cap)
    ri = flat_idx // kk
    si = flat_idx % kk
    valid = top_scores > 0.0

    # flat row gathers, NOT ref_knn_points[batch, ri]: the two-index gather
    # lowers as a slow custom fusion whose cost grows with the table size
    # (profiled 2.26 ms per gather at the packed (2048, 192) shape vs
    # ~0.4 ms flat; tools/profile_hlo.py 2048 packed)
    base = jnp.arange(p, dtype=jnp.int32)[:, None] * kk
    ref_pts = ref_knn_points.reshape(p * kk, 3)[base + ri]  # (P, cap, 3)
    src_pts = src_knn_points.reshape(p * kk, 3)[base + si]
    return FineCorr(
        ref_pts.reshape(-1, 3),
        src_pts.reshape(-1, 3),
        top_scores.reshape(-1),
        valid.reshape(-1),
    )
