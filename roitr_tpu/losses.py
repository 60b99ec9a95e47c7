"""Losses and online evaluator (pure functions over the model output dict).

Rebuilds reference lib/loss.py:8-214 with static shapes: ragged GT
correspondence lists arrive as fixed-capacity (C, 2)+mask buffers and are
scattered into dense overlap maps; all "boolean index then mean" reductions
become masked means.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from roitr_tpu.config import Config
from roitr_tpu.ops.geometry import apply_transform, pairwise_sq_dist, prefix_mask


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.clip(jnp.sum(m), min=1.0)


def weighted_circle_loss(
    pos_masks: jnp.ndarray,
    neg_masks: jnp.ndarray,
    feat_dists: jnp.ndarray,
    pos_margin: float,
    neg_margin: float,
    pos_optimal: float,
    neg_optimal: float,
    log_scale: float,
    pos_scales: jnp.ndarray | None = None,
    valid_rows: jnp.ndarray | None = None,
    valid_cols: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference lib/loss.py:8-49 with optional row/col validity masks for
    padded nodes (a padded row is simply excluded from the anchor means)."""
    row_masks = (jnp.sum(pos_masks, -1) > 0) & (jnp.sum(neg_masks, -1) > 0)
    col_masks = (jnp.sum(pos_masks, -2) > 0) & (jnp.sum(neg_masks, -2) > 0)
    if valid_rows is not None:
        row_masks = row_masks & valid_rows
    if valid_cols is not None:
        col_masks = col_masks & valid_cols

    pos_weights = feat_dists - 1e5 * (~pos_masks).astype(feat_dists.dtype)
    pos_weights = jnp.maximum(pos_weights - pos_optimal, 0.0)
    if pos_scales is not None:
        pos_weights = pos_weights * pos_scales
    pos_weights = jax.lax.stop_gradient(pos_weights)

    neg_weights = feat_dists + 1e5 * (~neg_masks).astype(feat_dists.dtype)
    neg_weights = jnp.maximum(neg_optimal - neg_weights, 0.0)
    neg_weights = jax.lax.stop_gradient(neg_weights)

    loss_pos_row = jax.nn.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, axis=-1)
    loss_pos_col = jax.nn.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, axis=-2)
    loss_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, axis=-1)
    loss_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, axis=-2)

    loss_row = jax.nn.softplus(loss_pos_row + loss_neg_row) / log_scale
    loss_col = jax.nn.softplus(loss_pos_col + loss_neg_col) / log_scale
    return (_masked_mean(loss_row, row_masks) + _masked_mean(loss_col, col_masks)) / 2.0


def _gt_overlap_map(out: Dict[str, Any]) -> jnp.ndarray:
    """Scatter the fixed-capacity GT correspondence list into a dense
    (M_tgt, N_src) overlap map (reference loss.py:102-103)."""
    m = out["tgt_node_feats"].shape[0]
    n = out["src_node_feats"].shape[0]
    idx = out["gt_node_corr_indices"]
    ov = jnp.where(out["gt_node_corr_masks"], out["gt_node_corr_overlaps"], 0.0)
    return jnp.zeros((m, n), ov.dtype).at[idx[:, 0], idx[:, 1]].set(ov)


def coarse_matching_loss(cfg: Config, out: Dict[str, Any]) -> jnp.ndarray:
    """Overlap-weighted circle loss over node descriptor distances
    (reference lib/loss.py:76-111)."""
    tgt_feats = out["tgt_node_feats"]
    src_feats = out["src_node_feats"]
    feat_dists = jnp.sqrt(pairwise_sq_dist(tgt_feats, src_feats))

    overlaps = _gt_overlap_map(out)
    pos_masks = overlaps > cfg.coarse_loss_positive_overlap
    neg_masks = overlaps == 0.0
    pos_scales = jnp.sqrt(overlaps * pos_masks)

    tgt_valid = prefix_mask(tgt_feats.shape[0], out["tgt_node_count"])
    src_valid = prefix_mask(src_feats.shape[0], out["src_node_count"])
    # padded nodes: force them out of both pos and neg sets
    pair_valid = tgt_valid[:, None] & src_valid[None, :]
    neg_masks = neg_masks & pair_valid

    return weighted_circle_loss(
        pos_masks,
        neg_masks,
        feat_dists,
        cfg.coarse_loss_positive_margin,
        cfg.coarse_loss_negative_margin,
        cfg.coarse_loss_positive_optimal,
        cfg.coarse_loss_negative_optimal,
        cfg.coarse_loss_log_scale,
        pos_scales=pos_scales,
        valid_rows=tgt_valid,
        valid_cols=src_valid,
    )


def fine_matching_loss(cfg: Config, out: Dict[str, Any], rot, trans) -> jnp.ndarray:
    """Negative mean OT log-score over GT-matched point pairs incl. slack
    row/col labels (reference lib/loss.py:114-143)."""
    tgt_pts = out["tgt_node_corr_knn_points"]  # (P, K, 3)
    src_pts = out["src_node_corr_knn_points"]
    tgt_masks = out["tgt_node_corr_knn_masks"]  # (P, K)
    src_masks = out["src_node_corr_knn_masks"]
    scores = out["matching_scores"]  # (P, K+1, K+1)

    src_pts = apply_transform(src_pts, rot, trans)
    dists = pairwise_sq_dist(tgt_pts, src_pts)  # (P, K, K)
    gt_masks = tgt_masks[:, :, None] & src_masks[:, None, :]
    gt_corr = (dists < cfg.fine_loss_positive_radius**2) & gt_masks
    slack_row = (jnp.sum(gt_corr, 2) == 0) & tgt_masks  # (P, K)
    slack_col = (jnp.sum(gt_corr, 1) == 0) & src_masks

    p, k = tgt_masks.shape
    labels = jnp.zeros_like(scores, dtype=bool)
    labels = labels.at[:, :k, :k].set(gt_corr)
    labels = labels.at[:, :k, k].set(slack_row)
    labels = labels.at[:, k, :k].set(slack_col)

    return -_masked_mean(scores, labels)


def overall_loss(cfg: Config, out: Dict[str, Any], rot, trans) -> Dict[str, jnp.ndarray]:
    """Reference lib/loss.py:146-166."""
    c_loss = coarse_matching_loss(cfg, out)
    f_loss = fine_matching_loss(cfg, out, rot, trans)
    loss = cfg.coarse_loss_weight * c_loss + cfg.fine_loss_weight * f_loss
    return {"loss": loss, "c_loss": c_loss, "f_loss": f_loss, "o_loss": 0.0 * f_loss}


def evaluate_coarse(cfg: Config, out: Dict[str, Any]) -> jnp.ndarray:
    """PIR: precision of predicted node correspondences vs the GT map
    (reference lib/loss.py:176-193)."""
    overlaps = _gt_overlap_map(out)
    gt_map = (overlaps > cfg.eval_acceptance_overlap) & (overlaps > 0)

    tgt_idx = out["tgt_node_corr_indices"]
    src_idx = out["src_node_corr_indices"]
    hits = gt_map[tgt_idx, src_idx]
    return _masked_mean(hits.astype(jnp.float32), out["node_corr_masks"])


def evaluate_fine(cfg: Config, out: Dict[str, Any], rot, trans) -> jnp.ndarray:
    """IR: fraction of extracted correspondences within the acceptance
    radius after the GT transform (reference lib/loss.py:196-206)."""
    src = apply_transform(out["src_corr_points"], rot, trans)
    d = jnp.linalg.norm(out["tgt_corr_points"] - src, axis=-1)
    hits = (d < cfg.eval_acceptance_radius).astype(jnp.float32)
    return _masked_mean(hits, out["corr_masks"])


def evaluate(cfg: Config, out: Dict[str, Any], rot, trans) -> Dict[str, jnp.ndarray]:
    return {
        "PIR": evaluate_coarse(cfg, out),
        "IR": evaluate_fine(cfg, out, rot, trans),
    }
