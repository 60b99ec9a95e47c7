"""Parity tests for losses vs torch implementations of the reference
formulas (lib/loss.py), plus padded-vs-dense equivalence."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from roitr_tpu.config import Config
from roitr_tpu.losses import fine_matching_loss, overall_loss, weighted_circle_loss

CFG = Config()


def _torch_circle_loss(pos_masks, neg_masks, feat_dists, pos_margin, neg_margin,
                       pos_optimal, neg_optimal, log_scale, pos_scales=None):
    """Torch reimplementation of reference lib/loss.py:8-49."""
    pos_masks = torch.tensor(pos_masks)
    neg_masks = torch.tensor(neg_masks)
    feat_dists = torch.tensor(feat_dists)
    row_masks = (pos_masks.sum(-1).gt(0) & neg_masks.sum(-1).gt(0))
    col_masks = (pos_masks.sum(-2).gt(0) & neg_masks.sum(-2).gt(0))

    pos_weights = feat_dists - 1e5 * (~pos_masks).float()
    pos_weights = torch.clamp(pos_weights - pos_optimal, min=0.0)
    if pos_scales is not None:
        pos_weights = pos_weights * torch.tensor(pos_scales)
    neg_weights = feat_dists + 1e5 * (~neg_masks).float()
    neg_weights = torch.clamp(neg_optimal - neg_weights, min=0.0)

    lpr = torch.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, dim=-1)
    lpc = torch.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, dim=-2)
    lnr = torch.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, dim=-1)
    lnc = torch.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, dim=-2)
    loss_row = F.softplus(lpr + lnr) / log_scale
    loss_col = F.softplus(lpc + lnc) / log_scale
    return ((loss_row[row_masks].mean() + loss_col[col_masks].mean()) / 2).item()


def test_weighted_circle_loss_matches_torch(rng):
    m, n = 14, 17
    feat_dists = (rng.rand(m, n) * 2).astype(np.float32)
    overlaps = np.where(rng.rand(m, n) > 0.8, rng.rand(m, n), 0.0).astype(np.float32)
    pos_masks = overlaps > 0.1
    neg_masks = overlaps == 0
    pos_scales = np.sqrt(overlaps * pos_masks).astype(np.float32)

    got = float(
        weighted_circle_loss(
            jnp.array(pos_masks), jnp.array(neg_masks), jnp.array(feat_dists),
            0.1, 1.4, 0.1, 1.4, 24.0, pos_scales=jnp.array(pos_scales),
        )
    )
    expect = _torch_circle_loss(pos_masks, neg_masks, feat_dists, 0.1, 1.4, 0.1, 1.4, 24.0,
                                pos_scales=pos_scales)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_fine_matching_loss_matches_torch(rng):
    p, k = 5, 8
    cfg = CFG
    tgt_pts = rng.rand(p, k, 3).astype(np.float32)
    src_pts = rng.rand(p, k, 3).astype(np.float32)
    tgt_masks = rng.rand(p, k) > 0.2
    src_masks = rng.rand(p, k) > 0.2
    scores = rng.randn(p, k + 1, k + 1).astype(np.float32)
    rot = np.eye(3, dtype=np.float32)
    trans = np.zeros((3, 1), np.float32)

    out = {
        "tgt_node_corr_knn_points": jnp.array(tgt_pts),
        "src_node_corr_knn_points": jnp.array(src_pts),
        "tgt_node_corr_knn_masks": jnp.array(tgt_masks),
        "src_node_corr_knn_masks": jnp.array(src_masks),
        "matching_scores": jnp.array(scores),
    }
    got = float(fine_matching_loss(cfg, out, jnp.array(rot), jnp.array(trans)))

    # torch reference (lib/loss.py:119-143)
    t_tgt, t_src = torch.tensor(tgt_pts), torch.tensor(src_pts)
    d = torch.cdist(t_tgt, t_src) ** 2
    gt_masks = torch.tensor(tgt_masks).unsqueeze(2) & torch.tensor(src_masks).unsqueeze(1)
    gt_corr = (d < cfg.fine_loss_positive_radius**2) & gt_masks
    slack_row = (gt_corr.sum(2) == 0) & torch.tensor(tgt_masks)
    slack_col = (gt_corr.sum(1) == 0) & torch.tensor(src_masks)
    labels = torch.zeros(p, k + 1, k + 1, dtype=torch.bool)
    labels[:, :k, :k] = gt_corr
    labels[:, :k, k] = slack_row
    labels[:, k, :k] = slack_col
    expect = (-torch.tensor(scores)[labels].mean()).item()
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_overall_loss_finite_on_model_output(rng):
    """Integration: overall_loss over a real pipeline output stays finite."""
    import jax
    from roitr_tpu.models.roitr import RoITr
    from tests.test_models_pipeline import make_pair

    cfg = Config(num_est_coarse_corr=16, num_gt_coarse_corr=8, point_per_patch=16,
                 sinkhorn_iters=5, max_gt_corr_candidates=64)
    pair = make_pair(rng)
    model = RoITr(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, pair, train=True
    )
    out = model.apply(variables, pair, train=True, rngs={"sampling": jax.random.PRNGKey(2)})
    losses = overall_loss(cfg, out, pair.rot, pair.trans)
    for key, val in losses.items():
        assert np.isfinite(float(val)), key
    assert float(losses["loss"]) > 0
