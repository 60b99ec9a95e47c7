"""Golden tests for partition / GT correspondence / occlusion / sinkhorn,
including parity against a torch reimplementation of the reference formulas."""

import numpy as np
import jax.numpy as jnp
import torch

from roitr_tpu.ops.partition import (
    node_correspondences,
    node_occlusion_score,
    point_to_node_partition,
)
from roitr_tpu.ops.sinkhorn import log_sinkhorn_ot


def test_point_to_node_partition(rng):
    n_pts, n_nodes, limit = 100, 8, 16
    pts = rng.randn(n_pts, 3).astype(np.float32)
    nodes = rng.randn(n_nodes, 3).astype(np.float32)
    part = point_to_node_partition(jnp.array(pts), jnp.array(nodes), limit)

    d = ((nodes[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    p2n = d.argmin(0)
    np.testing.assert_array_equal(np.asarray(part.point_to_node), p2n)
    np.testing.assert_array_equal(
        np.asarray(part.node_masks), np.isin(np.arange(n_nodes), p2n)
    )
    knn_idx = np.asarray(part.node_knn_indices)
    knn_mask = np.asarray(part.node_knn_masks)
    for m in range(n_nodes):
        own = np.where(p2n == m)[0]
        kept = knn_idx[m][knn_mask[m]]
        expect = own[np.argsort(d[m, own], kind="stable")][:limit]
        np.testing.assert_array_equal(np.sort(kept), np.sort(expect))
        # invalid slots must point at the padded row
        assert (knn_idx[m][~knn_mask[m]] == n_pts).all()


def test_point_to_node_partition_padded(rng):
    pts = rng.randn(64, 3).astype(np.float32)
    nodes = rng.randn(10, 3).astype(np.float32)
    full = point_to_node_partition(jnp.array(pts[:50]), jnp.array(nodes[:7]), 8)
    padded = point_to_node_partition(jnp.array(pts), jnp.array(nodes), 8, 50, 7)
    np.testing.assert_array_equal(
        np.asarray(full.node_masks), np.asarray(padded.node_masks)[:7]
    )
    assert not np.asarray(padded.node_masks)[7:].any()
    # padded points must be owned by no node
    assert (np.asarray(padded.point_to_node)[50:] == 10).all()
    a, b = np.asarray(full.node_knn_indices), np.asarray(padded.node_knn_indices)[:7]
    am, bm = np.asarray(full.node_knn_masks), np.asarray(padded.node_knn_masks)[:7]
    np.testing.assert_array_equal(am, bm)
    np.testing.assert_array_equal(a[am], b[bm])


def _np_node_correspondences(ref_nodes, src_nodes, ref_knn_pts, src_knn_pts,
                             rot, trans, radius, ref_masks, src_masks, rkm, skm):
    """Independent numpy implementation of the reference GT overlap logic."""
    src_nodes = src_nodes @ rot.T + trans
    src_knn_pts = src_knn_pts @ rot.T + trans
    out = {}
    m, n = len(ref_nodes), len(src_nodes)
    rmax = np.where(rkm, np.linalg.norm(ref_knn_pts - ref_nodes[:, None], axis=-1), 0).max(1)
    smax = np.where(skm, np.linalg.norm(src_knn_pts - src_nodes[:, None], axis=-1), 0).max(1)
    for i in range(m):
        for j in range(n):
            if not (ref_masks[i] and src_masks[j]):
                continue
            if rmax[i] + smax[j] + radius - np.linalg.norm(ref_nodes[i] - src_nodes[j]) <= 0:
                continue
            d = np.linalg.norm(
                ref_knn_pts[i][:, None, :] - src_knn_pts[j][None, :, :], axis=-1
            )
            ok = (d < radius) & rkm[i][:, None] & skm[j][None, :]
            r_frac = ok.any(1).sum() / rkm[i].sum()
            s_frac = ok.any(0).sum() / skm[j].sum()
            ov = (r_frac + s_frac) / 2
            if ov > 0:
                out[(i, j)] = ov
    return out


def test_node_correspondences(rng):
    m, n, k = 10, 12, 8
    ref_nodes = rng.randn(m, 3).astype(np.float32)
    src_nodes = rng.randn(n, 3).astype(np.float32)
    ref_knn = ref_nodes[:, None] + 0.3 * rng.randn(m, k, 3).astype(np.float32)
    src_knn = src_nodes[:, None] + 0.3 * rng.randn(n, k, 3).astype(np.float32)
    rkm = rng.rand(m, k) > 0.2
    skm = rng.rand(n, k) > 0.2
    rkm[:, 0] = skm[:, 0] = True
    rmask = np.ones(m, bool)
    smask = np.ones(n, bool)
    rot = np.eye(3, dtype=np.float32)
    trans = np.zeros(3, dtype=np.float32)
    radius = 0.4

    got = node_correspondences(
        jnp.array(ref_nodes), jnp.array(src_nodes), jnp.array(ref_knn), jnp.array(src_knn),
        jnp.array(rot), jnp.array(trans), radius,
        jnp.array(rmask), jnp.array(smask), jnp.array(rkm), jnp.array(skm),
        max_candidates=64,
    )
    expect = _np_node_correspondences(
        ref_nodes, src_nodes, ref_knn, src_knn, rot, trans, radius, rmask, smask, rkm, skm
    )
    got_map = {}
    for idx, ov, ok in zip(np.asarray(got.indices), np.asarray(got.overlaps), np.asarray(got.masks)):
        if ok:
            got_map[(int(idx[0]), int(idx[1]))] = float(ov)
    assert set(got_map) == set(expect)
    for key in expect:
        assert np.isclose(got_map[key], expect[key], atol=1e-5)


def test_node_occlusion_score(rng):
    n1, n2, m, k = 40, 35, 6, 8
    ref_pts = rng.randn(n1, 3).astype(np.float32)
    src_pts = rng.randn(n2, 3).astype(np.float32)
    ref_pad = np.concatenate([ref_pts, np.zeros((1, 3), np.float32)])
    src_pad = np.concatenate([src_pts, np.zeros((1, 3), np.float32)])
    ref_ids = rng.randint(0, n1, (m, k)).astype(np.int32)
    src_ids = rng.randint(0, n2, (m, k)).astype(np.int32)
    rkm = rng.rand(m, k) > 0.3
    skm = rng.rand(m, k) > 0.3
    rmask = np.ones(m, bool)
    smask = np.ones(m, bool)
    rot = np.eye(3, dtype=np.float32)
    trans = np.zeros(3, dtype=np.float32)
    thres = 0.5

    ref_score, src_score = node_occlusion_score(
        jnp.array(ref_ids), jnp.array(src_ids), jnp.array(ref_pad), jnp.array(src_pad),
        n1, n2, jnp.array(rot), jnp.array(trans),
        jnp.array(rmask), jnp.array(smask), jnp.array(rkm), jnp.array(skm), thres,
    )

    d_ref = np.sqrt(((ref_pad[:, None] - src_pts[None]) ** 2).sum(-1)).min(1)
    d_src = np.sqrt(((src_pad[:, None] - ref_pts[None]) ** 2).sum(-1)).min(1)
    ref_ov = (d_ref < thres).astype(np.float32)
    src_ov = (d_src < thres).astype(np.float32)
    exp_ref = (ref_ov[ref_ids] * rkm).sum(1) / (rkm.sum(1) + 1e-10)
    exp_src = (src_ov[src_ids] * skm).sum(1) / (skm.sum(1) + 1e-10)
    np.testing.assert_allclose(np.asarray(ref_score), exp_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(src_score), exp_src, atol=1e-5)


def _torch_log_ot(scores, row_masks, col_masks, alpha, num_iter, inf=1e6):
    """Torch reimplementation of reference modules.py:21-68 (CPU)."""
    scores = torch.tensor(scores)
    row_masks = torch.tensor(row_masks)
    col_masks = torch.tensor(col_masks)
    b, m, n = scores.shape
    ninf = torch.tensor(-inf)
    prm = torch.zeros(b, m + 1, dtype=torch.bool)
    prm[:, :m] = ~row_masks
    pcm = torch.zeros(b, n + 1, dtype=torch.bool)
    pcm[:, :n] = ~col_masks
    a = torch.tensor(alpha)
    padded = torch.cat(
        [torch.cat([scores, a.expand(b, m, 1)], -1), a.expand(b, 1, n + 1)], 1
    ).clone()
    padded[prm.unsqueeze(2) | pcm.unsqueeze(1)] = ninf
    nr = row_masks.float().sum(1)
    nc = col_masks.float().sum(1)
    norm = -torch.log(nr + nc)
    log_mu = torch.empty(b, m + 1)
    log_mu[:, :m] = norm.unsqueeze(1)
    log_mu[:, m] = torch.log(nc) + norm
    log_mu[prm] = ninf
    log_nu = torch.empty(b, n + 1)
    log_nu[:, :n] = norm.unsqueeze(1)
    log_nu[:, n] = torch.log(nr) + norm
    log_nu[pcm] = ninf
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(num_iter):
        u = log_mu - torch.logsumexp(padded + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(padded + u.unsqueeze(2), dim=1)
    return (padded + u.unsqueeze(2) + v.unsqueeze(1) - norm.unsqueeze(1).unsqueeze(2)).numpy()


def test_log_sinkhorn_matches_torch_reference(rng):
    b, m, n = 3, 9, 7
    scores = rng.randn(b, m, n).astype(np.float32)
    row_masks = rng.rand(b, m) > 0.2
    col_masks = rng.rand(b, n) > 0.2
    row_masks[:, 0] = col_masks[:, 0] = True
    alpha = np.float32(1.2)

    got = np.asarray(
        log_sinkhorn_ot(jnp.array(scores), jnp.array(row_masks), jnp.array(col_masks),
                        jnp.array(alpha), num_iter=30)
    )
    expect = _torch_log_ot(scores, row_masks, col_masks, alpha, 30)
    valid = ~(
        np.concatenate([~row_masks, np.zeros((b, 1), bool)], 1)[:, :, None]
        | np.concatenate([~col_masks, np.zeros((b, 1), bool)], 1)[:, None, :]
    )
    np.testing.assert_allclose(got[valid], expect[valid], rtol=1e-4, atol=1e-4)

    # after the -norm shift, each valid row of the plan sums to 1
    plan = np.exp(got[0])
    row_sums = plan[:-1][row_masks[0]].sum(1)
    np.testing.assert_allclose(row_sums, 1.0, rtol=1e-3)


def test_log_sinkhorn_early_exit_matches_converged(rng):
    """tol>0 (while_loop early exit) must agree with the fixed-count scan:
    a tiny tol runs the full budget (bitwise-identical potentials modulo
    lowering), and a practical tol=1e-2 stays within convergence error."""
    b, m, n = 4, 12, 10
    scores = rng.randn(b, m, n).astype(np.float32)
    row_masks = rng.rand(b, m) > 0.2
    col_masks = rng.rand(b, n) > 0.2
    row_masks[:, 0] = col_masks[:, 0] = True
    alpha = jnp.float32(1.2)
    args = (jnp.array(scores), jnp.array(row_masks), jnp.array(col_masks), alpha)

    fixed = np.asarray(log_sinkhorn_ot(*args, num_iter=100))
    tight = np.asarray(log_sinkhorn_ot(*args, num_iter=100, tol=1e-30))
    loose = np.asarray(log_sinkhorn_ot(*args, num_iter=100, tol=1e-2))

    valid = ~(
        np.concatenate([~row_masks, np.zeros((b, 1), bool)], 1)[:, :, None]
        | np.concatenate([~col_masks, np.zeros((b, 1), bool)], 1)[:, None, :]
    )
    np.testing.assert_allclose(tight[valid], fixed[valid], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(loose[valid], fixed[valid], rtol=5e-2, atol=5e-2)
    # the early-exited plan is still a valid transport plan
    plan = np.exp(loose[0])
    np.testing.assert_allclose(plan[:-1][row_masks[0]].sum(1), 1.0, rtol=1e-2)
