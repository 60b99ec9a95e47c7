"""Packed-batch parity: B pairs packed as one flat cloud must reproduce the
single-pair pipeline pair for pair (data/packing.py, RoITr._forward_packed).

The packed path exists for throughput (the small-bucket forward is half
fixed-cost — tools/probe_small_buckets.py), so its correctness contract is
exact equivalence with the single-pair path, which is itself certified
against the real reference (tests/test_reference_parity*.py). Tolerances are
fp32 reduction-order only: the flat/vmapped lowerings reduce in different
trees than the single-pair program.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp

from parity_harness import build_pair_inputs
from roitr_tpu.config import Config
from roitr_tpu.data.packing import pack_pairs
from roitr_tpu.data.synthetic import make_pair_arrays
from roitr_tpu.models.roitr import RoITr
from roitr_tpu.ops.normals import estimate_normals

CFG = Config(
    num_est_coarse_corr=8,
    num_gt_coarse_corr=16,
    point_per_patch=8,
    sinkhorn_iters=20,
    max_gt_corr_candidates=16,
    fine_matching_confidence_threshold=0.005,
    knn_method="exact",
    host_pyramid=True,
)

BUCKET = 256
COUNTS = [(256, 240), (230, 200), (178, 256)]


def _make_pairs(cfg=CFG):
    pairs = []
    rng = np.random.RandomState(11)
    for n_src, n_tgt in COUNTS:
        arr = make_pair_arrays(rng, BUCKET, n_src, n_tgt)
        sn = np.asarray(estimate_normals(
            jnp.array(arr["src_points"]), arr["src_count"], k=9))
        tn = np.asarray(estimate_normals(
            jnp.array(arr["tgt_points"]), arr["tgt_count"], k=9))
        pairs.append(build_pair_inputs(cfg, arr, sn, tn))
    return pairs


@pytest.fixture(scope="module")
def forwards():
    pairs = _make_pairs()
    packed = pack_pairs(pairs)
    model = RoITr(CFG)
    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p, train=False)
    )(pairs[0])["params"]
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    singles = [jax.device_get(fwd(params, p)) for p in pairs]
    packed_out = jax.device_get(fwd(params, packed))
    return pairs, singles, packed_out, params, model


FLOAT_KEYS = [
    "src_points", "tgt_points", "src_nodes", "tgt_nodes",
    "src_point_feats", "tgt_point_feats", "src_node_feats", "tgt_node_feats",
    "gt_node_corr_overlaps", "gt_tgt_node_occ", "gt_src_node_occ",
    "matching_scores",
    "src_node_corr_knn_points", "tgt_node_corr_knn_points",
]
INT_KEYS = [
    "gt_node_corr_indices", "gt_node_corr_masks",
    "tgt_node_corr_indices", "src_node_corr_indices", "node_corr_masks",
    "src_node_corr_knn_masks", "tgt_node_corr_knn_masks",
]


def test_packed_forward_matches_singles(forwards):
    pairs, singles, packed_out, _, _ = forwards
    for i, single in enumerate(singles):
        for key in FLOAT_KEYS:
            np.testing.assert_allclose(
                packed_out[key][i], single[key], rtol=2e-4, atol=2e-5,
                err_msg=f"pair {i} key {key}")
        for key in INT_KEYS:
            np.testing.assert_array_equal(
                packed_out[key][i], single[key], err_msg=f"pair {i} key {key}")
        # counts
        assert int(packed_out["src_count"][i]) == int(single["src_count"])
        assert int(packed_out["src_node_count"][i]) == int(single["src_node_count"])


def test_packed_fine_correspondences_match(forwards):
    pairs, singles, packed_out, _, _ = forwards
    for i, single in enumerate(singles):
        pm = packed_out["corr_masks"][i]
        sm = single["corr_masks"]
        np.testing.assert_array_equal(pm, sm, err_msg=f"pair {i} corr_masks")
        np.testing.assert_allclose(
            packed_out["tgt_corr_points"][i][pm], single["tgt_corr_points"][sm],
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            packed_out["src_corr_points"][i][pm], single["src_corr_points"][sm],
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            packed_out["corr_scores"][i][pm], single["corr_scores"][sm],
            rtol=2e-4, atol=1e-6)


def test_packed_serving_mode(forwards):
    """with_gt=False packed: matching outputs unchanged, GT buffers zeroed."""
    pairs, singles, _, params, model = forwards
    packed = pack_pairs(pairs)
    fwd = jax.jit(
        lambda p, x: model.apply({"params": p}, x, train=False, with_gt=False))
    out = jax.device_get(fwd(params, packed))
    for i, single in enumerate(singles):
        pm = out["corr_masks"][i]
        np.testing.assert_array_equal(pm, single["corr_masks"])
        np.testing.assert_allclose(
            out["corr_scores"][i][pm], single["corr_scores"][single["corr_masks"]],
            rtol=2e-4, atol=1e-6)
    assert not np.any(out["gt_node_corr_masks"])


def test_packed_eval_step_means(forwards):
    """eval_step on a packed batch == mean of per-pair eval metrics."""
    from roitr_tpu.data.loader import stack_batch
    from roitr_tpu.parallel.train_step import make_eval_step

    pairs, _, _, params, model = forwards
    eval_step = jax.jit(make_eval_step(CFG, model))
    single_metrics = [
        jax.device_get(eval_step(params, stack_batch([p]))) for p in pairs
    ]
    packed = jax.tree_util.tree_map(
        lambda x: np.asarray(x)[None], pack_pairs(pairs))
    packed_metrics = jax.device_get(eval_step(params, packed))
    for k in packed_metrics:
        expected = np.mean([m[k] for m in single_metrics])
        np.testing.assert_allclose(
            packed_metrics[k], expected, rtol=2e-4, atol=2e-5, err_msg=k)


def test_packed_train_step_grads():
    """Packed-batch gradients == mean of per-pair gradients.
    num_gt_coarse_corr >= max_gt_corr_candidates saturates the GT Gumbel
    sampler (every eligible candidate selected), making the loss
    permutation-invariant so the differing rng streams don't matter.
    Gradients (not post-Adam params) are compared: Adam's first step is
    ±lr*sign(g), so a 1-ulp reduction-order difference on a near-zero
    gradient element would flip a whole step.
    """
    from roitr_tpu.losses import overall_loss

    pairs = _make_pairs()
    packed = pack_pairs(pairs)
    model = RoITr(CFG)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pairs[0], train=True)["params"]

    def loss_singles(p):
        rngs = jax.random.split(jax.random.PRNGKey(5), len(pairs))
        losses = []
        for pair, rng in zip(pairs, rngs):
            out = model.apply({"params": p}, pair, train=True,
                              rngs={"sampling": rng})
            losses.append(overall_loss(CFG, out, pair.rot, pair.trans)["loss"])
        return jnp.mean(jnp.stack(losses))

    def loss_packed(p):
        out = model.apply({"params": p}, packed, train=True,
                          rngs={"sampling": jax.random.PRNGKey(7)})
        lb = jax.vmap(lambda o, r, t: overall_loss(CFG, o, r, t)["loss"])(
            out, jnp.asarray(packed.rot), jnp.asarray(packed.trans))
        return jnp.mean(lb)

    l_s, g_s = jax.jit(jax.value_and_grad(loss_singles))(params)
    l_p, g_p = jax.jit(jax.value_and_grad(loss_packed))(params)
    np.testing.assert_allclose(float(l_p), float(l_s), rtol=2e-4)
    flat_s, tree = jax.tree_util.tree_flatten(g_s)
    flat_p = jax.tree_util.tree_leaves(g_p)
    for a, b, path in zip(flat_s, flat_p, jax.tree_util.tree_leaves(
            jax.tree_util.tree_map_with_path(lambda kp, _: str(kp), g_s))):
        a, b = np.asarray(a), np.asarray(b)
        # atol floor 1e-7: zero-gradient leaves (e.g. the local attention's
        # proj_k bias, softmax-shift-invariant) carry ~1e-11 roundoff noise
        # where a relative tolerance is meaningless
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=max(5e-5 * scale, 1e-7), err_msg=path)
