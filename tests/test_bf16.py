"""bfloat16 compute path: runs, stays finite, and tracks the fp32 result."""

import numpy as np
import jax
import pytest

from roitr_tpu.config import Config
from roitr_tpu.data.synthetic import make_pair_inputs
from roitr_tpu.models.roitr import RoITr

BASE = Config(
    num_est_coarse_corr=8,
    num_gt_coarse_corr=8,
    point_per_patch=8,
    sinkhorn_iters=5,
    max_gt_corr_candidates=32,
)


def test_bf16_forward_close_to_fp32(rng):
    pair = make_pair_inputs(rng, 256, 240, 224, normal_k=8)
    m32 = RoITr(BASE)
    params = m32.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, pair, train=False
    )["params"]
    out32 = m32.apply({"params": params}, pair, train=False)

    m16 = RoITr(BASE.replace(compute_dtype="bfloat16"))
    out16 = m16.apply({"params": params}, pair, train=False)

    nv = int(out32["src_node_count"])
    f32 = np.asarray(out32["src_node_feats"])[:nv]
    f16 = np.asarray(out16["src_node_feats"])[:nv]
    assert np.isfinite(f16).all()
    # descriptors are unit vectors; bf16 backbone should stay well-aligned
    cos = (f32 * f16).sum(-1)
    assert cos.min() > 0.98, cos.min()
    # outputs stay fp32 at the interface
    assert out16["src_node_feats"].dtype == np.float32
    assert out16["matching_scores"].dtype == np.float32


def test_bf16_train_step_finite(rng):
    import jax.numpy as jnp

    from roitr_tpu.data.synthetic import stack_pairs
    from roitr_tpu.parallel.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = BASE.replace(compute_dtype="bfloat16")
    pair = make_pair_inputs(rng, 128, 120, 104, normal_k=8)
    model = RoITr(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(cfg, model, pair, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(cfg, model, tx))
    batch = stack_pairs([pair])
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params remain fp32
    assert all(x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(new_state.params))
