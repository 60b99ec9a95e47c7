"""Data-parallel training step tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roitr_tpu.config import Config
from roitr_tpu.data.synthetic import make_pair_inputs, stack_pairs
from roitr_tpu.models.roitr import RoITr
from roitr_tpu.parallel import (
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_optimizer,
    make_train_step,
    replicated,
    shard_batch,
)

CFG = Config(
    num_est_coarse_corr=8,
    num_gt_coarse_corr=8,
    point_per_patch=8,
    sinkhorn_iters=5,
    max_gt_corr_candidates=16,
)
BUCKET = 128


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    pairs = [make_pair_inputs(rng, BUCKET, BUCKET - 8, BUCKET - 24, normal_k=8) for _ in range(8)]
    model = RoITr(CFG)
    tx = make_optimizer(CFG, steps_per_epoch=10)
    state = create_train_state(CFG, model, pairs[0], jax.random.PRNGKey(0), tx)
    return model, tx, state, pairs


def test_train_step_updates_params_single_device(setup):
    model, tx, state, pairs = setup
    batch = stack_pairs(pairs[:2])
    step = jax.jit(make_train_step(CFG, model, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_train_step_8device_mesh_matches_single(setup):
    """The sharded 8-device step must produce the same update as the
    unsharded one (XLA collectives == single-device mean)."""
    model, tx, state, pairs = setup
    batch = stack_pairs(pairs)
    rng = jax.random.PRNGKey(2)
    train_step = make_train_step(CFG, model, tx)

    single = jax.jit(train_step)
    s1, m1 = single(state, batch, rng)

    mesh = make_mesh(8)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    sharded = jax.jit(train_step, in_shardings=(rep, bsh, rep), out_shardings=(rep, rep))
    with mesh:
        s8, m8 = sharded(jax.device_put(state, rep), shard_batch(mesh, batch), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_eval_step(setup):
    model, tx, state, pairs = setup
    batch = stack_pairs(pairs[:2])
    eval_step = jax.jit(make_eval_step(CFG, model))
    metrics = eval_step(state.params, batch)
    for k in ["loss", "c_loss", "f_loss", "PIR", "IR"]:
        assert np.isfinite(float(metrics[k])), k


def test_gradient_accumulation():
    cfg = CFG.replace(iter_size=2)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(1)
    pair = make_pair_inputs(rng, BUCKET, BUCKET - 8, BUCKET - 24, normal_k=8)
    model = RoITr(cfg)
    state = create_train_state(cfg, model, pair, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(cfg, model, tx))
    batch = stack_pairs([pair])
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    # first micro-step accumulates, params unchanged
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0
    s2, _ = step(s1, batch, jax.random.PRNGKey(2))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_nan_guard_skips_update(setup):
    """Non-finite gradients must leave params untouched (skip, not poison)."""
    import jax.numpy as jnp

    model, tx, state, pairs = setup
    # poison one input so the loss goes NaN
    bad = pairs[0]._replace(src_normals=pairs[0].src_normals * jnp.nan)
    batch = stack_pairs([bad])
    step = jax.jit(make_train_step(CFG, model, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert float(metrics["grads_finite"]) == 0.0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    ).all()
