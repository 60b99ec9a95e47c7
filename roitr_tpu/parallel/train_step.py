"""Data-parallel training/eval steps (vmap over pairs, sharded jit).

Replaces the reference trainer's inner loop (lib/trainer.py:169-267):
forward + loss + backward + Adam/ExpLR + gradient accumulation. The
reference is locked to batch 1 per GPU; here a whole pair batch is vmapped
and sharded over the `data` mesh axis, and XLA emits the gradient psum.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from roitr_tpu.config import Config
from roitr_tpu.losses import evaluate, overall_loss
from roitr_tpu.models.roitr import PairInputs, RoITr


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(betas=(0.9, 0.99)) or SGD(momentum) + per-epoch exponential LR
    decay + coupled L2 weight decay + gradient accumulation — matching the
    reference's torch optimizers exactly (main.py:79-94: SGD branch with
    cfg.momentum, Adam branch with betas=(0.9, 0.99); ExpLR main.py:97-100;
    iter_size accumulation trainer.py:265-267).

    torch couples weight_decay into the gradient *before* the moment
    updates, which is what add_decayed_weights placed first in the chain
    does (not decoupled AdamW).
    """
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(steps_per_epoch // max(cfg.iter_size, 1), 1),
        decay_rate=cfg.scheduler_gamma,
        staircase=True,
    )
    name = cfg.optimizer.upper()
    if name == "SGD":
        # torch.optim.SGD(momentum=m, dampening=0, nesterov=False):
        # buf = m*buf + grad; step = -lr*buf  == optax.trace(decay=m)
        inner = optax.trace(decay=cfg.momentum)
    elif name == "ADAM":
        inner = optax.scale_by_adam(b1=0.9, b2=0.99)
    else:
        raise NotImplementedError(f"optimizer {cfg.optimizer!r} (reference main.py:93)")
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        inner,
        optax.scale_by_learning_rate(schedule),
    )
    if cfg.iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.iter_size)
    return tx


def create_train_state(
    cfg: Config, model: RoITr, example_pair: PairInputs, rng, tx
) -> TrainState:
    example_pair = jax.tree_util.tree_map(jnp.asarray, example_pair)
    params = jax.jit(
        lambda p: model.init({"params": rng, "sampling": jax.random.PRNGKey(0)}, p, train=True)
    )(example_pair)["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def make_train_step(
    cfg: Config, model: RoITr, tx
) -> Callable[[TrainState, PairInputs, jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `batch` is a PairInputs pytree with a leading batch axis on every leaf,
    shardable along the `data` mesh axis.

    NOTE: scale batch through the mesh (`data` axis), not per-device vmap —
    XLA lowers vmapped neighborhood gathers poorly on TPU (measured 4.7x
    slower at N=16k). Keep cfg.batch_size (per-device) at 1 for large
    buckets; the vmap here is then over a size-1 axis and free.
    """

    def single_loss(params, pair: PairInputs, rng):
        out = model.apply({"params": params}, pair, train=True, rngs={"sampling": rng})
        if jnp.ndim(pair.src_count) == 1:
            # packed batch (data/packing.py): every output has a leading
            # per-pair axis; losses/metrics are per-pair, averaged here
            def lm(o, r, t):
                losses = overall_loss(cfg, o, r, t)
                metrics = evaluate(cfg, o, r, t)
                return losses["loss"], {**losses, **metrics}

            loss_b, metrics_b = jax.vmap(lm)(out, pair.rot, pair.trans)
            return jnp.mean(loss_b), jax.tree_util.tree_map(jnp.mean, metrics_b)
        losses = overall_loss(cfg, out, pair.rot, pair.trans)
        metrics = evaluate(cfg, out, pair.rot, pair.trans)
        return losses["loss"], {**losses, **metrics}

    def batch_loss(params, batch: PairInputs, rngs):
        losses, metrics = jax.vmap(single_loss, in_axes=(None, 0, 0))(params, batch, rngs)
        return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, metrics)

    def train_step(state: TrainState, batch: PairInputs, rng: jax.Array):
        bsz = batch.src_points.shape[0]
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), bsz)
        (loss, metrics), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            state.params, batch, rngs
        )
        # NaN guard: a degenerate batch (or numeric blowup) must not poison
        # the parameters — skip the update instead of writing non-finite
        # values (the reference crashes and relies on manual checkpoint
        # resume, trainer.py:94-130)
        grads_finite = jnp.all(
            jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)])
        ) & jnp.isfinite(loss)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(grads_finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(safe_grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_finite, new, old), params, state.params
        )
        metrics = dict(metrics)
        metrics["grads_finite"] = grads_finite.astype(jnp.float32)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, model: RoITr):
    """eval_step(params, batch) -> metrics dict (means over the batch)."""

    def single(params, pair: PairInputs):
        out = model.apply({"params": params}, pair, train=False)
        if jnp.ndim(pair.src_count) == 1:  # packed batch: per-pair means
            lm = lambda o, r, t: {**overall_loss(cfg, o, r, t), **evaluate(cfg, o, r, t)}
            return jax.tree_util.tree_map(
                jnp.mean, jax.vmap(lm)(out, pair.rot, pair.trans)
            )
        losses = overall_loss(cfg, out, pair.rot, pair.trans)
        metrics = evaluate(cfg, out, pair.rot, pair.trans)
        return {**losses, **metrics}

    def eval_step(params, batch: PairInputs):
        metrics = jax.vmap(single, in_axes=(None, 0))(params, batch)
        return jax.tree_util.tree_map(jnp.mean, metrics)

    return eval_step
