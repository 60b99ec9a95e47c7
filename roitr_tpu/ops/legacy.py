"""Reference-parity utility ops outside the live pipeline.

The reference ships several helpers that its current model path no longer
calls but that downstream users/scripts may rely on; they are provided here
for capability parity:

- `sinkhorn`: the slack-variant log-Sinkhorn (reference lib/utils.py:221-279)
  used by RPM-style matchers — unlike ops/sinkhorn.py's masked OT, the slack
  row/col are appended as zeros and excluded from normalization.
- `soft_assignment`: differentiable soft correspondences + confidences
  (reference lib/utils.py:296-320).
- `interpolate`: weighted coordinate blending (reference lib/utils.py:283-293).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from roitr_tpu.ops.geometry import pairwise_sq_dist


def sinkhorn(log_alpha: jnp.ndarray, n_iters: int = 5, slack: bool = True) -> jnp.ndarray:
    """log_alpha (B, J, K) -> log doubly-stochastic matrix (B, J, K)."""
    if slack:
        b, j, k = log_alpha.shape
        padded = jnp.pad(log_alpha, ((0, 0), (0, 1), (0, 1)))

        def step(carry, _):
            p = carry
            # row normalization (all rows but the slack row)
            top = p[:, :-1, :] - jax.nn.logsumexp(p[:, :-1, :], axis=2, keepdims=True)
            p = jnp.concatenate([top, p[:, -1:, :]], axis=1)
            left = p[:, :, :-1] - jax.nn.logsumexp(p[:, :, :-1], axis=1, keepdims=True)
            p = jnp.concatenate([left, p[:, :, -1:]], axis=2)
            return p, None

        padded, _ = jax.lax.scan(step, padded, length=n_iters)
        return padded[:, :-1, :-1]

    def step(carry, _):
        p = carry
        p = p - jax.nn.logsumexp(p, axis=2, keepdims=True)
        p = p - jax.nn.logsumexp(p, axis=1, keepdims=True)
        return p, None

    out, _ = jax.lax.scan(step, log_alpha, length=n_iters)
    return out


def interpolate(weights: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """weights (b, n, m), points (b, m, 3) -> blended coords (b, n, 3)."""
    return jnp.einsum("bnm,bmc->bnc", weights, points)


def soft_assignment(
    src_xyz: jnp.ndarray,
    src_feats: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_feats: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable correspondences by inverse feature distance.

    Returns (src2tgt confidence (b, n), src2tgt xyz (b, n, 3),
             tgt2src confidence (b, m), tgt2src xyz (b, m, 3)).
    """
    feat_dist = jnp.sqrt(pairwise_sq_dist(src_feats, tgt_feats))
    sim = 1.0 / (1e-8 + feat_dist)  # (b, n, m)

    s2t_w = sim / jnp.sum(sim, axis=-1, keepdims=True)
    s2t_max = jnp.max(sim, axis=-1)
    s2t_conf = s2t_max / jnp.sum(s2t_max, axis=-1, keepdims=True)
    s2t_xyz = interpolate(s2t_w, tgt_xyz)

    t2s_w = sim / jnp.sum(sim, axis=1, keepdims=True)
    t2s_max = jnp.max(sim, axis=1)
    t2s_conf = t2s_max / jnp.sum(t2s_max, axis=-1, keepdims=True)
    t2s_xyz = interpolate(jnp.swapaxes(t2s_w, 1, 2), src_xyz)

    return s2t_conf, s2t_xyz, t2s_conf, t2s_xyz
