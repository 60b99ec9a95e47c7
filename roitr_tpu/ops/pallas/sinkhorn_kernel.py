"""Pallas TPU kernel: fused log-domain Sinkhorn iteration.

The XLA implementation (ops/sinkhorn.py) runs the 100-iteration loop as a
lax.scan whose (P, M+1, N+1) score tensor round-trips HBM every iteration.
Here a group of patches is loaded into VMEM once and the entire iteration
runs on-chip: all logsumexp reductions on the VPU, a single HBM write at
the end. Patches are processed GROUP_SIZE at a time per grid step — a
per-patch grid (65x65 tiles) starves the VPU; batching the group restores
full-lane utilization.

Inference-path only: the kernel defines no VJP, so the training loss keeps
the differentiable XLA scan (fine matching is no-grad at extraction time in
the reference too, RIGA_v2.py:158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_SIZE = 32


def _sinkhorn_kernel(num_iter: int, scores_ref, log_mu_ref, log_nu_ref, out_ref):
    scores = scores_ref[...]  # (G, M1, N1) fp32, already padded/masked
    log_mu = log_mu_ref[:, 0, :]  # (G, M1)
    log_nu = log_nu_ref[:, 0, :]  # (G, N1)

    def lse(y, axis):
        m = jnp.max(y, axis=axis, keepdims=True)
        return jnp.squeeze(m + jnp.log(jnp.sum(jnp.exp(y - m), axis=axis, keepdims=True)), axis)

    def body(_, carry):
        u, v = carry
        u = log_mu - lse(scores + v[:, None, :], 2)
        v = log_nu - lse(scores + u[:, :, None], 1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iter, body, (u0, v0))
    out_ref[...] = scores + u[:, :, None] + v[:, None, :]


def sinkhorn_iterate_pallas(
    padded_scores: jnp.ndarray,  # (P, M1, N1) fp32, invalid entries = -inf-ish
    log_mu: jnp.ndarray,  # (P, M1)
    log_nu: jnp.ndarray,  # (P, N1)
    num_iter: int,
) -> jnp.ndarray:
    """Runs the u/v iteration fully in VMEM; returns scores + u + v."""
    p, m1, n1 = padded_scores.shape
    g = min(GROUP_SIZE, p)
    pad = (-p) % g
    if pad:
        padded_scores = jnp.pad(padded_scores, ((0, pad), (0, 0), (0, 0)))
        log_mu = jnp.pad(log_mu, ((0, pad), (0, 0)))
        log_nu = jnp.pad(log_nu, ((0, pad), (0, 0)))
    pp = p + pad

    kernel = functools.partial(_sinkhorn_kernel, num_iter)
    # marginals as (P, 1, M1): TPU block shapes must tile (8, 128) or equal
    # the full array dims in the last two axes
    out = pl.pallas_call(
        kernel,
        grid=(pp // g,),
        in_specs=[
            pl.BlockSpec((g, m1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, m1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, m1, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pp, m1, n1), jnp.float32),
    )(padded_scores, log_mu[:, None, :], log_nu[:, None, :])
    return out[:p]
