"""Pallas TPU kernel: fused log-domain Sinkhorn iteration.

The XLA implementation (ops/sinkhorn.py) runs the 100-iteration loop as a
lax.scan over (P, M+1, N+1) tensors — ~3.1 ms of device time at the
reference shape (256, 65, 65) x 100, which is >50% of the whole 2k-bucket
forward. Two Pallas formulations were measured:

- v1 (round 2): patches grouped on the OUTER dim, (G, 65, 65) blocks.
  5.5-5.6 ms for G in {32, 64, 128} — the 65-wide lane dim idles half the
  VPU and the dependent u->v reduce chain dominates; group size is
  irrelevant. Conclusively worse than the scan (PERFORMANCE.md).
- v2 (this file): the patch axis becomes the LANE dim — blocks are
  (M+1, N+1, G=128) with every lane busy; the u-update's logsumexp
  reduces over sublanes, the v-update's over the outer axis, and the
  whole `num_iter` loop runs on-core per grid step with a single HBM
  read/write of the score block.

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

GROUP_SIZE = 128  # patches per grid step, on the lane dimension
_VMEM_LIMIT = 32 * 1024 * 1024  # raised scoped-vmem budget (v5e has headroom)


def supported_shape(m1: int, n1: int) -> bool:
    """The kernel holds the (M1, N1, G) score block plus ~4 same-sized loop
    temps in VMEM. Default shapes (65, 65) use ~11M of the 32M budget;
    refuse anything that would not fit so callers fall back to the XLA
    scan instead of failing at compile time."""
    per_block = m1 * n1 * GROUP_SIZE * 4
    return 6 * per_block <= _VMEM_LIMIT


def _sinkhorn_kernel(num_iter: int, scores_ref, mu_ref, nu_ref, out_ref):
    s = scores_ref[...]  # (M1, N1, G) fp32, already padded/masked (finite)
    mu = mu_ref[...]  # (M1, 1, G)
    nu = nu_ref[...]  # (1, N1, G)

    def lse(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))

    def body(_, uv):
        u, v = uv
        u = mu - lse(s + v, 1)  # (M1, 1, G)
        v = nu - lse(s + u, 0)  # (1, N1, G)
        return u, v

    u, v = jax.lax.fori_loop(
        0, num_iter, body, (jnp.zeros_like(mu), jnp.zeros_like(nu))
    )
    out_ref[...] = s + u + v


def sinkhorn_iterate_pallas(
    padded_scores: jnp.ndarray,  # (P, M1, N1) fp32, invalid entries ~ -1e6
    log_mu: jnp.ndarray,  # (P, M1)
    log_nu: jnp.ndarray,  # (P, N1)
    num_iter: int,
) -> jnp.ndarray:
    """Runs the u/v iteration fully in VMEM; returns scores + u + v."""
    p, m1, n1 = padded_scores.shape
    g = GROUP_SIZE
    pad = (-p) % g
    if pad:
        padded_scores = jnp.pad(padded_scores, ((0, pad), (0, 0), (0, 0)))
        log_mu = jnp.pad(log_mu, ((0, pad), (0, 0)))
        log_nu = jnp.pad(log_nu, ((0, pad), (0, 0)))
    pp = p + pad

    # patch axis -> lanes: every lane busy (the (G, 65, 65) layout idled
    # half the VPU on its 65-wide lane dim)
    scores_t = jnp.transpose(padded_scores, (1, 2, 0))  # (M1, N1, P)
    mu_t = jnp.transpose(log_mu, (1, 0))[:, None, :]  # (M1, 1, P)
    nu_t = jnp.transpose(log_nu, (1, 0))[None, :, :]  # (1, N1, P)

    kernel = functools.partial(_sinkhorn_kernel, num_iter)
    out = pl.pallas_call(
        kernel,
        grid=(pp // g,),
        in_specs=[
            pl.BlockSpec((m1, n1, g), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, g), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, g), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m1, n1, g), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m1, n1, pp), jnp.float32),
        # the transposed score tensor is a transient — writing the result
        # over it saves a (M1, N1, G) VMEM block
        input_output_aliases={0: 0},
        # the loop body's (M1, N1, G) temps put the kernel stack 637K over
        # the default 16M scoped-vmem limit at G=128; v5e has headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(scores_t, mu_t, nu_t)
    return jnp.transpose(out, (2, 0, 1))[:p]
