"""Farthest point sampling over prefix-packed padded clouds.

TPU-native replacement for the reference CUDA kernel
(cpp_wrappers/pointops/src/sampling/sampling_cuda_kernel.cu:14-171): the
per-block shared-memory argmax-reduction becomes a `lax.fori_loop` whose body
is one full-width vector min + argmax — each step saturates the VPU. The
sequential O(m*n) dependency is inherent to FPS.

Semantics match the reference: the seed is index 0 (the kernel seeds each
segment at its start, sampling_cuda_kernel.cu:39), and each subsequent pick
maximizes the running min-distance to the picked set. Invalid (padded) points
can never be picked; if more samples are requested than valid points exist,
the extra slots repeat the seed and must be masked by the caller via
`num_valid_samples`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roitr_tpu.ops.geometry import prefix_mask


def furthest_point_sampling(points: jnp.ndarray, count, num_samples: int, unroll: int = 8):
    """points: (N, 3) with `count` valid prefix rows -> idx (num_samples,) int32.

    The loop is unrolled `unroll` steps per XLA while-iteration — FPS is
    latency-bound by loop overhead on TPU, not by the O(N) vector work.
    """
    points = jnp.asarray(points)  # fori_loop traces: numpy inputs must be lifted
    n = points.shape[0]
    valid = prefix_mask(n, count)
    # invalid points hold -inf so argmax never selects them
    init_dist = jnp.where(valid, 1e10, -jnp.inf).astype(jnp.float32)

    idx0 = jnp.int32(0)
    idx_out = jnp.zeros((num_samples,), jnp.int32).at[0].set(idx0)

    def body(i, state):
        idx_out, dists, last = state
        last_pt = points[last]
        d2 = jnp.sum((points - last_pt[None, :]) ** 2, axis=-1)
        dists = jnp.minimum(dists, jnp.where(valid, d2, -jnp.inf))
        nxt = jnp.argmax(dists).astype(jnp.int32)
        return idx_out.at[i].set(nxt), dists, nxt

    idx_out, _, _ = jax.lax.fori_loop(
        1, num_samples, body, (idx_out, init_dist, idx0), unroll=unroll
    )
    return idx_out


def num_valid_samples(count, stride: int):
    """Number of valid FPS samples: n // stride (reference model.py:59-63)."""
    return jnp.maximum(count // stride, 1)
