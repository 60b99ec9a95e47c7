"""Pallas TPU kernel: farthest point sampling, whole loop on-core.

The XLA formulation (ops/fps.py) is a `lax.fori_loop` whose per-iteration
vector work is tiny (one N-wide min + argmax) — it is bound by XLA
while-loop overhead (~several us/iteration: condition round-trip + kernel
launches), measured at ~7 ms for the three encoder levels of a 2048-point
pair and ~25 ms for one 16k level (PERFORMANCE.md). This kernel runs the
ENTIRE sequential chain inside one Mosaic program: the distance vector,
the point coordinate planes, and the output indices stay in
VMEM/registers across iterations, so each pick costs only its actual
vector work.

Design notes (replaces the reference CUDA block-reduction,
cpp_wrappers/pointops/src/sampling/sampling_cuda_kernel.cu:14-171):

- Both clouds of a pair are processed in lockstep on separate SUBLANES of
  the same (B=2, N) vectors — the two independent chains interleave for
  free, like the vmapped XLA version but without doubling loop overhead.
- No dynamic indexing anywhere (Mosaic cannot gather per-row from VMEM):
  the selected point's coordinates are extracted with a masked lane
  reduce, and the argmax is `min(lane where dists == max)` — identical
  tie-breaking (first max) to `jnp.argmax` and the CUDA tree reduction.
- Semantics match ops/fps.py exactly: seed = index 0, invalid (padded)
  lanes hold -inf and can never win, and when a cloud has fewer valid
  points than requested samples the surplus slots repeat the seed
  (all-(-inf) rows argmax to lane 0).

Routing: `supported_n` requires N % 128 == 0 (lane alignment of the
coordinate planes); callers fall back to the XLA loop below that (64-point
level-3 clouds of the 1024 bucket).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported_n(n: int) -> bool:
    return n % 128 == 0 and n >= 128


def _kernel(xs_ref, ys_ref, zs_ref, cnt_ref, out_ref, *, num_samples):
    xs = xs_ref[...]
    ys = ys_ref[...]
    zs = zs_ref[...]
    b, n = xs.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    valid = lane < cnt_ref[...]  # (B, 1) broadcast over lanes
    dists0 = jnp.where(valid, jnp.float32(1e10), -jnp.inf)
    siota = jax.lax.broadcasted_iota(jnp.int32, (b, num_samples), 1)

    def body(i, state):
        dists, out, nxt = state  # nxt (B, 1): the previous pick per cloud
        sel = (lane == nxt).astype(jnp.float32)  # one-hot of the pick
        xsel = jnp.sum(xs * sel, axis=1, keepdims=True)
        ysel = jnp.sum(ys * sel, axis=1, keepdims=True)
        zsel = jnp.sum(zs * sel, axis=1, keepdims=True)
        d2 = (xs - xsel) ** 2 + (ys - ysel) ** 2 + (zs - zsel) ** 2
        dists = jnp.minimum(dists, jnp.where(valid, d2, -jnp.inf))
        m = jnp.max(dists, axis=1, keepdims=True)
        cand = jnp.where(dists == m, lane, n)  # first-max tie-break
        pick = jnp.min(cand, axis=1, keepdims=True)
        out = out + jnp.where(siota == i, pick, 0)
        return dists, out, pick

    out0 = jnp.zeros((b, num_samples), jnp.int32)  # slot 0 = seed index 0
    _, out, _ = jax.lax.fori_loop(
        1, num_samples, body, (dists0, out0, jnp.zeros((b, 1), jnp.int32))
    )
    out_ref[...] = out


def fps_pairs(points: jnp.ndarray, counts: jnp.ndarray, num_samples: int,
              interpret: bool = False) -> jnp.ndarray:
    """points (B, N, 3) f32, counts (B,) -> idx (B, num_samples) int32.

    B is typically 2 (the two clouds of a pair, lockstep on sublanes)."""
    b, n, _ = points.shape
    if not interpret and not supported_n(n):
        raise ValueError(f"fps_pairs needs N % 128 == 0 (got {n})")
    planes = jnp.transpose(points.astype(jnp.float32), (2, 0, 1))  # (3, B, N)
    cnt = counts.astype(jnp.int32).reshape(b, 1)
    spec = pl.BlockSpec((b, n), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, num_samples=num_samples),
        out_shape=jax.ShapeDtypeStruct((b, num_samples), jnp.int32),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((b, 1), lambda: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, num_samples), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planes[0], planes[1], planes[2], cnt)
