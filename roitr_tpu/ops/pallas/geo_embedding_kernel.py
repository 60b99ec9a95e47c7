"""Pallas TPU kernel: fused geometric structure embedding.

The XLA lowering of GeometricStructureEmbedding (reference
positional_encoding.py:94-154) materializes the (N, N, k, hidden) angular
sinusoidal basis in HBM — 800 MB at N=512/hidden=256 — then streams it
through the projection matmul and the max-over-k reduce: ~22 ms of the
151 ms 32k forward (profiled, HBM-bound at ~140 GB/s).

This kernel never materializes the basis. Per tile of flattened (i, j)
pairs it computes, entirely in VMEM:

    out = [sin(d w), cos(d w)] @ Wd + bd
        + max_k ([sin(a_k w), cos(a_k w)] @ Wa) + ba

using the even/odd-column split of the projection kernels (the interleaved
[sin0, cos0, sin1, ...] basis layout of sinusoidal_embedding means
e @ W == sin_part @ W[0::2] + cos_part @ W[1::2]). HBM traffic drops to
the (N^2, hidden) output write + tiny index reads; the matmuls run on the
MXU at (TILE*k, hidden/2) x (hidden/2, hidden).

Training: a custom VJP recomputes the basis chunk-free in XLA for the
weight gradients (indices are stop_gradient in the reference, lib wraps
them in no_grad) — backward cost matches the old forward, forward is ~7x
cheaper everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # 2048 exceeds the 16M scoped-vmem limit (22.6M with double-buffered blocks)


def _div_term(hidden: int) -> np.ndarray:
    return np.exp(
        np.arange(0, hidden, 2, dtype=np.float32) * (-np.log(10000.0) / hidden)
    )


def _kernel(d_ref, a_ref, div_ref, wde_ref, wdo_ref, bd_ref,
            wae_ref, wao_ref, ba_ref, out_ref, *, out_dtype=jnp.float32):
    # NOTE (measured, v5e): the fp32 dots below run at ~36 TFLOP/s — near
    # the fp32 MXU roofline; this kernel is compute-bound, not HBM-bound.
    # Casting the operands to bf16 changes nothing: this Mosaic version
    # upcasts non-f32 dot operands back to f32 (verified bitwise-identical
    # output and timing), so bf16 MXU passes are not reachable from Pallas
    # here. Revisit if Mosaic gains native bf16 matmul lowering.
    div = div_ref[0, :]  # (H/2,)
    d = d_ref[:, 0]  # (T,)
    om = d[:, None] * div[None, :]  # (T, H/2)
    y = (
        jnp.dot(jnp.sin(om), wde_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(jnp.cos(om), wdo_ref[...], preferred_element_type=jnp.float32)
    )
    k = a_ref.shape[1]
    acc = None
    for kk in range(k):
        a = a_ref[:, kk]
        om = a[:, None] * div[None, :]
        ya = (
            jnp.dot(jnp.sin(om), wae_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(jnp.cos(om), wao_ref[...], preferred_element_type=jnp.float32)
        )
        acc = ya if acc is None else jnp.maximum(acc, ya)
    out = y + acc + bd_ref[0, :][None, :] + ba_ref[0, :][None, :]
    # emit the consumer's storage dtype directly (bf16 when the global
    # transformer stores the embedding bf16) — a separate XLA convert of
    # the (N*N, H) tensor costs a measured 0.6 ms per cloud at N=512
    out_ref[...] = out.astype(out_dtype)


def _pallas_forward(d_idx, a_idx, wd, bd, wa, ba, interpret=False,
                    out_dtype=jnp.float32):
    """d_idx (R,), a_idx (R, k) -> (R, H)."""
    r, k = a_idx.shape
    hidden = wd.shape[1]
    div = jnp.asarray(_div_term(hidden))[None, :]  # (1, H/2)
    pad = (-r) % TILE
    if pad:
        d_idx = jnp.pad(d_idx, (0, pad))
        a_idx = jnp.pad(a_idx, ((0, pad), (0, 0)))
    rp = d_idx.shape[0]
    grid = (rp // TILE,)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((rp, hidden), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        d_idx[:, None], a_idx, div,
        wd[0::2], wd[1::2], bd[None, :],
        wa[0::2], wa[1::2], ba[None, :],
    )
    return out[:r]


def _xla_basis(x, hidden):
    """Interleaved sinusoidal basis, matches embeddings.sinusoidal_embedding."""
    div = jnp.asarray(_div_term(hidden))
    om = x[..., None] * div
    return jnp.stack([jnp.sin(om), jnp.cos(om)], axis=-1).reshape(x.shape + (hidden,))


def _xla_forward(d_idx, a_idx, wd, bd, wa, ba):
    y = _xla_basis(d_idx, wd.shape[1]) @ wd + bd
    ya = _xla_basis(a_idx, wa.shape[1]) @ wa  # (R, k, H)
    return y + jnp.max(ya, axis=-2) + ba


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_geo_embedding(d_idx, a_idx, wd, bd, wa, ba, interpret=False,
                        out_dtype=jnp.float32):
    """Fused sin-basis + projection + max-over-k. d_idx (R,), a_idx (R, k),
    wd/wa (H, H) interleaved-basis kernels, bd/ba (H,) -> (R, H) in
    out_dtype (fp32 math; the store is cast)."""
    return _pallas_forward(d_idx, a_idx, wd, bd, wa, ba, interpret=interpret,
                           out_dtype=out_dtype)


def _fwd(d_idx, a_idx, wd, bd, wa, ba, interpret, out_dtype):
    out = _pallas_forward(d_idx, a_idx, wd, bd, wa, ba, interpret=interpret,
                          out_dtype=out_dtype)
    return out, (d_idx, a_idx, wd, wa)


_BWD_CHUNK = 8192


def _bwd(interpret, out_dtype, res, g):
    """Weight grads by chunked recompute: the whole-R rematerialized basis
    e_a is (R, k, H) fp32 — 800 MB at N=512 (R = N^2) — the training
    peak-memory driver. A lax.scan over row chunks accumulates dwd/dwa
    with a 25 MB transient instead; padding rows carry zero cotangent so
    they contribute nothing."""
    d_idx, a_idx, wd, wa = res
    g = g.astype(jnp.float32)  # weight grads stay fp32 whatever the store
    hidden = wd.shape[1]
    k = a_idx.shape[1]
    r = d_idx.shape[0]
    dbd = dba = g.sum(0)

    pad = (-r) % _BWD_CHUNK
    if pad:
        d_idx = jnp.pad(d_idx, (0, pad))
        a_idx = jnp.pad(a_idx, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    nch = (r + pad) // _BWD_CHUNK
    chunks = (
        d_idx.reshape(nch, _BWD_CHUNK),
        a_idx.reshape(nch, _BWD_CHUNK, k),
        g.reshape(nch, _BWD_CHUNK, hidden),
    )

    def step(carry, xs):
        dwd, dwa = carry
        d, a, gg = xs
        e_d = _xla_basis(d, hidden)  # (C, H)
        dwd = dwd + e_d.T @ gg
        # max-over-k routing: recompute per-k projections to find the argmax
        e_a = _xla_basis(a, hidden)  # (C, k, H)
        ya = e_a @ wa
        sel = jax.nn.one_hot(jnp.argmax(ya, axis=-2), k, axis=-2, dtype=gg.dtype)
        dwa = dwa + jnp.einsum("rkh,rkd->dh", sel * gg[:, None, :], e_a)
        return (dwd, dwa), None

    (dwd, dwa), _ = jax.lax.scan(
        step, (jnp.zeros_like(wd), jnp.zeros_like(wa)), chunks
    )
    return (None, None, dwd, dbd, dwa, dba)


fused_geo_embedding.defvjp(_fwd, _bwd)
