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

Training: the VJP is a second Pallas kernel with the same structure. The
forward (when taken under differentiation) additionally emits the
max-over-k routing as an int8 (R, H) argmax map — the kernel is
compute-bound, so the extra write is nearly free — and the backward then
recomputes only the sin/cos bases per tile and accumulates
dWd/dWa/db with eight (H/2, TILE) x (TILE, H) transposed matmuls per
tile: no (R, k, H) basis is ever materialized and no projection is
recomputed. Indices are stop_gradient as in the reference (lib wraps the
embedding indices in no_grad). `_xla_bwd_scan` below is the retained
numerical ORACLE for the backward kernel (the on-chip gate compares
against it) — it is not wired into any product path: on CPU the embedding
module routes to its XLA formulation before this kernel is ever entered,
and interpret-mode differentiation uses the Pallas backward in interpret
mode too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # rows per grid step at hidden=256 (see _tile_for)


MAX_HIDDEN = 1024  # beyond this the 4 constant (H/2, H) f32 weight blocks
# alone approach the 16M scoped-vmem limit; callers (models/embeddings.py)
# route wider experimental widths to the XLA formulation


def _tile_for(hidden: int) -> int:
    """Row-tile size fitting the 16M scoped-vmem limit. The per-step
    footprint scales with TILE*hidden (out/temps/argmax blocks) plus
    4 constant (H/2, H) weight blocks, so the tile shrinks as the width
    grows: 1024 rows at H=256 (2048 measured 22.6M, over), 512 at H=512
    (the 4DMatch factor=2 width; 1024 measured 21.7M on a v5e, over by
    5.7M). Rounded DOWN to a multiple of 256 so non-power-of-two widths
    (e.g. 384) still get sublane-aligned tiles; floor 256 keeps the
    matmuls MXU-shaped up to MAX_HIDDEN (wider widths must not reach
    this kernel — see supported_hidden)."""
    if hidden > MAX_HIDDEN:
        raise ValueError(
            f"fused_geo_embedding supports hidden <= {MAX_HIDDEN}, got "
            f"{hidden}; use the XLA formulation")
    return max(256, (TILE * 256 // max(hidden, 256)) // 256 * 256)


def supported_hidden(hidden: int) -> bool:
    """Routing guard for callers: the kernel's VMEM budget holds up to
    MAX_HIDDEN (weight blocks scale with H^2)."""
    return hidden <= MAX_HIDDEN


def _div_term(hidden: int) -> np.ndarray:
    return np.exp(
        np.arange(0, hidden, 2, dtype=np.float32) * (-np.log(10000.0) / hidden)
    )


ARGMAX_DTYPE = jnp.int8  # k <= 3 routing indices; 67 MB at R = 512^2


def _kernel(d_ref, a_ref, div_ref, wde_ref, wdo_ref, bd_ref,
            wae_ref, wao_ref, ba_ref, out_ref, *amax_ref,
            out_dtype=jnp.float32):
    # NOTE (re-measured 2026-08-18, v5e): these f32 dots already run bf16
    # MXU passes — the output is bitwise-equal to XLA DEFAULT precision
    # and ~2.4e-3 from an fp32-"highest" reference. (Round 2 read "bf16
    # operand cast changes nothing" as proof of fp32 passes; it's equally
    # consistent with bf16 passes being active, which is what holds.)
    # In-pipeline the kernel now TIES plain XLA at 32k and is kept for
    # training HBM headroom only — see PERFORMANCE.md kernel re-audit.
    div = div_ref[0, :]  # (H/2,)
    d = d_ref[:, 0]  # (T,)
    om = d[:, None] * div[None, :]  # (T, H/2)
    y = (
        jnp.dot(jnp.sin(om), wde_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(jnp.cos(om), wdo_ref[...], preferred_element_type=jnp.float32)
    )
    k = a_ref.shape[1]
    acc = arg = None
    for kk in range(k):
        a = a_ref[:, kk]
        om = a[:, None] * div[None, :]
        ya = (
            jnp.dot(jnp.sin(om), wae_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(jnp.cos(om), wao_ref[...], preferred_element_type=jnp.float32)
        )
        if acc is None:
            acc = ya
            arg = jnp.zeros(ya.shape, jnp.int32)
        else:
            # strict > keeps the first max on ties — same routing as
            # jnp.argmax in the backward reference
            arg = jnp.where(ya > acc, kk, arg)
            acc = jnp.maximum(acc, ya)
    out = y + acc + bd_ref[0, :][None, :] + ba_ref[0, :][None, :]
    # emit the consumer's storage dtype directly (bf16 when the global
    # transformer stores the embedding bf16) — a separate XLA convert of
    # the (N*N, H) tensor costs a measured 0.6 ms per cloud at N=512
    out_ref[...] = out.astype(out_dtype)
    if amax_ref:  # under differentiation: emit the max-over-k routing map
        amax_ref[0][...] = arg.astype(ARGMAX_DTYPE)


def _pallas_forward(d_idx, a_idx, wd, bd, wa, ba, interpret=False,
                    out_dtype=jnp.float32, with_argmax=False):
    """d_idx (R,), a_idx (R, k) -> (R, H) [, (R, H) int8 argmax map]."""
    r, k = a_idx.shape
    hidden = wd.shape[1]
    tile = _tile_for(hidden)
    div = jnp.asarray(_div_term(hidden))[None, :]  # (1, H/2)
    pad = (-r) % tile
    if pad:
        d_idx = jnp.pad(d_idx, (0, pad))
        a_idx = jnp.pad(a_idx, ((0, pad), (0, 0)))
    rp = d_idx.shape[0]
    grid = (rp // tile,)
    out_shape = [jax.ShapeDtypeStruct((rp, hidden), out_dtype)]
    out_specs = [pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if with_argmax:
        out_shape.append(jax.ShapeDtypeStruct((rp, hidden), ARGMAX_DTYPE))
        out_specs.append(
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden // 2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(
        d_idx[:, None], a_idx, div,
        wd[0::2], wd[1::2], bd[None, :],
        wa[0::2], wa[1::2], ba[None, :],
    )
    if with_argmax:
        return res[0][:r], res[1][:r]
    return res[0][:r]


def _xla_basis(x, hidden):
    """Interleaved sinusoidal basis, matches embeddings.sinusoidal_embedding."""
    div = jnp.asarray(_div_term(hidden))
    om = x[..., None] * div
    return jnp.stack([jnp.sin(om), jnp.cos(om)], axis=-1).reshape(x.shape + (hidden,))


def _xla_forward(d_idx, a_idx, wd, bd, wa, ba):
    y = _xla_basis(d_idx, wd.shape[1]) @ wd + bd
    ya = _xla_basis(a_idx, wa.shape[1]) @ wa  # (R, k, H)
    return y + jnp.max(ya, axis=-2) + ba


def _bwd_kernel(d_ref, a_ref, amax_ref, g_ref, div_ref,
                dwde_ref, dwdo_ref, dwae_ref, dwao_ref, dbd_ref):
    """Per tile: recompute sin/cos bases (elementwise, no projection) and
    accumulate the weight gradients with transposed matmuls. The argmax
    map routes each (row, column) element's cotangent to the winning k.
    Output blocks are revisited every grid step (sequential on TPU)."""
    step = pl.program_id(0)
    div = div_ref[0, :]  # (H/2,)
    g = g_ref[...].astype(jnp.float32)  # (T, H)

    def tmm(a, b):  # (T, X) x (T, Y) -> (X, Y), contracting rows
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    om = d_ref[:, 0][:, None] * div[None, :]  # (T, H/2)
    dwde_c = tmm(jnp.sin(om), g)
    dwdo_c = tmm(jnp.cos(om), g)

    k = a_ref.shape[1]
    amax = amax_ref[...].astype(jnp.int32)  # (T, H)
    dwae_c = dwao_c = None
    for kk in range(k):
        gk = jnp.where(amax == kk, g, 0.0)  # (T, H)
        om = a_ref[:, kk][:, None] * div[None, :]
        ce = tmm(jnp.sin(om), gk)
        co = tmm(jnp.cos(om), gk)
        dwae_c = ce if dwae_c is None else dwae_c + ce
        dwao_c = co if dwao_c is None else dwao_c + co

    dbd_c = jnp.sum(g, axis=0, keepdims=True)  # (1, H)

    @pl.when(step == 0)
    def _init():
        dwde_ref[...] = jnp.zeros_like(dwde_ref[...])
        dwdo_ref[...] = jnp.zeros_like(dwdo_ref[...])
        dwae_ref[...] = jnp.zeros_like(dwae_ref[...])
        dwao_ref[...] = jnp.zeros_like(dwao_ref[...])
        dbd_ref[...] = jnp.zeros_like(dbd_ref[...])

    dwde_ref[...] += dwde_c
    dwdo_ref[...] += dwdo_c
    dwae_ref[...] += dwae_c
    dwao_ref[...] += dwao_c
    dbd_ref[...] += dbd_c


def _pallas_backward(d_idx, a_idx, amax, g, hidden, interpret=False):
    """Returns (dwd (H, H), dbd (H,), dwa (H, H)); dba == dbd."""
    r, k = a_idx.shape
    tile = _tile_for(hidden)
    div = jnp.asarray(_div_term(hidden))[None, :]
    pad = (-r) % tile
    if pad:
        d_idx = jnp.pad(d_idx, (0, pad))
        a_idx = jnp.pad(a_idx, ((0, pad), (0, 0)))
        amax = jnp.pad(amax, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))  # zero cotangent on pad rows
    rp = d_idx.shape[0]
    grid = (rp // tile,)
    h2 = hidden // 2
    wspec = pl.BlockSpec((h2, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dwde, dwdo, dwae, dwao, dbd = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h2, hidden), jnp.float32),
            jax.ShapeDtypeStruct((h2, hidden), jnp.float32),
            jax.ShapeDtypeStruct((h2, hidden), jnp.float32),
            jax.ShapeDtypeStruct((h2, hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(wspec, wspec, wspec, wspec,
                   pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(d_idx[:, None], a_idx, amax, g, div)
    # re-interleave the even/odd row split: wd[0::2] = dwde, wd[1::2] = dwdo
    dwd = jnp.stack([dwde, dwdo], axis=1).reshape(hidden, hidden)
    dwa = jnp.stack([dwae, dwao], axis=1).reshape(hidden, hidden)
    return dwd, dbd[0], dwa


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_geo_embedding(d_idx, a_idx, wd, bd, wa, ba, interpret=False,
                        out_dtype=jnp.float32):
    """Fused sin-basis + projection + max-over-k. d_idx (R,), a_idx (R, k),
    wd/wa (H, H) interleaved-basis kernels, bd/ba (H,) -> (R, H) in
    out_dtype (fp32 math; the store is cast)."""
    return _pallas_forward(d_idx, a_idx, wd, bd, wa, ba, interpret=interpret,
                           out_dtype=out_dtype)


def _fwd(d_idx, a_idx, wd, bd, wa, ba, interpret, out_dtype):
    out, amax = _pallas_forward(d_idx, a_idx, wd, bd, wa, ba,
                                interpret=interpret, out_dtype=out_dtype,
                                with_argmax=True)
    return out, (d_idx, a_idx, amax, wd.shape[1])


def _bwd(interpret, out_dtype, res, g):
    d_idx, a_idx, amax, hidden = res
    dwd, dbd, dwa = _pallas_backward(
        d_idx, a_idx, amax, g, hidden, interpret=interpret
    )
    return (None, None, dwd, dbd, dwa, dbd)


fused_geo_embedding.defvjp(_fwd, _bwd)


_BWD_CHUNK = 8192


def _xla_bwd_scan(d_idx, a_idx, wd, wa, g):
    """XLA chunked-recompute weight grads (the previous VJP; kept as the
    numerical reference for the backward kernel and a CPU fallback). The
    whole-R rematerialized basis e_a would be (R, k, H) fp32 — 800 MB at
    N=512 (R = N^2); the scan keeps a 25 MB transient."""
    g = g.astype(jnp.float32)
    hidden = wd.shape[1]
    k = a_idx.shape[1]
    r = d_idx.shape[0]
    dbd = g.sum(0)

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
        e_a = _xla_basis(a, hidden)  # (C, k, H)
        ya = e_a @ wa
        sel = jax.nn.one_hot(jnp.argmax(ya, axis=-2), k, axis=-2, dtype=gg.dtype)
        dwa = dwa + jnp.einsum("rkh,rkd->dh", sel * gg[:, None, :], e_a)
        return (dwd, dwa), None

    (dwd, dwa), _ = jax.lax.scan(
        step, (jnp.zeros_like(wd), jnp.zeros_like(wa)), chunks
    )
    return dwd, dbd, dwa, dbd
