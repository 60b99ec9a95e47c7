"""Pallas TPU kernel: fused global RPE self-attention over coarse nodes.

The XLA lowering of GlobalRPESelfAttention (reference geoattention.py:69-232,
rebuilt in models/attention.py) streams the (N, N, D) geometric embedding
from HBM once for the positional scores and once again for the positional
states, through thin batched einsums whose 4-wide head outputs force
relayouts — ~8 ms of the 32k forward across 3 self layers x 2 clouds, vs a
~1 ms bandwidth floor.

This kernel reads the embedding ONCE per layer. Per grid step of TN query
rows it keeps k/v fully VMEM-resident and computes, entirely on-chip:

    scores[h, m] = (q_bd . k2[m] + qwp[h] . e[m]) / sqrt(c)
    hidden       = blockdiag(softmax_mask(scores) @ v2)
    ae[h]        = softmax_selfexcl(scores) @ e

where q_bd = q_row broadcast onto a block-diagonal (H, D) layout — the
per-head dot products become ONE NT matmul against the (N, D) key table
(same trick for v). The reference's q.b_p score bias is constant along the
key axis and therefore softmax-invariant; it is dropped here (documented at
the call site).

Backward: a second Pallas kernel with the same one-pass structure — the
embedding is read once and the cotangent written once per layer, with the
softmax VJPs and all eight gradient matmuls on-chip (the previous
XLA-recompute VJP streamed the embedding twice more through the thin-head
einsums). `xla_forward` below remains the small-N / CPU path and the
numerical reference for both kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 8  # query rows per grid step; embed block = TN x N x D (2 MB bf16 at N=512)


def _nt(a, b):
    """(X, D) x (Y, D) -> (X, Y), contracting the last dims."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _nn(a, b):
    """(X, Y) x (Y, D) -> (X, D)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _tn_matmul(a, b):
    """(X, Y) x (X, D) -> (Y, D), contracting the first dims (a^T @ b)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _msoftmax(scores, m):
    """Masked softmax over the combined (axis 1, axis 2) key axes of an
    (R, TN, N) score block; fully-masked rows produce zeros."""
    neg = jnp.where(m, scores, -jnp.inf)
    mx = jnp.max(jnp.max(neg, axis=2, keepdims=True), axis=1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.where(m, jnp.exp(neg - mx), 0.0)
    sm = jnp.sum(jnp.sum(ex, axis=2, keepdims=True), axis=1, keepdims=True)
    return ex / jnp.where(sm == 0.0, 1.0, sm)


def _recompute_attn(q_ref, qwp_ref, emb_ref, k_ref, mask_ref, step, num_heads):
    """Shared forward score/softmax recompute for both kernels. Returns
    (attn, attn_pos, q_bd, qwp_flat, e_flat, seg, inv) for a row-tile
    grid step."""
    h = num_heads
    tn, d = q_ref.shape
    c = d // h
    n = k_ref.shape[0]
    r = tn * h

    seg = (
        jax.lax.broadcasted_iota(jnp.int32, (h, d), 1) // c
        == jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
    ).astype(jnp.float32)  # (H, D) 0/1 head-block mask
    inv = jnp.float32(1.0 / np.sqrt(c))

    q_bd = (q_ref[...][:, None, :] * seg[None]).reshape(r, d)  # (R, D)
    qwp_flat = qwp_ref[...].reshape(r, d)  # (R, D)
    # keep the embedding block in its storage dtype: an .astype(f32)
    # materializes a (TN*N, D) stack temp — 8 MB at (N, D) = (512, 512),
    # which blew the 16M scoped-vmem limit in the backward at the 4D 32k
    # shape. Mixed-dtype dots (f32 x bf16, f32 accumulate) avoid the temp
    # with no precision loss on the f32 side; on the MXU the bf16 side
    # feeds the same bf16 passes Mosaic uses for f32 dots anyway.
    e_flat = emb_ref[...].reshape(tn * n, d)  # (TN*N, D), storage dtype

    se = _nt(q_bd, k_ref[...])  # (R, N) — shared keys, no row blocking needed
    sp = _nt(qwp_flat, e_flat).reshape(r, tn, n)  # (R, TN, N)
    s = (sp + se[:, None, :]) * inv

    # masks over (R, TN, N): own-block (j == row), valid keys, self-exclusion
    rr = jax.lax.broadcasted_iota(jnp.int32, (r, tn, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (r, tn, n), 1)
    mm = jax.lax.broadcasted_iota(jnp.int32, (r, tn, n), 2)
    own = jj == rr // h
    kmask = (mask_ref[...] > 0.0)[None, :, :] & own  # (R, TN, N)
    selfm = mm != (step * tn + rr // h)

    attn = _msoftmax(s, kmask)  # zero outside the own block
    attn_pos = _msoftmax(s, kmask & selfm)
    return attn, attn_pos, q_bd, qwp_flat, e_flat, seg, inv


def _kernel(q_ref, qwp_ref, emb_ref, k_ref, v_ref, mask_ref, hid_ref, ae_ref,
            *, num_heads):
    """Fully vectorized over the TN-row tile — no per-row loop (a per-row
    formulation measured at XLA parity: ~5000 tiny Mosaic ops ate the
    bandwidth win). All TN*H score rows are computed against ALL TN*N
    embedding rows in ONE NT matmul; the 1/TN of entries with matching row
    index are kept and the rest masked to -inf before the softmax (the
    wasted flops are free — the kernel is bandwidth/overhead-bound). The
    in-block zero structure of the softmax output then makes the value and
    positional aggregations plain (TN*H, TN*N) @ (TN*N, D) matmuls."""
    h = num_heads
    tn, d = q_ref.shape
    n = k_ref.shape[0]
    r = tn * h
    step = pl.program_id(0)

    attn, attn_pos, _, _, e_flat, seg, _ = _recompute_attn(
        q_ref, qwp_ref, emb_ref, k_ref, mask_ref, step, num_heads
    )

    hid_full = _nn(jnp.sum(attn, axis=1), v_ref[...])  # (R, D)
    hid_rows = jnp.sum(hid_full.reshape(tn, h, d) * seg[None], axis=1)  # (TN, D)
    hid_ref[...] = hid_rows
    ap = attn_pos.reshape(r, tn * n)
    ae_ref[...] = _nn(ap, e_flat).reshape(tn, h, d)


def _bwd_kernel(q_ref, qwp_ref, emb_ref, k_ref, v_ref, mask_ref, ghid_ref,
                gae_ref, dq_ref, dqwp_ref, demb_ref, dk_ref, dv_ref,
                *, num_heads):
    """One-pass backward: recompute the two softmaxes for this row tile
    (MXU flops are nearly free next to the embedding stream), then produce
    every gradient with plain matmuls. dk/dv accumulate across grid steps
    in a revisited VMEM block (the TPU grid is sequential). Padded query
    rows contribute nothing: their ghid/gae blocks are zero, so both
    softmax VJPs vanish there."""
    h = num_heads
    tn, d = q_ref.shape
    n = k_ref.shape[0]
    r = tn * h
    step = pl.program_id(0)

    attn, attn_pos, q_bd, qwp_flat, e_flat, seg, inv = _recompute_attn(
        q_ref, qwp_ref, emb_ref, k_ref, mask_ref, step, num_heads
    )
    k2 = k_ref[...]
    v2 = v_ref[...]

    # hidden branch: hid_full = (sum_j attn) @ v2, head-collapsed by seg
    ghid_bd = (ghid_ref[...][:, None, :] * seg[None]).reshape(r, d)  # (R, D)
    gae_flat = gae_ref[...].reshape(r, d)  # (R, D)

    a_sum = jnp.sum(attn, axis=1)  # (R, N)
    dv_c = _tn_matmul(a_sum, ghid_bd)  # (N, D)
    d_attn = _nt(ghid_bd, v2)[:, None, :]  # (R, 1, N), identical for every j
    ds = attn * (
        d_attn
        - jnp.sum(jnp.sum(attn * d_attn, axis=2, keepdims=True), axis=1, keepdims=True)
    )

    # positional branch: ae = attn_pos @ e
    ap_flat = attn_pos.reshape(r, tn * n)
    demb_f = _tn_matmul(ap_flat, gae_flat)  # (TN*N, D)
    d_ap = _nt(gae_flat, e_flat).reshape(r, tn, n)
    ds += attn_pos * (
        d_ap
        - jnp.sum(jnp.sum(attn_pos * d_ap, axis=2, keepdims=True), axis=1, keepdims=True)
    )

    ds = ds * inv  # scores = (sp + se) / sqrt(c)
    dse = jnp.sum(ds, axis=1)  # (R, N)
    dq_bd = _nn(dse, k2)  # (R, D)
    dk_c = _tn_matmul(dse, q_bd)  # (N, D)

    ds_flat = ds.reshape(r, tn * n)
    dqwp = _nn(ds_flat, e_flat)  # (R, D)
    demb_f += _tn_matmul(ds_flat, qwp_flat)  # (TN*N, D)

    dq_ref[...] = jnp.sum(dq_bd.reshape(tn, h, d) * seg[None], axis=1)
    dqwp_ref[...] = dqwp.reshape(tn, h, d)
    demb_ref[...] = demb_f.reshape(tn, n, d).astype(demb_ref.dtype)

    @pl.when(step == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref[...])
        dv_ref[...] = jnp.zeros_like(dv_ref[...])

    dk_ref[...] += dk_c
    dv_ref[...] += dv_c


def xla_forward(q2, k2, v2, qwp, embed, key_mask):
    """Reference XLA formulation (also the recompute target of the VJP).

    q2/k2/v2 (N, D) merged-head projections, qwp (N, H, D), embed (N, N, D),
    key_mask (N,) float 1/0 -> hidden (N, D), ae (N, H, D)."""
    n, d = q2.shape
    h = qwp.shape[1]
    c = d // h
    q = q2.reshape(n, h, c)
    k = k2.reshape(n, h, c)
    v = v2.reshape(n, h, c)
    scores_e = jnp.einsum("nhc,mhc->hnm", q, k)
    # mixed-dtype einsum promotes to f32 without materializing an f32 copy
    # of the (possibly bf16-stored) embedding
    scores_p = jnp.einsum("nhd,nmd->hnm", qwp, embed)
    scores = (scores_e + scores_p) / jnp.sqrt(jnp.float32(c))

    from roitr_tpu.models.attention import masked_softmax

    kmask = (key_mask > 0.0)[None, None, :]
    attn = masked_softmax(scores, kmask)
    hidden = jnp.einsum("hnm,mhc->nhc", attn, v).reshape(n, d)
    eye = jnp.eye(n, dtype=bool)[None]
    attn_pos = masked_softmax(scores, kmask & ~eye)
    ae = jnp.einsum("hnm,nmd->nhd", attn_pos, embed)
    return hidden, ae


def supported_n(n: int) -> bool:
    """Mosaic constraint: the in-kernel (R, TN*N) -> (R, TN, N) shape cast
    needs the key count N lane-aligned (N % 128 == 0, i.e. buckets >= 8192
    points at stride 64). Callers fall back to `xla_forward` below that —
    the embedding tensor is tiny there anyway."""
    return n % 128 == 0


def _pallas_forward(q2, k2, v2, qwp, embed, key_mask, interpret=False):
    n, d = q2.shape
    h = qwp.shape[1]
    if not interpret and not supported_n(n):
        raise ValueError(
            f"fused_rpe_self_attention needs N % 128 == 0 on TPU (got {n}); "
            "use xla_forward for small node counts"
        )
    pad = (-n) % TN
    npad = n + pad
    if pad:
        q2p = jnp.pad(q2, ((0, pad), (0, 0)))
        qwpp = jnp.pad(qwp, ((0, pad), (0, 0), (0, 0)))
        embp = jnp.pad(embed, ((0, pad), (0, 0), (0, 0)))
    else:
        q2p, qwpp, embp = q2, qwp, embed
    grid = (npad // TN,)
    hid, ae = pl.pallas_call(
        functools.partial(_kernel, num_heads=h),
        out_shape=(
            jax.ShapeDtypeStruct((npad, d), jnp.float32),
            jax.ShapeDtypeStruct((npad, h, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TN, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q2p, qwpp, embp, k2, v2, key_mask.astype(jnp.float32)[None, :])
    return hid[:n], ae[:n]


BTN = 8  # backward rows/step (Mosaic needs the sublane block dim % 8 == 0,
# so the tile cannot shrink below 8 to buy VMEM headroom)

# Backward VMEM guard: the double-buffered (BTN, N, D) embedding-in and
# demb-out blocks dominate the backward's scoped vmem (4 x block bytes);
# at (N, D) = (512, 512) bf16 the 4 MB blocks alone hit the 16M limit
# (measured on a v5e: 16.04M > 16.00M, the 4D 32k train step). 2 MB
# blocks (the 3D 32k shape) fit with room for temps. Oversized shapes
# fall back to the XLA recompute VJP — measured a wash against the
# kernel at shapes where both fit (PERFORMANCE.md kernel re-audit).
_BWD_EMB_BLOCK_LIMIT = 2 * 1024 * 1024


def bwd_fits_vmem(n: int, d: int, emb_itemsize: int) -> bool:
    return BTN * n * d * emb_itemsize <= _BWD_EMB_BLOCK_LIMIT


def _pallas_backward(q2, k2, v2, qwp, embed, key_mask, ghid, gae, interpret=False):
    n, d = q2.shape
    h = qwp.shape[1]
    pad = (-n) % BTN
    npad = n + pad
    if pad:
        q2p = jnp.pad(q2, ((0, pad), (0, 0)))
        qwpp = jnp.pad(qwp, ((0, pad), (0, 0), (0, 0)))
        embp = jnp.pad(embed, ((0, pad), (0, 0), (0, 0)))
        ghidp = jnp.pad(ghid, ((0, pad), (0, 0)))
        gaep = jnp.pad(gae, ((0, pad), (0, 0), (0, 0)))
    else:
        q2p, qwpp, embp, ghidp, gaep = q2, qwp, embed, ghid, gae
    grid = (npad // BTN,)
    dq, dqwp, demb, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=h),
        out_shape=(
            jax.ShapeDtypeStruct((npad, d), jnp.float32),
            jax.ShapeDtypeStruct((npad, h, d), jnp.float32),
            jax.ShapeDtypeStruct((npad, n, d), embed.dtype),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BTN, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BTN, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BTN, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BTN, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BTN, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BTN, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BTN, h, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BTN, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(q2p, qwpp, embp, k2, v2, key_mask.astype(jnp.float32)[None, :],
      ghidp, gaep)
    return dq[:n], dqwp[:n], demb[:n], dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_rpe_self_attention(q2, k2, v2, qwp, embed, key_mask, interpret=False):
    """Fused scores + double masked softmax + value/positional aggregation.
    Returns (hidden (N, D), ae (N, H, D)). key_mask (N,) float 1/0."""
    return _pallas_forward(q2, k2, v2, qwp, embed, key_mask, interpret=interpret)


def _fwd(q2, k2, v2, qwp, embed, key_mask, interpret):
    out = _pallas_forward(q2, k2, v2, qwp, embed, key_mask, interpret=interpret)
    return out, (q2, k2, v2, qwp, embed, key_mask)


def _bwd(interpret, res, g):
    q2, k2, v2, qwp, embed, key_mask = res
    ghid, gae = g
    n, d = q2.shape
    if not interpret and not bwd_fits_vmem(n, d, embed.dtype.itemsize):
        _, vjp = jax.vjp(
            lambda a, b, c, w, e: xla_forward(a, b, c, w, e, key_mask),
            q2, k2, v2, qwp, embed,
        )
        dq2, dk2, dv2, dqwp, dembed = vjp(
            (ghid.astype(jnp.float32), gae.astype(jnp.float32))
        )
        return dq2, dk2, dv2, dqwp, dembed, None
    dq2, dqwp, dembed, dk2, dv2 = _pallas_backward(
        q2, k2, v2, qwp, embed, key_mask,
        ghid.astype(jnp.float32), gae.astype(jnp.float32), interpret=interpret,
    )
    return dq2, dk2, dv2, dqwp, dembed, None


fused_rpe_self_attention.defvjp(_fwd, _bwd)
