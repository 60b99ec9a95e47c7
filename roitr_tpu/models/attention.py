"""Attention layers (flax.linen): local PPF attention, global RPE attention
with learned positional states, and cross attention.

Rebuilds reference model/transformer/{attention,geoattention}.py. Two
TPU-motivated departures (both mathematically identical to the reference):

1. The global RPE attention never materializes the projected (N, N, d)
   positional tensors. `scores_p = q . proj_p(e)` is refactored as
   `(q @ Wp) . e` and `sum_m A * proj_vp(e)` as `proj_vp(sum_m A * e)`,
   contracting the head projections into the small side so only the raw
   embedding (N, N, d) is ever resident (reference geoattention.py:101-136
   builds two extra (B, H, N, M, c) tensors).
2. All softmaxes are mask-safe: rows whose keys are entirely invalid
   (padding) produce zeros instead of NaN.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1):
    """softmax along `axis`; `mask` True=keep. All-masked rows -> zeros."""
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    m = jnp.max(scores, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    if mask is not None:
        e = jnp.where(mask, e, 0.0)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.where(s == 0.0, 1.0, s)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(..., H*c) -> (..., H, c) head-major, matching einops '(h c)'."""
    return x.reshape(x.shape[:-1] + (num_heads, x.shape[-1] // num_heads))


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


class AttentionOutput(nn.Module):
    """Feed-forward block: expand 2x, act, squeeze, residual LayerNorm
    (reference attention.py:203-218)."""

    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.d_model * 2, dtype=self.dtype, name="expand")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="squeeze")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x + h)


class LocalPPFAttention(nn.Module):
    """Gathered neighborhood attention with PPF relative position terms.

    Reference LocalRPEMultiHeadAttention + LocalRPEAttentionLayer
    (attention.py:134-200, 290-320): q is the center point, k/v its K
    neighbors, p/vp the projected PPF embedding;
    scores = (q.k + q.p)/sqrt(c), out = A @ (v + vp), then linear +
    LayerNorm(residual at the center point).
    """

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # (N, d) — all candidate key/value points
        pos_embed: jnp.ndarray,  # (M, K, d) — PPF embedding per neighborhood
        node_idx: jnp.ndarray,  # (M,) — center index into feats
        group_idx: jnp.ndarray,  # (M, K) — neighbor indices into feats
        neighbor_mask: Optional[jnp.ndarray] = None,  # (M, K) True=valid
    ) -> jnp.ndarray:
        h, c = self.num_heads, self.d_model // self.num_heads

        # project on the dense (N, d) side, then gather (reference order —
        # keeps the matmul at N x d x d instead of M*K x d x d).
        # node_idx None means centers == all points (identity gather).
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(feats)
        if node_idx is not None:
            q = q[node_idx]  # (M, d)
        # one (M, K, 2d) gather instead of separate k and v gathers: TPU row
        # gathers are per-row-latency-bound (profiled 0.47 ms at 262k rows
        # whether rows are 3 or 64 floats wide), so doubling the row width
        # is free and halves the gather count. Bitwise identical to two
        # gathers of the separate projections.
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(feats)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(feats)
        kv = jnp.concatenate([k, v], axis=-1)[group_idx]  # (M, K, 2d)
        k, v = kv[..., : self.d_model], kv[..., self.d_model :]
        p = nn.Dense(self.d_model, dtype=self.dtype, name="proj_p")(pos_embed)  # (M, K, d)
        vp = nn.Dense(self.d_model, dtype=self.dtype, name="proj_vp")(pos_embed)

        # Head-segmented attention WITHOUT (M, K, H, c) head splits: the
        # (N,K,C)->(N,K,H,c) reshapes lower as real layout copies on TPU
        # (profiled at ~20 ms of the 32k forward, "data formatting" at
        # 107 GB/s). Per-head contractions are segment-sums over C, i.e. a
        # matmul with the constant 0/1 segment matrix S (C, H); and
        # q.k + q.p == q.(k+p). Everything stays in the native (M, K, C)
        # layout. Mathematically identical to the reference einsums.
        # (Measured alternative: the "pure bitcast" form — reshape
        # (M,K,C)->(M,K,H,c), sum(-1) for scores, broadcast attn back over
        # c — is 8% SLOWER end-to-end (58.7 vs 54.4 ms at 32k): the H=4
        # outputs still force relayouts and the in-lane segment reductions
        # fuse worse than the seg matmul. Keep the seg-matmul form.)
        seg = (jnp.arange(self.d_model) // c)[:, None] == jnp.arange(h)[None, :]
        seg = seg.astype(q.dtype)  # (C, H)

        prod = q[:, None, :] * (k + p)  # (M, K, C)
        scores = jnp.einsum("mkc,ch->mkh", prod, seg) / jnp.sqrt(
            jnp.asarray(c, feats.dtype)
        )
        attn = masked_softmax(
            scores, None if neighbor_mask is None else neighbor_mask[:, :, None], axis=1
        )  # (M, K, H)
        w = jnp.einsum("mkh,ch->mkc", attn, seg)  # broadcast heads back to C
        hidden = jnp.sum(w * (v + vp), axis=1)  # (M, d)

        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        residual = feats if node_idx is None else feats[node_idx]
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(hidden + residual)


class LocalPPFTransformer(nn.Module):
    """in_proj -> PPF embed -> local attention -> out_proj
    (reference ppftransformer.py:202-253)."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, node_idx, group_idx, ppf, neighbor_mask=None):
        pos = nn.Dense(self.hidden_dim, dtype=self.dtype, name="embedding_proj")(ppf)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")(feats)
        x = LocalPPFAttention(self.hidden_dim, self.num_heads, self.dtype, name="attention")(
            x, pos, node_idx, group_idx, neighbor_mask
        )
        return nn.Dense(self.output_dim, dtype=self.dtype, name="out_proj")(x)


class GlobalRPESelfAttention(nn.Module):
    """Self attention over coarse nodes with geometric relative position
    embedding, also emitting learned positional states.

    Reference RPEMultiHeadAttention + RPEAttentionLayer
    (geoattention.py:69-232): scores = (q.k + q.p)/sqrt(c); hidden = A @ v;
    pos_states = sum_m A_selfexcluded * vp (self-excluding softmax,
    geoattention.py:117-134). Projections of the (N, N, d) embedding are
    contracted into q / pulled out of the sum (see module docstring).
    """

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32
    # "auto": fused Pallas kernel on TPU (reads the (N, N, d) embedding
    # ONCE per layer, everything else VMEM-resident), XLA einsums elsewhere.
    backend: str = "auto"  # auto | xla | pallas | pallas_interpret

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (N, d)
        embed: jnp.ndarray,  # (N, N, d) geometric structure embedding
        key_mask: Optional[jnp.ndarray] = None,  # (N,) True=valid
    ):
        h, c = self.num_heads, self.d_model // self.num_heads
        n = x.shape[0]

        q2 = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(x)  # (N, d)
        k2 = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(x)
        v2 = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(x)
        q = _split_heads(q2, h)

        # factored q . proj_p(e): contract q into the projection kernel.
        # The proj_p bias contributes q . b_p to every score of a query row
        # — constant along the key axis, hence softmax-invariant; it is
        # dropped (both backends), which changes nothing downstream.
        wp = self.param("proj_p_kernel", nn.initializers.lecun_normal(), (self.d_model, self.d_model))
        self.param("proj_p_bias", nn.initializers.zeros, (self.d_model,))
        wp_h = wp.reshape(self.d_model, h, c)  # (D_in, H, c)
        qwp = jnp.einsum("nhc,dhc->nhd", q, wp_h)  # (N, H, D_in)

        from roitr_tpu.ops.pallas.rpe_attention_kernel import (
            fused_rpe_self_attention,
            supported_n,
            xla_forward,
        )

        backend = self.backend
        if backend == "auto":
            # kernel needs the key count lane-aligned (N % 128 == 0, i.e.
            # coarse levels of >= 8192-point buckets); XLA below that
            backend = (
                "pallas"
                if jax.default_backend() == "tpu" and supported_n(n)
                else "xla"
            )
        fmask = (
            jnp.ones((n,), jnp.float32)
            if key_mask is None
            else key_mask.astype(jnp.float32)
        )

        f32 = lambda t: t.astype(jnp.float32)
        if backend.startswith("pallas"):
            hidden, ae = fused_rpe_self_attention(
                f32(q2), f32(k2), f32(v2), f32(qwp), embed, fmask,
                backend == "pallas_interpret",
            )
        else:
            hidden, ae = xla_forward(f32(q2), f32(k2), f32(v2), f32(qwp), embed, fmask)
        hidden = hidden.astype(x.dtype)

        wvp = self.param("proj_vp_kernel", nn.initializers.lecun_normal(), (self.d_model, self.d_model))
        bvp = self.param("proj_vp_bias", nn.initializers.zeros, (self.d_model,))
        wvp_h = wvp.reshape(self.d_model, h, c)  # (D_in, H, c)
        pos_states = jnp.einsum("nhd,dhc->nhc", ae.astype(x.dtype), wvp_h) + bvp.reshape(h, c)[None]
        pos_states = _merge_heads(pos_states)  # (N, d)

        return hidden, pos_states


class RPESelfLayer(nn.Module):
    """RPEAttentionLayer + RPETransformerLayer wrapper
    (geoattention.py:196-261): attention -> linear -> LayerNorm(residual),
    pos: linear -> LayerNorm, then FFN on both streams."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embed, key_mask=None):
        hidden, pos = GlobalRPESelfAttention(
            self.d_model, self.num_heads, self.dtype, name="attention"
        )(x, embed, key_mask)
        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(hidden + x)

        pos = nn.Dense(self.d_model, dtype=self.dtype, name="pos_linear")(pos)
        pos = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pos_norm")(pos)

        out = AttentionOutput(self.d_model, self.dtype, name="output")(out)
        pos = AttentionOutput(self.d_model, self.dtype, name="pos_proj")(pos)
        return out, pos


class CrossAttentionLayer(nn.Module):
    """Cross attention where learned positional states are added to the
    q/k inputs before projection (reference geoattention.py:10-66, 264-292:
    input_q + pos_q, input_k + pos_k), followed by linear + residual
    LayerNorm and the FFN."""

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (N, d) queries
        mem: jnp.ndarray,  # (M, d) keys/values
        pos_q: Optional[jnp.ndarray],  # (N, d)
        pos_k: Optional[jnp.ndarray],  # (M, d)
        key_mask: Optional[jnp.ndarray] = None,  # (M,)
    ) -> jnp.ndarray:
        h, c = self.num_heads, self.d_model // self.num_heads
        in_q = x if pos_q is None else x + pos_q
        in_k = mem if pos_k is None else mem + pos_k

        q = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(in_q), h)
        k = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(in_k), h)
        v = _split_heads(nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(mem), h)

        scores = jnp.einsum("nhc,mhc->hnm", q, k) / jnp.sqrt(jnp.asarray(c, x.dtype))
        attn = masked_softmax(scores, None if key_mask is None else key_mask[None, None, :])
        hidden = _merge_heads(jnp.einsum("hnm,mhc->nhc", attn, v))

        hidden = nn.Dense(self.d_model, dtype=self.dtype, name="linear")(hidden)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(hidden + x)
        return AttentionOutput(self.d_model, self.dtype, name="output")(out)
