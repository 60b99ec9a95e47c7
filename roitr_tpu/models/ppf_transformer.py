"""Alternative global transformer conditioned on PPF embeddings.

Rebuilds reference model/transformer/ppftransformer.py:14-199 (the
`PPFTransformer` + `RPEConditionalTransformer` variant with
`with_cross_pos_embed` attention, reference attention.py:8-131). The
default RoITr pipeline does not instantiate it (model.py:165 uses
GeometricTransformer), but the reference ships it as the alternative
global stage and the config flag exists — kept here for capability parity
and experimentation.

Architecture: global-mode PPF embedding per node neighborhood (4 sinusoidal
channels, max-pooled over the neighborhood before attention,
ppftransformer.py:32-35), interleaved self (RPE over the pooled embedding)
and cross blocks; cross attention optionally adds projected positional
embeddings to q/k and the value (attention.py:49-54, 67-68).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from roitr_tpu.models.attention import (
    AttentionOutput,
    _merge_heads,
    _split_heads,
    masked_softmax,
)
from roitr_tpu.models.embeddings import PPFEmbedding


class CrossPosEmbedAttention(nn.Module):
    """MultiHeadAttention with optional projected positional embeddings
    added inside the score/value paths (reference attention.py:8-74)."""

    d_model: int
    num_heads: int
    with_cross_pos_embed: bool = False

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_q, embed_k, key_masks=None):
        h, c = self.num_heads, self.d_model // self.num_heads
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), h)
        if self.with_cross_pos_embed:
            pq = _split_heads(nn.Dense(self.d_model, name="proj_pq")(embed_q), h)
            pk = _split_heads(nn.Dense(self.d_model, name="proj_pk")(embed_k), h)
            vk = _split_heads(nn.Dense(self.d_model, name="proj_vk")(embed_k), h)
            scores = jnp.einsum("nhc,mhc->hnm", q + pq, k + pk)
        else:
            scores = jnp.einsum("nhc,mhc->hnm", q, k)
        scores = scores / jnp.sqrt(jnp.asarray(c, input_q.dtype))
        attn = masked_softmax(scores, None if key_masks is None else key_masks[None, None, :])
        value = (v + vk) if self.with_cross_pos_embed else v
        return _merge_heads(jnp.einsum("hnm,mhc->nhc", attn, value))


class PPFCrossLayer(nn.Module):
    """TransformerLayer of the PPF variant (ppftransformer.py:14-48):
    neighborhood embeddings are max-pooled before use."""

    d_model: int
    num_heads: int
    with_cross_pos_embed: bool = False

    @nn.compact
    def __call__(self, x, mem, embed_q, embed_k, key_masks=None):
        eq = None if embed_q is None else jnp.max(embed_q, axis=-2)
        ek = None if embed_k is None else jnp.max(embed_k, axis=-2)
        hidden = CrossPosEmbedAttention(
            self.d_model, self.num_heads, self.with_cross_pos_embed, name="attention"
        )(x, mem, mem, eq, ek, key_masks)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(hidden + x)
        return AttentionOutput(self.d_model, name="output")(out)


class PPFSelfLayer(nn.Module):
    """RPETransformerLayer of the PPF variant (ppftransformer.py:51-75 +
    attention.py:77-131): relative-position attention over the all-pairs
    PPF embedding e (N, N, d): scores = (q.k + q.proj_p(e))/sqrt(c),
    out = A @ v + sum_m A * proj_vp(e). Projections are factored exactly as
    in GlobalRPESelfAttention (never materializing per-head (N,N,c))."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x, embed, key_masks=None):
        h, c = self.num_heads, self.d_model // self.num_heads
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(x), h)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(x), h)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(x), h)

        wp = self.param("proj_p_kernel", nn.initializers.lecun_normal(),
                        (self.d_model, self.d_model))
        bp = self.param("proj_p_bias", nn.initializers.zeros, (self.d_model,))
        wvp = self.param("proj_vp_kernel", nn.initializers.lecun_normal(),
                         (self.d_model, self.d_model))
        bvp = self.param("proj_vp_bias", nn.initializers.zeros, (self.d_model,))

        qwp = jnp.einsum("nhc,dhc->nhd", q, wp.reshape(self.d_model, h, c))
        scores_p = jnp.einsum("nhd,nmd->hnm", qwp, embed)
        scores_p = scores_p + jnp.einsum("nhc,hc->hn", q, bp.reshape(h, c))[:, :, None]
        scores = (jnp.einsum("nhc,mhc->hnm", q, k) + scores_p) / jnp.sqrt(
            jnp.asarray(c, x.dtype)
        )
        attn = masked_softmax(scores, None if key_masks is None else key_masks[None, None, :])
        hidden0 = jnp.einsum("hnm,mhc->nhc", attn, v)
        ae = jnp.einsum("hnm,nmd->nhd", attn, embed)
        hidden1 = jnp.einsum("nhd,dhc->nhc", ae, wvp.reshape(self.d_model, h, c))
        hidden1 = hidden1 + bvp.reshape(h, c)[None]
        hidden = _merge_heads(hidden0 + hidden1)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(hidden + x)
        return AttentionOutput(self.d_model, name="output")(out)


class PPFTransformer(nn.Module):
    """Global PPF transformer (reference ppftransformer.py:125-199)."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Sequence[str]
    with_cross_pos_embed: bool = False

    @nn.compact
    def __call__(
        self,
        ref_feats: jnp.ndarray,  # (N, C)
        src_feats: jnp.ndarray,  # (M, C)
        ref_ppfs: jnp.ndarray,  # (N, K, 4)
        src_ppfs: jnp.ndarray,  # (M, K, 4)
        ref_masks: Optional[jnp.ndarray] = None,
        src_masks: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        embedding = PPFEmbedding(self.hidden_dim, mode="global", name="embedding")
        ref_embed = embedding(ref_ppfs)  # (N, K, d)
        src_embed = embedding(src_ppfs)

        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        feats0, feats1 = in_proj(ref_feats), in_proj(src_feats)

        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = PPFSelfLayer(self.hidden_dim, self.num_heads, name=f"layers_{i}")
                feats0 = layer(feats0, ref_embed, ref_masks)
                feats1 = layer(feats1, src_embed, src_masks)
            elif block == "cross":
                layer = PPFCrossLayer(
                    self.hidden_dim, self.num_heads, self.with_cross_pos_embed,
                    name=f"layers_{i}",
                )
                feats0 = layer(feats0, feats1, ref_embed, src_embed, src_masks)
                feats1 = layer(feats1, feats0, src_embed, ref_embed, ref_masks)
            else:
                raise ValueError(f"unknown block type {block!r}")

        out_proj = nn.Dense(self.output_dim, name="out_proj")
        return out_proj(feats0), out_proj(feats1)
