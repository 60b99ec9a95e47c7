"""Positional / structural embeddings (flax.linen).

Rebuilds reference model/transformer/positional_encoding.py:38-154 with
static shapes and optional validity masks. All geometry math stays fp32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from roitr_tpu.ops.geometry import masked_pairwise_sq_dist, prefix_mask

_INF = 1e10


def sinusoidal_embedding(indices: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """indices (*,) -> (*, d_model), interleaved [sin0, cos0, sin1, cos1, ...].

    Matches reference positional_encoding.py:38-62: omega_i = idx *
    exp(-2i log(1e4)/d); the (d/2, 2) [sin, cos] pair layout is flattened
    into the feature axis.
    """
    if d_model % 2 != 0:
        raise ValueError(f"sinusoidal embedding needs even d_model, got {d_model}")
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-np.log(10000.0) / d_model)
    )
    omegas = indices[..., None] * div_term  # (*, d/2)
    emb = jnp.stack([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)  # (*, d/2, 2)
    return emb.reshape(indices.shape + (d_model,))


class PPFEmbedding(nn.Module):
    """PPF -> hidden embedding (reference PPFStructualEmbedding, :65-91).

    local mode: a single linear lift of the raw 4-d PPF.
    global mode: 4 sinusoidal embeddings (one per PPF channel) concatenated,
    projected, then L2-normalized.
    """

    hidden_dim: int
    mode: str = "local"

    @nn.compact
    def __call__(self, ppf: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "local":
            return nn.Dense(self.hidden_dim, name="proj")(ppf)
        if self.mode == "global":
            sub = self.hidden_dim // 4
            parts = [sinusoidal_embedding(ppf[..., i], sub) for i in range(4)]
            emb = nn.Dense(self.hidden_dim, name="proj")(jnp.concatenate(parts, axis=-1))
            return emb / jnp.clip(jnp.linalg.norm(emb, axis=-1, keepdims=True), min=1e-12)
        raise ValueError(f"unknown PPF embedding mode {self.mode!r}")


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact param names/inits (kernel,
    bias) so the torch->flax converter paths stay unchanged, while the
    matmul itself can run inside a fused Pallas kernel."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class GeometricStructureEmbedding(nn.Module):
    """Pairwise distance + triplet angular embedding over coarse nodes.

    Matches reference positional_encoding.py:94-154: d_indices = dist/sigma_d
    and, for each of the angle_k nearest neighbors of the row point, the angle
    at the row point between (neighbor - row) and (col - row), scaled by
    180/(sigma_a*pi); sinusoidal-embedded, projected, angular part
    max-reduced over k. The embedding indices carry no gradient (reference
    wraps them in no_grad); we stop_gradient for parity.

    On TPU the sin-basis + projection + max runs as a fused Pallas kernel
    (ops/pallas/geo_embedding_kernel.py) — the XLA lowering materializes the
    (N, N, k, hidden) basis in HBM (~22 ms of the 32k forward); the kernel
    keeps it in VMEM. Identical math, custom VJP for training.
    """

    hidden_dim: int
    sigma_d: float = 0.2
    sigma_a: float = 15.0
    angle_k: int = 3
    reduction_a: str = "max"
    backend: str = "auto"  # auto | xla | pallas | pallas_interpret
    # storage dtype the fused kernel emits directly (the XLA path returns
    # fp32 and the caller casts — an extra 0.6 ms convert per cloud the
    # kernel avoids)
    out_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray, count=None) -> jnp.ndarray:
        """points (N, 3) prefix-packed -> (N, N, hidden_dim)."""
        n = points.shape[0]
        mask = prefix_mask(n, count) if count is not None else jnp.ones(n, bool)

        sq = masked_pairwise_sq_dist(points, points, y_mask=mask, fill=_INF)
        dist = jnp.sqrt(jnp.where(sq >= _INF, 1e-12, sq))
        d_indices = jnp.sqrt(masked_pairwise_sq_dist(points, points, fill=1e-12)) / self.sigma_d

        # clamp for tiny node sets (padded buckets can leave < angle_k+1
        # nodes; the reference never sees this case)
        k = max(min(self.angle_k, n - 1), 1)
        neg, knn_idx = jax.lax.top_k(-sq, min(k + 1, n))  # self first (dist 0)
        knn_idx = knn_idx[:, 1:] if n > 1 else knn_idx  # (N, k)
        neg = neg[:, 1:] if n > 1 else neg
        # when fewer valid nodes than k+1 exist, top_k returns padding nodes
        # (dist +inf); replace them with self so the embedding never reads
        # garbage coordinates (angle becomes atan2(0,0)=0, deterministic)
        invalid = -neg >= _INF
        knn_idx = jnp.where(
            invalid, jnp.arange(n, dtype=knn_idx.dtype)[:, None], knn_idx
        )
        knn_points = points[knn_idx]  # (N, k, 3)
        ref_vec = knn_points - points[:, None, :]  # (N, k, 3)
        anc_vec = points[None, :, :] - points[:, None, :]  # (N, N, 3)
        cross = jnp.cross(ref_vec[:, None, :, :], anc_vec[:, :, None, :])  # (N, N, k, 3)
        sin_v = jnp.linalg.norm(cross, axis=-1)
        cos_v = jnp.sum(ref_vec[:, None, :, :] * anc_vec[:, :, None, :], axis=-1)
        angles = jnp.arctan2(sin_v, cos_v)  # (N, N, k)
        factor_a = 180.0 / (self.sigma_a * np.pi)
        a_indices = angles * factor_a

        d_indices = jax.lax.stop_gradient(d_indices)
        a_indices = jax.lax.stop_gradient(a_indices)

        wd, bd = _DenseParams(self.hidden_dim, self.hidden_dim, name="proj_d")()
        wa, ba = _DenseParams(self.hidden_dim, self.hidden_dim, name="proj_a")()

        from roitr_tpu.ops.pallas.geo_embedding_kernel import supported_hidden

        backend = self.backend
        if backend == "auto":
            backend = (
                "pallas"
                if jax.default_backend() == "tpu" and supported_hidden(self.hidden_dim)
                else "xla"
            )
        if backend.startswith("pallas") and self.reduction_a == "max":
            from roitr_tpu.ops.pallas.geo_embedding_kernel import fused_geo_embedding

            out = fused_geo_embedding(
                d_indices.reshape(-1),
                a_indices.reshape(-1, a_indices.shape[-1]),
                wd, bd, wa, ba,
                backend == "pallas_interpret",
                self.out_dtype,
            )
            return out.reshape(n, n, self.hidden_dim)

        d_emb = sinusoidal_embedding(d_indices, self.hidden_dim) @ wd + bd
        a_emb = sinusoidal_embedding(a_indices, self.hidden_dim) @ wa + ba
        if self.reduction_a == "max":
            a_emb = jnp.max(a_emb, axis=2)
        elif self.reduction_a == "mean":
            a_emb = jnp.mean(a_emb, axis=2)
        else:
            raise ValueError(f"unknown reduction {self.reduction_a!r}")
        return d_emb + a_emb
