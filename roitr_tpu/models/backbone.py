"""Rotation-invariant point transformer backbone (PAM encoder-decoder).

Rebuilds reference model/model.py:13-237 (`RIPointTransformer`) for padded
prefix-packed clouds: a 4-level U-Net where every level attends over kNN
neighborhoods using PPF relative geometry, a global geometric transformer at
the coarsest level, and an interpolating decoder.

Per-level self-kNN indices and PPFs are computed once and shared by every
block at that level — encoder blocks and the decoder block alike (the
reference caches them the same way via the idx/ppf slots threaded through
block lists, model.py:28-44, 223-231).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from roitr_tpu.models.attention import LocalPPFTransformer
from roitr_tpu.models.transformer import GeometricTransformer
from roitr_tpu.ops.fps import furthest_point_sampling
from roitr_tpu.ops.geometry import calc_ppf, index_valid, prefix_mask
from roitr_tpu.ops.neighbors import masked_knn, three_nn_interpolate


def _is_packed(count) -> bool:
    """Packed-batch mode (data/packing.py): count is a (B,) vector and every
    point array is B aligned per-pair segments concatenated flat."""
    return jnp.ndim(count) == 1


class Level(NamedTuple):
    """One resolution level of a cloud (static shapes, prefix-packed)."""

    points: jnp.ndarray  # (M, 3)
    normals: jnp.ndarray  # (M, 3)
    feats: jnp.ndarray  # (M, C)
    count: jnp.ndarray  # () int32 — valid prefix length
    group_idx: jnp.ndarray  # (M, K) self-kNN (excl. self)
    ppf: jnp.ndarray  # (M, K, 4)
    neighbor_mask: jnp.ndarray  # (M, K)
    down_idx: Optional[jnp.ndarray]  # (M,) index into the parent level


def _device_fps_pyramids(src_points, src_count, tgt_points, tgt_count, strides):
    """FPS-only pyramids for both clouds, sampled in vmapped lockstep.

    Returns two CloudPyramid-shaped namespaces whose kNN fields are None
    (the encoder computes those per cloud); exact: vmap of the FPS loop
    produces identical indices to two sequential runs.
    """
    import jax

    from roitr_tpu.data.pyramid import CloudPyramid

    from roitr_tpu.ops.pallas import fps_kernel

    pts = jnp.stack([jnp.asarray(src_points), jnp.asarray(tgt_points)])
    cnt = jnp.stack([jnp.asarray(src_count), jnp.asarray(tgt_count)])
    fps_fields = {0: {}, 1: {}}
    for lvl, stride in enumerate(strides):
        if stride == 1:
            continue
        m = pts.shape[1] // stride
        if jax.default_backend() == "tpu" and fps_kernel.supported_n(pts.shape[1]):
            # whole FPS chain on-core: the XLA loop pays ~us-scale while-loop
            # overhead per pick (ops/pallas/fps_kernel.py docstring)
            idx = fps_kernel.fps_pairs(pts, cnt, m)
        else:
            idx = jax.vmap(furthest_point_sampling, in_axes=(0, 0, None))(pts, cnt, m)
        for c in (0, 1):
            fps_fields[c][f"fps_idx{lvl + 1}"] = idx[c]
        pts = jnp.take_along_axis(pts, idx[:, :, None], axis=1)
        cnt = jnp.maximum(cnt // stride, 1)

    none_fields = {
        name: None
        for name in CloudPyramid._fields
        if not name.startswith("fps_idx")
    }
    return (
        CloudPyramid(**fps_fields[0], **none_fields),
        CloudPyramid(**fps_fields[1], **none_fields),
    )


def _gather_pn(points, normals, group_idx):
    """Neighbor (points, normals) via ONE (M, K, 6) row gather: TPU row
    gathers are per-row-latency-bound (a 3-wide row costs the same as a
    64-wide one, profiled), so fusing the two gathers halves their cost."""
    pn = jnp.concatenate([points, normals], axis=-1)[group_idx]
    return pn[..., :3], pn[..., 3:]


def _self_neighborhood(points, normals, count, nsample, self_idx=None, method="exact"):
    """Self-kNN (excluding the point itself) + PPFs for one level."""
    if self_idx is not None:
        group_idx = self_idx
    else:
        if _is_packed(count):
            raise ValueError("packed batches require host-precomputed kNN indices")
        group_idx, _ = masked_knn(points, points, count, nsample,
                                  exclude_self=True, method=method)
    neighbor_mask = index_valid(group_idx, count, points.shape[0])
    ppf = calc_ppf(points, normals, *_gather_pn(points, normals, group_idx))
    return group_idx, ppf, neighbor_mask


class TransitionDown(nn.Module):
    """FPS downsample + cross-kNN PPF attention pooling into the sampled set
    (reference model.py:47-80). `fps_idx`/`cross_idx` accept host-precomputed
    indices (roitr_tpu/data/pyramid.py) — FPS especially is latency-bound on
    TPU (sequential argmax chain) and much better produced by the loader."""

    out_dim: int
    hidden_dim: int
    num_heads: int
    stride: int
    nsample: int
    dtype: Any = jnp.float32
    knn_method: str = "exact"
    remat: bool = False

    @nn.compact
    def __call__(self, points, normals, feats, count, fps_idx=None, cross_idx=None):
        n = points.shape[0]
        if self.stride != 1:
            m = n // self.stride
            if fps_idx is not None:
                idx = fps_idx
            elif _is_packed(count):
                raise ValueError("packed batches require host-precomputed FPS indices")
            else:
                idx = furthest_point_sampling(points, count, m)
            new_count = jnp.maximum(count // self.stride, 1)
            new_points, new_normals = _gather_pn(points, normals, idx)
        else:
            m = n
            idx = None
            new_count = count
            new_points, new_normals = points, normals

        if cross_idx is not None:
            group_idx = cross_idx
        elif _is_packed(count):
            raise ValueError("packed batches require host-precomputed kNN indices")
        else:
            group_idx, _ = masked_knn(new_points, points, count, self.nsample,
                                      exclude_self=True, method=self.knn_method)
        neighbor_mask = index_valid(group_idx, count, n)
        ppf = calc_ppf(new_points, new_normals, *_gather_pn(points, normals, group_idx))

        cls = nn.remat(LocalPPFTransformer) if self.remat else LocalPPFTransformer
        x = cls(
            input_dim=feats.shape[-1],
            hidden_dim=self.hidden_dim,
            output_dim=self.out_dim,
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="transformer",
        )(feats, idx, group_idx, ppf, neighbor_mask)
        return new_points, new_normals, x, new_count, idx


class PointBlock(nn.Module):
    """RIPointTransformerBlock (reference model.py:120-142): local PPF
    attention + LayerNorm + residual + ReLU over a fixed level."""

    dim: int
    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, feats, group_idx, ppf, neighbor_mask):
        identity = feats
        cls = nn.remat(LocalPPFTransformer) if self.remat else LocalPPFTransformer
        x = cls(
            input_dim=self.dim,
            hidden_dim=self.hidden_dim,
            output_dim=self.dim,
            num_heads=self.num_heads,
            dtype=self.dtype,
            name="transformer",
        )(feats, None, group_idx, ppf, neighbor_mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x + identity)


class TransitionUpHead(nn.Module):
    """Coarsest-level decoder head: concat per-cloud mean-pooled global
    feature (reference model.py:99-112, is_head branch)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, count):
        mask = prefix_mask(feats.shape[0], count)[:, None]
        masked = jnp.where(mask, feats, 0.0).astype(jnp.float32)
        if _is_packed(count):
            # per-pair global pooling over the aligned segments
            b = count.shape[0]
            seg = feats.shape[0] // b
            denom = jnp.maximum(count, 1).astype(jnp.float32)[:, None]
            pooled = (masked.reshape(b, seg, -1).sum(axis=1) / denom).astype(feats.dtype)
            g = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="linear2")(pooled))
            g = jnp.repeat(g, seg, axis=0)  # (B*seg, dim)
        else:
            denom = jnp.maximum(count, 1).astype(jnp.float32)
            pooled = (masked.sum(axis=0, keepdims=True) / denom).astype(feats.dtype)
            g = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="linear2")(pooled))
            g = jnp.broadcast_to(g, (feats.shape[0], g.shape[-1]))
        x = jnp.concatenate([feats, g], axis=-1)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        return nn.relu(x)


class TransitionUp(nn.Module):
    """Decoder upsample: lateral projection + 3-NN inverse-distance
    interpolation of the coarser level (reference model.py:113-117)."""

    out_dim: int
    dtype: Any = jnp.float32
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, points, feats, coarse_points, coarse_feats, coarse_count,
                 up_idx=None, up_w=None):
        x1 = nn.Dense(self.out_dim, dtype=self.dtype, name="linear1")(feats)
        x1 = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x1))
        x2 = nn.Dense(self.out_dim, dtype=self.dtype, name="linear2")(coarse_feats)
        x2 = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x2))
        up = three_nn_interpolate(points, coarse_points, x2, coarse_count,
                                  idx=up_idx, weight=up_w, method=self.knn_method)
        return x1 + up


class RIPointTransformer(nn.Module):
    """The full backbone (reference model.py:145-237)."""

    transformer_blocks: Sequence[str]
    factor: int = 1
    num_heads: int = 4
    enc_blocks: Sequence[int] = (2, 3, 3, 3)
    strides: Sequence[int] = (1, 4, 4, 4)
    nsample: Sequence[int] = (8, 16, 16, 16)
    dtype: Any = jnp.float32
    knn_method: str = "exact"
    geo_embedding_storage: str = "bf16"
    # rematerialize the local PPF attention blocks in the backward pass
    # (recompute the cheap fused forward instead of storing the (M, K, C)
    # intermediates in HBM) — training-only effect
    remat_local: bool = False

    def setup(self):
        f = self.factor
        self.planes = [64 * f, 128 * f, 256 * f, 256 * f]
        hid = lambda p: min(p, 256 * f)
        enc = []
        in_dim = 1
        for lvl in range(4):
            p = self.planes[lvl]
            stage = {
                "down": TransitionDown(
                    out_dim=p,
                    hidden_dim=hid(p),
                    num_heads=self.num_heads,
                    stride=self.strides[lvl],
                    nsample=self.nsample[lvl],
                    dtype=self.dtype,
                    knn_method=self.knn_method,
                    remat=self.remat_local,
                    name=f"enc{lvl + 1}_down",
                ),
                "blocks": [
                    PointBlock(p, hid(p), self.num_heads, self.dtype,
                               remat=self.remat_local,
                               name=f"enc{lvl + 1}_block{b}")
                    for b in range(1, self.enc_blocks[lvl])
                ],
            }
            enc.append(stage)
            in_dim = p
        self.enc = enc

        self.global_transformer = GeometricTransformer(
            input_dim=self.planes[3],
            output_dim=self.planes[3],
            hidden_dim=self.planes[3],
            num_heads=self.num_heads,
            blocks=self.transformer_blocks,
            sigma_d=0.2,
            sigma_a=15.0,
            angle_k=3,
            dtype=self.dtype,
            embedding_storage=self.geo_embedding_storage,
            name="global_transformer",
        )

        self.dec4_up = TransitionUpHead(self.planes[3], self.dtype, name="dec4_up")
        self.dec4_block = PointBlock(
            self.planes[3], hid(self.planes[3]), self.num_heads, self.dtype,
            remat=self.remat_local, name="dec4_block"
        )
        self.dec3_up = TransitionUp(self.planes[2], self.dtype, self.knn_method, name="dec3_up")
        self.dec3_block = PointBlock(
            self.planes[2], hid(self.planes[2]), self.num_heads, self.dtype,
            remat=self.remat_local, name="dec3_block"
        )
        self.dec2_up = TransitionUp(self.planes[1], self.dtype, self.knn_method, name="dec2_up")
        self.dec2_block = PointBlock(
            self.planes[1], hid(self.planes[1]), self.num_heads, self.dtype,
            remat=self.remat_local, name="dec2_block"
        )
        self.dec1_up = TransitionUp(self.planes[0], self.dtype, self.knn_method, name="dec1_up")
        self.dec1_block = PointBlock(
            self.planes[0], hid(self.planes[0]), self.num_heads, self.dtype,
            remat=self.remat_local, name="dec1_block"
        )

    def encode(self, points, normals, feats, count, pyramid=None) -> Tuple[Level, ...]:
        levels = []
        p, nrm, x, cnt = points, normals, feats, count
        for lvl in range(4):
            stage = self.enc[lvl]
            fps_idx = cross_idx = self_idx = None
            if pyramid is not None:
                fps_idx = getattr(pyramid, f"fps_idx{lvl + 1}", None) if lvl > 0 else None
                cross_idx = getattr(pyramid, f"cross_idx{lvl + 1}")
                self_idx = getattr(pyramid, f"self_idx{lvl + 1}")
            p, nrm, x, cnt, down_idx = stage["down"](
                p, nrm, x, cnt, fps_idx=fps_idx, cross_idx=cross_idx
            )
            group_idx, ppf, nmask = _self_neighborhood(
                p, nrm, cnt, self.nsample[lvl], self_idx=self_idx,
                method=self.knn_method,
            )
            for block in stage["blocks"]:
                x = block(x, group_idx, ppf, nmask)
            levels.append(Level(p, nrm, x, cnt, group_idx, ppf, nmask, down_idx))
        return tuple(levels)

    def decode(self, levels: Tuple[Level, ...], pyramid=None) -> Tuple[jnp.ndarray, ...]:
        l1, l2, l3, l4 = levels
        up = lambda n: (None, None) if pyramid is None else (
            getattr(pyramid, f"up_idx{n}"), getattr(pyramid, f"up_w{n}")
        )
        x4 = self.dec4_up(l4.feats, l4.count)
        x4 = self.dec4_block(x4, l4.group_idx, l4.ppf, l4.neighbor_mask)
        x3 = self.dec3_up(l3.points, l3.feats, l4.points, x4, l4.count, *up(4))
        x3 = self.dec3_block(x3, l3.group_idx, l3.ppf, l3.neighbor_mask)
        x2 = self.dec2_up(l2.points, l2.feats, l3.points, x3, l3.count, *up(3))
        x2 = self.dec2_block(x2, l2.group_idx, l2.ppf, l2.neighbor_mask)
        x1 = self.dec1_up(l1.points, l1.feats, l2.points, x2, l2.count, *up(2))
        x1 = self.dec1_block(x1, l1.group_idx, l1.ppf, l1.neighbor_mask)
        return x1, x2, x3, x4

    def __call__(
        self,
        src_points,  # (N, 3) raw source (backbone geometry input)
        src_normals,
        src_feats,
        src_count,
        tgt_points,
        tgt_normals,
        tgt_feats,
        tgt_count,
        src_deformed,  # (N, 3) deformed source (4DMatch; == src_points for rigid)
        src_pyramid=None,
        tgt_pyramid=None,
    ):
        # Without a host pyramid, compute both clouds' FPS chains in lockstep
        # (vmap over a (2,) cloud axis): FPS is bound by its sequential
        # argmax dependency, so running the two clouds in the same loop
        # halves the chain length. Only FPS is batched this way — vmapping
        # the attention gathers was measured 4.7x SLOWER at 16k (XLA lowers
        # batched neighborhood gathers poorly), so the encoder itself stays
        # sequential per cloud (matching the reference, model.py:195-204).
        packed = _is_packed(src_count)
        if (
            not packed
            and src_pyramid is None
            and tgt_pyramid is None
            and src_points.shape == tgt_points.shape
        ):
            src_pyramid, tgt_pyramid = _device_fps_pyramids(
                src_points, src_count, tgt_points, tgt_count, self.strides
            )
        s_levels = self.encode(src_points, src_normals, src_feats, src_count, src_pyramid)
        t_levels = self.encode(tgt_points, tgt_normals, tgt_feats, tgt_count, tgt_pyramid)
        s4, t4 = s_levels[3], t_levels[3]

        s_mask4 = prefix_mask(s4.points.shape[0], s4.count)
        t_mask4 = prefix_mask(t4.points.shape[0], t4.count)
        if packed:
            # per-pair coarse transformer: the aligned segments make the
            # (B, m4, ...) views free reshapes; the transformer itself is
            # dense (embedding + einsum attention), so a lifted vmap with
            # shared params is the right batching here — the 4.7x-slower
            # vmapped-gather pathology only applies to the point levels.
            b = src_count.shape[0]
            m4 = s4.points.shape[0] // b
            n4 = t4.points.shape[0] // b
            per_pair = lambda mdl, rp, sp, rf, sf, rc, sc, rm, sm: mdl(
                rp, sp, rf, sf, ref_count=rc, src_count=sc,
                ref_masks=rm, src_masks=sm,
            )
            vmapped = nn.vmap(
                per_pair,
                in_axes=(0, 0, 0, 0, 0, 0, 0, 0),
                out_axes=0,
                variable_axes={"params": None},
                split_rngs={"params": False},
            )
            s_gx4, t_gx4 = vmapped(
                self.global_transformer,
                s4.points.reshape(b, m4, 3),
                t4.points.reshape(b, n4, 3),
                s4.feats.reshape(b, m4, -1),
                t4.feats.reshape(b, n4, -1),
                s4.count,
                t4.count,
                s_mask4.reshape(b, m4),
                t_mask4.reshape(b, n4),
            )
            s_gx4 = s_gx4.reshape(b * m4, -1)
            t_gx4 = t_gx4.reshape(b * n4, -1)
        else:
            s_gx4, t_gx4 = self.global_transformer(
                s4.points,
                t4.points,
                s4.feats,
                t4.feats,
                ref_count=s4.count,
                src_count=t4.count,
                ref_masks=s_mask4,
                src_masks=t_mask4,
            )

        s_x1, _, _, _ = self.decode(s_levels, src_pyramid)
        t_x1, _, _, _ = self.decode(t_levels, tgt_pyramid)

        # chain FPS indices back to raw ordering (reference model.py:233-235)
        idx3_in_1 = s_levels[1].down_idx[s_levels[2].down_idx]
        idx4_in_1 = idx3_in_1[s_levels[3].down_idx]
        s_nodes = src_deformed[idx4_in_1]

        return (
            s_nodes,  # (N4, 3) source nodes (in deformed frame)
            s_gx4,  # (N4, C) source node features (globally refined)
            src_deformed,  # (N, 3) source points
            s_x1,  # (N, C1) source point features
            s4.count,
            t4.points,
            t_gx4,
            t_levels[0].points,
            t_x1,
            t4.count,
        )
