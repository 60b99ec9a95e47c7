"""The full RoITr coarse-to-fine matching pipeline (flax.linen).

Rebuilds reference model/RIGA_v2.py:10-180 end to end with static shapes:
backbone -> descriptor projections -> point-to-node partition -> GT patch
correspondences (train + dumped metrics) -> coarse matching -> patch
gathering -> Sinkhorn OT -> fine matching. Every ragged structure of the
reference is a fixed-capacity buffer + mask here, so the whole forward pass
is one jitted XLA program per (bucket, mode) pair.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from roitr_tpu.config import Config
from roitr_tpu.models.backbone import RIPointTransformer
from roitr_tpu.models.matching import (
    CoarseCorr,
    adaptive_superpoint_matching,
    coarse_matching,
    fine_matching,
    gt_coarse_corr_generator,
)
from roitr_tpu.ops.partition import (
    node_correspondences,
    node_occlusion_score,
    point_to_node_partition,
)
from roitr_tpu.ops.sinkhorn import log_sinkhorn_ot


class PairInputs(NamedTuple):
    """One padded point-cloud pair (prefix-packed).

    For rigid benchmarks src_points == src_raw_points; for 4DMatch
    src_points is the flow-deformed source (reference dataset/fdmatch.py) and
    the backbone runs on the raw geometry (reference RIGA_v2.py:58-62).
    """

    src_points: jnp.ndarray  # (N, 3) (deformed for 4D)
    src_raw_points: jnp.ndarray  # (N, 3)
    src_normals: jnp.ndarray  # (N, 3)
    src_feats: jnp.ndarray  # (N, 1)
    src_count: jnp.ndarray  # () int32
    tgt_points: jnp.ndarray  # (M, 3)
    tgt_normals: jnp.ndarray  # (M, 3)
    tgt_feats: jnp.ndarray  # (M, 1)
    tgt_count: jnp.ndarray  # () int32
    rot: jnp.ndarray  # (3, 3) GT rotation src->tgt
    trans: jnp.ndarray  # (3, 1) GT translation
    # optional host-precomputed geometric pyramids (CloudPyramid pytrees;
    # None -> the backbone computes FPS/kNN on device)
    src_pyramid: Any = None
    tgt_pyramid: Any = None


def _l2norm(x, axis=-1):
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), min=1e-12)


def _flat_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-pair row gather as ONE flat 2D row gather.

    table: (B, R, ...) — per-pair row tables; idx: (B, ...) int rows into
    the pair's own table. A vmapped/batched gather lowers poorly on TPU
    (PERFORMANCE.md: 4.7x at 16k); offsetting indices by b*R and gathering
    from the flattened (B*R, ...) table is the same values as table[b][idx[b]]
    through the fast plain-row-gather path.
    """
    b, r = table.shape[0], table.shape[1]
    base = (jnp.arange(b, dtype=idx.dtype) * r).reshape((b,) + (1,) * (idx.ndim - 1))
    flat = table.reshape((b * r,) + table.shape[2:])
    return flat[idx + base]


class RoITr(nn.Module):
    """Pipeline module. `train` toggles the GT-correspondence OT path
    (reference RIGA_v2.py:125-126)."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        f = cfg.channel_factor
        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = RIPointTransformer(
            transformer_blocks=tuple(cfg.transformer_architecture),
            factor=f,
            num_heads=cfg.num_heads,
            enc_blocks=tuple(cfg.enc_blocks),
            strides=tuple(cfg.enc_strides),
            nsample=tuple(cfg.enc_nsample),
            dtype=compute_dtype,
            knn_method=cfg.knn_method,
            geo_embedding_storage=cfg.geo_embedding_storage,
            remat_local=cfg.remat_local,
            name="backbone",
        )
        self.coarse_proj = nn.Dense(256 * f, name="coarse_proj")
        self.fine_proj = nn.Dense(256 * f, name="fine_proj")
        # learnable Sinkhorn dustbin score (reference modules.py:18)
        self.ot_alpha = self.param("ot_alpha", nn.initializers.ones, ())

    def __call__(
        self, pair: PairInputs, train: bool = False, with_gt: bool = True
    ) -> Dict[str, Any]:
        """`with_gt=False` is a serving-mode fast path: skips GT patch
        correspondences + occlusion scores (the reference computes them even
        in test mode purely for analysis dumps, RIGA_v2.py:91-116). Training
        requires with_gt=True."""
        if train and not with_gt:
            raise ValueError("training requires with_gt=True")
        if jnp.ndim(pair.src_count) == 1:
            return self._forward_packed(pair, train=train, with_gt=with_gt)
        cfg = self.cfg
        out: Dict[str, Any] = {}

        (
            src_nodes,
            src_node_feats,
            src_points,
            src_point_feats,
            src_node_count,
            tgt_nodes,
            tgt_node_feats,
            tgt_points,
            tgt_point_feats,
            tgt_node_count,
        ) = self.backbone(
            pair.src_raw_points,
            pair.src_normals,
            pair.src_feats,
            pair.src_count,
            pair.tgt_points,
            pair.tgt_normals,
            pair.tgt_feats,
            pair.tgt_count,
            pair.src_points,
            src_pyramid=pair.src_pyramid,
            tgt_pyramid=pair.tgt_pyramid,
        )

        # descriptor heads always run fp32 (matching/OT numerics)
        src_node_feats = _l2norm(self.coarse_proj(src_node_feats.astype(jnp.float32)))
        tgt_node_feats = _l2norm(self.coarse_proj(tgt_node_feats.astype(jnp.float32)))
        src_point_feats = self.fine_proj(src_point_feats.astype(jnp.float32))
        tgt_point_feats = self.fine_proj(tgt_point_feats.astype(jnp.float32))

        out["src_points"] = src_points
        out["tgt_points"] = tgt_points
        out["src_nodes"] = src_nodes
        out["tgt_nodes"] = tgt_nodes
        out["src_point_feats"] = src_point_feats
        out["tgt_point_feats"] = tgt_point_feats
        out["src_node_feats"] = src_node_feats
        out["tgt_node_feats"] = tgt_node_feats
        out["src_count"] = pair.src_count
        out["tgt_count"] = pair.tgt_count
        out["src_node_count"] = src_node_count
        out["tgt_node_count"] = tgt_node_count

        # ---- 2. point-to-node partition (reference RIGA_v2.py:82-89)
        src_part = point_to_node_partition(
            src_points, src_nodes, cfg.point_per_patch, pair.src_count, src_node_count
        )
        tgt_part = point_to_node_partition(
            tgt_points, tgt_nodes, cfg.point_per_patch, pair.tgt_count, tgt_node_count
        )

        src_padded_points = jnp.concatenate([src_points, jnp.zeros((1, 3), src_points.dtype)])
        tgt_padded_points = jnp.concatenate([tgt_points, jnp.zeros((1, 3), tgt_points.dtype)])
        src_node_knn_points = src_padded_points[src_part.node_knn_indices]
        tgt_node_knn_points = tgt_padded_points[tgt_part.node_knn_indices]

        # ---- GT node correspondences + occlusion (always computed in the
        # reference, dumped for analysis in test mode too — RIGA_v2.py:91-116;
        # skipped in serving mode)
        if with_gt:
            gt_corr = node_correspondences(
                tgt_nodes,
                src_nodes,
                tgt_node_knn_points,
                src_node_knn_points,
                pair.rot,
                pair.trans,
                cfg.matching_radius,
                ref_masks=tgt_part.node_masks,
                src_masks=src_part.node_masks,
                ref_knn_masks=tgt_part.node_knn_masks,
                src_knn_masks=src_part.node_knn_masks,
                max_candidates=cfg.max_gt_corr_candidates,
            )
            gt_tgt_occ, gt_src_occ = node_occlusion_score(
                tgt_part.node_knn_indices,
                src_part.node_knn_indices,
                tgt_padded_points,
                src_padded_points,
                pair.tgt_count,
                pair.src_count,
                pair.rot,
                pair.trans,
                ref_masks=tgt_part.node_masks,
                src_masks=src_part.node_masks,
                ref_knn_masks=tgt_part.node_knn_masks,
                src_knn_masks=src_part.node_knn_masks,
                knn_method=cfg.knn_method,
            )
        else:
            from roitr_tpu.ops.partition import NodeCorrespondences

            c = min(cfg.max_gt_corr_candidates, tgt_nodes.shape[0] * src_nodes.shape[0])
            gt_corr = NodeCorrespondences(
                jnp.zeros((c, 2), jnp.int32),
                jnp.zeros((c,), jnp.float32),
                jnp.zeros((c,), bool),
            )
            gt_tgt_occ = jnp.zeros((tgt_nodes.shape[0],), jnp.float32)
            gt_src_occ = jnp.zeros((src_nodes.shape[0],), jnp.float32)
        out["gt_node_corr_indices"] = gt_corr.indices
        out["gt_node_corr_overlaps"] = gt_corr.overlaps
        out["gt_node_corr_masks"] = gt_corr.masks
        out["gt_tgt_node_occ"] = gt_tgt_occ
        out["gt_src_node_occ"] = gt_src_occ

        # ---- 3. coarse matching (no-grad in reference RIGA_v2.py:119-126)
        tgt_f = jax.lax.stop_gradient(tgt_node_feats)
        src_f = jax.lax.stop_gradient(src_node_feats)
        if cfg.is_rigid:
            est = coarse_matching(
                tgt_f,
                src_f,
                tgt_part.node_masks,
                src_part.node_masks,
                cfg.num_est_coarse_corr,
                dual_normalization=True,
            )
            est = CoarseCorr(est.ref_indices, est.src_indices, est.scores, est.masks)
        else:
            m = adaptive_superpoint_matching(
                src_f,
                tgt_f,
                src_part.node_masks,
                tgt_part.node_masks,
                min_num_correspondences=cfg.num_est_coarse_corr,
                capacity=cfg.coarse_corr_capacity
                or max(cfg.num_est_coarse_corr * 4, 512),
                similarity_threshold=cfg.coarse_similarity_threshold,
            )
            # reference returns (src, tgt); pipeline consumes (tgt=ref, src)
            est = CoarseCorr(m.src_indices, m.ref_indices, m.scores, m.masks)

        out["tgt_node_corr_indices"] = est.ref_indices
        out["src_node_corr_indices"] = est.src_indices
        out["node_corr_masks"] = est.masks

        if train:
            corr = gt_coarse_corr_generator(
                self.make_rng("sampling"),
                gt_corr.indices,
                gt_corr.overlaps,
                gt_corr.masks,
                cfg.num_gt_coarse_corr,
                cfg.coarse_overlap_threshold,
            )
        else:
            corr = est

        tgt_corr_idx, src_corr_idx = corr.ref_indices, corr.src_indices

        # ---- 4. gather per-correspondence patches (reference :129-147)
        src_knn_idx = src_part.node_knn_indices[src_corr_idx]  # (P, K)
        tgt_knn_idx = tgt_part.node_knn_indices[tgt_corr_idx]
        src_knn_masks = src_part.node_knn_masks[src_corr_idx] & corr.masks[:, None]
        tgt_knn_masks = tgt_part.node_knn_masks[tgt_corr_idx] & corr.masks[:, None]
        src_knn_points = src_node_knn_points[src_corr_idx]  # (P, K, 3)
        tgt_knn_points = tgt_node_knn_points[tgt_corr_idx]

        zrow = jnp.zeros((1, src_point_feats.shape[-1]), src_point_feats.dtype)
        src_padded_feats = jnp.concatenate([src_point_feats, zrow])
        tgt_padded_feats = jnp.concatenate([tgt_point_feats, zrow])
        src_knn_feats = src_padded_feats[src_knn_idx]  # (P, K, C)
        tgt_knn_feats = tgt_padded_feats[tgt_knn_idx]

        out["src_node_corr_knn_points"] = src_knn_points
        out["tgt_node_corr_knn_points"] = tgt_knn_points
        out["src_node_corr_knn_masks"] = src_knn_masks
        out["tgt_node_corr_knn_masks"] = tgt_knn_masks

        # ---- 5. optimal transport (reference :150-153). The fused
        # lane-major Pallas kernel is the default on TPU (1.8 vs 4.5 ms at
        # (256, 65, 65) x 100 on v5e forward, exact to ~7e-6 — the OT stage
        # is >50% of the 2k-bucket forward); since round 5 it also carries
        # an on-core backward (trajectory-recompute VJP), so training takes
        # it too where the stacks fit VMEM (log_sinkhorn_ot falls back to
        # the checkpointed XLA scan otherwise).
        use_pallas = (
            cfg.sinkhorn_backend == "pallas"
            and jax.default_backend() == "tpu"
        )
        c = src_point_feats.shape[-1]
        matching_scores = jnp.einsum("pnc,pmc->pnm", tgt_knn_feats, src_knn_feats) / c**0.5
        matching_scores = log_sinkhorn_ot(
            matching_scores,
            tgt_knn_masks,
            src_knn_masks,
            self.ot_alpha,
            num_iter=cfg.sinkhorn_iters,
            backend="pallas" if use_pallas else "xla",
            # convergence early-exit is an inference-only lever: the
            # while_loop has no reverse-mode derivative, and training
            # keeps the reference's fixed 100 iterations anyway
            tol=0.0 if train else cfg.sinkhorn_tol,
            differentiable=train,
        )
        out["matching_scores"] = matching_scores  # (P, K+1, K+1); row: tgt, col: src

        # ---- 6. fine matching (no-grad, reference :158-169)
        scores_ng = jax.lax.stop_gradient(matching_scores)
        if not cfg.fine_matching_use_dustbin:
            scores_ng = scores_ng[:, :-1, :-1]
        fine = fine_matching(
            tgt_knn_points,
            src_knn_points,
            tgt_knn_masks,
            src_knn_masks,
            scores_ng,
            corr.masks,
            global_scores=corr.scores,
            k=cfg.fine_matching_topk,
            mutual=cfg.fine_matching_mutual,
            confidence_threshold=cfg.fine_matching_confidence_threshold,
            use_global_score=cfg.fine_matching_use_global_score,
            use_dustbin=cfg.fine_matching_use_dustbin,
            allow_fast=not train,  # slow path is faster inside the train step
        )
        out["tgt_corr_points"] = fine.ref_points
        out["src_corr_points"] = fine.src_points
        out["corr_scores"] = fine.scores
        out["corr_masks"] = fine.masks
        return out

    def _forward_packed(
        self, pair: PairInputs, train: bool = False, with_gt: bool = True
    ) -> Dict[str, Any]:
        """Packed-batch forward: B same-bucket pairs as ONE flat cloud per
        side (data/packing.py). The point levels run flat (plain row gathers
        on host-offset indices — the fast path on TPU); everything per-pair
        from the partition on runs on free (B, ...) reshapes of the aligned
        segments, vmapped where dense and flat-gathered where not. Every
        output gains a leading B axis; per-pair slices match the single-pair
        forward (tests/test_packed_batch.py).

        Rationale: the production forward has a ~2.2 ms fixed pool (gather
        DMA setup, sub-tile coarse-level ops, dispatch) that dominates small
        buckets — tools/probe_small_buckets.py measures 2.7 ms at N=512 vs
        4.5 ms at N=2048. Packing amortizes that pool over B pairs, which
        the reference (locked to batch 1) cannot do.
        """
        cfg = self.cfg
        out: Dict[str, Any] = {}
        b = pair.src_count.shape[0]

        (
            src_nodes,
            src_node_feats,
            src_points,
            src_point_feats,
            src_node_count,
            tgt_nodes,
            tgt_node_feats,
            tgt_points,
            tgt_point_feats,
            tgt_node_count,
        ) = self.backbone(
            pair.src_raw_points,
            pair.src_normals,
            pair.src_feats,
            pair.src_count,
            pair.tgt_points,
            pair.tgt_normals,
            pair.tgt_feats,
            pair.tgt_count,
            pair.src_points,
            src_pyramid=pair.src_pyramid,
            tgt_pyramid=pair.tgt_pyramid,
        )

        src_node_feats = _l2norm(self.coarse_proj(src_node_feats.astype(jnp.float32)))
        tgt_node_feats = _l2norm(self.coarse_proj(tgt_node_feats.astype(jnp.float32)))
        src_point_feats = self.fine_proj(src_point_feats.astype(jnp.float32))
        tgt_point_feats = self.fine_proj(tgt_point_feats.astype(jnp.float32))

        # free (B, ...) views of the aligned segments
        n = src_points.shape[0] // b
        m = tgt_points.shape[0] // b
        sm4 = src_nodes.shape[0] // b
        tm4 = tgt_nodes.shape[0] // b
        src_points = src_points.reshape(b, n, 3)
        tgt_points = tgt_points.reshape(b, m, 3)
        src_nodes = src_nodes.reshape(b, sm4, 3)
        tgt_nodes = tgt_nodes.reshape(b, tm4, 3)
        src_node_feats = src_node_feats.reshape(b, sm4, -1)
        tgt_node_feats = tgt_node_feats.reshape(b, tm4, -1)
        src_point_feats = src_point_feats.reshape(b, n, -1)
        tgt_point_feats = tgt_point_feats.reshape(b, m, -1)

        out["src_points"] = src_points
        out["tgt_points"] = tgt_points
        out["src_nodes"] = src_nodes
        out["tgt_nodes"] = tgt_nodes
        out["src_point_feats"] = src_point_feats
        out["tgt_point_feats"] = tgt_point_feats
        out["src_node_feats"] = src_node_feats
        out["tgt_node_feats"] = tgt_node_feats
        out["src_count"] = pair.src_count
        out["tgt_count"] = pair.tgt_count
        out["src_node_count"] = src_node_count
        out["tgt_node_count"] = tgt_node_count

        # ---- partition per pair (dense sort/scatter internals vmap cleanly)
        part_fn = jax.vmap(
            lambda pts, nds, pc, nc: point_to_node_partition(
                pts, nds, cfg.point_per_patch, pc, nc
            )
        )
        src_part = part_fn(src_points, src_nodes, pair.src_count, src_node_count)
        tgt_part = part_fn(tgt_points, tgt_nodes, pair.tgt_count, tgt_node_count)

        zrow3 = jnp.zeros((b, 1, 3), src_points.dtype)
        src_padded_points = jnp.concatenate([src_points, zrow3], axis=1)  # (B, N+1, 3)
        tgt_padded_points = jnp.concatenate([tgt_points, zrow3], axis=1)
        src_node_knn_points = _flat_gather(src_padded_points, src_part.node_knn_indices)
        tgt_node_knn_points = _flat_gather(tgt_padded_points, tgt_part.node_knn_indices)

        if with_gt:
            corr_fn = jax.vmap(
                lambda rn, sn, rkp, skp, rot, trans, rm, sm, rkm, skm: node_correspondences(
                    rn, sn, rkp, skp, rot, trans, cfg.matching_radius,
                    ref_masks=rm, src_masks=sm,
                    ref_knn_masks=rkm, src_knn_masks=skm,
                    max_candidates=cfg.max_gt_corr_candidates,
                )
            )
            gt_corr = corr_fn(
                tgt_nodes, src_nodes, tgt_node_knn_points, src_node_knn_points,
                pair.rot, pair.trans,
                tgt_part.node_masks, src_part.node_masks,
                tgt_part.node_knn_masks, src_part.node_knn_masks,
            )
            occ_fn = jax.vmap(
                lambda rki, ski, rp, sp, rc, sc, rot, trans, rm, sm, rkm, skm: node_occlusion_score(
                    rki, ski, rp, sp, rc, sc, rot, trans,
                    ref_masks=rm, src_masks=sm,
                    ref_knn_masks=rkm, src_knn_masks=skm,
                    knn_method=cfg.knn_method,
                )
            )
            gt_tgt_occ, gt_src_occ = occ_fn(
                tgt_part.node_knn_indices, src_part.node_knn_indices,
                tgt_padded_points, src_padded_points,
                pair.tgt_count, pair.src_count,
                pair.rot, pair.trans,
                tgt_part.node_masks, src_part.node_masks,
                tgt_part.node_knn_masks, src_part.node_knn_masks,
            )
        else:
            from roitr_tpu.ops.partition import NodeCorrespondences

            c = min(cfg.max_gt_corr_candidates, tm4 * sm4)
            gt_corr = NodeCorrespondences(
                jnp.zeros((b, c, 2), jnp.int32),
                jnp.zeros((b, c), jnp.float32),
                jnp.zeros((b, c), bool),
            )
            gt_tgt_occ = jnp.zeros((b, tm4), jnp.float32)
            gt_src_occ = jnp.zeros((b, sm4), jnp.float32)
        out["gt_node_corr_indices"] = gt_corr.indices
        out["gt_node_corr_overlaps"] = gt_corr.overlaps
        out["gt_node_corr_masks"] = gt_corr.masks
        out["gt_tgt_node_occ"] = gt_tgt_occ
        out["gt_src_node_occ"] = gt_src_occ

        # ---- coarse matching per pair
        tgt_f = jax.lax.stop_gradient(tgt_node_feats)
        src_f = jax.lax.stop_gradient(src_node_feats)
        if cfg.is_rigid:
            est = jax.vmap(
                lambda rf, sf, rm, sm: coarse_matching(
                    rf, sf, rm, sm, cfg.num_est_coarse_corr, dual_normalization=True
                )
            )(tgt_f, src_f, tgt_part.node_masks, src_part.node_masks)
            est = CoarseCorr(est.ref_indices, est.src_indices, est.scores, est.masks)
        else:
            cap = cfg.coarse_corr_capacity or max(cfg.num_est_coarse_corr * 4, 512)
            mm = jax.vmap(
                lambda sf, rf, sm, rm: adaptive_superpoint_matching(
                    sf, rf, sm, rm,
                    min_num_correspondences=cfg.num_est_coarse_corr,
                    capacity=cap,
                    similarity_threshold=cfg.coarse_similarity_threshold,
                )
            )(src_f, tgt_f, src_part.node_masks, tgt_part.node_masks)
            est = CoarseCorr(mm.src_indices, mm.ref_indices, mm.scores, mm.masks)

        out["tgt_node_corr_indices"] = est.ref_indices
        out["src_node_corr_indices"] = est.src_indices
        out["node_corr_masks"] = est.masks

        if train:
            rngs = jax.random.split(self.make_rng("sampling"), b)
            corr = jax.vmap(
                lambda rng, idx, ov, masks: gt_coarse_corr_generator(
                    rng, idx, ov, masks,
                    cfg.num_gt_coarse_corr, cfg.coarse_overlap_threshold,
                )
            )(rngs, gt_corr.indices, gt_corr.overlaps, gt_corr.masks)
        else:
            corr = est

        tgt_corr_idx, src_corr_idx = corr.ref_indices, corr.src_indices  # (B, P)

        # ---- per-correspondence patches: flat row gathers throughout
        src_knn_idx = _flat_gather(src_part.node_knn_indices, src_corr_idx)  # (B, P, K)
        tgt_knn_idx = _flat_gather(tgt_part.node_knn_indices, tgt_corr_idx)
        src_knn_masks = _flat_gather(src_part.node_knn_masks, src_corr_idx) & corr.masks[:, :, None]
        tgt_knn_masks = _flat_gather(tgt_part.node_knn_masks, tgt_corr_idx) & corr.masks[:, :, None]
        src_knn_points = _flat_gather(src_node_knn_points, src_corr_idx)  # (B, P, K, 3)
        tgt_knn_points = _flat_gather(tgt_node_knn_points, tgt_corr_idx)

        zrowc = jnp.zeros((b, 1, src_point_feats.shape[-1]), src_point_feats.dtype)
        src_padded_feats = jnp.concatenate([src_point_feats, zrowc], axis=1)
        tgt_padded_feats = jnp.concatenate([tgt_point_feats, zrowc], axis=1)
        src_knn_feats = _flat_gather(src_padded_feats, src_knn_idx)  # (B, P, K, C)
        tgt_knn_feats = _flat_gather(tgt_padded_feats, tgt_knn_idx)

        out["src_node_corr_knn_points"] = src_knn_points
        out["tgt_node_corr_knn_points"] = tgt_knn_points
        out["src_node_corr_knn_masks"] = src_knn_masks
        out["tgt_node_corr_knn_masks"] = tgt_knn_masks

        # ---- optimal transport over all B*P patches at once (per-patch op)
        use_pallas = (
            cfg.sinkhorn_backend == "pallas"
            and jax.default_backend() == "tpu"
        )
        c = src_point_feats.shape[-1]
        p = src_corr_idx.shape[1]
        k = src_knn_idx.shape[-1]
        matching_scores = (
            jnp.einsum("bpnc,bpmc->bpnm", tgt_knn_feats, src_knn_feats) / c**0.5
        )
        matching_scores = log_sinkhorn_ot(
            matching_scores.reshape(b * p, k, k),
            tgt_knn_masks.reshape(b * p, k),
            src_knn_masks.reshape(b * p, k),
            self.ot_alpha,
            num_iter=cfg.sinkhorn_iters,
            backend="pallas" if use_pallas else "xla",
            tol=0.0 if train else cfg.sinkhorn_tol,
            differentiable=train,
        )
        out["matching_scores"] = matching_scores.reshape(b, p, k + 1, k + 1)

        # ---- fine matching (per-patch op: run flat over B*P patches)
        scores_ng = jax.lax.stop_gradient(matching_scores)
        if not cfg.fine_matching_use_dustbin:
            scores_ng = scores_ng[:, :-1, :-1]
        fine = fine_matching(
            tgt_knn_points.reshape(b * p, k, 3),
            src_knn_points.reshape(b * p, k, 3),
            tgt_knn_masks.reshape(b * p, k),
            src_knn_masks.reshape(b * p, k),
            scores_ng,
            corr.masks.reshape(b * p),
            global_scores=corr.scores.reshape(b * p),
            k=cfg.fine_matching_topk,
            mutual=cfg.fine_matching_mutual,
            confidence_threshold=cfg.fine_matching_confidence_threshold,
            use_global_score=cfg.fine_matching_use_global_score,
            use_dustbin=cfg.fine_matching_use_dustbin,
            allow_fast=not train,  # slow path is faster inside the train step
        )
        out["tgt_corr_points"] = fine.ref_points.reshape(b, -1, 3)
        out["src_corr_points"] = fine.src_points.reshape(b, -1, 3)
        out["corr_scores"] = fine.scores.reshape(b, -1)
        out["corr_masks"] = fine.masks.reshape(b, -1)
        return out


def create_model(cfg: Config) -> RoITr:
    """Reference model/RIGA_v2.py:178-180."""
    return RoITr(cfg)
