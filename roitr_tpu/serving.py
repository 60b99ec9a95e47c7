"""One-call correspondence inference on raw point clouds.

The reference has no serving surface — its inference path starts from a
dataset pickle and ends in dump files (lib/tester.py:19-69). `Matcher`
wraps the full production path for a live service: host preprocessing
(normal estimation + view redirect + bucket padding + optional
FPS/kNN pyramid — the measured-best levers), one cached jitted program
per bucket size, and fixed-capacity outputs trimmed back to ragged numpy.

    matcher = Matcher(cfg, params)            # or Matcher.from_checkpoint
    out = matcher.match(src_xyz, tgt_xyz)     # (n, 3) float numpy each
    out["src_corr_pts"], out["tgt_corr_pts"], out["confidence"]

Normals are estimated exactly like the datasets do (kNN-33 PCA +
view-point redirect, reference dataset/tdmatch.py:120-127); pass
`src_normals`/`tgt_normals` to skip that when the sensor provides them.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from roitr_tpu.config import Config

# Correspondence wire format: ONE (..., C, 8) array per fetch instead of
# four (each extra output leaf costs a host<->device round trip on the
# tunnel backend). Columns: src xyz 0:3 | tgt xyz 3:6 | score 6 | mask 7.


def _corr_pack(out):
    """Device-side: model outputs -> (..., C, 8) packed correspondences."""
    import jax.numpy as jnp

    return jnp.concatenate(
        [
            out["src_corr_points"],
            out["tgt_corr_points"],
            out["corr_scores"][..., None],
            out["corr_masks"].astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )


def _corr_unpack(corr: np.ndarray) -> Dict[str, np.ndarray]:
    """Host-side: one pair's (C, 8) packed rows -> trimmed result dict."""
    cmask = corr[:, 7] > 0.5
    return {
        "src_corr_pts": corr[cmask, 0:3],
        "tgt_corr_pts": corr[cmask, 3:6],
        "confidence": corr[cmask, 6],
    }


class Matcher:
    """Bucket-cached serving wrapper around the RoITr pipeline."""

    def __init__(
        self,
        cfg: Config,
        params,
        descriptors: bool = False,
        prep: str = "host",
    ):
        """prep: where normals are estimated when the caller provides none.

        "host": numpy kNN-33 PCA in _prepare — the dataset-identical path,
        but ~20 ms/pair of the 21.8 ms sustained serving cost on a
        single-core host (PERFORMANCE.md). "device": ALL geometry prep runs
        inside the jitted program — normals (ops/normals.py, certified
        against the numpy twin) AND the FPS/kNN pyramid (ops/pyramid.py,
        bitwise-equal indices to data/pyramid.py) — so the host only pads
        and packs. Device prep also shrinks the H2D payload ~4x (the
        pyramid index tables dominate it; the tunnel moves ~50 MB/s —
        tools/probe_serving_breakdown.py). Caller-provided normals are
        always honored either way (the reference's Open3D estimation lives
        in the dataset workers, dataset/tdmatch.py:120-127 — a serving host
        has no such pool).
        """
        import jax

        from roitr_tpu.models.roitr import RoITr
        from roitr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()

        if prep not in ("host", "device"):
            raise ValueError(f"unknown prep mode {prep!r}")
        self.cfg = cfg
        self.params = params
        self.descriptors = descriptors
        self.prep = prep
        self.model = RoITr(cfg)
        # serving mode: no GT analysis outputs (with_gt=False); one compiled
        # program per bucket, cached across calls. Inputs travel as ONE
        # packed f32 buffer and the needed outputs come back as ONE array —
        # per-leaf transfers cost a host<->device round trip each (~7-8 ms
        # on the tunnel backend; the unpacked form measured ~560 ms of pure
        # transfer latency around a 4 ms forward at the 2048 bucket).
        self._fwd_by_bucket = {}

    def _get_fwd(self, bucket, pair, est=(False, False)):
        """Per-bucket jitted (params, packed) -> packed_corr [, full out]."""
        key = (bucket, est)
        if key in self._fwd_by_bucket:
            return self._fwd_by_bucket[key]
        import jax

        from roitr_tpu.ops.pyramid import device_prep_pair
        from roitr_tpu.utils.packing import build_spec, unpack_device

        treedef, spec, total = build_spec(pair)
        # prep="device" with no host pyramid attached: build both exact
        # FPS/kNN pyramids in-program too (single-pair match under
        # device prep, VERDICT r4 #2)
        build_pyr = self.prep == "device" and pair.src_pyramid is None

        def run(p, packed):
            x = unpack_device(packed, treedef, spec)
            x = device_prep_pair(x, self.cfg, est=est, pyramid=build_pyr)
            out = self.model.apply({"params": p}, x, train=False, with_gt=False)
            corr = _corr_pack(out)  # (C, 8): one fetch instead of four
            return (corr, out) if self.descriptors else corr

        entry = (jax.jit(run), spec, total)
        self._fwd_by_bucket[key] = entry
        return entry

    def _get_batch_fwd(self, bucket, batch_size, batch_pair, mode,
                       est=(False, False)):
        """Jitted batch program for (bucket, batch_size, mode, est).

        mode "packed": B pairs as ONE flat cloud (data/packing.py) —
        amortizes the whole small-bucket fixed pool; measured best at
        buckets <= ~1024 where the gather tables stay cache-resident.
        mode "map": lax.map over stacked pairs — sequential on device,
        amortizes only dispatch; measured best at 2048+ (PERFORMANCE.md).
        """
        key = (bucket, batch_size, mode, est)
        if key in self._fwd_by_bucket:
            return self._fwd_by_bucket[key]
        import jax

        from roitr_tpu.ops.pyramid import device_prep_packed, device_prep_pair
        from roitr_tpu.utils.packing import build_spec, unpack_device

        treedef, spec, total = build_spec(batch_pair)
        # pairs carry no pyramids under prep="device": build EXACT ones
        # per pair in-program (ADVICE r4 #1 — letting the model's own
        # FPS/kNN fallback run would inherit cfg.knn_method, silently
        # switching map-mode device prep to approx neighbors at the
        # production configs; the explicit exact build keeps every prep
        # mode bitwise-equal to the host pyramid)
        build_pyr = self.prep == "device" and batch_pair.src_pyramid is None

        def run(p, packed):
            x = unpack_device(packed, treedef, spec)
            if mode == "map":
                return jax.lax.map(
                    lambda px: _corr_pack(
                        self.model.apply(
                            {"params": p},
                            device_prep_pair(px, self.cfg, est=est,
                                             pyramid=build_pyr),
                            train=False, with_gt=False)),
                    x,
                )  # (B, C, 8)
            x = device_prep_packed(x, self.cfg, est=est,
                                   pyramid=x.src_pyramid is None)
            out = self.model.apply({"params": p}, x, train=False, with_gt=False)
            return _corr_pack(out)  # (B, C, 8)

        entry = (jax.jit(run), spec, total)
        self._fwd_by_bucket[key] = entry
        return entry

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Config, **kw) -> "Matcher":
        from roitr_tpu.train.checkpoint import load_checkpoint

        restored = load_checkpoint(path)
        params = restored["params"] if "params" in restored else restored
        return cls(cfg, params, **kw)

    def _prepare(self, src_pcd, tgt_pcd, src_normals, tgt_normals,
                 device_pyramid=False):
        from roitr_tpu.data.loader import dict_to_pair
        from roitr_tpu.data.preprocess import (
            estimate_normals_np,
            normal_redirect_np,
            pad_cloud,
            pick_bucket,
        )

        cfg = self.cfg
        # datasets redirect normals toward the origin view point
        # (reference dataset/tdmatch.py:46, fdmatch.py:42)
        view = np.zeros(3, np.float32)
        # prep="device": missing normals are estimated INSIDE the jitted
        # program (the host step below is ~20 ms/pair on one core); the
        # zeros placeholders are overwritten device-side before the model
        # ever reads them.
        est = (src_normals is None and self.prep == "device",
               tgt_normals is None and self.prep == "device")
        if src_normals is None:
            src_normals = (np.zeros_like(src_pcd) if est[0] else
                           normal_redirect_np(
                src_pcd, estimate_normals_np(src_pcd, cfg.normal_knn), view
            ))
        if tgt_normals is None:
            tgt_normals = (np.zeros_like(tgt_pcd) if est[1] else
                           normal_redirect_np(
                tgt_pcd, estimate_normals_np(tgt_pcd, cfg.normal_knn), view
            ))
        bucket = pick_bucket(max(len(src_pcd), len(tgt_pcd)), cfg.buckets)
        s_pts, s_nrm, s_feats, s_cnt = pad_cloud(src_pcd, src_normals, bucket)
        t_pts, t_nrm, t_feats, t_cnt = pad_cloud(tgt_pcd, tgt_normals, bucket)
        item = {
            "src_points": s_pts,
            "src_raw_points": s_pts,
            "src_normals": s_nrm,
            "src_feats": s_feats,
            "src_count": s_cnt,
            "tgt_points": t_pts,
            "tgt_normals": t_nrm,
            "tgt_feats": t_feats,
            "tgt_count": t_cnt,
            # serving has no ground truth; the with_gt=False path never
            # reads these, they only satisfy the input pytree structure
            "rot": np.eye(3, dtype=np.float32),
            "trans": np.zeros((3, 1), np.float32),
        }
        # device_pyramid (match_batch under prep="device"): pyramids are
        # built inside the jitted program (ops/pyramid.py — indices
        # bitwise-equal to this host twin), which drops ~6 ms/pair of
        # single-core host work AND ~80% of the H2D payload (the index
        # tables dominate the packed buffer — a win even for the RTT-bound
        # single pair, whose packed H2D buffer shrinks ~4x). Indices stay
        # bitwise-equal to the host build either way.
        if self.cfg.host_pyramid and not device_pyramid:
            from roitr_tpu.data.pyramid import build_cloud_pyramid

            item["src_pyramid"] = build_cloud_pyramid(
                s_pts, int(s_cnt), strides=tuple(cfg.enc_strides),
                nsample=tuple(cfg.enc_nsample))
            item["tgt_pyramid"] = build_cloud_pyramid(
                t_pts, int(t_cnt), strides=tuple(cfg.enc_strides),
                nsample=tuple(cfg.enc_nsample))
        return dict_to_pair(item), est

    def match(
        self,
        src_pcd: np.ndarray,  # (n, 3) float
        tgt_pcd: np.ndarray,  # (m, 3) float
        src_normals: Optional[np.ndarray] = None,
        tgt_normals: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Predict dense correspondences between two raw clouds.

        Returns src_corr_pts/tgt_corr_pts (C, 3) and confidence (C,), C
        data-dependent (fixed-capacity buffers trimmed by their validity
        mask); with descriptors=True also the node/point descriptors."""
        src_pcd = np.ascontiguousarray(src_pcd, np.float32)
        tgt_pcd = np.ascontiguousarray(tgt_pcd, np.float32)
        # cap to the dataset limit AND the largest static bucket (reference
        # caps at 30k, dataset/tdmatch.py:72-78; random subsample like it).
        # User-provided normals must ride the same permutation or they stop
        # corresponding to the surviving points.
        limit = min(self.cfg.points_limit, max(self.cfg.buckets))
        if len(src_pcd) > limit or len(tgt_pcd) > limit:
            rng = np.random.RandomState(0)
            if len(src_pcd) > limit:
                idx = rng.permutation(len(src_pcd))[:limit]
                src_pcd = src_pcd[idx]
                if src_normals is not None:
                    src_normals = np.asarray(src_normals, np.float32)[idx]
            if len(tgt_pcd) > limit:
                idx = rng.permutation(len(tgt_pcd))[:limit]
                tgt_pcd = tgt_pcd[idx]
                if tgt_normals is not None:
                    tgt_normals = np.asarray(tgt_normals, np.float32)[idx]
        pair, est = self._prepare(src_pcd, tgt_pcd, src_normals, tgt_normals,
                                  device_pyramid=self.prep == "device")
        from roitr_tpu.utils.packing import pack_host

        bucket = int(pair.src_points.shape[0])
        fwd, spec, total = self._get_fwd(bucket, pair, est)
        packed = pack_host(pair, spec, total)
        result = fwd(self.params, packed)
        if self.descriptors:
            corr, out_dev = result
            out = {k: np.asarray(v) for k, v in out_dev.items()}
        else:
            corr = result
        res = _corr_unpack(np.asarray(corr))  # single device fetch
        if self.descriptors:
            sc, tc = int(out["src_count"]), int(out["tgt_count"])
            snc, tnc = int(out["src_node_count"]), int(out["tgt_node_count"])
            res.update(
                src_nodes=out["src_nodes"][:snc],
                tgt_nodes=out["tgt_nodes"][:tnc],
                src_node_desc=out["src_node_feats"][:snc],
                tgt_node_desc=out["tgt_node_feats"][:tnc],
                src_point_desc=out["src_point_feats"][:sc],
                tgt_point_desc=out["tgt_point_feats"][:tc],
            )
        return res

    def match_batch(
        self,
        pairs: Sequence,  # [(src_pcd, tgt_pcd) or (src, tgt, src_normals, tgt_normals)]
        batch_size: int = 8,
        mode: str = "auto",
    ):
        """Predict correspondences for many pairs, batched.

        Same-bucket pairs are grouped into batches of up to `batch_size`,
        each run as ONE program. Two backends (PERFORMANCE.md):
        - "packed": B pairs as ONE flat cloud — amortizes the whole
          small-bucket fixed pool (835 pairs/s at 512, 2.3x); pays off
          while the gather tables stay cache-resident.
        - "map": lax.map over stacked pairs — dispatch amortization only,
          the best mode at 2048+ (344 pairs/s at 2048).
        - "auto" (default): packed for buckets <= 1024, map above.
        Requires cfg.host_pyramid (the production default; packed needs
        precomputed FPS/kNN indices).

        Returns a list of per-pair dicts in input order, same keys as
        match() (without descriptors)."""
        if mode not in ("auto", "packed", "map"):
            raise ValueError(f"unknown match_batch mode {mode!r}")
        if not self.cfg.host_pyramid and self.prep != "device":
            raise ValueError(
                "match_batch requires cfg.host_pyramid=True or prep='device'")
        from roitr_tpu.data.loader import stack_batch
        from roitr_tpu.data.packing import pack_pairs
        from roitr_tpu.utils.packing import pack_host

        prepared = []
        ests = []
        for item in pairs:
            src, tgt = item[0], item[1]
            sn = item[2] if len(item) > 2 else None
            tn = item[3] if len(item) > 3 else None
            pair, est = self._prepare(
                np.ascontiguousarray(src, np.float32),
                np.ascontiguousarray(tgt, np.float32),
                sn, tn,
                device_pyramid=self.prep == "device",
            )
            prepared.append(pair)
            ests.append(est)

        # group by (bucket, est flags) so each compiled batch program has
        # static normal-estimation structure (device prep adds est variants;
        # all-host or all-sensor-normal workloads group exactly as before)
        by_bucket: Dict[tuple, list] = {}
        for i, pair in enumerate(prepared):
            by_bucket.setdefault(
                (int(pair.src_points.shape[0]), ests[i]), []).append(i)

        # pipelined dispatch: fetching inside the dispatch loop would
        # serialize a full host<->device round trip (~33 ms on the tunnel
        # backend) per group, so run a small dispatch-ahead WINDOW — the
        # RTT overlaps the next groups' prep+compute while in-flight
        # device INPUT buffers (points/normals/pyramids, tens of MB per
        # group at big buckets) stay bounded instead of all-resident.
        window = 3
        results: Dict[int, Dict[str, np.ndarray]] = {}
        inflight: list = []  # (group, real, device_corr)

        def drain_one():
            group, real, corr_dev = inflight.pop(0)
            corr = np.asarray(corr_dev)
            for j, i in enumerate(group[:real]):
                results[i] = _corr_unpack(corr[j])

        for (bucket, est), idxs in by_bucket.items():
            use_mode = mode if mode != "auto" else (
                "packed" if bucket <= 1024 else "map")
            for s in range(0, len(idxs), batch_size):
                group = idxs[s : s + batch_size]
                real = len(group)
                # ragged tail: repeat the last pair (per-pair outputs are
                # independent; the duplicates are simply not returned)
                padded_group = group + [group[-1]] * (batch_size - real) \
                    if real < batch_size and len(idxs) >= batch_size else group
                group_pairs = [prepared[i] for i in padded_group]
                batch_pair = (
                    pack_pairs(group_pairs,
                               require_pyramids=self.prep != "device")
                    if use_mode == "packed" else stack_batch(group_pairs))
                fwd, spec, total = self._get_batch_fwd(
                    bucket, len(padded_group), batch_pair, use_mode, est)
                inflight.append(
                    (group, real, fwd(self.params, pack_host(batch_pair, spec, total))))
                if len(inflight) > window:
                    drain_one()
        while inflight:
            drain_one()
        return [results[i] for i in range(len(prepared))]
