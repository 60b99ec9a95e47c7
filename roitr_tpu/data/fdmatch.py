"""4DMatch/4DLoMatch non-rigid pair dataset (host side).

Reads the reference's `.npz` entry files (dataset/fdmatch.py:31-98) with
keys s_pc/t_pc/s2t_flow/rot/trans[/metric_index]. The deformed source
(s_pc + flow) is the matching geometry; normals come from the raw source.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from roitr_tpu.config import Config
from roitr_tpu.data.preprocess import (
    cap_points,
    estimate_normals_np,
    normal_redirect_np,
    pad_cloud,
    pick_bucket,
)


def read_entries(split: str, data_root: str) -> List[str]:
    """Resolve a 4DMatch split to a list of .npz entry paths.

    Reference surface (lib/utils.py:11-25): `split` is a directory under
    the data root (e.g. 'split/4DMatch' from Lepard-prepared data),
    globbed as <split>/*/*.npz — accepted as-is so reference data layouts
    are drop-in (sorted here for reproducible pair indices; the reference
    leaves glob order to the filesystem). A plain text file of relative
    .npz paths (one per line) also works, for custom splits."""
    path = split if os.path.isabs(split) else os.path.join(data_root, split)
    if os.path.isdir(path):
        import glob

        entries = sorted(glob.glob(os.path.join(path, "*", "*.npz")))
        if not entries:
            raise FileNotFoundError(
                f"4DMatch split directory {path!r} matched no "
                f"<scene>/*.npz entries — expected the Lepard layout "
                f"(split/<benchmark>/<scene>/pair.npz)")
        return entries
    split_file = split if os.path.exists(split) else path
    entries = []
    with open(split_file) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(os.path.join(data_root, line))
    return entries


class FDMatchDataset:
    def __init__(self, entries: List[str], config: Config, data_augmentation: bool = True):
        self.entries = entries
        self.config = config
        self.data_augmentation = data_augmentation
        self.view_point = np.array([0.0, 0.0, 0.0])

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        from scipy.spatial.transform import Rotation

        cfg = self.config
        entry = np.load(self.entries[index])
        rot = entry["rot"].astype(np.float32)
        trans = entry["trans"].astype(np.float32)
        src_pcd = entry["s_pc"].astype(np.float32)
        tgt_pcd = entry["t_pc"].astype(np.float32)
        src_deformed = (src_pcd + entry["s2t_flow"]).astype(np.float32)
        metric_index = (
            entry["metric_index"].squeeze().astype(np.int32)
            if "metric_index" in entry
            else None
        )

        rng = np.random.RandomState() if self.data_augmentation else np.random.RandomState(index)
        if src_pcd.shape[0] > cfg.points_limit:
            idx = rng.permutation(src_pcd.shape[0])[: cfg.points_limit]
            src_pcd, src_deformed = src_pcd[idx], src_deformed[idx]
        if tgt_pcd.shape[0] > cfg.points_limit:
            tgt_pcd = cap_points(rng, tgt_pcd, cfg.points_limit)

        if self.data_augmentation:
            # rotate one side + noise (reference fdmatch.py:59-73 — noise is
            # added to the raw source only, not the deformed copy)
            euler = rng.rand(3) * 2.0 * np.pi
            rot_ab = Rotation.from_euler("zyx", euler).as_matrix().astype(np.float32)
            if rng.rand(1)[0] > 0.5:
                src_pcd = src_pcd @ rot_ab.T
                src_deformed = src_deformed @ rot_ab.T
                rot = rot @ rot_ab.T
            else:
                tgt_pcd = tgt_pcd @ rot_ab.T
                rot = rot_ab @ rot
                trans = rot_ab @ trans
            src_pcd = src_pcd + (rng.rand(*src_pcd.shape).astype(np.float32) - 0.5) * cfg.augment_noise
            tgt_pcd = tgt_pcd + (rng.rand(*tgt_pcd.shape).astype(np.float32) - 0.5) * cfg.augment_noise

        if trans.ndim == 1:
            trans = trans[:, None]

        if getattr(cfg, "device_prep", False):
            # normals + pyramids are built inside the jitted program
            # (ops/pyramid.py device_prep_pair); placeholders only
            src_normals = np.zeros_like(src_pcd)
            tgt_normals = np.zeros_like(tgt_pcd)
        else:
            src_normals = normal_redirect_np(
                src_pcd, estimate_normals_np(src_pcd, cfg.normal_knn), self.view_point
            )
            tgt_normals = normal_redirect_np(
                tgt_pcd, estimate_normals_np(tgt_pcd, cfg.normal_knn), self.view_point
            )

        bucket = pick_bucket(max(src_pcd.shape[0], tgt_pcd.shape[0]), cfg.buckets)
        s_pts, s_nrm, s_feats, s_cnt = pad_cloud(src_deformed, src_normals, bucket)
        t_pts, t_nrm, t_feats, t_cnt = pad_cloud(tgt_pcd, tgt_normals, bucket)
        raw = np.zeros((bucket, 3), np.float32)
        raw[: src_pcd.shape[0]] = src_pcd

        out = {
            "src_points": s_pts,  # deformed source — matching geometry
            "src_raw_points": raw,  # raw source — backbone geometry
            "src_normals": s_nrm,
            "src_feats": s_feats,
            "src_count": s_cnt,
            "tgt_points": t_pts,
            "tgt_normals": t_nrm,
            "tgt_feats": t_feats,
            "tgt_count": t_cnt,
            "rot": rot.astype(np.float32),
            "trans": trans.astype(np.float32),
        }
        if metric_index is not None:
            out["metric_index"] = metric_index
        if cfg.host_pyramid and not getattr(cfg, "device_prep", False):
            from roitr_tpu.data.pyramid import build_cloud_pyramid

            out["src_pyramid"] = build_cloud_pyramid(raw, s_cnt)
            out["tgt_pyramid"] = build_cloud_pyramid(t_pts, t_cnt)
        return out
