"""Coarse-to-fine registration evaluation over dumped correspondences.

Rebuilds reference registration/evaluate_registration_c2f.py and the
_rotated variant as importable functions + CLI. Reads the per-pair dump
files written by roitr_tpu.eval.tester (same keys as the reference's
lib/tester.py:56-68 dumps, so either implementation's dumps evaluate here
— and our dumps evaluate in the reference scripts).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from roitr_tpu.eval.benchmark import benchmark
from roitr_tpu.eval.ransac import (
    get_inlier_ratio_correspondence,
    ransac_pose_estimation_correspondences,
)
from roitr_tpu.eval.trajectory import read_trajectory, write_est_trajectory


def _ransac_fn(backend: str):
    """'numpy' (default, reference-protocol parity on any host) or 'jax'
    (same semantics, all 50k hypotheses in one jitted program — the fast
    path on a TPU/accelerator host; eval/ransac_jax.py)."""
    if backend == "numpy":
        return ransac_pose_estimation_correspondences
    if backend == "jax":
        from roitr_tpu.eval.ransac_jax import (
            ransac_pose_estimation_correspondences_jax,
        )

        return ransac_pose_estimation_correspondences_jax
    raise ValueError(f"unknown ransac backend {backend!r}")


def resolve_gt_folder(whichbenchmark: str) -> str:
    """Locate the Redwood ground-truth folder (gt.log/gt.info per scene).

    The repo vendors the published 3DMatch/3DLoMatch benchmark metadata under
    `configs/benchmarks/` (same data the reference ships,
    reference configs/benchmarks/3DMatch/*/gt.log), so the protocol runs out
    of the box from any CWD; a relative `configs/benchmarks` next to the CWD
    still wins for user-supplied splits."""
    candidates = [
        os.path.join("configs", "benchmarks", whichbenchmark),
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "configs", "benchmarks", whichbenchmark,
        ),
    ]
    for c in candidates:
        if os.path.isdir(c):
            return c
    raise FileNotFoundError(
        f"no ground-truth folder for benchmark {whichbenchmark!r}; looked in "
        f"{candidates} — pass gt_folder= explicitly"
    )


def load_dump(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v)) for k, v in data.items()}


def list_dumps(desc_dir: str) -> List[str]:
    files = glob.glob(os.path.join(desc_dir, "*.pth")) + glob.glob(
        os.path.join(desc_dir, "*.npz")
    )
    return sorted(files, key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))


def sample_correspondences(
    rng: np.random.RandomState,
    src_corr: np.ndarray,
    tgt_corr: np.ndarray,
    confidence: np.ndarray,
    n_points: int,
):
    """Confidence-weighted sampling without replacement
    (reference evaluate_registration_c2f.py:80-85). Falls back to uniform
    when confidences are degenerate (all-zero dumps from untrained nets)."""
    if confidence.shape[0] > n_points:
        total = float(confidence.sum())
        if total > 0 and np.isfinite(total):
            prob = confidence / total
            sel = rng.choice(prob.shape[0], n_points, replace=False, p=prob)
        else:
            sel = rng.choice(confidence.shape[0], n_points, replace=False)
        return src_corr[sel], tgt_corr[sel], confidence[sel]
    return src_corr, tgt_corr, confidence


def benchmark_registration(
    desc_dir: str,
    exp_dir: str,
    whichbenchmark: str,
    n_points: int,
    gt_folder: Optional[str] = None,
    inlier_ratio_threshold: float = 0.05,
    seed: int = 0,
    ransac_iterations: int = 50000,
    ransac_backend: str = "numpy",
) -> Dict[str, float]:
    """Full protocol: sample -> RANSAC -> IR -> Redwood RR -> FMR
    (reference evaluate_registration_c2f.py:44-118)."""
    ransac_fn = _ransac_fn(ransac_backend)
    if gt_folder is None:
        gt_folder = resolve_gt_folder(whichbenchmark)
    out_dir = os.path.join(exp_dir, whichbenchmark, str(n_points))
    os.makedirs(out_dir, exist_ok=True)

    rng = np.random.RandomState(seed)
    tsfm_est, inlier_ratios = [], []
    for path in list_dumps(desc_dir):
        data = load_dump(path)
        src_corr, tgt_corr, conf = sample_correspondences(
            rng, data["src_corr_pts"], data["tgt_corr_pts"], data["confidence"], n_points
        )
        tsfm_est.append(
            ransac_fn(
                src_corr, tgt_corr, max_iterations=ransac_iterations, seed=seed
            )
        )
        inlier_ratios.append(
            get_inlier_ratio_correspondence(
                src_corr, tgt_corr, data["rot"], data["trans"], 0.1
            )
        )

    tsfm_est = np.asarray(tsfm_est)
    write_est_trajectory(gt_folder, out_dir, tsfm_est)
    reg = benchmark(out_dir, gt_folder)

    # per-scene IR / FMR aggregation (reference :105-118)
    inlier_ratios = np.asarray(inlier_ratios)
    scenes = sorted(os.listdir(gt_folder))
    split, count = [], 0
    for s in scenes:
        gt_pairs, _ = read_trajectory(os.path.join(gt_folder, s, "gt.log"))
        split.append((count, count + len(gt_pairs)))
        count += len(gt_pairs)
    inliers = [np.mean(inlier_ratios[a:b]) for a, b in split if b > a]
    fmrs = [(inlier_ratios[a:b] > inlier_ratio_threshold).mean() for a, b in split if b > a]

    result = {
        "inlier_ratio": float(np.mean(inliers)) if inliers else 0.0,
        "feature_match_recall": float(np.mean(fmrs)) if fmrs else 0.0,
        **reg,
    }
    with open(os.path.join(out_dir, "result"), "a") as f:
        f.write(f"Inlier ratio: {result['inlier_ratio']:.3f}\n")
        f.write(f"Feature match recall: {result['feature_match_recall']:.3f}\n")
    return result


def benchmark_registration_rotated(
    desc_dir: str,
    exp_dir: str,
    whichbenchmark: str,
    n_points: int,
    rmse_threshold: float = 0.2,
    inlier_ratio_threshold: float = 0.05,
    seed: int = 0,
    ransac_iterations: int = 50000,
    ransac_backend: str = "numpy",
) -> Dict[str, float]:
    """Rotated-benchmark protocol: RMSE-based registration recall computed
    directly against the per-pair GT (reference
    evaluate_registration_c2f_rotated.py:40-116) — no Redwood covariances
    (the random rotations invalidate them).
    """
    ransac_fn = _ransac_fn(ransac_backend)
    out_dir = os.path.join(exp_dir, whichbenchmark + "_rotated", str(n_points))
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    recalls, inlier_ratios = [], []
    for path in list_dumps(desc_dir):
        data = load_dump(path)
        src_corr, tgt_corr, conf = sample_correspondences(
            rng, data["src_corr_pts"], data["tgt_corr_pts"], data["confidence"], n_points
        )
        tsfm = ransac_fn(
            src_corr, tgt_corr, max_iterations=ransac_iterations, seed=seed
        )
        inlier_ratios.append(
            get_inlier_ratio_correspondence(src_corr, tgt_corr, data["rot"], data["trans"], 0.1)
        )
        # RMSE of the GT-overlap src points under est vs gt transform
        src_pcd = data["src_pcd"]
        rot, trans = data["rot"], data["trans"].reshape(1, 3)
        gt_warp = src_pcd @ rot.T + trans
        est_warp = src_pcd @ tsfm[:3, :3].T + tsfm[:3, 3]
        rmse = np.sqrt(((gt_warp - est_warp) ** 2).sum(-1).mean())
        recalls.append(float(rmse < rmse_threshold))

    inlier_ratios = np.asarray(inlier_ratios)
    result = {
        "registration_recall": float(np.mean(recalls)) if recalls else 0.0,
        "inlier_ratio": float(np.mean(inlier_ratios)) if inlier_ratios.size else 0.0,
        "feature_match_recall": float((inlier_ratios > inlier_ratio_threshold).mean())
        if inlier_ratios.size
        else 0.0,
    }
    with open(os.path.join(out_dir, "result"), "w") as f:
        for k, v in result.items():
            f.write(f"{k}: {v:.3f}\n")
    return result


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", required=True, help="directory of dumped pairs")
    parser.add_argument("--benchmark", default="3DMatch")
    parser.add_argument("--n_points", type=int, default=1000)
    parser.add_argument("--exp_dir", default="est_traj")
    parser.add_argument("--rotated", action="store_true")
    parser.add_argument("--gt_folder", default=None)
    parser.add_argument(
        "--ransac_backend", default="numpy", choices=("numpy", "jax"),
        help="'jax' runs all hypotheses in one jitted program (TPU fast path)")
    args = parser.parse_args()

    if args.rotated:
        res = benchmark_registration_rotated(
            args.source_path, args.exp_dir, args.benchmark, args.n_points,
            ransac_backend=args.ransac_backend,
        )
    else:
        res = benchmark_registration(
            args.source_path, args.exp_dir, args.benchmark, args.n_points,
            gt_folder=args.gt_folder, ransac_backend=args.ransac_backend,
        )
    for k, v in res.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
