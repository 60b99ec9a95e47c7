"""End-to-end product-surface test: main.py CLI train -> test dumps ->
offline registration eval, all on generated fixture data in the reference's
on-disk layout. Exercises config loading, trainer, checkpointing, tester
dump format, and the Redwood-protocol evaluator in one flow."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_dataset(tmp, rng, n_pairs=3, n_pts=150):
    """Fixture scene in the reference layout + a gt benchmark folder."""
    import torch

    from roitr_tpu.data.synthetic import make_surface_cloud, random_rotation

    root = tmp / "indoor"
    scene = root / "sceneA"
    scene.mkdir(parents=True)
    infos = {"rot": [], "trans": [], "src": [], "tgt": [], "overlap": []}
    gt_dir = tmp / "benchmarks" / "3DMatch" / "sceneA"
    gt_dir.mkdir(parents=True)
    gt_log, gt_info = [], []
    for i in range(n_pairs):
        scene_pts = make_surface_cloud(rng, n_pts + 60)
        tgt = scene_pts[:n_pts]
        rot = random_rotation(rng)
        trans = (rng.randn(3, 1) * 0.3).astype(np.float32)
        src = (scene_pts[30 : 30 + n_pts] - trans.T) @ rot
        torch.save(torch.tensor(src), scene / f"cloud_bin_{2 * i}.pth")
        torch.save(torch.tensor(tgt), scene / f"cloud_bin_{2 * i + 1}.pth")
        infos["src"].append(f"sceneA/cloud_bin_{2 * i}.pth")
        infos["tgt"].append(f"sceneA/cloud_bin_{2 * i + 1}.pth")
        infos["rot"].append(rot)
        infos["trans"].append(trans)
        infos["overlap"].append(0.8)
        t = np.eye(4)
        t[:3, :3], t[:3, 3] = rot, trans[:, 0]
        gt_log.append((i, i + 2, n_pairs + 2, t))
        gt_info.append((i, i + 2, n_pairs + 2, np.eye(6) * 100))
    info_path = tmp / "val_info.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    with open(gt_dir / "gt.log", "w") as f:
        for i, j, n, t in gt_log:
            f.write(f"{i}\t{j}\t{n}\n")
            for row in t:
                f.write("\t".join(f"{v:.12f}" for v in row) + "\n")
    with open(gt_dir / "gt.info", "w") as f:
        for i, j, n, info in gt_info:
            f.write(f"{i}\t{j}\t{n}\n")
            for row in info:
                f.write("\t".join(f"{v:.6f}" for v in row) + "\n")
    return str(root), str(info_path), str(tmp / "benchmarks" / "3DMatch")


def _write_config(tmp, root, info_path, mode):
    cfg = {
        "misc": {"exp_dir": "e2e", "mode": mode, "verbose": False, "seed": 0},
        "model": {"pretrain": "", "transformer_architecture": ["self", "cross"]},
        "data": {
            "dataset": "tdmatch", "root": root, "train_info": info_path,
            "val_info": info_path, "test_info": info_path,
            "benchmark": "3DMatch", "buckets": [192],
            "points_limit": 180, "normal_knn": 9,
        },
        "coarse_matching": {"num_gt_coarse_corr": 8, "num_est_coarse_corr": 8,
                            "coarse_overlap_threshold": 0.1, "matching_radius": 0.1},
        "fine_matching": {"point_per_patch": 16,
                          "fine_matching_confidence_threshold": 0.01},
        "train": {"max_epoch": 1, "batch_size": 1, "training_max_iter": 2,
                  "val_max_iter": 2},
        "extra": {"sinkhorn_iters": 5, "max_gt_corr_candidates": 32, "dp_size": 1},
    }
    path = tmp / f"cfg_{mode}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True,
        timeout=1200,
    )


@pytest.mark.slow
def test_cli_train_test_eval(tmp_path, rng):
    root, info_path, gt_folder = _write_dataset(tmp_path, rng)

    # ---- train one epoch via the CLI
    cfg_train = _write_config(tmp_path, root, info_path, "train")
    res = _run_cli([os.path.join(REPO, "main.py"), cfg_train], cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-3000:]
    ckpts = os.listdir(tmp_path / "snapshot" / "e2e" / "checkpoints")
    assert "model_0" in ckpts and "model_best_loss" in ckpts

    # ---- test (dump) via the CLI with the trained checkpoint
    cfg_test = _write_config(tmp_path, root, info_path, "test")
    with open(cfg_test) as f:
        raw = yaml.safe_load(f)
    raw["model"]["pretrain"] = str(tmp_path / "snapshot" / "e2e" / "checkpoints" / "model_0")
    with open(cfg_test, "w") as f:
        yaml.safe_dump(raw, f)
    res = _run_cli([os.path.join(REPO, "main.py"), cfg_test], cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-3000:]
    dump_dir = tmp_path / "snapshot" / "e2e" / "3DMatch"
    assert sorted(os.listdir(dump_dir)) == ["0.pth", "1.pth", "2.pth"]

    # ---- offline registration eval over the dumps
    res = _run_cli(
        ["-m", "roitr_tpu.eval.registration", "--source_path", str(dump_dir),
         "--benchmark", "3DMatch", "--n_points", "100",
         "--gt_folder", gt_folder, "--exp_dir", str(tmp_path / "est")],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "inlier_ratio" in res.stdout and "mean_recall" in res.stdout
    result_file = tmp_path / "est" / "3DMatch" / "100" / "result"
    assert result_file.exists()
