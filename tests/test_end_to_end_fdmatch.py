"""Non-rigid (4DMatch) end-to-end product-surface test (VERDICT round-2 #3):
main.py CLI train on synthetic flow .npz entries -> test dumps carrying
metric_index -> NFMR/IR offline eval. The 4D clone of test_end_to_end.py.

Reference flow: dataset/fdmatch.py (npz entries with s_pc/t_pc/s2t_flow/
rot/trans/metric_index) -> lib/tester.py dumps ->
registration/evaluate_fdmatch.py:50-115 (NFMR).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_dataset(tmp, rng, n_pairs=3, n_pts=150):
    """Synthetic flow pairs in the reference's npz-entry layout."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from roitr_tpu.data.synthetic import make_flow_pair_arrays

    root = tmp / "4d"
    (root / "seq").mkdir(parents=True)
    entries = []
    for i in range(n_pairs):
        arr = make_flow_pair_arrays(rng, n_pts, n_pts, n_pts)
        rel = f"seq/pair{i}.npz"
        np.savez(
            root / rel,
            s_pc=arr["src_raw_points"][:n_pts],
            t_pc=arr["tgt_points"][:n_pts],
            s2t_flow=arr["flow"][:n_pts],
            rot=arr["rot"],
            trans=arr["trans"],
            metric_index=np.arange(0, n_pts, 5)[None],
        )
        entries.append(rel)
    split = tmp / "split.txt"
    split.write_text("\n".join(entries) + "\n")
    return str(root), str(split)


def _write_config(tmp, root, split, mode):
    cfg = {
        "misc": {"exp_dir": "e2e4d", "mode": mode, "verbose": False, "seed": 0},
        "model": {"pretrain": "", "transformer_architecture": ["self", "cross"]},
        "data": {
            "dataset": "fdmatch", "root": root, "train_info": split,
            "val_info": split, "benchmark": "4DMatch", "buckets": [192],
            "points_limit": 180, "normal_knn": 9, "augment_noise": 0.0,
        },
        "coarse_matching": {"num_gt_coarse_corr": 8, "num_est_coarse_corr": 8,
                            "coarse_overlap_threshold": 0.1, "matching_radius": 0.1},
        "fine_matching": {"point_per_patch": 16,
                          "fine_matching_confidence_threshold": 0.01},
        "train": {"max_epoch": 1, "batch_size": 1, "training_max_iter": 2,
                  "val_max_iter": 2},
        "extra": {"sinkhorn_iters": 5, "max_gt_corr_candidates": 32, "dp_size": 1},
    }
    path = tmp / f"cfg4d_{mode}.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True,
        timeout=1200,
    )


@pytest.mark.slow
def test_cli_train_test_nfmr(tmp_path, rng):
    root, split = _write_dataset(tmp_path, rng)

    # ---- train one epoch (factor=2 channels live)
    cfg_train = _write_config(tmp_path, root, split, "train")
    res = _run_cli([os.path.join(REPO, "main.py"), cfg_train], cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-3000:]
    ckpts = os.listdir(tmp_path / "snapshot" / "e2e4d" / "checkpoints")
    assert "model_0" in ckpts

    # ---- test (dump): metric_index must ride along for the NFMR eval
    cfg_test = _write_config(tmp_path, root, split, "test")
    with open(cfg_test) as f:
        raw = yaml.safe_load(f)
    raw["model"]["pretrain"] = str(
        tmp_path / "snapshot" / "e2e4d" / "checkpoints" / "model_0")
    with open(cfg_test, "w") as f:
        yaml.safe_dump(raw, f)
    res = _run_cli([os.path.join(REPO, "main.py"), cfg_test], cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr[-3000:]
    dump_dir = tmp_path / "snapshot" / "e2e4d" / "4DMatch"
    assert sorted(os.listdir(dump_dir)) == ["0.pth", "1.pth", "2.pth"]

    import torch

    d0 = torch.load(dump_dir / "0.pth", map_location="cpu", weights_only=False)
    assert "metric_index_list" in d0
    assert "src_raw_pcd" in d0 and "src_pcd" in d0
    # deformed vs raw source really differ in the dumps
    assert np.abs(np.asarray(d0["src_pcd"]) - np.asarray(d0["src_raw_pcd"])).max() > 1e-4

    # ---- NFMR/IR offline eval over the dumps
    res = _run_cli(
        ["-m", "roitr_tpu.eval.fdmatch_eval", "--source_path", str(dump_dir)],
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "NFMR" in res.stdout and "IR" in res.stdout
