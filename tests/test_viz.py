"""Visualizer smoke tests (headless matplotlib)."""

import os

import numpy as np

from roitr_tpu.viz import Visualizer, visualize_feature_space


def test_visualizer_renders(tmp_path, rng):
    viz = Visualizer(str(tmp_path))
    src = rng.rand(300, 3).astype(np.float32)
    rot = np.eye(3, dtype=np.float32)
    trans = np.zeros((3, 1), np.float32)
    tgt = src + 0.01

    p1 = viz.show_alignment(src, tgt, rot, trans)
    assert os.path.exists(p1) and os.path.getsize(p1) > 1000

    corr = rng.choice(300, 50)
    p2 = viz.show_correspondences(src, tgt, src[corr], tgt[corr], rot, trans)
    assert os.path.exists(p2)

    nodes = src[::30]
    p2n = rng.randint(0, len(nodes), 300)
    p3 = viz.show_nodes(src, nodes, p2n)
    assert os.path.exists(p3)

    dump = {
        "src_pcd": src, "tgt_pcd": tgt, "rot": rot, "trans": trans,
        "src_corr_pts": src[corr], "tgt_corr_pts": tgt[corr],
    }
    paths = viz.show_dump(dump)
    assert set(paths) == {"input", "gt", "corr"}


def test_feature_space(tmp_path, rng):
    src = rng.rand(120, 3).astype(np.float32)
    tgt = rng.rand(110, 3).astype(np.float32)
    sf = rng.randn(120, 16).astype(np.float32)
    tf = rng.randn(110, 16).astype(np.float32)
    out = visualize_feature_space(src, sf, tgt, tf, str(tmp_path / "fs.png"))
    assert os.path.exists(out)


def test_patch_and_node_corr_modes(tmp_path, rng):
    """Reference visualizer.py:182-311 equivalents: patch highlight +
    gt/est node-correspondence dumps (PNG + vertex-colored .obj line set)."""
    viz = Visualizer(str(tmp_path))
    src = rng.rand(200, 3).astype(np.float32)
    tgt = src + 0.01
    src_nodes, tgt_nodes = src[::20], tgt[::20]

    p = viz.show_patch(src, tgt, src_nodes, tgt_nodes,
                       src_patch=src[:15], tgt_patch=tgt[:15])
    assert os.path.exists(p) and os.path.getsize(p) > 1000

    corr = np.stack([np.arange(8), np.arange(8)], axis=1)
    ok = np.array([True] * 6 + [False] * 2)
    out = viz.save_node_correspondences(src_nodes, tgt_nodes, corr, ok)
    assert os.path.exists(out["png"])
    lines = open(out["obj"]).read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == 16
    assert sum(l.startswith("l ") for l in lines) == 8
    assert any(l.endswith("255 0 0") for l in lines)  # wrong corr in red

    dump = {
        "src_pcd": src, "tgt_pcd": tgt,
        "rot": np.eye(3, dtype=np.float32), "trans": np.zeros((3, 1), np.float32),
        "src_corr_pts": src[:30], "tgt_corr_pts": tgt[:30],
        "src_nodes": src_nodes, "tgt_nodes": tgt_nodes,
        "src_node_desc": rng.rand(len(src_nodes), 8).astype(np.float32),
        "tgt_node_desc": rng.rand(len(tgt_nodes), 8).astype(np.float32),
    }
    paths = viz.show_dump(dump)
    assert "patch" in paths and os.path.exists(paths["patch"])
