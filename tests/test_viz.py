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
