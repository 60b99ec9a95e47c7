"""True-oracle parity of the 4DMatch (factor=2) pipeline at PRODUCTION SCALE.

VERDICT r4 next #4: the factor=2 width is the only one that ever failed on
real hardware (two VMEM walls, PERFORMANCE.md), yet its oracle parity
stopped at small buckets (test_reference_parity_fdmatch.py, N=512). This
clones the 16384-bucket envelope suite (test_reference_parity_scale.py)
with benchmark="4DMatch": REAL reference (model/RIGA_v2.py:21-28 factor=2
channels + AdaptiveSuperPointMatching + deformed-source chaining,
dataset/fdmatch.py:31-98) vs roitr_tpu, converted weights, full production
levers (host pyramid + approx kNN), deformed flow pair.

Slow: two 16k factor=2 reference forwards on this single-core host —
minutes; one variant, module-scoped, like the rigid twin.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from roitr_tpu.config import Config
from roitr_tpu.data.synthetic import make_flow_pair_arrays

pytestmark = pytest.mark.slow

BUCKET = 16384
N_SRC, N_TGT = 16000, 15200

CFG = Config(
    benchmark="4DMatch",
    mode="test",
    num_est_coarse_corr=64,
    point_per_patch=32,
    sinkhorn_iters=100,
    fine_matching_confidence_threshold=0.005,
    # shipped 4D fine matching keeps topk=2 (configs/test/fdmatch.yaml)
    fine_matching_topk=2,
    # full production levers (configs/test/fdmatch.yaml equivalents)
    knn_method="approx",
    host_pyramid=True,
)

# Measured at-scale envelope for the factor=2 width (seed 11, recorded in
# assertion messages each run) — same floors as the rigid 16k suite: a
# masking/recall/VMEM-style bug craters min-cos far below 0.9.
NODE_COS_FLOOR = 0.99
POINT_COS_FLOOR = 0.99


@pytest.fixture(scope="module")
def outputs():
    from parity_harness import run_both

    return run_both(CFG, BUCKET, N_SRC, N_TGT, seed=11, aligned=True,
                    make_arrays=make_flow_pair_arrays)


def test_factor2_widths_and_deformed_chaining_at_scale(outputs):
    arr, ref, _, ours = outputs
    assert ref["src_node_feats"].shape[1] == 512  # factor=2 channels
    assert ours["src_node_feats"].shape[1] == 512
    snc = int(ours["src_node_count"])
    # backbone nodes from RAW source; matching points from DEFORMED source
    np.testing.assert_allclose(ours["src_nodes"][:snc], ref["src_nodes"], atol=1e-5)
    sc = int(ours["src_count"])
    np.testing.assert_allclose(ours["src_points"][:sc], ref["src_points"], atol=1e-6)
    assert np.abs(arr["src_points"][:sc] - arr["src_raw_points"][:sc]).max() > 1e-3


def test_descriptors_within_envelope_at_scale_4d(outputs):
    from parity_harness import cos_rows

    arr, ref, _, ours = outputs
    snc, tnc = int(ours["src_node_count"]), int(ours["tgt_node_count"])
    sc, tc = int(ours["src_count"]), int(ours["tgt_count"])
    for key, cnt, floor in (
        ("src_node_feats", snc, NODE_COS_FLOOR),
        ("tgt_node_feats", tnc, NODE_COS_FLOOR),
        ("src_point_feats", sc, POINT_COS_FLOOR),
        ("tgt_point_feats", tc, POINT_COS_FLOOR),
    ):
        cos = cos_rows(ours[key][:cnt], ref[key])
        assert cos.min() > floor, f"{key}: min cos {cos.min():.6f}"


def test_gt_node_correspondences_match_at_scale_4d(outputs):
    """GT set equality with the rigid suite's <= 2/32 per-pair overlap bound
    (point_per_patch=32 here; the 4D GT runs on the deformed source)."""
    arr, ref, _, ours = outputs
    ref_set = {
        (int(i), int(j)): float(o)
        for (i, j), o in zip(ref["gt_node_corr_indices"], ref["gt_node_corr_overlaps"])
    }
    m = ours["gt_node_corr_masks"]
    our_set = {
        (int(i), int(j)): float(o)
        for (i, j), o in zip(ours["gt_node_corr_indices"][m], ours["gt_node_corr_overlaps"][m])
    }
    assert set(our_set) == set(ref_set)
    deltas = np.array([abs(our_set[k] - ref_set[k]) for k in ref_set])
    assert deltas.max() <= 2.0 / 32 + 1e-6, (
        f"max overlap delta {deltas.max():.6f}, "
        f"{int((deltas > 1e-6).sum())}/{len(deltas)} pairs drifted")


def test_fine_correspondences_and_ir_at_scale_4d(outputs):
    arr, _, ref_aligned, ours = outputs
    m = ours["corr_masks"]
    our_pts = np.concatenate(
        [ours["tgt_corr_points"][m], ours["src_corr_points"][m]], axis=1)
    ref_pts = np.concatenate(
        [ref_aligned["tgt_corr_points"], ref_aligned["src_corr_points"]], axis=1)
    assert ref_pts.shape[0] > 0
    count_delta = abs(our_pts.shape[0] - ref_pts.shape[0]) / ref_pts.shape[0]
    assert count_delta < 0.05, f"corr count delta {count_delta:.4f}"

    def ir(pts):
        # 4D inlier test: matched deformed-source points against the rigidly
        # transformed prediction (the GT rot/trans maps deformed src -> tgt,
        # reference evaluate_fdmatch.py:118-124 uses 0.04 m)
        tgt, src = pts[:, :3], pts[:, 3:]
        src_t = src @ arr["rot"].T + arr["trans"].T
        return float((np.linalg.norm(tgt - src_t, axis=1) < 0.04).mean())

    ir_delta = abs(ir(our_pts) - ir(ref_pts))
    assert ir_delta < 0.03, f"IR delta {ir_delta:.4f} (ours {ir(our_pts):.4f} ref {ir(ref_pts):.4f})"
