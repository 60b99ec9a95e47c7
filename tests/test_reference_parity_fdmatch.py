"""True-oracle parity of the NON-RIGID (4DMatch) pipeline (VERDICT
round-2 missing #3).

Runs the REAL reference with benchmark="4DMatch" — which flips the live
path to factor=2 channel widths, AdaptiveSuperPointMatching
(model/RIGA_v2.py:21-28, model/modules.py:75-132) and the deformed-source
node chaining (RIGA_v2.py:58-62: the backbone runs on the RAW source
geometry, matching runs on src + flow) — against roitr_tpu on the same
synthetic flow pair with converted weights. Plus an NFMR sanity check on
both sides' fine correspondences (registration/evaluate_fdmatch.py:50-115).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from roitr_tpu.config import Config
from roitr_tpu.data.synthetic import make_flow_pair_arrays

N = 512

CFG = Config(
    benchmark="4DMatch",
    mode="test",
    num_est_coarse_corr=32,
    point_per_patch=16,
    sinkhorn_iters=100,
    fine_matching_confidence_threshold=0.005,
    knn_method="exact",
    host_pyramid=False,
)


@pytest.fixture(scope="module")
def both_outputs():
    from parity_harness import run_both

    return run_both(CFG, N, N, N, seed=13, aligned=True,
                    make_arrays=make_flow_pair_arrays)


def test_factor2_descriptor_widths(both_outputs):
    _, ref, _, ours = both_outputs
    # 4DMatch doubles every channel width (reference RIGA_v2.py:24 factor=2)
    assert ref["src_node_feats"].shape[1] == 512
    assert ours["src_node_feats"].shape[1] == 512
    assert ref["src_point_feats"].shape[1] == 512


def test_deformed_source_node_chaining(both_outputs):
    """Backbone nodes must come from the RAW source, matching points from
    the DEFORMED source (reference RIGA_v2.py:58-62)."""
    arr, ref, _, ours = both_outputs
    snc = int(ours["src_node_count"])
    np.testing.assert_allclose(ours["src_nodes"][:snc], ref["src_nodes"], atol=1e-6)
    sc = int(ours["src_count"])
    # src_points output is the deformed cloud on both sides
    np.testing.assert_allclose(ours["src_points"][:sc], ref["src_points"], atol=1e-6)
    np.testing.assert_allclose(ref["src_points"], arr["src_points"][:sc], atol=1e-6)
    assert np.abs(arr["src_points"] - arr["src_raw_points"]).max() > 1e-3  # really deformed


def test_node_and_point_descriptors_match(both_outputs):
    from parity_harness import cos_rows

    _, ref, _, ours = both_outputs
    snc, tnc = int(ours["src_node_count"]), int(ours["tgt_node_count"])
    sc, tc = int(ours["src_count"]), int(ours["tgt_count"])
    for key, cnt in (("src_node_feats", snc), ("tgt_node_feats", tnc),
                     ("src_point_feats", sc), ("tgt_point_feats", tc)):
        cos = cos_rows(ours[key][:cnt], ref[key])
        assert cos.min() > 0.999, f"{key}: min cos {cos.min():.6f}"


def test_gt_node_correspondences_match(both_outputs):
    """4D GT correspondences are generated on the DEFORMED source."""
    _, ref, _, ours = both_outputs
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
    for k in ref_set:
        np.testing.assert_allclose(our_set[k], ref_set[k], atol=1e-5)


def test_adaptive_matching_true_oracle():
    """Exact parity of AdaptiveSuperPointMatching vs the real reference
    module on diverse descriptors (threshold + min-count fallback logic)."""
    import jax.numpy as jnp
    import torch

    from reference_oracle import install_reference
    from roitr_tpu.models.matching import adaptive_superpoint_matching

    install_reference()
    from model.modules import AdaptiveSuperPointMatching as RefASM

    rng = np.random.RandomState(5)
    for thr, tag in ((0.75, "threshold-dominant"), (0.2, "min-count fallback")):
        sf = rng.randn(30, 64).astype(np.float32)
        tf = rng.randn(26, 64).astype(np.float32)
        sf /= np.linalg.norm(sf, axis=1, keepdims=True)
        tf /= np.linalg.norm(tf, axis=1, keepdims=True)

        ref_mod = RefASM(min_num_correspondences=10, similarity_threshold=thr)
        with torch.no_grad():
            # reference signature: (src_feats, tgt_feats, ...) returns
            # (src_idx, tgt_idx, scores) — note the swapped order vs
            # CoarseMatching (RIGA_v2.py:119 passes (tgt, src))
            r_t, r_s, r_scores = ref_mod(
                torch.from_numpy(tf), torch.from_numpy(sf),
                torch.ones(26, dtype=torch.bool), torch.ones(30, dtype=torch.bool),
            )
        est = adaptive_superpoint_matching(
            jnp.array(tf), jnp.array(sf),
            jnp.ones(26, bool), jnp.ones(30, bool),
            10, 26 * 30, similarity_threshold=thr,
        )
        m = np.asarray(est.masks)
        ours = sorted(zip(np.asarray(est.ref_indices)[m].tolist(),
                          np.asarray(est.src_indices)[m].tolist()))
        ref_pairs = sorted(zip(r_t.numpy().tolist(), r_s.numpy().tolist()))
        assert ours == ref_pairs, tag
        np.testing.assert_allclose(
            np.sort(np.asarray(est.scores)[m]), np.sort(r_scores.numpy()),
            rtol=1e-5, err_msg=tag)


def test_ot_scores_match_on_identical_patches(both_outputs):
    _, _, ref_aligned, ours = both_outputs
    m = ours["node_corr_masks"]
    row_valid = np.concatenate(
        [ours["tgt_node_corr_knn_masks"][m], np.ones((m.sum(), 1), bool)], axis=1)
    col_valid = np.concatenate(
        [ours["src_node_corr_knn_masks"][m], np.ones((m.sum(), 1), bool)], axis=1)
    valid = row_valid[:, :, None] & col_valid[:, None, :]
    a = ours["matching_scores"][m]
    b = ref_aligned["matching_scores"]
    assert a.shape == b.shape
    diff = np.abs(a - b)[valid]
    assert diff.max() < 2e-2, f"max OT diff {diff.max():.2e}"
    assert diff.mean() < 2e-3


def test_fine_correspondences_and_nfmr_close(both_outputs):
    arr, _, ref_aligned, ours = both_outputs
    m = ours["corr_masks"]
    our_src = ours["src_corr_points"][m]
    our_tgt = ours["tgt_corr_points"][m]
    ref_src = ref_aligned["src_corr_points"]
    ref_tgt = ref_aligned["tgt_corr_points"]
    assert ref_src.shape[0] > 0
    assert abs(our_src.shape[0] - ref_src.shape[0]) / ref_src.shape[0] < 0.02

    # NFMR over the synthetic flow (eval/fdmatch_eval.py semantics): both
    # sides' correspondence sets must recall the metric points equally
    from roitr_tpu.eval.fdmatch_eval import compute_nrfmr

    sc = int(ours["src_count"])
    metric_index = np.arange(0, sc, 7, dtype=np.int32)
    def nfmr(src_corr, tgt_corr):
        data = {
            "src_raw_pcd": arr["src_raw_points"][:sc],
            "src_pcd": arr["src_points"][:sc],  # deformed frame
            "metric_index_list": metric_index,
            "rot": arr["rot"], "trans": arr["trans"],
            "src_corr_pts": src_corr, "tgt_corr_pts": tgt_corr,
        }
        return compute_nrfmr(data)

    a = nfmr(our_src, our_tgt)
    b = nfmr(ref_src, ref_tgt)
    assert abs(a - b) < 0.02, f"NFMR ours {a:.4f} vs ref {b:.4f}"
