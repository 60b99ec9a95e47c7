"""True-oracle parity at the SHIPPED envelope (VERDICT round-2 missing #1).

tests/test_reference_parity.py certifies the strictest-numerics path
(full bucket, exact kNN, device pyramid). Production runs something else:
padded buckets (real clouds never land on bucket boundaries), host-built
FPS/kNN pyramids, and approx kNN (`configs/test/*.yaml`). Each variant here
runs the REAL reference (/root/reference, via tests/reference_oracle.py) on
the exact-size clouds and roitr_tpu with the production lever under test on
the padded buffers, with converted weights — so the production config's
drift is bounded *against the reference*, not just against ourselves.

Variants:
- padded:       src=900/tgt=780 in the 1024 bucket, exact kNN, device FPS —
                exercises the full mask lattice end to end
- host_pyramid: host-precomputed FPS/kNN pyramid (bit-parity lever)
- approx_knn:   approx_min_k neighbor search (99.6% recall lever) —
                bounded by a measured tolerance
- production:   all of the above combined = what configs/test/*.yaml runs

Reference match: model/RIGA_v2.py:58-175 run on arbitrary-size pairs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from roitr_tpu.config import Config

BUCKET = 1024

BASE = dict(
    benchmark="3DMatch",
    mode="test",
    num_est_coarse_corr=64,
    point_per_patch=32,
    sinkhorn_iters=100,
    # untrained OT plans are ~uniform; see test_reference_parity.py
    fine_matching_confidence_threshold=0.005,
)

# (config, (n_src, n_tgt), run aligned ref, node/point descriptor cos floor)
# cos floors are measured envelopes (see each variant's comment), set with
# ~10x headroom below the observed minimum but far above failure signatures
# (a real masking/recall bug drives min-cos < 0.9).
VARIANTS = {
    # padded path, strict levers. Measured min cos 0.9981 (worst of 14
    # nodes): padding changes every reduction's row count (1024-row masked
    # matmuls vs the reference's exact 900), so fp32 summation order—not
    # masking—drifts slightly more than the shape-identical base suite; a
    # pad-row leak would crater cos far below 0.99 (and is independently
    # excluded at ~1e-5 tolerance by test_padding_invariance.py, which
    # compares our own pipeline across bucket sizes).
    "padded": (
        Config(**BASE, knn_method="exact", host_pyramid=False),
        (900, 780), True, 0.995,
    ),
    # host pyramid is a bit-parity lever (PERFORMANCE.md): same floor
    "host_pyramid": (
        Config(**BASE, knn_method="exact", host_pyramid=True),
        (BUCKET, BUCKET), False, 0.999,
    ),
    # approx kNN: 99.6% neighbor recall; measured min cos 0.9996 node /
    # 0.9990 point at this seed (flipped neighbors perturb ~0.4% of local
    # attention supports)
    "approx_knn": (
        Config(**BASE, knn_method="approx", host_pyramid=False),
        (BUCKET, BUCKET), False, 0.995,
    ),
    "production": (
        Config(**BASE, knn_method="approx", host_pyramid=True),
        (900, 780), True, 0.995,
    ),
}


@pytest.fixture(scope="module", params=list(VARIANTS))
def variant_outputs(request):
    from parity_harness import run_both

    cfg, (n_src, n_tgt), aligned, cos_floor = VARIANTS[request.param]
    arr, ref, ref_aligned, ours = run_both(
        cfg, BUCKET, n_src, n_tgt, seed=7, aligned=aligned
    )
    return request.param, cfg, cos_floor, arr, ref, ref_aligned, ours


def test_counts_and_fps_nodes_identical(variant_outputs):
    name, cfg, _, arr, ref, _, ours = variant_outputs
    snc, tnc = int(ours["src_node_count"]), int(ours["tgt_node_count"])
    assert snc == ref["src_nodes"].shape[0], name
    assert tnc == ref["tgt_nodes"].shape[0], name
    np.testing.assert_allclose(ours["src_nodes"][:snc], ref["src_nodes"], atol=1e-6)
    np.testing.assert_allclose(ours["tgt_nodes"][:tnc], ref["tgt_nodes"], atol=1e-6)
    sc, tc = int(ours["src_count"]), int(ours["tgt_count"])
    np.testing.assert_allclose(ours["src_points"][:sc], ref["src_points"], atol=1e-6)
    np.testing.assert_allclose(ours["tgt_points"][:tc], ref["tgt_points"], atol=1e-6)


def test_descriptors_within_envelope(variant_outputs):
    from parity_harness import cos_rows

    name, cfg, cos_floor, arr, ref, _, ours = variant_outputs
    snc, tnc = int(ours["src_node_count"]), int(ours["tgt_node_count"])
    sc, tc = int(ours["src_count"]), int(ours["tgt_count"])
    for key, cnt in (
        ("src_node_feats", snc), ("tgt_node_feats", tnc),
        ("src_point_feats", sc), ("tgt_point_feats", tc),
    ):
        cos = cos_rows(ours[key][:cnt], ref[key])
        assert cos.min() > cos_floor, f"{name}/{key}: min cos {cos.min():.6f}"


def test_padding_rows_do_not_leak(variant_outputs):
    """Valid-prefix outputs must be finite; the trimmed comparison above
    plus finite padding rows rules out pad-row contamination."""
    name, _, _, _, _, _, ours = variant_outputs
    for key in ("src_node_feats", "tgt_node_feats", "src_point_feats", "tgt_point_feats"):
        assert np.isfinite(ours[key]).all(), f"{name}/{key}"


def test_gt_node_correspondences_match(variant_outputs):
    name, _, _, _, ref, _, ours = variant_outputs
    ref_set = {
        (int(i), int(j)): float(o)
        for (i, j), o in zip(ref["gt_node_corr_indices"], ref["gt_node_corr_overlaps"])
    }
    m = ours["gt_node_corr_masks"]
    our_set = {
        (int(i), int(j)): float(o)
        for (i, j), o in zip(ours["gt_node_corr_indices"][m], ours["gt_node_corr_overlaps"][m])
    }
    assert set(our_set) == set(ref_set), name
    for k in ref_set:
        np.testing.assert_allclose(our_set[k], ref_set[k], atol=1e-5)
    np.testing.assert_allclose(ours["gt_tgt_node_occ"][: len(ref["gt_tgt_node_occ"])],
                               ref["gt_tgt_node_occ"], atol=1e-5)
    np.testing.assert_allclose(ours["gt_src_node_occ"][: len(ref["gt_src_node_occ"])],
                               ref["gt_src_node_occ"], atol=1e-5)


def test_ot_scores_match_on_identical_patches(variant_outputs):
    name, cfg, _, _, _, ref_aligned, ours = variant_outputs
    if ref_aligned is None:
        pytest.skip("descriptor-level variant (no aligned reference run)")
    m = ours["node_corr_masks"]
    row_valid = np.concatenate(
        [ours["tgt_node_corr_knn_masks"][m], np.ones((m.sum(), 1), bool)], axis=1)
    col_valid = np.concatenate(
        [ours["src_node_corr_knn_masks"][m], np.ones((m.sum(), 1), bool)], axis=1)
    valid = row_valid[:, :, None] & col_valid[:, None, :]
    a = ours["matching_scores"][m]
    b = ref_aligned["matching_scores"]
    assert a.shape == b.shape, name
    diff = np.abs(a - b)[valid]
    # descriptor drift (<= 1 - cos_floor) carries into the OT einsum scores;
    # a real OT/masking bug produces O(1) diffs
    tol = 2e-2 if name == "padded" else 6e-2
    assert diff.max() < tol, f"{name}: max OT diff {diff.max():.2e}"
    assert diff.mean() < tol / 10, f"{name}: mean OT diff {diff.mean():.2e}"


def test_fine_correspondences_end_to_end_close(variant_outputs):
    name, cfg, _, arr, _, ref_aligned, ours = variant_outputs
    if ref_aligned is None:
        pytest.skip("descriptor-level variant (no aligned reference run)")
    m = ours["corr_masks"]
    our_pts = np.concatenate(
        [ours["tgt_corr_points"][m], ours["src_corr_points"][m]], axis=1)
    ref_pts = np.concatenate(
        [ref_aligned["tgt_corr_points"], ref_aligned["src_corr_points"]], axis=1)
    assert ref_pts.shape[0] > 0, name
    # near-uniform untrained OT plans make the discrete extraction knife-edge
    count_tol = 0.02 if name == "padded" else 0.05
    assert abs(our_pts.shape[0] - ref_pts.shape[0]) / ref_pts.shape[0] < count_tol, name

    def ir(pts):
        tgt, src = pts[:, :3], pts[:, 3:]
        src_t = src @ arr["rot"].T + arr["trans"].T
        return float((np.linalg.norm(tgt - src_t, axis=1) < 0.1).mean())

    assert abs(ir(our_pts) - ir(ref_pts)) < 0.03, name
