"""Host-precomputed pyramid: parity with the device-computed path."""

import numpy as np
import jax
import pytest

from roitr_tpu.config import Config
from roitr_tpu.data.pyramid import build_cloud_pyramid
from roitr_tpu.data.synthetic import make_pair_inputs
from roitr_tpu.models.roitr import RoITr

CFG = Config(
    num_est_coarse_corr=8,
    num_gt_coarse_corr=8,
    point_per_patch=8,
    sinkhorn_iters=5,
    max_gt_corr_candidates=64,
)


def test_pyramid_indices_match_device(rng):
    """FPS and kNN indices from the host builder must equal the device ops
    (same seeds, same exclusion semantics) on tie-free data."""
    import jax.numpy as jnp

    from roitr_tpu.ops.fps import furthest_point_sampling
    from roitr_tpu.ops.neighbors import masked_knn

    bucket, count = 256, 240
    pts = np.zeros((bucket, 3), np.float32)
    pts[:count] = rng.rand(count, 3).astype(np.float32)

    pyr = build_cloud_pyramid(pts, count)

    m2 = count // 4
    dev_fps = np.asarray(furthest_point_sampling(jnp.array(pts), count, bucket // 4))
    np.testing.assert_array_equal(pyr.fps_idx2[:m2], dev_fps[:m2])

    dev_knn, _ = masked_knn(jnp.array(pts), jnp.array(pts), count, 8, exclude_self=True)
    np.testing.assert_array_equal(pyr.cross_idx1[:count], np.asarray(dev_knn)[:count])


def test_full_pipeline_parity_with_pyramid(rng):
    """Model outputs with a host pyramid must match the device-computed
    path to float tolerance."""
    pair = make_pair_inputs(rng, 256, 240, 224, normal_k=8)
    model = RoITr(CFG)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, pair, train=False
    )["params"]
    out_dev = model.apply({"params": params}, pair, train=False)

    src_pyr = build_cloud_pyramid(np.asarray(pair.src_raw_points), int(pair.src_count))
    tgt_pyr = build_cloud_pyramid(np.asarray(pair.tgt_points), int(pair.tgt_count))
    pair_h = pair._replace(src_pyramid=src_pyr, tgt_pyramid=tgt_pyr)
    out_host = model.apply({"params": params}, pair_h, train=False)

    nv = int(out_dev["src_node_count"])
    np.testing.assert_allclose(
        np.asarray(out_dev["src_node_feats"])[:nv],
        np.asarray(out_host["src_node_feats"])[:nv],
        atol=1e-4,
    )
    # sqrt-rounding differences in host vs device 3-NN weights drift a few
    # ulps through 100 Sinkhorn iterations; 2e-3 on log-scores is float noise
    np.testing.assert_allclose(
        np.asarray(out_dev["matching_scores"]),
        np.asarray(out_host["matching_scores"]),
        atol=2e-3,
    )
