"""End-to-end pipeline smoke + invariance tests on tiny synthetic pairs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roitr_tpu.config import Config
from roitr_tpu.models.roitr import PairInputs, RoITr
from roitr_tpu.ops.normals import estimate_normals


def make_pair(rng, n=256, n_valid=224, m_valid=192, overlap=0.7):
    """Synthetic partially-overlapping pair with known GT transform."""
    scene = rng.rand(n_valid + m_valid, 3).astype(np.float32)

    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    rot = q.astype(np.float32)
    trans = rng.randn(3, 1).astype(np.float32) * 0.1

    # tgt-frame views of the scene; src is pulled back through the GT
    # transform so that src @ rot.T + trans.T lands in the tgt frame
    # (convention of reference loss.py:129)
    start = int((1 - overlap) * n_valid)
    src_in_tgt_frame = scene[:n_valid]
    tgt_view = scene[start: start + m_valid]
    src_view = (src_in_tgt_frame - trans.T) @ rot

    src_pts = np.zeros((n, 3), np.float32)
    tgt_pts = np.zeros((n, 3), np.float32)
    src_pts[:n_valid] = src_view
    tgt_pts[:m_valid] = tgt_view
    src_count, tgt_count = n_valid, m_valid

    src_normals = np.asarray(estimate_normals(jnp.array(src_pts), src_count, k=8))
    tgt_normals = np.asarray(estimate_normals(jnp.array(tgt_pts), tgt_count, k=8))
    return PairInputs(
        src_points=jnp.array(src_pts),
        src_raw_points=jnp.array(src_pts),
        src_normals=jnp.array(src_normals),
        src_feats=jnp.ones((n, 1), jnp.float32),
        src_count=jnp.int32(src_count),
        tgt_points=jnp.array(tgt_pts),
        tgt_normals=jnp.array(tgt_normals),
        tgt_feats=jnp.ones((n, 1), jnp.float32),
        tgt_count=jnp.int32(tgt_count),
        rot=jnp.array(rot),
        trans=jnp.array(trans),
    )


@pytest.fixture(scope="module")
def tiny_cfg():
    return Config(
        benchmark="3DMatch",
        num_est_coarse_corr=16,
        num_gt_coarse_corr=8,
        point_per_patch=16,
        sinkhorn_iters=10,
        max_gt_corr_candidates=64,
        factor=1,
    )


@pytest.fixture(scope="module")
def tiny_model_and_params(tiny_cfg):
    rng = np.random.RandomState(0)
    pair = make_pair(rng)
    model = RoITr(tiny_cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair,
        train=False,
    )["params"]
    return model, params, pair


def test_forward_shapes_and_finiteness(tiny_cfg, tiny_model_and_params):
    model, params, pair = tiny_model_and_params
    out = model.apply({"params": params}, pair, train=False)

    n4 = pair.src_points.shape[0] // 64
    assert out["src_nodes"].shape == (n4, 3)
    assert out["src_node_feats"].shape == (n4, 256)
    assert out["src_point_feats"].shape == (pair.src_points.shape[0], 256)
    p = tiny_cfg.num_est_coarse_corr
    k = tiny_cfg.point_per_patch
    assert out["matching_scores"].shape == (p, k + 1, k + 1)
    assert out["tgt_corr_points"].shape[0] == p * k * tiny_cfg.fine_matching_topk

    for key in ["src_node_feats", "tgt_node_feats", "matching_scores", "corr_scores"]:
        assert np.isfinite(np.asarray(out[key])).all(), key

    # node feats are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["src_node_feats"]), axis=-1), 1.0, atol=1e-5
    )


def test_forward_jits_and_is_deterministic(tiny_model_and_params):
    model, params, pair = tiny_model_and_params
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    o1 = fwd(params, pair)
    o2 = fwd(params, pair)
    np.testing.assert_array_equal(np.asarray(o1["corr_scores"]), np.asarray(o2["corr_scores"]))


def test_train_mode_runs_with_sampling_rng(tiny_model_and_params):
    model, params, pair = tiny_model_and_params
    out = model.apply(
        {"params": params}, pair, train=True, rngs={"sampling": jax.random.PRNGKey(7)}
    )
    assert np.isfinite(np.asarray(out["matching_scores"])).all()


def test_rotation_invariance_of_node_feats(tiny_cfg, tiny_model_and_params):
    """Rotating the source cloud must leave node descriptors (nearly)
    unchanged — the core RoITr property (PPF-only geometry)."""
    model, params, pair = tiny_model_and_params
    out0 = model.apply({"params": params}, pair, train=False)

    rng = np.random.RandomState(3)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    q = q.astype(np.float32)
    src_pts = np.asarray(pair.src_points) @ q.T
    src_nrm = np.asarray(pair.src_normals) @ q.T
    pair_rot = pair._replace(
        src_points=jnp.array(src_pts),
        src_raw_points=jnp.array(src_pts),
        src_normals=jnp.array(src_nrm),
    )
    out1 = model.apply({"params": params}, pair_rot, train=False)

    f0 = np.asarray(out0["src_node_feats"])
    f1 = np.asarray(out1["src_node_feats"])
    n_valid = int(np.asarray(out0["src_node_count"]))
    # cosine similarity of valid node descriptors should be ~1
    cos = (f0[:n_valid] * f1[:n_valid]).sum(-1)
    assert cos.min() > 0.99, cos.min()


def test_remat_local_same_params_and_grads(tiny_cfg, tiny_model_and_params):
    """cfg.remat_local must not change the param tree or the gradients
    (jax.checkpoint recomputes the same fused forward). Kept for
    memory-limited buckets; measured slower at 32k (PERFORMANCE.md)."""
    model, params, pair = tiny_model_and_params
    model_r = RoITr(tiny_cfg.replace(remat_local=True))
    p_r = model_r.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair, train=False,
    )["params"]
    assert jax.tree_util.tree_structure(p_r) == jax.tree_util.tree_structure(params)

    def loss(m, p):
        o = m.apply({"params": p}, pair, train=True, rngs={"sampling": jax.random.PRNGKey(7)})
        return jnp.sum(o["matching_scores"] ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(model, p)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(model_r, p)))(params)
    mx = max(
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
        )
    )
    assert mx < 1e-5, f"remat changed gradients by {mx}"


def test_sinkhorn_tol_inference_lever(tiny_cfg, tiny_model_and_params):
    """cfg.sinkhorn_tol > 0 (convergence early-exit) must track the
    fixed-count inference scores closely, and train=True must ignore it
    (the while_loop has no reverse-mode derivative)."""
    model, params, pair = tiny_model_and_params
    out_fixed = model.apply({"params": params}, pair, train=False)

    cfg_tol = tiny_cfg.replace(sinkhorn_tol=1e-3)
    model_tol = RoITr(cfg_tol)
    out_tol = model_tol.apply({"params": params}, pair, train=False)
    np.testing.assert_allclose(
        np.asarray(out_tol["matching_scores"]),
        np.asarray(out_fixed["matching_scores"]),
        rtol=5e-2, atol=5e-2,
    )
    # the downstream extraction is identical at this tolerance
    np.testing.assert_array_equal(
        np.asarray(out_tol["src_corr_points"]), np.asarray(out_fixed["src_corr_points"])
    )

    # training path still differentiates (fixed-count scan regardless of tol)
    def loss_fn(p):
        o = model_tol.apply(
            {"params": p}, pair, train=True, rngs={"sampling": jax.random.PRNGKey(0)}
        )
        return jnp.sum(o["matching_scores"])

    g = jax.grad(loss_fn)(params)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, jnp.float32(0)))), "non-finite grads"
