"""Serving API: raw clouds in, trimmed correspondences out (no reference
equivalent — lib/tester.py only reads dataset pickles)."""

import numpy as np
import jax
import pytest

from roitr_tpu.config import Config
from roitr_tpu.serving import Matcher

CFG = Config(
    num_est_coarse_corr=8,
    num_gt_coarse_corr=8,
    point_per_patch=8,
    sinkhorn_iters=5,
    max_gt_corr_candidates=16,
    buckets=(128, 256),
    points_limit=300,
    normal_knn=9,
)


@pytest.fixture(scope="module")
def matcher():
    from roitr_tpu.data.synthetic import make_pair_inputs
    from roitr_tpu.models.roitr import RoITr

    rng = np.random.RandomState(0)
    pair = make_pair_inputs(rng, 128, 120, 112, normal_k=9)
    model = RoITr(CFG)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair, train=False,
    )["params"]
    return Matcher(CFG, params, descriptors=True)


def test_match_raw_clouds(matcher):
    rng = np.random.RandomState(1)
    src = rng.rand(117, 3).astype(np.float32)  # odd sizes -> bucket padding
    tgt = rng.rand(103, 3).astype(np.float32)
    out = matcher.match(src, tgt)

    assert out["src_corr_pts"].shape == out["tgt_corr_pts"].shape
    assert out["confidence"].shape[0] == out["src_corr_pts"].shape[0]
    for v in out.values():
        assert np.isfinite(np.asarray(v, np.float32)).all()
    # descriptors trimmed to valid counts and L2-normalized
    assert out["src_point_desc"].shape[0] == 117
    assert out["tgt_point_desc"].shape[0] == 103
    np.testing.assert_allclose(
        np.linalg.norm(out["src_node_desc"], axis=-1), 1.0, atol=1e-4
    )


def test_match_deterministic_and_bucket_cached(matcher):
    rng = np.random.RandomState(2)
    src = rng.rand(100, 3).astype(np.float32)
    tgt = rng.rand(90, 3).astype(np.float32)
    a = matcher.match(src, tgt)
    b = matcher.match(src, tgt)
    np.testing.assert_array_equal(a["src_corr_pts"], b["src_corr_pts"])
    np.testing.assert_array_equal(a["confidence"], b["confidence"])

    # a larger pair lands in the next bucket and still runs
    big_src = rng.rand(200, 3).astype(np.float32)
    big_tgt = rng.rand(180, 3).astype(np.float32)
    out = matcher.match(big_src, big_tgt)
    assert np.isfinite(out["confidence"]).all()


def test_match_caps_oversized_clouds(matcher):
    rng = np.random.RandomState(3)
    src = rng.rand(400, 3).astype(np.float32)  # > points_limit and > buckets
    tgt = rng.rand(50, 3).astype(np.float32)
    out = matcher.match(src, tgt)
    # capped to min(points_limit=300, max bucket=256)
    assert out["src_point_desc"].shape[0] <= 256


def test_match_caps_provided_normals_with_points(matcher):
    # oversized cloud + user normals: both must be subsampled by the SAME
    # permutation (advisor round-2 medium finding — previously a ValueError
    # from mismatched pad_cloud lengths)
    rng = np.random.RandomState(5)
    src = rng.rand(400, 3).astype(np.float32)
    tgt = rng.rand(350, 3).astype(np.float32)
    sn = np.tile(np.array([[0, 0, 1]], np.float32), (400, 1))
    tn = np.tile(np.array([[0, 0, 1]], np.float32), (350, 1))
    out = matcher.match(src, tgt, src_normals=sn, tgt_normals=tn)
    assert np.isfinite(out["confidence"]).all()
    assert out["src_point_desc"].shape[0] <= 256


def test_match_accepts_provided_normals(matcher):
    rng = np.random.RandomState(4)
    src = rng.rand(80, 3).astype(np.float32)
    tgt = rng.rand(70, 3).astype(np.float32)
    sn = np.tile(np.array([[0, 0, 1]], np.float32), (80, 1))
    tn = np.tile(np.array([[0, 0, 1]], np.float32), (70, 1))
    out = matcher.match(src, tgt, src_normals=sn, tgt_normals=tn)
    assert np.isfinite(out["confidence"]).all()


def test_pytree_packing_round_trip():
    """pack_host -> unpack_device must be lossless for f32/i32/bool leaves
    (ints ride the f32 carrier as bitcasts; the serving path depends on
    exact index round-trips)."""
    import jax
    import numpy as np

    from roitr_tpu.utils.packing import build_spec, pack_host, unpack_device

    rng = np.random.RandomState(3)
    tree = {
        "pts": rng.randn(17, 3).astype(np.float32),
        "idx": rng.randint(-(2**30), 2**30, size=(5, 4)).astype(np.int32),
        "cnt": np.int64(12345),
        "mask": rng.rand(9) > 0.5,
        "nested": (np.float32(2.5), rng.randint(0, 7, (3,)).astype(np.int32)),
    }
    treedef, spec, total = build_spec(tree)
    packed = pack_host(tree, spec, total)
    assert packed.dtype == np.float32 and packed.shape == (total,)
    out = jax.jit(lambda p: unpack_device(p, treedef, spec))(packed)
    flat_in = jax.tree_util.tree_leaves(tree)
    flat_out = jax.tree_util.tree_leaves(out)
    for a, b in zip(flat_in, flat_out):
        a = np.asarray(a)
        if a.dtype == np.int64:
            a = a.astype(np.int32)
        np.testing.assert_array_equal(np.asarray(b), a)


@pytest.fixture(scope="module")
def pyramid_matcher():
    """host_pyramid matcher (the production lever and the packed-batch
    requirement)."""
    from roitr_tpu.data.synthetic import make_pair_inputs
    from roitr_tpu.models.roitr import RoITr

    cfg = CFG.replace(host_pyramid=True)
    rng = np.random.RandomState(0)
    pair = make_pair_inputs(rng, 128, 120, 112, normal_k=9)
    model = RoITr(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair, train=False,
    )["params"]
    return Matcher(cfg, params)


def test_match_batch_matches_singles(pyramid_matcher):
    """Packed match_batch must reproduce per-pair match() results, in input
    order, across mixed bucket sizes and a ragged tail."""
    rng = np.random.RandomState(6)
    pairs = [
        (rng.rand(117, 3).astype(np.float32), rng.rand(103, 3).astype(np.float32)),
        (rng.rand(90, 3).astype(np.float32), rng.rand(95, 3).astype(np.float32)),
        (rng.rand(200, 3).astype(np.float32), rng.rand(60, 3).astype(np.float32)),
        (rng.rand(110, 3).astype(np.float32), rng.rand(100, 3).astype(np.float32)),
    ]
    batched = pyramid_matcher.match_batch(pairs, batch_size=2)
    assert len(batched) == len(pairs)
    for (src, tgt), got in zip(pairs, batched):
        want = pyramid_matcher.match(src, tgt)
        assert got["src_corr_pts"].shape == want["src_corr_pts"].shape
        np.testing.assert_allclose(
            got["src_corr_pts"], want["src_corr_pts"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            got["confidence"], want["confidence"], rtol=1e-3, atol=1e-5)


def test_match_batch_requires_host_pyramid(matcher):
    with pytest.raises(ValueError):
        matcher.match_batch([(np.zeros((10, 3), np.float32),) * 2])


def test_match_batch_map_mode(pyramid_matcher):
    """mode='map' (lax.map program batching, the 2048+ default) must match
    per-pair match() results too."""
    rng = np.random.RandomState(7)
    pairs = [
        (rng.rand(100, 3).astype(np.float32), rng.rand(96, 3).astype(np.float32)),
        (rng.rand(118, 3).astype(np.float32), rng.rand(120, 3).astype(np.float32)),
    ]
    batched = pyramid_matcher.match_batch(pairs, batch_size=2, mode="map")
    for (src, tgt), got in zip(pairs, batched):
        want = pyramid_matcher.match(src, tgt)
        assert got["src_corr_pts"].shape == want["src_corr_pts"].shape
        np.testing.assert_allclose(
            got["src_corr_pts"], want["src_corr_pts"], rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError):
        pyramid_matcher.match_batch(pairs, mode="bogus")


@pytest.fixture(scope="module")
def device_prep_matcher(pyramid_matcher):
    """Same params/config as pyramid_matcher, normals estimated in-program."""
    return Matcher(pyramid_matcher.cfg, pyramid_matcher.params, prep="device")


def _corr_set(out, decimals=4):
    return {
        tuple(np.round(np.concatenate([s, t]), decimals))
        for s, t in zip(out["src_corr_pts"], out["tgt_corr_pts"])
    }


def test_device_prep_matches_host_prep(pyramid_matcher, device_prep_matcher):
    """prep='device' (in-program kNN-PCA normals) must reproduce the host
    numpy prep up to eigensolver tolerance: the normals agree to high
    cosine, and the produced correspondence sets overlap near-fully (exact
    bit equality is not expected — jnp.linalg.eigh and numpy eigh round
    differently, and a handful of borderline matches may flip)."""
    from roitr_tpu.data.preprocess import estimate_normals_np, normal_redirect_np
    from roitr_tpu.ops.normals import estimate_normals

    rng = np.random.RandomState(8)
    src = rng.rand(117, 3).astype(np.float32)
    tgt = rng.rand(103, 3).astype(np.float32)

    # normals themselves: device vs numpy twin
    host_n = normal_redirect_np(
        src, estimate_normals_np(src, CFG.normal_knn), np.zeros(3, np.float32))
    pad = np.zeros((128, 3), np.float32)
    pad[:117] = src
    dev_n = np.asarray(estimate_normals(pad, np.int32(117), k=CFG.normal_knn))[:117]
    cos = np.abs(np.sum(host_n * dev_n, axis=-1))
    assert np.mean(cos > 0.999) > 0.97, f"normal agreement {np.mean(cos > 0.999)}"

    host_out = pyramid_matcher.match(src, tgt)
    dev_out = device_prep_matcher.match(src, tgt)
    a, b = _corr_set(host_out), _corr_set(dev_out)
    jacc = len(a & b) / max(len(a | b), 1)
    assert jacc >= 0.9, f"correspondence Jaccard {jacc}"


def test_device_prep_honors_sensor_normals(pyramid_matcher, device_prep_matcher):
    """Caller-provided normals bypass estimation entirely in BOTH prep
    modes. Since round 5, single-pair match() under prep='device' also
    builds its pyramid in-program (VERDICT r4 #2): index fields are bitwise
    host-equal (tests/test_device_pyramid.py) but the 3-NN up-interpolation
    weights round differently at fp32, so outputs are allclose rather than
    bitwise — the correspondence SET must still be identical."""
    rng = np.random.RandomState(9)
    src = rng.rand(100, 3).astype(np.float32)
    tgt = rng.rand(96, 3).astype(np.float32)
    sn = np.tile(np.array([[0, 0, 1]], np.float32), (100, 1))
    tn = np.tile(np.array([[0, 0, 1]], np.float32), (96, 1))
    a = pyramid_matcher.match(src, tgt, src_normals=sn, tgt_normals=tn)
    b = device_prep_matcher.match(src, tgt, src_normals=sn, tgt_normals=tn)
    assert _corr_set(a) == _corr_set(b)
    np.testing.assert_allclose(
        np.sort(a["confidence"]), np.sort(b["confidence"]), rtol=1e-4, atol=1e-6)


def test_device_prep_match_batch(device_prep_matcher):
    """match_batch with device prep: packed and map backends both reproduce
    the per-pair device-prep match(), including a mixed group where one
    pair brings sensor normals (separate est-flag group)."""
    rng = np.random.RandomState(10)
    pairs = [
        (rng.rand(117, 3).astype(np.float32), rng.rand(103, 3).astype(np.float32)),
        (rng.rand(90, 3).astype(np.float32), rng.rand(95, 3).astype(np.float32)),
    ]
    sn = np.tile(np.array([[0, 0, 1]], np.float32), (110, 1))
    tn = np.tile(np.array([[0, 0, 1]], np.float32), (100, 1))
    pairs.append((rng.rand(110, 3).astype(np.float32),
                  rng.rand(100, 3).astype(np.float32), sn, tn))
    for mode in ("packed", "map"):
        batched = device_prep_matcher.match_batch(pairs, batch_size=2, mode=mode)
        assert len(batched) == len(pairs)
        for item, got in zip(pairs, batched):
            want = device_prep_matcher.match(*item)
            assert got["src_corr_pts"].shape == want["src_corr_pts"].shape
            np.testing.assert_allclose(
                got["src_corr_pts"], want["src_corr_pts"], rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                got["confidence"], want["confidence"], rtol=1e-3, atol=1e-5)
