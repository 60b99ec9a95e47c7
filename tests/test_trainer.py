"""Trainer / Tester / checkpoint integration on tiny synthetic datasets."""

import os

import numpy as np
import jax
import pytest

from roitr_tpu.config import Config
from roitr_tpu.data.synthetic import make_pair_arrays
from roitr_tpu.train.checkpoint import (
    init_best_metrics,
    load_checkpoint,
    save_checkpoint,
    update_bests,
)

TINY = Config(
    num_est_coarse_corr=8,
    num_gt_coarse_corr=8,
    point_per_patch=8,
    sinkhorn_iters=5,
    max_gt_corr_candidates=16,
    buckets=(128,),
    normal_knn=9,
    batch_size=1,
    max_epoch=1,
    verbose=False,
    training_max_iter=2,
    val_max_iter=2,
    dp_size=1,
)


class SyntheticDataset:
    """Duck-typed dataset yielding preprocessed dicts like TDMatchDataset."""

    def __init__(self, n, bucket=128, seed=0):
        self.n = n
        self.bucket = bucket
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from roitr_tpu.data.preprocess import estimate_normals_np, normal_redirect_np

        rng = np.random.RandomState(self.seed + i)
        arr = make_pair_arrays(rng, self.bucket, self.bucket - 8, self.bucket - 24)
        sc, tc = int(arr["src_count"]), int(arr["tgt_count"])
        sn = np.zeros((self.bucket, 3), np.float32)
        tn = np.zeros((self.bucket, 3), np.float32)
        sn[:sc] = normal_redirect_np(
            arr["src_points"][:sc], estimate_normals_np(arr["src_points"][:sc], 9), np.zeros(3)
        )
        tn[:tc] = normal_redirect_np(
            arr["tgt_points"][:tc], estimate_normals_np(arr["tgt_points"][:tc], 9), np.zeros(3)
        )
        ones = np.ones((self.bucket, 1), np.float32)
        return {
            **arr,
            "src_normals": sn,
            "tgt_normals": tn,
            "src_feats": ones,
            "tgt_feats": ones,
        }


def test_update_bests():
    best = init_best_metrics()
    improved = update_bests(best, {"loss": 1.0, "PIR": 0.5, "IR": 0.2,
                                   "c_loss": 0.6, "f_loss": 0.4, "o_loss": 0.0})
    assert all(improved.values())
    improved = update_bests(best, {"loss": 2.0, "PIR": 0.6, "IR": 0.1,
                                   "c_loss": 0.7, "f_loss": 0.5, "o_loss": 0.0})
    assert improved["PIR"] and not improved["loss"] and not improved["IR"]
    assert best["loss"] == 1.0 and best["PIR"] == 0.6


def test_trainer_one_epoch(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from roitr_tpu.train.trainer import Trainer

    ds = SyntheticDataset(4)
    trainer = Trainer(TINY, train_dataset=ds, val_dataset=SyntheticDataset(2, seed=50))
    bests = trainer.train()
    assert np.isfinite(bests["loss"])
    assert int(trainer.state.step) == 2
    # checkpoints exist: per-epoch + per-best
    ckpts = os.listdir(os.path.join("snapshot", TINY.exp_dir, "checkpoints"))
    assert "model_0" in ckpts
    assert "model_best_loss" in ckpts
    # events written
    assert os.path.exists(os.path.join("snapshot", TINY.exp_dir, "events.jsonl"))


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from roitr_tpu.data.loader import dict_to_pair
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.parallel.train_step import create_train_state, make_optimizer

    ds = SyntheticDataset(1)
    pair = dict_to_pair(ds[0])
    model = RoITr(TINY)
    tx = make_optimizer(TINY, 10)
    state = create_train_state(TINY, model, pair, jax.random.PRNGKey(0), tx)

    path = str(tmp_path / "ckpt")
    best = init_best_metrics()
    best["loss"] = 0.5
    save_checkpoint(path, state, epoch=3, best_metrics=best)
    restored = load_checkpoint(path, abstract_state=state)
    assert int(restored["epoch"]) == 3
    assert float(restored["best_metrics"]["loss"]) == 0.5
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tester_dumps_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    import torch

    from roitr_tpu.data.loader import dict_to_pair
    from roitr_tpu.eval.tester import Tester
    from roitr_tpu.models.roitr import RoITr

    cfg = TINY.replace(mode="test", exp_dir="test_exp")
    ds = SyntheticDataset(2)
    model = RoITr(cfg)
    pair = dict_to_pair(ds[0])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, pair, train=False
    )["params"]

    tester = Tester(cfg, dataset=ds, params=params)
    tester.test()

    dump0 = os.path.join("snapshot", cfg.exp_dir, cfg.benchmark, "0.pth")
    assert os.path.exists(dump0)
    data = torch.load(dump0, weights_only=False)
    for key in [
        "src_raw_pcd", "src_pcd", "tgt_pcd", "src_nodes", "tgt_nodes",
        "src_node_desc", "tgt_node_desc", "src_point_desc", "tgt_point_desc",
        "src_corr_pts", "tgt_corr_pts", "confidence",
        "gt_tgt_node_occ", "gt_src_node_occ", "rot", "trans",
    ]:
        assert key in data, key
    # ragged shapes restored: valid counts only
    assert data["src_pcd"].shape == (120, 3)
    assert data["src_nodes"].shape[0] == 120 // 64 or data["src_nodes"].shape[0] == 2
    assert data["src_corr_pts"].shape == data["tgt_corr_pts"].shape
    assert data["confidence"].shape[0] == data["src_corr_pts"].shape[0]


def test_tester_c2f_dump_mode(tmp_path, monkeypatch):
    """dump_mode='c2f' drops the never-read descriptor tensors and compacts
    the corr buffers on device (stable order). The corr/points keys must be
    BIT-identical to dump_mode='full' whenever the valid count fits
    dump_corr_cap; placeholder descriptor keys keep the unchanged reference
    evaluator loadable; a too-small cap warns and truncates. Also pins the
    dp-sharded c2f path against the single-device one."""
    monkeypatch.chdir(tmp_path)
    import torch

    from roitr_tpu.data.loader import dict_to_pair
    from roitr_tpu.eval.tester import C2F_PLACEHOLDERS, Tester
    from roitr_tpu.models.roitr import RoITr

    cfg = TINY.replace(mode="test")
    ds = SyntheticDataset(3)
    model = RoITr(cfg)
    pair = dict_to_pair(ds[0])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair, train=False,
    )["params"]

    Tester(cfg.replace(exp_dir="full"), dataset=ds, params=params).test()
    Tester(cfg.replace(exp_dir="c2f", dump_mode="c2f"),
           dataset=ds, params=params).test()
    Tester(cfg.replace(exp_dir="c2f_dp", dump_mode="c2f", dp_size=2),
           dataset=ds, params=params).test()

    shared = ("src_raw_pcd", "src_pcd", "tgt_pcd", "src_nodes", "tgt_nodes",
              "src_corr_pts", "tgt_corr_pts", "confidence",
              "gt_tgt_node_occ", "gt_src_node_occ", "rot", "trans")
    for i in range(3):
        a = torch.load(os.path.join("snapshot", "full", cfg.benchmark, f"{i}.pth"),
                       weights_only=False)
        b = torch.load(os.path.join("snapshot", "c2f", cfg.benchmark, f"{i}.pth"),
                       weights_only=False)
        c = torch.load(os.path.join("snapshot", "c2f_dp", cfg.benchmark, f"{i}.pth"),
                       weights_only=False)
        for k in shared:
            np.testing.assert_array_equal(
                a[k].numpy(), b[k].numpy(), err_msg=f"pair {i}: {k}")
            np.testing.assert_array_equal(
                b[k].numpy(), c[k].numpy(), err_msg=f"dp pair {i}: {k}")
        for k in C2F_PLACEHOLDERS:  # loadable by the reference script
            assert k in b and b[k].numel() == 0
            assert a[k].numel() > 0  # full mode keeps real descriptors

    # overflow: cap smaller than the valid corr count -> warning + truncation
    a = torch.load(os.path.join("snapshot", "full", cfg.benchmark, "0.pth"),
                   weights_only=False)
    n_valid = a["confidence"].shape[0]
    assert n_valid > 2
    with pytest.warns(UserWarning, match="truncated"):
        Tester(cfg.replace(exp_dir="c2f_trunc", dump_mode="c2f",
                           dump_corr_cap=2),
               dataset=SyntheticDataset(1), params=params).test()
    t = torch.load(os.path.join("snapshot", "c2f_trunc", cfg.benchmark, "0.pth"),
                   weights_only=False)
    assert t["confidence"].shape[0] == 2
    np.testing.assert_array_equal(t["src_corr_pts"].numpy(),
                                  a["src_corr_pts"].numpy()[:2])

    with pytest.raises(ValueError, match="dump_mode"):
        Tester(cfg.replace(dump_mode="bogus"), dataset=ds, params=params)


def test_tester_dp_sharded_matches_single(tmp_path, monkeypatch):
    """cfg.dp_size > 1 shards test-split inference over the device mesh
    (one pair per device); the per-pair dumps must be bit-identical to
    the single-device loop, including the padded ragged tail (5 pairs
    over 4 shards)."""
    monkeypatch.chdir(tmp_path)
    import torch

    from roitr_tpu.data.loader import dict_to_pair
    from roitr_tpu.eval.tester import Tester
    from roitr_tpu.models.roitr import RoITr

    ds = SyntheticDataset(5)
    model = RoITr(TINY)
    pair = dict_to_pair(ds[0])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, pair, train=False
    )["params"]

    Tester(TINY.replace(mode="test", exp_dir="single"), dataset=ds, params=params).test()
    Tester(
        TINY.replace(mode="test", exp_dir="sharded", dp_size=4), dataset=ds, params=params
    ).test()

    for i in range(5):
        a = torch.load(os.path.join("snapshot", "single", TINY.benchmark, f"{i}.pth"),
                       weights_only=False)
        b = torch.load(os.path.join("snapshot", "sharded", TINY.benchmark, f"{i}.pth"),
                       weights_only=False)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k].numpy(), b[k].numpy(), err_msg=f"pair {i}: {k}")


def test_tester_packed_matches_single(tmp_path, monkeypatch):
    """cfg.packed_batch groups batch_size same-bucket pairs into ONE flat
    packed program per mesh shard; the per-pair dumps must match the
    single-pair loop (fp32 reduction tolerance) in the right order — this
    pins the (D, B) -> pair-major flattening and the a[i] dump indexing,
    including the repeated-pair ragged tail (5 pairs over dp=2 x pack=2)."""
    monkeypatch.chdir(tmp_path)
    import torch

    from roitr_tpu.data.loader import dict_to_pair
    from roitr_tpu.data.pyramid import build_cloud_pyramid
    from roitr_tpu.eval.tester import Tester
    from roitr_tpu.models.roitr import RoITr

    class PyramidDataset(SyntheticDataset):
        def __getitem__(self, i):
            item = super().__getitem__(i)
            # packed mode needs host pyramids (preprocess.py:200-206 builds
            # the source pyramid on the raw geometry)
            item["src_pyramid"] = build_cloud_pyramid(
                item["src_raw_points"], int(item["src_count"]),
                strides=tuple(TINY.enc_strides), nsample=tuple(TINY.enc_nsample))
            item["tgt_pyramid"] = build_cloud_pyramid(
                item["tgt_points"], int(item["tgt_count"]),
                strides=tuple(TINY.enc_strides), nsample=tuple(TINY.enc_nsample))
            return item

    base = TINY.replace(mode="test", host_pyramid=True)
    ds = PyramidDataset(5)
    model = RoITr(base)
    pair = dict_to_pair(ds[0])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair, train=False,
    )["params"]

    Tester(base.replace(exp_dir="single"), dataset=ds, params=params).test()
    Tester(
        base.replace(exp_dir="packed", packed_batch=True, batch_size=2),
        dataset=ds, params=params,
    ).test()
    Tester(
        base.replace(exp_dir="packed_dp", packed_batch=True, batch_size=2,
                     dp_size=2),
        dataset=ds, params=params,
    ).test()

    for exp in ("packed", "packed_dp"):
        for i in range(5):
            a = torch.load(
                os.path.join("snapshot", "single", base.benchmark, f"{i}.pth"),
                weights_only=False)
            b = torch.load(
                os.path.join("snapshot", exp, base.benchmark, f"{i}.pth"),
                weights_only=False)
            assert set(a) == set(b)
            for k in a:
                av, bv = a[k].numpy(), b[k].numpy()
                assert av.shape == bv.shape, f"{exp} pair {i}: {k}"
                np.testing.assert_allclose(
                    av, bv, atol=5e-5, rtol=1e-5, err_msg=f"{exp} pair {i}: {k}")


def test_tester_device_prep_matches_host(tmp_path, monkeypatch):
    """cfg.device_prep moves normal estimation + the exact FPS/kNN pyramid
    into the jitted test program (VERDICT r4 #2): the dataset ships zero
    normals and no pyramids. Dumps must agree with the host-prep tester up
    to the closed-form-vs-LAPACK eigensolver tolerance of the normals
    (descriptor cosine, correspondence-set overlap) — and the packed
    device-prep tester must agree with the single device-prep loop at fp32
    reduction tolerance."""
    monkeypatch.chdir(tmp_path)
    import torch

    from roitr_tpu.data.loader import dict_to_pair
    from roitr_tpu.eval.tester import Tester
    from roitr_tpu.models.roitr import RoITr

    class DevicePrepDataset(SyntheticDataset):
        """Zero normals, no pyramids — what the datasets emit under
        cfg.device_prep (preprocess_pair device_prep=True)."""

        def __getitem__(self, i):
            item = super().__getitem__(i)
            item["src_normals"] = np.zeros_like(item["src_normals"])
            item["tgt_normals"] = np.zeros_like(item["tgt_normals"])
            return item

    cfg = TINY.replace(mode="test", normal_knn=9)
    ds_host, ds_dev = SyntheticDataset(3), DevicePrepDataset(3)
    model = RoITr(cfg)
    pair = dict_to_pair(ds_host[0])
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        pair, train=False,
    )["params"]

    Tester(cfg.replace(exp_dir="host"), dataset=ds_host, params=params).test()
    Tester(cfg.replace(exp_dir="dev", device_prep=True),
           dataset=ds_dev, params=params).test()
    Tester(cfg.replace(exp_dir="dev_packed", device_prep=True,
                       packed_batch=True, batch_size=2),
           dataset=ds_dev, params=params).test()

    def corr_set(d):
        return {
            tuple(np.round(np.concatenate([s, t]), 4))
            for s, t in zip(d["src_corr_pts"].numpy(), d["tgt_corr_pts"].numpy())
        }

    for i in range(3):
        a = torch.load(os.path.join("snapshot", "host", cfg.benchmark, f"{i}.pth"),
                       weights_only=False)
        b = torch.load(os.path.join("snapshot", "dev", cfg.benchmark, f"{i}.pth"),
                       weights_only=False)
        c = torch.load(os.path.join("snapshot", "dev_packed", cfg.benchmark,
                                    f"{i}.pth"), weights_only=False)
        # geometry keys are prep-independent
        for k in ("src_pcd", "tgt_pcd", "rot", "trans"):
            np.testing.assert_array_equal(a[k].numpy(), b[k].numpy(), err_msg=k)
        # descriptors: normals differ only at eigensolver tolerance
        for k in ("src_node_desc", "tgt_node_desc"):
            av, bv = a[k].numpy(), b[k].numpy()
            cos = np.sum(av * bv, axis=-1) / np.maximum(
                np.linalg.norm(av, axis=-1) * np.linalg.norm(bv, axis=-1), 1e-12)
            assert cos.min() > 0.99, f"pair {i}: {k} min cos {cos.min()}"
        sa, sb = corr_set(a), corr_set(b)
        jacc = len(sa & sb) / max(len(sa | sb), 1)
        assert jacc >= 0.8, f"pair {i}: corr Jaccard {jacc}"
        # packed device-prep vs single device-prep: same prep, fp32 tolerance
        assert set(b) == set(c)
        for k in b:
            bv, cv = b[k].numpy(), c[k].numpy()
            assert bv.shape == cv.shape, f"pair {i}: {k}"
            np.testing.assert_allclose(
                bv, cv, atol=5e-5, rtol=1e-4, err_msg=f"pair {i}: {k}")


def test_trainer_resume(tmp_path, monkeypatch):
    """cfg.pretrain restores params/epoch/bests (reference trainer.py:94-130)."""
    monkeypatch.chdir(tmp_path)
    from roitr_tpu.train.trainer import Trainer

    ds = SyntheticDataset(2)
    t1 = Trainer(TINY, train_dataset=ds, val_dataset=SyntheticDataset(2, seed=50))
    t1.train()
    ckpt = os.path.join("snapshot", TINY.exp_dir, "checkpoints", "model_0")

    cfg2 = TINY.replace(pretrain=ckpt, exp_dir="resumed")
    t2 = Trainer(cfg2, train_dataset=ds, val_dataset=SyntheticDataset(2, seed=50))
    assert t2.start_epoch == 1
    assert np.isfinite(t2.best_metrics["loss"])
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.state.params),
        jax.tree_util.tree_leaves(t2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
