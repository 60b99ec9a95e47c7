"""Test-split inference + evaluator-compatible dumps.

Rebuilds reference lib/tester.py:11-88: run the pipeline over each test
pair and dump one file per pair with the exact key set the unchanged
`registration/` evaluators read (tester.py:56-68). Fixed-capacity device
buffers are trimmed to their valid counts on host before dumping, restoring
the reference's ragged shapes.

Dump format: torch .pth when torch is importable (bit-compatible with the
reference evaluators), else .npz with the same keys.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from roitr_tpu.config import Config
from roitr_tpu.data import get_dataset
from roitr_tpu.data.loader import dict_to_pair
from roitr_tpu.models.roitr import RoITr
from roitr_tpu.train.checkpoint import load_checkpoint


# the forward-output keys the dump actually reads (trim_outputs below).
# The Tester fetches ONLY these, in ONE jax.device_get call: per-leaf
# np.asarray over the whole 29-leaf output tree paid the ~33 ms tunnel RTT
# per leaf (977 ms/pair measured); the batched subset fetch is 172 ms —
# the tunnel's ~34 MB/s on the 5.7 MB dump payload, its hard floor
# (tools/probe_tester_fetch.py, 2026-08-20).
DUMP_KEYS = (
    "src_count", "tgt_count", "src_node_count", "tgt_node_count",
    "corr_masks", "src_points", "tgt_points", "src_nodes", "tgt_nodes",
    "src_node_feats", "tgt_node_feats", "src_point_feats", "tgt_point_feats",
    "src_corr_points", "tgt_corr_points", "corr_scores",
    "gt_tgt_node_occ", "gt_src_node_occ",
)


# dump_mode="c2f": only what the live offline evaluators READ. The
# reference's own registration/evaluate_registration_c2f.py:69-75 loads the
# point/node descriptors and never uses them (RANSAC consumes corr_pts +
# confidence + rot/trans); dropping them plus compacting the corr buffers
# (compact_corr below) cuts the payload 5.7 -> ~0.5 MB per 2048-bucket pair
# — the fetch is this tunnel's ~34 MB/s bandwidth floor (PERFORMANCE.md).
C2F_KEYS = (
    "src_count", "tgt_count", "src_node_count", "tgt_node_count",
    "src_points", "tgt_points", "src_nodes", "tgt_nodes",
    "corr_count", "corr_total",
    "src_corr_points", "tgt_corr_points", "corr_scores",
    "gt_tgt_node_occ", "gt_src_node_occ",
)
# keys the reference evaluator loads but never uses — dumped as empty
# placeholders in c2f mode so the unchanged script still runs
C2F_PLACEHOLDERS = ("src_node_desc", "tgt_node_desc",
                    "src_point_desc", "tgt_point_desc")


def compact_corr(out: Dict, cap: int) -> Dict:
    """Device-side stable compaction of the fixed-capacity corr buffers.

    Valid entries move to the front IN ORIGINAL ORDER (argsort of the
    inverted mask is stable), so whenever the valid count fits `cap` the
    trimmed dump is bit-identical to dump_mode="full". `corr_total`
    carries the untruncated count for the host-side overflow warning.
    Handles a leading batch dim (packed forward) via vmap.
    """
    import jax.numpy as jnp

    def one(masks, src, tgt, scores):
        k = min(cap, masks.shape[0])
        order = jnp.argsort(jnp.logical_not(masks), stable=True)[:k]
        total = jnp.sum(masks.astype(jnp.int32))
        return {
            "src_corr_points": src[order],
            "tgt_corr_points": tgt[order],
            "corr_scores": scores[order],
            "corr_total": total,
            "corr_count": jnp.minimum(total, k),
        }

    fn = jax.vmap(one) if out["corr_masks"].ndim == 2 else one
    res = dict(out)
    res.update(fn(out["corr_masks"], out["src_corr_points"],
                  out["tgt_corr_points"], out["corr_scores"]))
    return res


def fetch_outputs(out: Dict, keys=DUMP_KEYS) -> Dict[str, np.ndarray]:
    """One batched D2H transfer of the dump-relevant output subset."""
    return jax.device_get({k: out[k] for k in keys})


def trim_outputs(out: Dict, pair, metric_index=None) -> Dict[str, np.ndarray]:
    """Slice fixed-capacity buffers down to valid entries (host side)."""
    sc = int(out["src_count"])
    tc = int(out["tgt_count"])
    snc = int(out["src_node_count"])
    tnc = int(out["tgt_node_count"])

    if "src_point_feats" not in out:  # dump_mode="c2f" (compact_corr applied)
        cc = int(out["corr_count"])
        total = int(out["corr_total"])
        if total > cc:
            import warnings

            warnings.warn(
                f"dump_mode='c2f': {total} valid correspondences truncated "
                f"to dump_corr_cap={cc}; raise cfg.dump_corr_cap")
        data = {
            "src_raw_pcd": np.asarray(pair.src_raw_points)[:sc],
            "src_pcd": np.asarray(out["src_points"])[:sc],
            "tgt_pcd": np.asarray(out["tgt_points"])[:tc],
            "src_nodes": np.asarray(out["src_nodes"])[:snc],
            "tgt_nodes": np.asarray(out["tgt_nodes"])[:tnc],
            "src_corr_pts": np.asarray(out["src_corr_points"])[:cc],
            "tgt_corr_pts": np.asarray(out["tgt_corr_points"])[:cc],
            "confidence": np.asarray(out["corr_scores"])[:cc],
            "gt_tgt_node_occ": np.asarray(out["gt_tgt_node_occ"])[:tnc],
            "gt_src_node_occ": np.asarray(out["gt_src_node_occ"])[:snc],
            "rot": np.asarray(pair.rot),
            "trans": np.asarray(pair.trans),
        }
        for k in C2F_PLACEHOLDERS:
            data[k] = np.zeros((0,), np.float32)
        if metric_index is not None:
            data["metric_index_list"] = np.asarray(metric_index)
        return data

    cmask = np.asarray(out["corr_masks"])

    data = {
        "src_raw_pcd": np.asarray(pair.src_raw_points)[:sc],
        "src_pcd": np.asarray(out["src_points"])[:sc],
        "tgt_pcd": np.asarray(out["tgt_points"])[:tc],
        "src_nodes": np.asarray(out["src_nodes"])[:snc],
        "tgt_nodes": np.asarray(out["tgt_nodes"])[:tnc],
        "src_node_desc": np.asarray(out["src_node_feats"])[:snc],
        "tgt_node_desc": np.asarray(out["tgt_node_feats"])[:tnc],
        "src_point_desc": np.asarray(out["src_point_feats"])[:sc],
        "tgt_point_desc": np.asarray(out["tgt_point_feats"])[:tc],
        "src_corr_pts": np.asarray(out["src_corr_points"])[cmask],
        "tgt_corr_pts": np.asarray(out["tgt_corr_points"])[cmask],
        "confidence": np.asarray(out["corr_scores"])[cmask],
        "gt_tgt_node_occ": np.asarray(out["gt_tgt_node_occ"])[:tnc],
        "gt_src_node_occ": np.asarray(out["gt_src_node_occ"])[:snc],
        "rot": np.asarray(pair.rot),
        "trans": np.asarray(pair.trans),
    }
    if metric_index is not None:
        data["metric_index_list"] = np.asarray(metric_index)
    return data


def dump_pair(path_base: str, data: Dict[str, np.ndarray]):
    try:
        import torch

        torch.save(
            # copy: numpy views of jax buffers are read-only and torch warns
            {k: torch.from_numpy(np.array(v, copy=True)) for k, v in data.items()},
            path_base + ".pth",
        )
    except ImportError:
        np.savez(path_base + ".npz", **data)


class Tester:
    """Test-split inference loop dumping per-pair files
    (reference lib/tester.py:19-69).

    With cfg.dp_size > 1 the pair stream is sharded over a `data` device
    mesh — one pair per device per step (the inner vmap axis is size 1 per
    shard, the pattern the train step uses; batching the encoder itself is
    a measured 4.7x loss). Same-bucket pairs are grouped so each mesh step
    runs one compiled program; the ragged tail is padded by repeating the
    last pair and the padding is never dumped. Dumps are bit-identical to
    the single-device loop (tests/test_eval.py)."""

    def __init__(self, cfg: Config, dataset=None, params=None):
        from roitr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        self.snapshot_dir = os.path.join("snapshot", cfg.exp_dir, cfg.benchmark)
        os.makedirs(self.snapshot_dir, exist_ok=True)
        self.dataset = dataset if dataset is not None else get_dataset(cfg, "test")
        self.model = RoITr(cfg)
        if params is None:
            if not cfg.pretrain:
                raise ValueError("Tester needs cfg.pretrain or explicit params")
            restored = load_checkpoint(cfg.pretrain)
            params = restored["params"] if "params" in restored else restored
        self.params = params
        self.dp = max(int(getattr(cfg, "dp_size", 1) or 1), 1)

        # cfg.device_prep: the dataset ships zero-normal, pyramid-free pairs
        # and the jitted program rebuilds both (VERDICT r4 #2 — the host
        # pipeline was ~1 s/pair of prep for ~4 ms of device compute on this
        # 1-core host; the reference hides the same cost in DataLoader
        # workers, lib/tester.py:19-69 via main.py:113-127)
        dev_prep = bool(getattr(cfg, "device_prep", False))
        dump_mode = getattr(cfg, "dump_mode", "full") or "full"
        if dump_mode not in ("full", "c2f"):
            raise ValueError(f"dump_mode must be 'full' or 'c2f', got {dump_mode!r}")
        self.fetch_keys = DUMP_KEYS if dump_mode == "full" else C2F_KEYS

        def apply_one(p, x):
            if dev_prep:
                from roitr_tpu.ops.pyramid import device_prep_packed, device_prep_pair

                x = (device_prep_packed(x, cfg) if x.src_count.ndim
                     else device_prep_pair(x, cfg))
            out = self.model.apply({"params": p}, x, train=False)
            if dump_mode == "c2f":
                out = compact_corr(out, int(getattr(cfg, "dump_corr_cap", 16384)))
            return out

        if self.dp > 1:
            from roitr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

            self.mesh = make_mesh(self.dp)
            rep, bsh = replicated(self.mesh), batch_sharding(self.mesh)
            self._fwd_sharded = jax.jit(
                lambda p, xs: jax.vmap(lambda x: apply_one(p, x), in_axes=0)(xs),
                in_shardings=(rep, bsh),
                out_shardings=bsh,
            )
            self.params = jax.device_put(self.params, rep)
        # one jit cache entry per bucket size (single-device path + dp tail)
        self._fwd = jax.jit(apply_one)

    def _items(self, n):
        pool = None
        workers = min(getattr(self.cfg, "num_workers", 0), os.cpu_count() or 1)
        if workers > 1 and n > 1:
            # overlap host preprocessing with device inference (reference
            # parity: num_workers DataLoader, main.py:113-127)
            from roitr_tpu.data.worker_pool import WorkerPool

            pool = WorkerPool(self.dataset, workers)
            return pool, pool.imap(range(n))
        return None, (self.dataset[i] for i in range(n))

    def _dump(self, idx, item, pair, out):
        data = trim_outputs(out, pair, metric_index=item.get("metric_index"))
        dump_pair(os.path.join(self.snapshot_dir, str(idx)), data)

    def test(self):
        """Inference loop. The D2H fetch + trim + file dump run on ONE
        worker thread (bounded queue): the fetch is the tunnel-bandwidth
        floor (~172 ms/pair at the 2048 bucket — see DUMP_KEYS), so the
        main thread's per-item host prep and the next dispatch overlap it
        instead of serializing after it. Dumps are bit-identical to the
        serial loop (same fetch_outputs values, tests/test_eval.py)."""
        import queue
        import threading

        n = len(self.dataset)
        t0_wall = time.perf_counter()
        pool, items = self._items(n)
        # packed batching: cfg.packed_batch groups batch_size same-bucket
        # pairs into ONE flat packed program per mesh shard (data/packing.py)
        pack = max(int(getattr(self.cfg, "batch_size", 1) or 1), 1) \
            if getattr(self.cfg, "packed_batch", False) else 1
        dev_prep = bool(getattr(self.cfg, "device_prep", False))
        if pack > 1 and not (self.cfg.host_pyramid or dev_prep):
            raise ValueError("packed_batch requires host_pyramid or device_prep")

        dq: queue.Queue = queue.Queue(maxsize=2)  # bounds live device outputs
        errors: list = []

        def worker():
            while True:
                job = dq.get()
                try:
                    if job is None:
                        return
                    entries, outs, flatten = job
                    fetched = fetch_outputs(outs, self.fetch_keys)  # ONE batched D2H
                    if flatten:  # (D, B, ...) -> flat pair-major (D*B, ...)
                        fetched = {k: v.reshape((-1,) + v.shape[2:])
                                   for k, v in fetched.items()}
                    for idx, item, pair, i in entries:
                        o = fetched if i is None else \
                            {k: v[i] for k, v in fetched.items()}
                        self._dump(idx, item, pair, o)
                except Exception as e:
                    errors.append(e)
                finally:
                    dq.task_done()

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()

        def submit(entries, outs, flatten=False):
            if errors:
                raise errors[0]
            dq.put((entries, outs, flatten))

        if self.dp > 1 or pack > 1:
            from roitr_tpu.data.packing import pack_pairs
            from roitr_tpu.data.synthetic import stack_pairs

            group_size = self.dp * pack
            pending: Dict[int, list] = {}  # bucket -> [(idx, item, pair)]

            def run_group(group):
                real = len(group)
                while len(group) < group_size:  # pad tail by repeating the last
                    group = group + [group[-1]]
                pairs = [g[2] for g in group]
                if pack > 1:
                    shards = [
                        pack_pairs(pairs[i : i + pack],
                                   require_pyramids=not dev_prep)
                        for i in range(0, group_size, pack)
                    ]
                else:
                    shards = pairs
                if self.dp > 1:
                    batch = stack_pairs(shards)
                    with self.mesh:
                        outs = self._fwd_sharded(self.params, batch)
                else:
                    outs = self._fwd(self.params, shards[0])
                submit([(idx, item, pair, i)
                        for i, (idx, item, pair) in enumerate(group[:real])],
                       outs, flatten=(self.dp > 1 and pack > 1))

            for idx, item in enumerate(items):
                pair = dict_to_pair(item)
                bucket = pair.src_points.shape[0]
                pending.setdefault(bucket, []).append((idx, item, pair))
                if len(pending[bucket]) == group_size:
                    run_group(pending.pop(bucket))
            for group in pending.values():
                if group:
                    run_group(group)
        else:
            for idx, item in enumerate(items):
                pair = dict_to_pair(item)
                out = self._fwd(self.params, pair)  # async dispatch
                submit([(idx, item, pair, None)], out)

        dq.put(None)
        dq.join()
        thread.join()
        if errors:
            raise errors[0]
        if pool is not None:
            pool.close()
        if n:
            wall = time.perf_counter() - t0_wall
            print(f"tested {n} pairs, {wall / n:.3f}s/pair "
                  f"(wall incl. compile + fetch + dumps)")


def get_trainer(cfg: Config):
    """Mode dispatch (reference lib/tester.py:78-88)."""
    from roitr_tpu.train.trainer import Trainer

    if cfg.mode in ("train", "val"):
        return Trainer(cfg)
    return Tester(cfg)
