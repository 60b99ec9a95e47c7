"""Training orchestration: epoch loop, metrics, per-best checkpoints.

Rebuilds reference lib/trainer.py:9-344 on the JAX stack: the jitted
data-parallel train step replaces forward/backward/optimizer.step, orbax
replaces torch.save snapshots, and a JSONL scalar stream replaces
tensorboardX. Multi-host: only process 0 logs/checkpoints (reference
rank-0 guards, trainer.py:41-51).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from roitr_tpu.config import Config
from roitr_tpu.data import get_dataset, iterate_batches
from roitr_tpu.models.roitr import RoITr
from roitr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from roitr_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from roitr_tpu.train.checkpoint import (
    init_best_metrics,
    load_checkpoint,
    save_checkpoint,
    update_bests,
)
from roitr_tpu.utils.logging import Logger, MetricMeters, ScalarWriter, Timer


class Trainer:
    def __init__(self, cfg: Config, train_dataset=None, val_dataset=None):
        from roitr_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        if cfg.packed_batch and not cfg.host_pyramid:
            raise ValueError("packed_batch requires host_pyramid (data/packing.py)")
        self.snapshot_dir = os.path.join("snapshot", cfg.exp_dir)
        self.ckpt_dir = os.path.join(self.snapshot_dir, "checkpoints")
        self.is_main = jax.process_index() == 0
        if self.is_main:
            os.makedirs(self.ckpt_dir, exist_ok=True)
            self.logger = Logger(self.snapshot_dir)
            self.writer = ScalarWriter(self.snapshot_dir)

        self.train_dataset = train_dataset or get_dataset(cfg, "train")
        self.val_dataset = val_dataset or get_dataset(cfg, "val")

        self.mesh = make_mesh(cfg.dp_size)
        self.model = RoITr(cfg)
        steps_per_epoch = min(len(self.train_dataset), cfg.training_max_iter)
        self.tx = make_optimizer(cfg, steps_per_epoch)

        # build state from one example pair
        example = self._example_pair()
        self.state = create_train_state(cfg, self.model, example, jax.random.PRNGKey(cfg.seed), self.tx)
        self.start_epoch = 0
        self.best_metrics = init_best_metrics()
        if cfg.pretrain:
            self._resume(cfg.pretrain)

        rep, bsh = replicated(self.mesh), batch_sharding(self.mesh)
        self._train_step = jax.jit(
            make_train_step(cfg, self.model, self.tx),
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep),
        )
        self._eval_step = jax.jit(
            make_eval_step(cfg, self.model), in_shardings=(rep, bsh), out_shardings=rep
        )
        self._rep = rep
        self.state = jax.device_put(self.state, rep)

    # ------------------------------------------------------------------
    def _example_pair(self):
        from roitr_tpu.data.loader import dict_to_pair

        return dict_to_pair(self.train_dataset[0])

    def _resume(self, path: str):
        restored = load_checkpoint(path, abstract_state=self.state)
        self.state = TrainState(
            step=restored["step"], params=restored["params"], opt_state=restored["opt_state"]
        )
        self.start_epoch = int(restored["epoch"]) + 1
        self.best_metrics.update({k: float(v) for k, v in restored["best_metrics"].items()})
        self._log(f"resumed from {path} at epoch {self.start_epoch}\n")

    def _log(self, text: str):
        if self.is_main:
            self.logger.write(text)

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        meters = MetricMeters()
        timer = Timer()
        rng = jax.random.PRNGKey(cfg.seed + epoch)
        batches = iterate_batches(
            self.train_dataset,
            batch_size=cfg.batch_size * self.mesh.size,
            shuffle=True,
            seed=cfg.seed + epoch,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            max_items=cfg.training_max_iter,
            # more workers than host cores is pure IPC overhead
            num_workers=min(cfg.num_workers, os.cpu_count() or 1),
            pack=cfg.batch_size if cfg.packed_batch else 0,
        )
        for it, batch in enumerate(batches):
            timer.tic()
            batch = shard_batch(self.mesh, batch)
            with self.mesh:
                self.state, metrics = self._train_step(self.state, batch, rng)
            metrics = {k: float(v) for k, v in metrics.items()}
            timer.toc()
            meters.update(metrics, n=int(np.prod(batch.rot.shape[:-2])))
            if self.is_main and cfg.verbose and (it + 1) % cfg.verbose_freq == 0:
                self._log(
                    f"epoch {epoch} iter {it + 1}: {meters.summary()}, "
                    f"{timer.avg:.3f}s/it\n"
                )
                # the reference's scalar stream records RUNNING AVERAGES
                # (lib/trainer.py:277-286 writes stats_meter .avg), which is
                # what convergence audits diff against — not the last
                # batch's instantaneous values
                self.writer.write("train", int(self.state.step), meters.averages())
        return meters.averages()

    def eval_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        meters = MetricMeters()
        batches = iterate_batches(
            self.val_dataset,
            batch_size=cfg.batch_size * self.mesh.size,
            shuffle=False,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            max_items=cfg.val_max_iter,
            # more workers than host cores is pure IPC overhead
            num_workers=min(cfg.num_workers, os.cpu_count() or 1),
            pack=cfg.batch_size if cfg.packed_batch else 0,
        )
        for batch in batches:
            batch = shard_batch(self.mesh, batch)
            with self.mesh:
                metrics = self._eval_step(self.state.params, batch)
            meters.update({k: float(v) for k, v in metrics.items()}, n=int(np.prod(batch.rot.shape[:-2])))
        avgs = meters.averages()
        if self.is_main:
            self._log(f"epoch {epoch} val: {meters.summary()}\n")
            self.writer.write("val", int(self.state.step), avgs)
        return avgs

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.max_epoch):
            t0 = time.time()
            train_metrics = self.train_epoch(epoch)
            self._log(
                f"epoch {epoch} train done in {time.time() - t0:.0f}s: "
                + ", ".join(f"{k}: {v:.4f}" for k, v in sorted(train_metrics.items()))
                + "\n"
            )
            val_metrics = self.eval_epoch(epoch)

            if self.is_main:
                improved = update_bests(self.best_metrics, val_metrics)
                save_checkpoint(
                    os.path.join(self.ckpt_dir, f"model_{epoch}"),
                    self.state,
                    epoch,
                    self.best_metrics,
                )
                for name, better in improved.items():
                    if better:
                        save_checkpoint(
                            os.path.join(self.ckpt_dir, f"model_best_{name}"),
                            self.state,
                            epoch,
                            self.best_metrics,
                        )
        return self.best_metrics

    def eval(self):
        return self.eval_epoch(self.start_epoch)
