"""Bucketed batching + prefetching loader (host side).

Replaces the reference's torch DataLoader + offset-concatenating collate_fn
(dataset/common.py:50-126, dataset/dataloader.py): pairs padded to the same
bucket are stacked along a leading batch axis, ready to shard over the
`data` mesh axis.

Preprocessing (load -> augment -> kNN-33 normals -> pyramid) is pure
numpy/native-C++ and GIL-heavy, so with `num_workers > 0` it fans out to a
pool of worker processes (reference parity: torch DataLoader with
num_workers=8, main.py:113-127) — a single thread cannot feed an 8-shard
mesh at 30k points (~0.5-1 s/pair of host work vs ~5 pairs/s device
consumption). The pool is a dedicated subprocess pool (worker_pool.py) —
every multiprocessing start method is wrong in a JAX host process (fork:
deadlock risk on XLA's threads; spawn/forkserver: re-execute the caller's
__main__ in every child). Workers never touch a device (dataset __getitem__
is numpy/native-C++ only). A background thread then batches and prefetches
whatever source is active.

Per-host sharding replaces torch DistributedSampler: each JAX process
strides the index list by process_index (reference main.py:105-108).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # jax/flax import stays lazy: spawned loader workers
    from roitr_tpu.models.roitr import PairInputs  # import this module too



def dict_to_pair(d: Dict[str, np.ndarray]) -> "PairInputs":
    from roitr_tpu.models.roitr import PairInputs

    return PairInputs(
        src_points=d["src_points"],
        src_raw_points=d["src_raw_points"],
        src_normals=d["src_normals"],
        src_feats=d["src_feats"],
        src_count=d["src_count"],
        tgt_points=d["tgt_points"],
        tgt_normals=d["tgt_normals"],
        tgt_feats=d["tgt_feats"],
        tgt_count=d["tgt_count"],
        rot=d["rot"],
        trans=d["trans"],
        src_pyramid=d.get("src_pyramid"),
        tgt_pyramid=d.get("tgt_pyramid"),
    )


def stack_batch(items: List[PairInputs]) -> PairInputs:
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *items)


class BucketBatcher:
    """Groups same-bucket pairs into batches; flushes ragged remainders by
    repeating the last pair (masked duplicates are harmless for eval and
    negligible for training).

    With pack > 1, every `pack` consecutive pairs are packed into ONE flat
    packed PairInputs (data/packing.py) before stacking — batch_size must
    then be a multiple of pack (batch_size // pack packed batches per step,
    one per data-parallel shard)."""

    def __init__(self, batch_size: int, pack: int = 0):
        if pack and batch_size % pack != 0:
            raise ValueError(f"batch_size {batch_size} not a multiple of pack {pack}")
        self.batch_size = batch_size
        self.pack = pack
        self._pending: Dict[int, List[PairInputs]] = {}

    def _emit(self, pend: List[PairInputs]) -> PairInputs:
        if self.pack and self.pack > 1:
            from roitr_tpu.data.packing import pack_pairs

            packed = [
                pack_pairs(pend[i : i + self.pack])
                for i in range(0, len(pend), self.pack)
            ]
            return stack_batch(packed)
        return stack_batch(pend)

    def add(self, pair: PairInputs) -> Optional[PairInputs]:
        bucket = pair.src_points.shape[0]
        pend = self._pending.setdefault(bucket, [])
        pend.append(pair)
        if len(pend) == self.batch_size:
            self._pending[bucket] = []
            return self._emit(pend)
        return None

    def flush(self) -> List[PairInputs]:
        out = []
        for bucket, pend in self._pending.items():
            if pend:
                while len(pend) < self.batch_size:
                    pend.append(pend[-1])
                out.append(self._emit(pend))
        self._pending = {}
        return out


def iterate_batches(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    process_index: int = 0,
    process_count: int = 1,
    max_items: Optional[int] = None,
    prefetch: int = 2,
    num_workers: int = 0,
    pack: int = 0,
) -> Iterator[PairInputs]:
    """Yield stacked PairInputs batches, prefetched on a background thread.

    num_workers > 0 preprocesses items in that many forked worker processes
    (ordered imap, chunksize 1); 0 keeps everything in this process.
    pack > 1 packs every `pack` pairs into one flat packed batch before
    stacking (see BucketBatcher)."""
    indices = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(indices)
    indices = indices[process_index::process_count]
    if max_items is not None:
        indices = indices[:max_items]

    pool = None
    if num_workers > 0 and len(indices) > 0:
        from roitr_tpu.data.worker_pool import WorkerPool

        pool = WorkerPool(dataset, num_workers)
        items = pool.imap([int(i) for i in indices])
    else:
        items = (dataset[int(i)] for i in indices)

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        batcher = BucketBatcher(batch_size, pack=pack)
        try:
            for item in items:
                if stop.is_set():
                    return
                batch = batcher.add(dict_to_pair(item))
                if batch is not None:
                    q.put(batch)
            for batch in batcher.flush():
                q.put(batch)
        finally:
            q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
    finally:
        stop.set()
        if pool is not None:
            pool.close()
