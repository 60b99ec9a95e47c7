"""Featherweight dataset for worker-pool throughput tests.

Lives in its own module (imports numpy only) so that unpickling it inside
a preprocessing worker doesn't drag the whole test module's import graph
(Config, scipy, the loader) into every worker — on a single-core CI host
those serialized imports would dominate the wall-clock the test budgets.
Production datasets are similarly lean (roitr_tpu/data/tdmatch.py imports
numpy + scipy only, never jax).
"""

import time

import numpy as np


class SlowDataset:
    """0.5 s of simulated preprocessing per item. sleep, not busy-wait: the
    CI host may have a single core, where CPU-bound speedup is impossible —
    the property the pool owns is concurrent dispatch/overlap, which sleep
    measures on any core count (real TPU hosts have 100+ cores for the
    CPU-bound part)."""

    def __len__(self):
        return 16

    def __getitem__(self, i):
        time.sleep(0.5)
        arr = np.full((16, 3), float(i), np.float32)
        return {
            "src_points": arr, "src_raw_points": arr, "src_normals": arr,
            "src_feats": arr[:, :1], "src_count": np.int32(16),
            "tgt_points": arr, "tgt_normals": arr, "tgt_feats": arr[:, :1],
            "tgt_count": np.int32(16), "rot": np.eye(3, dtype=np.float32),
            "trans": np.zeros((3, 1), np.float32),
        }
