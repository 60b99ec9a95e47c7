"""A/B the FAST_FINE_MATCHING path inside the training forward (VERDICT r4 #1).

BENCH_r03 -> BENCH_r04 train steps regressed 27.0 -> 34.7 ms at 2048 and
178.1 -> 195.9 ms at 32k. Round 4 touched the fine-matching hot path
(models/matching.py FAST_FINE_MATCHING), which also runs under training.
This measures both variants in one process, several repetitions each, to
bound session noise on this shared 1-core host.

Usage: python tools/bisect_train_regression.py [bucket ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_bucket(bucket, iters, reps):
    import jax

    from bench import make_inputs
    from roitr_tpu.config import Config
    from roitr_tpu.data.synthetic import stack_pairs
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.parallel.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = Config(
        benchmark="3DMatch",
        sinkhorn_iters=100,
        host_pyramid=(bucket > 4096),
        knn_method="approx" if bucket > 4096 else "exact",
        iter_size=1,
    )
    pair = make_inputs(bucket, cfg)
    batch = stack_pairs([pair])

    model = RoITr(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, model, pair, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(cfg, model, tx))
    rng = jax.random.PRNGKey(1)

    state, m = step(state, batch, rng)  # compile
    float(m["loss"])
    state, m = step(state, batch, rng)  # warm
    float(m["loss"])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch, rng)
        loss = float(m["loss"])  # fence
        times.append((time.perf_counter() - t0) / iters)
    assert np.isfinite(loss)
    return times


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import roitr_tpu.models.matching as matching

    buckets = [int(a) for a in sys.argv[1:]] or [2048, 32768]
    for bucket in buckets:
        iters = 20 if bucket <= 4096 else 5
        reps = 5 if bucket <= 4096 else 4
        for fast in (True, False):
            matching.FAST_FINE_MATCHING = fast
            times = bench_bucket(bucket, iters, reps)
            ms = [t * 1e3 for t in times]
            print(
                f"train N={bucket:6d} fast={int(fast)}: "
                f"min {min(ms):7.2f}  med {sorted(ms)[len(ms)//2]:7.2f}  "
                f"max {max(ms):7.2f} ms/step  reps={ms}",
                flush=True,
            )


if __name__ == "__main__":
    main()
