"""Training-step throughput on one chip (fwd + bwd + Adam, train=True).

The reference's real cost is 150 epochs x ~20k pairs of fwd+bwd
(lib/trainer.py:169-267); inference pairs/s alone understates the rebuild's
value. Times the full jitted train step (value_and_grad through the whole
pipeline incl. GT correspondence generation + optimizer update) at the
production operating points, pipelined with a host-fetch fence (CLAUDE.md).

Usage: python tools/bench_train.py [bucket ...]   (default: 2048 16384 32768)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_bucket(bucket, iters):
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

    def run_one(st):
        new_state, metrics = step(st, batch, rng)
        return new_state, metrics

    state, m = run_one(state)  # compile
    float(m["loss"])
    state, m = run_one(state)  # warm
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = run_one(state)
    loss = float(m["loss"])  # fence
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return dt, loss


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    buckets = [int(a) for a in sys.argv[1:]] or [2048, 16384, 32768]
    for bucket in buckets:
        iters = 10 if bucket <= 4096 else 5
        dt, loss = bench_bucket(bucket, iters)
        print(
            f"train_step N={bucket:6d}: {dt * 1e3:8.1f} ms/step "
            f"({1.0 / dt:6.2f} steps/s, loss={loss:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
