"""Measure packed-batch throughput on the TPU: inference at 2048/512 for
several B, and the packed train step. Compare with tools/
probe_small_buckets.py (single-pair) and probe_batch_modes.py (lax.map)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_packed_train(bucket, cfg, batch, iters):
    import jax

    import bench
    from roitr_tpu.data.packing import pack_pairs
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.parallel.train_step import (
        create_train_state, make_optimizer, make_train_step)

    pairs = [bench.make_inputs(bucket, cfg, seed=200 + i) for i in range(batch)]
    packed = jax.tree_util.tree_map(np.asarray, pack_pairs(pairs))
    pk_batch = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], packed)
    model = RoITr(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, model, pairs[0], jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(cfg, model, tx))
    rng = jax.random.PRNGKey(1)
    state, m = step(state, pk_batch, rng)
    assert np.isfinite(float(m["loss"]))
    state, m = step(state, pk_batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, pk_batch, rng)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    return dt


def main():
    import bench

    bench.setup_cache()
    from roitr_tpu.config import Config

    prod = dict(sinkhorn_iters=100, host_pyramid=True, knn_method="approx")

    for bucket, blist in ((2048, (4, 8, 16)), (512, (16,))):
        for b in blist:
            cfg = Config(benchmark="3DMatch", **prod)
            pps = bench.bench_packed(bucket, cfg, b, iters=max(32 // b, 4))
            print(f"packed inference n={bucket} B={b:2d}: "
                  f"{1e3 / pps:6.2f} ms/pair ({pps:7.1f} pairs/s)", flush=True)

    for b in (4, 8):
        cfg = Config(benchmark="3DMatch", **prod)
        dt = bench_packed_train(2048, cfg, b, iters=8)
        print(f"packed train     n=2048 B={b:2d}: {dt * 1e3 / b:6.2f} ms/pair "
              f"({dt * 1e3:6.1f} ms/step, {b / dt:5.1f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
