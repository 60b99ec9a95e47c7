"""A/B the Sinkhorn OT backend inside the TRAINING step (round 5).

The lane-major Pallas kernel grew a custom VJP (on-core trajectory
recompute + reverse loop, ops/pallas/sinkhorn_kernel.py); training now
routes through it where `supported_shape_bwd` holds. This measures the
full jitted train step with sinkhorn_backend pallas vs xla in one process,
several repetitions each, plus a gradient agreement check on the first
step — the measured-delta + tolerance evidence VERDICT r4 #8 asks for.

Usage: python tools/probe_sinkhorn_train.py [bucket ...]   (default 2048 32768)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_bucket(cfg, bucket, iters, reps):
    import jax

    from bench import make_inputs
    from roitr_tpu.data.synthetic import stack_pairs
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.parallel.train_step import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    pair = make_inputs(bucket, cfg)
    batch = stack_pairs([pair])

    model = RoITr(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = create_train_state(cfg, model, pair, jax.random.PRNGKey(0), tx)
    step = jax.jit(make_train_step(cfg, model, tx))
    rng = jax.random.PRNGKey(1)

    state1, m = step(state, batch, rng)  # compile
    first_loss = float(m["loss"])
    state1, m = step(state1, batch, rng)  # warm
    float(m["loss"])
    times = []
    st = state1
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = step(st, batch, rng)
        loss = float(m["loss"])  # fence
        times.append((time.perf_counter() - t0) / iters)
    assert np.isfinite(loss)
    # params after one step, for cross-backend agreement
    p0 = jax.tree_util.tree_leaves(state1.params)
    flat = np.concatenate([np.asarray(x).ravel() for x in p0])
    return times, first_loss, flat


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from roitr_tpu.config import Config

    buckets = [int(a) for a in sys.argv[1:]] or [2048, 32768]
    for bucket in buckets:
        iters = 20 if bucket <= 4096 else 5
        reps = 5 if bucket <= 4096 else 4
        results = {}
        for backend in ("pallas", "xla"):
            cfg = Config(
                benchmark="3DMatch",
                sinkhorn_iters=100,
                host_pyramid=(bucket > 4096),
                knn_method="approx" if bucket > 4096 else "exact",
                iter_size=1,
                sinkhorn_backend=backend,
            )
            times, loss, flat = bench_bucket(cfg, bucket, iters, reps)
            ms = [t * 1e3 for t in times]
            results[backend] = flat
            print(
                f"train N={bucket:6d} ot={backend:6s}: "
                f"min {min(ms):7.2f}  med {sorted(ms)[len(ms)//2]:7.2f}  "
                f"max {max(ms):7.2f} ms/step  loss={loss:.5f}",
                flush=True,
            )
        d = np.abs(results["pallas"] - results["xla"])
        scale = np.abs(results["xla"]).max()
        print(
            f"  params after 1 step: max |pallas-xla| = {d.max():.3e} "
            f"(rel {d.max() / (scale + 1e-30):.3e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
