"""Probe: lax.map program-batching vs pipelined single-pair dispatch.

The small-bucket forward has a ~2.2 ms fixed pool (tools/
probe_small_buckets.py); part of it is host dispatch that one program
running B pairs sequentially (lax.map) amortizes away. Measures ms/pair
for B in {1, 4, 8, 16} at the production 2048 bucket.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import bench

    bench.setup_cache()
    import jax
    import jax.numpy as jnp

    from roitr_tpu.config import Config
    from roitr_tpu.data.synthetic import stack_pairs
    from roitr_tpu.models.roitr import RoITr

    bucket = 2048
    cfg = Config(benchmark="3DMatch", sinkhorn_iters=100, host_pyramid=True,
                 knn_method="approx")
    fwd, params, pair, fence = bench.build_forward(bucket, cfg)
    pps = bench.bench_point(fwd, params, pair, fence, iters=30)
    print(f"B= 1 pipelined: {1e3 / pps:6.2f} ms/pair ({pps:6.1f} pairs/s)", flush=True)

    model = RoITr(cfg)
    for b in (4, 8, 16):
        batch = stack_pairs([pair] * b)

        @jax.jit
        def bfwd(p, xb):
            return jax.lax.map(
                lambda x: model.apply({"params": p}, x, train=False)["matching_scores"],
                xb,
            )

        def bfence(out):
            return float(out.sum())

        bfence(bfwd(params, batch))  # compile
        bfence(bfwd(params, batch))  # warm
        iters = max(30 // b, 4)
        t0 = time.perf_counter()
        outs = [bfwd(params, batch) for _ in range(iters)]
        bfence(outs[-1])
        dt = (time.perf_counter() - t0) / (iters * b)
        print(f"B={b:2d} lax.map:   {dt * 1e3:6.2f} ms/pair ({1.0 / dt:6.1f} pairs/s)",
              flush=True)


if __name__ == "__main__":
    main()
