"""Probe: how does the production forward scale BELOW the 2048 bucket?

If time/pair flattens as N shrinks, the small-bucket regime is dominated by
per-op fixed costs (dispatch + DMA setup + sub-tile ops), and batching B
pairs per program (segment-flattened, not vmapped) would amortize them.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import bench

    bench.setup_cache()
    from roitr_tpu.config import Config

    prod = dict(sinkhorn_iters=100, host_pyramid=True, knn_method="approx")
    for bucket in (512, 1024, 2048, 4096):
        cfg = Config(benchmark="3DMatch", **prod)
        fwd, params, pair, fence = bench.build_forward(bucket, cfg)
        t0 = time.perf_counter()
        pps = bench.bench_point(fwd, params, pair, fence, iters=30)
        print(
            f"bucket {bucket:5d}: {1e3 / pps:7.2f} ms/pair ({pps:6.1f} pairs/s)"
            f"  [meas+compile wall {time.perf_counter() - t0:.0f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
