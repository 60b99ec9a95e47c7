"""A/B the fast fine-matching extraction on-chip, same session.

Measures the 4DMatch-2048 and 3DMatch-2048 production points with
matching.FAST_FINE_MATCHING off (round-3 exact-cap global top-k) and on
(row-top-k slots + flat bool gather), printing wall + device time for each.
Same process, serialized, so tunnel/session variance cancels.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main():
    from roitr_tpu.config import Config
    from roitr_tpu.models import matching

    bench.setup_cache()
    prod = dict(sinkhorn_iters=100, host_pyramid=True, knn_method="approx")
    points = [
        ("n2048_4dmatch", 2048, Config(benchmark="4DMatch", **prod), 10),
        ("n2048_production", 2048, Config(benchmark="3DMatch", **prod), 20),
    ]
    for fast in (False, True):
        matching.FAST_FINE_MATCHING = fast
        for tag, bucket, cfg, iters in points:
            fwd, params, pair, fence = bench.build_forward(bucket, cfg)
            pps = bench.bench_point(fwd, params, pair, fence, iters)
            line = {"tag": tag, "fast": fast,
                    "ms_per_pair": round(1e3 / pps, 3),
                    "pairs_per_sec": round(pps, 2)}
            line.update(bench.profile_utilization(fwd, params, pair, fence) or {})
            print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
