"""Benchmark: flagship RoITr matching inference throughput on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Config: single 3DMatch-style pair inference at a 2048-point bucket
(BASELINE.json configs[0]), full pipeline — backbone, global transformer,
coarse matching, Sinkhorn OT (100 iters), fine matching.

`vs_baseline` is measured against an assumed CUDA-reference throughput of
10 pairs/sec for this workload (RoITr-class torch pipelines run ~100 ms/pair
at 2k points on an RTX 3090; the repo publishes no throughput numbers —
BASELINE.md). The north-star target is vs_baseline >= 5.
"""

import json
import time

import numpy as np

ASSUMED_BASELINE_PAIRS_PER_SEC = 10.0
BUCKET = 2048
ITERS = 20


def main():
    import jax

    from roitr_tpu.config import Config
    from roitr_tpu.data.synthetic import make_pair_inputs
    from roitr_tpu.models.roitr import RoITr

    cfg = Config(benchmark="3DMatch", sinkhorn_iters=100)
    rng = np.random.RandomState(0)
    pair = make_pair_inputs(rng, BUCKET, BUCKET - 128, BUCKET - 256)

    model = RoITr(cfg)
    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(pair)["params"]

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))

    # Throughput is measured pipelined: ITERS forwards are enqueued
    # asynchronously and fenced once by fetching a device-computed scalar
    # (on the axon tunnel backend block_until_ready returns early; a host
    # fetch is the only reliable fence, and the ~33 ms host<->device
    # round-trip would otherwise dominate a per-call measurement).
    def fence(out):
        return float(out["matching_scores"].sum())

    fence(fwd(params, pair))  # compile
    fence(fwd(params, pair))  # warmup

    t0 = time.perf_counter()
    outs = [fwd(params, pair) for _ in range(ITERS)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / ITERS
    pairs_per_sec = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "inference_pairs_per_sec_n2048",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/sec",
                "vs_baseline": round(pairs_per_sec / ASSUMED_BASELINE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
