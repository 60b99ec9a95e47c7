"""Benchmark: flagship RoITr matching inference throughput on one TPU chip.

Prints one JSON line per operating point, headline (production workload)
LAST: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Operating points:
- N=2048, defaults (fp32, exact kNN, device pyramid) — round-1 continuity.
- N=16384 and N=32768 with the measured-best levers (host-precomputed
  FPS/kNN pyramid + approx kNN: bit-parity / 99.6% recall, PERFORMANCE.md)
  — the production workload: real 3DMatch pairs run up to 30k points
  (reference dataset/tdmatch.py:41,72-78 caps at 30k).

`vs_baseline` is measured against an assumed CUDA-reference throughput
(the repo publishes none — BASELINE.md): 10 pairs/s at 2k points (RoITr-
class torch pipelines run ~100 ms/pair on an RTX 3090) and 2.5 pairs/s at
30k (the reference's kNN/FPS/attention chains scale superlinearly; ~400
ms/pair is generous to the reference). North-star: vs_baseline >= 5.

Timing is device-side steady-state, pipelined: ITERS forwards enqueued
asynchronously, fenced once by fetching a device scalar (block_until_ready
returns early on the axon tunnel; the ~33 ms host<->device RPC would
dominate per-call timing). Host preprocessing (normals + pyramid) is
overlapped by the loader's worker pool in production (data/loader.py).
"""

import json
import time

import numpy as np

ASSUMED_BASELINE = {2048: 10.0, 16384: 4.0, 32768: 2.5}  # pairs/sec


def setup_cache():
    # persistent compilation cache: driver re-runs skip 5-15 min compiles;
    # shared with main.py / Trainer / Tester / serving via the same helper
    from roitr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache("/root/repo/.jax_cache")


def make_inputs(bucket, cfg):
    import jax.numpy as jnp

    from roitr_tpu.data.pyramid import build_cloud_pyramid
    from roitr_tpu.data.synthetic import make_pair_inputs

    rng = np.random.RandomState(0)
    pair = make_pair_inputs(rng, bucket, bucket - 128, bucket - 256)
    if cfg.host_pyramid:
        src_pyr = build_cloud_pyramid(
            np.asarray(pair.src_raw_points), int(pair.src_count),
            strides=tuple(cfg.enc_strides), nsample=tuple(cfg.enc_nsample))
        tgt_pyr = build_cloud_pyramid(
            np.asarray(pair.tgt_points), int(pair.tgt_count),
            strides=tuple(cfg.enc_strides), nsample=tuple(cfg.enc_nsample))
        import jax

        pair = pair._replace(
            src_pyramid=jax.tree_util.tree_map(jnp.asarray, src_pyr),
            tgt_pyramid=jax.tree_util.tree_map(jnp.asarray, tgt_pyr),
        )
    return pair


def bench_point(bucket, cfg, iters):
    import jax

    from roitr_tpu.models.roitr import RoITr

    pair = make_inputs(bucket, cfg)
    model = RoITr(cfg)
    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p,
            train=False,
        )
    )(pair)["params"]
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))

    def fence(out):
        return float(out["matching_scores"].sum())

    fence(fwd(params, pair))  # compile
    fence(fwd(params, pair))  # warmup
    t0 = time.perf_counter()
    outs = [fwd(params, pair) for _ in range(iters)]
    fence(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def main():
    from roitr_tpu.config import Config

    setup_cache()
    points = [
        (2048, Config(benchmark="3DMatch", sinkhorn_iters=100), 20, "n2048_default"),
        (2048,
         Config(benchmark="3DMatch", sinkhorn_iters=100,
                host_pyramid=True, knn_method="approx"),
         30, "n2048_production"),
        (16384,
         Config(benchmark="3DMatch", sinkhorn_iters=100,
                host_pyramid=True, knn_method="approx"),
         10, "n16384_production"),
        (32768,
         Config(benchmark="3DMatch", sinkhorn_iters=100,
                host_pyramid=True, knn_method="approx"),
         10, "n32768_production"),
    ]
    for bucket, cfg, iters, tag in points:
        pps = bench_point(bucket, cfg, iters)
        print(
            json.dumps(
                {
                    "metric": f"inference_pairs_per_sec_{tag}",
                    "value": round(pps, 3),
                    "unit": "pairs/sec",
                    "vs_baseline": round(pps / ASSUMED_BASELINE[bucket], 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
