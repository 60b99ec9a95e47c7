"""XLA compiler-option sweep for the 32k inference wall-vs-device gap.

PERFORMANCE.md: ~8-10 ms of the 52.9 ms 32k forward is gather-DMA stall
the default schedule cannot hide. Client-side XLA_FLAGS do NOT reach the
compiler on the axon tunnel backend (compilation happens server-side and
the client rejects unknown TPU flags), but per-compile `compiler_options`
pass through `.lower().compile()` — so each configuration is one extra
compile of the same program in one process. The JAX persistent cache keys
on compile options, so re-runs are warm.

Usage: python tools/exp_xla_flags.py [bucket] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPTION_SETS = {
    "baseline": {},
    "latency_hiding": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs+slack": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_memory_limit_slack_fraction": "0.95",
    },
    "all_experimental_sched": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_enable_experimental_fusion_cost_model": "true",
    },
}


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from bench import build_forward, setup_cache
    from roitr_tpu.config import Config

    setup_cache()
    cfg = Config(benchmark="3DMatch", sinkhorn_iters=100, host_pyramid=True,
                 knn_method="approx")
    fwd, params, pair, fence = build_forward(bucket, cfg)
    lowered = fwd.lower(params, pair)

    for name, opts in OPTION_SETS.items():
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = time.perf_counter() - t0
            fence(compiled(params, pair))  # warm
            fence(compiled(params, pair))
            t0 = time.perf_counter()
            outs = [compiled(params, pair) for _ in range(iters)]
            fence(outs[-1])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:28s} {1.0 / dt:8.3f} pairs/s  ({dt * 1e3:.2f} ms, "
                  f"compile {compile_s:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
