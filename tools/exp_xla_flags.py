"""XLA flag sweep for the 32k inference wall-vs-device gap.

PERFORMANCE.md: ~8-10 ms of the 52.9 ms 32k forward is gather-DMA stall
the default schedule cannot hide. This sweeps scheduler/async-related XLA
flags in SUBPROCESSES (XLA_FLAGS is read at backend init, so each
configuration needs a fresh process) and reports pairs/s per flag set.

Usage: python tools/exp_xla_flags.py [bucket]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAG_SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "latency_hiding+mem": (
        "--xla_tpu_enable_latency_hiding_scheduler=true "
        "--xla_tpu_memory_limit_slack_fraction=0.95"
    ),
    "aggressive_fusion": "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
}

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from bench import build_forward, bench_point, setup_cache
from roitr_tpu.config import Config
setup_cache()
cfg = Config(benchmark="3DMatch", sinkhorn_iters=100, host_pyramid=True, knn_method="approx")
pps = bench_point(*build_forward({bucket}, cfg), 10)
print(f"RESULT {{pps:.3f}}")
"""


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + "/root/.axon_site" + os.pathsep + env.get("PYTHONPATH", "")
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        res = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO, bucket=bucket)],
            env=env, capture_output=True, text=True, timeout=1700,
        )
        line = [l for l in res.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            print(f"{name:24s} {line[0].split()[1]} pairs/s", flush=True)
        else:
            err = (res.stderr or "").strip().splitlines()
            print(f"{name:24s} FAILED: {err[-1][:120] if err else res.returncode}", flush=True)


if __name__ == "__main__":
    main()
