"""Measure the REAL reference's forward wall time on this host's CPU.

VERDICT r4 next #5: bench.py's `vs_baseline` divides by an ASSUMED GPU
figure (the reference publishes no throughput numbers anywhere —
BASELINE.md). The only measurable anchor in this environment is the real
reference network run on this host's single CPU core via the faithful
pure-torch pointops harness (tests/reference_oracle.py — the same code the
at-scale parity suite executes). This tool times that forward at the
2048 and 16384 operating points so BASELINE.md carries MEASURED anchor
rows at both production buckets.

Matches reference lib/tester.py:29-69 semantics: eval-mode forward incl.
the GT analysis stage (the reference's test loop computes it too).

Usage: python tools/bench_reference_cpu.py [n_points ...]  (default 2048 16384)
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def bench(n_points, reps):
    import torch

    from reference_oracle import install_reference, make_ref_config
    from roitr_tpu.config import Config
    from roitr_tpu.data.preprocess import estimate_normals_np, normal_redirect_np
    from roitr_tpu.data.synthetic import make_pair_arrays

    cfg = Config(benchmark="3DMatch", sinkhorn_iters=100)
    bucket = n_points
    rng = np.random.RandomState(7)
    arr = make_pair_arrays(rng, bucket, n_points - 128, n_points - 256)
    n, m = int(arr["src_count"]), int(arr["tgt_count"])
    view = np.zeros(3, np.float32)
    sn = normal_redirect_np(
        arr["src_raw_points"][:n], estimate_normals_np(arr["src_raw_points"][:n], 33), view)
    tn = normal_redirect_np(
        arr["tgt_points"][:m], estimate_normals_np(arr["tgt_points"][:m], 33), view)

    riga = install_reference()
    torch.manual_seed(0)
    model = riga.create_model(make_ref_config(cfg)).eval()

    t = lambda a: torch.from_numpy(np.ascontiguousarray(a).copy()).float()
    args = (
        t(arr["src_points"][:n]), t(arr["tgt_points"][:m]),
        torch.ones(n, 1), torch.ones(m, 1),
        t(sn), t(tn), t(arr["rot"]), t(arr["trans"]),
        t(arr["src_raw_points"][:n]),
    )
    with torch.no_grad():
        model(*args)  # warm (allocator, thread pools)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        with torch.no_grad():
            model(*args)
        times.append(time.perf_counter() - t0)
    return times


def main():
    import torch

    buckets = [int(a) for a in sys.argv[1:]] or [2048, 16384]
    print(f"torch {torch.__version__}, threads={torch.get_num_threads()}, "
          f"host cores={os.cpu_count()}")
    for n_points in buckets:
        reps = 3 if n_points <= 4096 else 2
        times = bench(n_points, reps)
        best = min(times)
        print(
            f"reference RIGA_v2 torch-CPU forward N={n_points:6d}: "
            f"min {best:7.2f} s  ({1.0 / best:.4f} pairs/s)  reps={[round(x, 2) for x in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
