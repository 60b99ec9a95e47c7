"""Probe: sustained serving throughput, host-prep vs device-prep normals.

Round-3 finding (PERFORMANCE.md): sustained match_batch at the 512 bucket
is 21.84 ms/pair on this single-core host — ~20 ms of numpy normal
estimation + pyramid around 1.17 ms of device compute. prep="device"
(serving.Matcher) moves normal estimation into the jitted program; this
probe measures both modes end-to-end on the real chip, plus the host-prep
stage cost alone.

Run on TPU:  python tools/probe_serving_prep.py [n_pairs] [bucket]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    batch = 16

    import jax

    from roitr_tpu.config import Config
    from roitr_tpu.data.synthetic import make_surface_cloud
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.serving import Matcher
    from roitr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache("/root/repo/.jax_cache")
    cfg = Config(benchmark="3DMatch", buckets=(bucket,), host_pyramid=True,
                 knn_method="approx", sinkhorn_iters=100)

    rng = np.random.RandomState(7)
    from roitr_tpu.data.pyramid import build_cloud_pyramid
    from roitr_tpu.data.synthetic import make_pair_inputs

    pair = make_pair_inputs(rng, bucket, bucket - 17, bucket - 33)
    model = RoITr(cfg)
    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p, train=False)
    )(pair)["params"]

    clouds = [
        (make_surface_cloud(rng, bucket - 17), make_surface_cloud(rng, bucket - 33))
        for _ in range(n_pairs)
    ]

    # host prep stage cost alone (normals + pyramid + padding), per pair
    m_host = Matcher(cfg, params, prep="host")
    t0 = time.perf_counter()
    for src, tgt in clouds[:8]:
        m_host._prepare(src, tgt, None, None)
    prep_ms = (time.perf_counter() - t0) / 8 * 1e3
    print(f"host _prepare stage: {prep_ms:.2f} ms/pair")

    for prep in ("device", "host"):
        matcher = Matcher(cfg, params, prep=prep)
        out = matcher.match_batch(clouds[:batch], batch_size=batch)  # compile
        assert len(out) == batch
        t0 = time.perf_counter()
        out = matcher.match_batch(clouds, batch_size=batch)
        dt = (time.perf_counter() - t0) / n_pairs
        assert len(out) == n_pairs
        ncorr = float(np.mean([len(o["confidence"]) for o in out]))
        print(f"prep={prep}: {dt * 1e3:.2f} ms/pair sustained "
              f"({1.0 / dt:.1f} pairs/s), mean corr {ncorr:.0f}")


if __name__ == "__main__":
    main()
