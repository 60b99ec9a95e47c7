"""Probe: where does sustained match_batch's device-side wait go?

Round-4 profile (single host core, 512 bucket, B=16 packed, prep=device):
sustained 19.5 ms/pair = 6.3 ms host pyramid + 13.6 ms waiting on the
device fetch — yet the device-only packed forward benches at ~1.15 ms/pair.
Candidates for the missing ~12 ms/pair: (a) the segmented normal
estimation added by prep=device, (b) H2D transfer of the packed input
buffer through the ~33 ms-RTT tunnel, (c) D2H of the corr output.

This probe times each in isolation on the real chip. Every timing uses
DISTINCT host input buffers per iteration (a reused numpy buffer can hit
client-side transfer caching) and fences via a device-computed scalar
(block_until_ready returns early on the tunnel backend, CLAUDE.md).

Run on TPU:  python tools/probe_serving_breakdown.py [bucket] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8


def fence_arr(x):
    return float(np.asarray(x).ravel()[0])


def timed_pipelined(label, fns, fence=fence_arr):
    """fns: list of zero-arg dispatch thunks (one per iter). Dispatch all,
    fence the last; per-iter steady-state time."""
    out = fns[0]()  # warm
    fence(out)
    t0 = time.perf_counter()
    for f in fns[1:]:
        out = f()
    fence(out)
    dt = (time.perf_counter() - t0) / (len(fns) - 1) * 1e3
    print(f"{label}: {dt:.2f} ms/iter", flush=True)
    return dt


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    from roitr_tpu.config import Config
    from roitr_tpu.data.packing import pack_pairs
    from roitr_tpu.data.synthetic import make_pair_inputs, make_surface_cloud
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.serving import Matcher
    from roitr_tpu.utils.compile_cache import enable_persistent_cache
    from roitr_tpu.utils.packing import pack_host

    enable_persistent_cache("/root/repo/.jax_cache")
    cfg = Config(benchmark="3DMatch", buckets=(bucket,), host_pyramid=True,
                 knn_method="approx", sinkhorn_iters=100)

    rng = np.random.RandomState(7)
    pair0 = make_pair_inputs(rng, bucket, bucket - 17, bucket - 33)
    model = RoITr(cfg)
    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p, train=False)
    )(pair0)["params"]

    # ITERS distinct batches of clouds -> distinct packed buffers
    def make_batch_clouds():
        return [
            (make_surface_cloud(rng, bucket - 17), make_surface_cloud(rng, bucket - 33))
            for _ in range(batch)
        ]

    for est in ((False, False), (True, True)):
        dev = est[0]
        matcher = Matcher(cfg, params, prep="device" if dev else "host")
        packed_bufs = []
        for _ in range(ITERS):
            prepared = [matcher._prepare(s, t, None, None,
                                         device_pyramid=dev)[0]
                        for s, t in make_batch_clouds()]
            bp = pack_pairs(prepared, require_pyramids=not dev)
            fwd, spec, total = matcher._get_batch_fwd(
                bucket, batch, bp, "packed", est)
            packed_bufs.append(pack_host(bp, spec, total))
        print(f"packed input buffer: {packed_bufs[0].nbytes / 1e6:.2f} MB")

        # H2D alone, distinct buffers (fence: jitted scalar reduce of the
        # transferred buffer — fetching a raw slice trips the tunnel backend)
        import jax.numpy as jnp

        first_elt = jax.jit(lambda x: x[0])
        timed_pipelined(
            f"H2D packed est={est}",
            [lambda b=b: first_elt(jax.device_put(b)) for b in packed_bufs])

        # fwd from host numpy each call (the match_batch condition)
        dt = timed_pipelined(
            f"fwd est={est} (H2D each call)",
            [lambda b=b: fwd(params, b) for b in packed_bufs])
        # fwd from pre-staged device buffers (the bench.py condition)
        staged = [jax.device_put(b) for b in packed_bufs]
        fence_arr(staged[-1][:1])
        dt2 = timed_pipelined(
            f"fwd est={est} (pre-staged)",
            [lambda b=b: fwd(params, b) for b in staged])
        print(f"  -> per pair: H2D-each {dt / batch:.2f}, staged {dt2 / batch:.2f} ms")

    # segmented normals / device pyramid alone (distinct staged inputs)
    from roitr_tpu.ops.normals import estimate_normals_segmented
    from roitr_tpu.ops.pyramid import build_pyramids_packed

    seg = jax.jit(lambda p, c: estimate_normals_segmented(p, c, k=cfg.normal_knn))
    pyr = jax.jit(lambda p, c: build_pyramids_packed(
        p, c, strides=tuple(cfg.enc_strides), nsample=tuple(cfg.enc_nsample)))
    flats = []
    for _ in range(ITERS):
        prepared = [matcher._prepare(s, t, None, None, device_pyramid=True)[0]
                    for s, t in make_batch_clouds()]
        bp = pack_pairs(prepared, require_pyramids=False)
        flats.append((jax.device_put(np.asarray(bp.src_points)),
                      jax.device_put(np.asarray(bp.src_count))))
    timed_pipelined(
        "segmented normals alone (one flat side, staged)",
        [lambda a=a: seg(a[0], a[1]) for a in flats])
    timed_pipelined(
        "device pyramid alone (one flat side, staged)",
        [lambda a=a: pyr(a[0], a[1]).self_idx4 for a in flats])


if __name__ == "__main__":
    main()
