"""Stage-wise latency breakdown of the production 32k forward (one chip).

Times jitted sub-programs independently (params-independent, so standalone
inits are fine) to locate the remaining hotspots after host_pyramid +
approx kNN. Pipelined timing, host-fetch fence (CLAUDE.md).

Usage: python tools/profile_stages.py [bucket]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKET = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
ITERS = 8


def timeit(fn, fence, *args):
    fence(fn(*args))  # compile
    fence(fn(*args))  # warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    fence(outs[-1])
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from roitr_tpu.config import Config
    from roitr_tpu.models.backbone import RIPointTransformer
    from roitr_tpu.models.roitr import RoITr
    from bench import make_inputs

    cfg = Config(benchmark="3DMatch", sinkhorn_iters=100,
                 host_pyramid=True, knn_method="approx")
    pair = make_inputs(BUCKET, cfg)

    results = {}

    # full pipeline
    model = RoITr(cfg)
    params = jax.jit(lambda p: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        p, train=False))(pair)["params"]
    full = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
    results["full"] = timeit(full, lambda o: float(o["matching_scores"].sum()), params, pair)

    serving = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False, with_gt=False))
    results["serving (with_gt=False)"] = timeit(
        serving, lambda o: float(o["matching_scores"].sum()), params, pair)

    # backbone alone
    bb = RIPointTransformer(
        transformer_blocks=tuple(cfg.transformer_architecture),
        factor=cfg.channel_factor, num_heads=cfg.num_heads,
        enc_blocks=tuple(cfg.enc_blocks), strides=tuple(cfg.enc_strides),
        nsample=tuple(cfg.enc_nsample), dtype=jnp.float32,
        knn_method=cfg.knn_method)

    def bb_apply(p, x):
        return bb.apply({"params": p}, x.src_raw_points, x.src_normals,
                        x.src_feats, x.src_count, x.tgt_points, x.tgt_normals,
                        x.tgt_feats, x.tgt_count, x.src_points,
                        src_pyramid=x.src_pyramid, tgt_pyramid=x.tgt_pyramid)

    bparams = jax.jit(lambda x: bb.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        x.src_raw_points, x.src_normals, x.src_feats, x.src_count,
        x.tgt_points, x.tgt_normals, x.tgt_feats, x.tgt_count, x.src_points,
        src_pyramid=x.src_pyramid, tgt_pyramid=x.tgt_pyramid))(pair)["params"]
    bbj = jax.jit(bb_apply)
    results["backbone"] = timeit(bbj, lambda o: float(o[1].sum()), bparams, pair)

    # partition alone (N x M argmin + top-K)
    from roitr_tpu.ops.partition import point_to_node_partition

    nodes = np.asarray(pair.src_points)[: BUCKET // 64]
    part = jax.jit(lambda pts, nds: point_to_node_partition(
        pts, jnp.asarray(nds), cfg.point_per_patch, pair.src_count,
        jnp.int32(len(nds))))
    results["partition (1 cloud)"] = timeit(
        part, lambda o: float(o.node_knn_indices.sum()), pair.src_points, nodes)

    # OT alone
    from roitr_tpu.ops.sinkhorn import log_sinkhorn_ot

    P, K = cfg.num_est_coarse_corr, cfg.point_per_patch
    rng = np.random.RandomState(0)
    sc = jnp.asarray(rng.randn(P, K, K).astype(np.float32))
    msk = jnp.ones((P, K), bool)
    ot = jax.jit(lambda s: log_sinkhorn_ot(s, msk, msk, jnp.float32(1.0),
                                           num_iter=cfg.sinkhorn_iters))
    results["sinkhorn OT (256,65,65) x100"] = timeit(ot, lambda o: float(o.sum()), sc)

    for k, v in results.items():
        print(f"{k:32s} {v * 1e3:8.1f} ms")
    resid = results["full"] - results["backbone"] - results["sinkhorn OT (256,65,65) x100"] \
        - 2 * results["partition (1 cloud)"]
    print(f"{'residual (GT corr/occ, matching, gathers)':42s} {resid * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
