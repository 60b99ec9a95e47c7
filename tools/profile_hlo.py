"""Op-level HLO breakdown of a jitted program on the real chip (xprof).

Captures a jax.profiler trace around N pipelined executions of the chosen
program (default: the production 32k backbone) and prints the top HLO ops
by self time from xprof's hlo_stats — the ground truth for where the
remaining milliseconds go (micro-benchmarks of single ops measure ~2 ms
dispatch overhead instead, CLAUDE.md).

Usage: python tools/profile_hlo.py [bucket] [program] [benchmark]
  program:   backbone | full | train | packed   (default backbone)
  benchmark: 3DMatch | 4DMatch                  (default 3DMatch)
"""

import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKET = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
PROGRAM = sys.argv[2] if len(sys.argv) > 2 else "backbone"
BENCHMARK = sys.argv[3] if len(sys.argv) > 3 else "3DMatch"
ITERS = 8


def build():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench import make_inputs
    from roitr_tpu.config import Config
    from roitr_tpu.models.backbone import RIPointTransformer
    from roitr_tpu.models.roitr import RoITr

    extra = {}
    if BENCHMARK == "4DMatch":
        # the SHIPPED 4D matching sizes (bench.py n2048_4dmatch /
        # configs/test/fdmatch.yaml) — Config defaults inflate matching 2x
        extra = dict(num_est_coarse_corr=128, fine_matching_topk=2)
    cfg = Config(benchmark=BENCHMARK, sinkhorn_iters=100,
                 host_pyramid=True, knn_method="approx", **extra)
    pair = make_inputs(BUCKET, cfg)

    if PROGRAM == "train":
        from roitr_tpu.data.synthetic import stack_pairs
        from roitr_tpu.parallel.train_step import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        batch = stack_pairs([pair])
        model = RoITr(cfg)
        tx = make_optimizer(cfg, steps_per_epoch=1000)
        state = create_train_state(cfg, model, pair, jax.random.PRNGKey(0), tx)
        step = jax.jit(make_train_step(cfg, model, tx))
        rng = jax.random.PRNGKey(1)

        holder = {"state": state}

        def fn():
            holder["state"], metrics = step(holder["state"], batch, rng)
            return metrics

        return (lambda *_: fn()), (), (lambda m: float(m["loss"]))

    if PROGRAM == "packed":
        from roitr_tpu.data.packing import pack_pairs

        B = 8
        pairs = [make_inputs(BUCKET, cfg, seed=100 + i) for i in range(B)]
        packed = jax.tree_util.tree_map(jnp.asarray, pack_pairs(pairs))
        model = RoITr(cfg)
        params = jax.jit(lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p, train=False))(pairs[0])["params"]
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
        fence = lambda o: float(o["matching_scores"].sum())
        return fn, (params, packed), fence

    if PROGRAM == "full":
        model = RoITr(cfg)
        params = jax.jit(lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p, train=False))(pair)["params"]
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))
        fence = lambda o: float(o["matching_scores"].sum())
        return fn, (params, pair), fence

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

    params = jax.jit(lambda x: bb.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        x.src_raw_points, x.src_normals, x.src_feats, x.src_count,
        x.tgt_points, x.tgt_normals, x.tgt_feats, x.tgt_count, x.src_points,
        src_pyramid=x.src_pyramid, tgt_pyramid=x.tgt_pyramid))(pair)["params"]
    fn = jax.jit(bb_apply)
    fence = lambda o: float(o[1].sum())
    return fn, (params, pair), fence


def main():
    import jax

    fn, args, fence = build()
    fence(fn(*args))  # compile
    fence(fn(*args))  # warm

    tmp = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tmp):
        outs = [fn(*args) for _ in range(ITERS)]
        fence(outs[-1])

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane under {tmp}"
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    data, _ = xspace_to_tool_data(files, "hlo_stats", {})
    import json

    tab = json.loads(data.decode() if isinstance(data, bytes) else data)
    ids = [c["id"] for c in tab["cols"]]
    rows = [dict(zip(ids, [c["v"] if c else None for c in r["c"]])) for r in tab["rows"]]
    tcol, ccol, ncol = "total_self_time", "category", "hlo_op_expression"
    rows.sort(key=lambda r: -float(r[tcol] or 0))
    total = sum(float(r[tcol] or 0) for r in rows)
    print(f"total device self-time: {total / ITERS / 1e3:.1f} ms/iter  ({len(rows)} ops)")
    print(f"{'us/iter':>9}  {'%':>5}  {'category':24s} expression")
    for r in rows[:35]:
        us = float(r[tcol] or 0) / ITERS
        print(f"{us:9.0f}  {100 * float(r[tcol]) / total:5.1f}  "
              f"{str(r[ccol] or '')[:24]:24s} {str(r[ncol] or '')[:110]}")

    # category rollup
    agg = {}
    for r in rows:
        agg[r[ccol]] = agg.get(r[ccol], 0) + float(r[tcol] or 0)
    print("\nby category (ms/iter):")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {str(k):32s} {v / ITERS / 1e3:8.2f}")


if __name__ == "__main__":
    main()
