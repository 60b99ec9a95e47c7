"""Break down the sustained Tester's per-pair second (round 5).

BENCH_r05 preview: sustained_tester ~1.04 s/pair with device_prep — the
host-prep theory (VERDICT r4 #2) is dead; prep moved on-device and the line
did not move. Hypothesis: the per-pair cost is the OUTPUT FETCH — the
Tester `np.asarray`s every leaf of the forward's output tree, paying the
~33 ms tunnel RTT per leaf plus the full padded payload at ~50 MB/s.

Measures, at the 2048 bucket with device_prep:
  1. leaves + bytes of the output tree
  2. dispatch-only time (async enqueue)
  3. fetch-everything time (the Tester's current np.asarray tree)
  4. fetch-dump-subset time (only the keys trim_outputs reads)
  5. single-buffer fetch: one concatenated f32 bundle of the dump subset
  6. pipelined single-buffer: dispatch i+1 before fetching i

Usage: python tools/probe_tester_fetch.py [bucket]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKET = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

DUMP_KEYS = [
    # trim_outputs reads these from the forward output (+ pair-side arrays)
    "src_count", "tgt_count", "src_node_count", "tgt_node_count",
    "corr_masks", "src_points", "tgt_points", "src_nodes", "tgt_nodes",
    "src_node_feats", "tgt_node_feats", "src_point_feats", "tgt_point_feats",
    "src_corr_points", "tgt_corr_points", "corr_scores",
    "gt_tgt_node_occ", "gt_src_node_occ",
]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from bench import make_inputs
    from roitr_tpu.config import Config
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.ops.pyramid import device_prep_pair

    cfg = Config(benchmark="3DMatch", buckets=(BUCKET,), sinkhorn_iters=100,
                 device_prep=True, host_pyramid=False, knn_method="approx")
    pair = make_inputs(BUCKET, cfg)
    model = RoITr(cfg)

    def apply_one(p, x):
        return model.apply({"params": p}, device_prep_pair(x, cfg), train=False)

    params = jax.jit(
        lambda p: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            p, train=False)
    )(pair)["params"]
    fwd = jax.jit(apply_one)

    out = fwd(params, pair)
    leaves = jax.tree_util.tree_leaves(out)
    tot = sum(l.size * l.dtype.itemsize for l in leaves)
    sub = {k: out[k] for k in DUMP_KEYS}
    sub_leaves = jax.tree_util.tree_leaves(sub)
    sub_tot = sum(l.size * l.dtype.itemsize for l in sub_leaves)
    print(f"output tree: {len(leaves)} leaves, {tot / 1e6:.1f} MB "
          f"| dump subset: {len(sub_leaves)} leaves, {sub_tot / 1e6:.1f} MB",
          flush=True)

    # jitted bundle: dump subset as ONE flat f32 buffer (one D2H transfer)
    def apply_bundle(p, x):
        o = apply_one(p, x)
        return jnp.concatenate(
            [o[k].astype(jnp.float32).ravel() for k in DUMP_KEYS])

    fwd_b = jax.jit(apply_bundle)
    bundle = fwd_b(params, pair)
    print(f"bundle: {bundle.size * 4 / 1e6:.1f} MB", flush=True)

    def timeit(label, fn, reps=6):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:38s}: {dt * 1e3:8.1f} ms", flush=True)
        return dt

    # 2. dispatch only (async) — fence once after to not poison next timing
    def dispatch_only():
        fwd(params, pair)
    timeit("dispatch only (async)", dispatch_only)
    np.asarray(fwd(params, pair)["src_count"])  # drain

    # 3. the Tester's current fetch: np.asarray the whole tree
    def fetch_all():
        o = fwd(params, pair)
        jax.tree_util.tree_map(np.asarray, o)
    timeit("fwd + np.asarray WHOLE tree", fetch_all, reps=3)

    # 4. fetch only the dump subset (still per-leaf)
    def fetch_subset():
        o = fwd(params, pair)
        for k in DUMP_KEYS:
            np.asarray(o[k])
    timeit("fwd + per-leaf fetch of dump subset", fetch_subset, reps=3)

    # 4b. device_get of the subset in one call (may batch transfers)
    def fetch_subset_devget():
        o = fwd(params, pair)
        jax.device_get({k: o[k] for k in DUMP_KEYS})
    timeit("fwd + jax.device_get(dump subset)", fetch_subset_devget, reps=3)

    # 5. single-buffer bundle fetch
    def fetch_bundle():
        np.asarray(fwd_b(params, pair))
    timeit("fwd + single-bundle fetch", fetch_bundle, reps=3)

    # 6. pipelined bundle: dispatch all, fetch in order
    N = 8
    t0 = time.perf_counter()
    handles = [fwd_b(params, pair) for _ in range(N)]
    for h in handles:
        np.asarray(h)
    dt = (time.perf_counter() - t0) / N
    print(f"{'pipelined bundle (dispatch-all) x8':38s}: {dt * 1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
