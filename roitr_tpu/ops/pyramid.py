"""Device-side construction of the backbone's geometric pyramid.

The host twin (data/pyramid.py) computes per-level FPS + kNN on the CPU so
the loader can overlap them with device compute — right for training, where
a worker pool hides the cost. A SERVING host has no such pool: the pyramid
is ~6 ms/pair of single-core numpy/C++ and its index tables are ~80% of the
packed H2D payload (2.83 MB/batch at the 512 bucket through a ~50 MB/s
tunnel — tools/probe_serving_breakdown.py). This module builds the same
pyramid INSIDE the jitted program from nothing but the padded points:

- FPS: the whole batch's 2B clouds run lockstep on sublanes of one Pallas
  chain (ops/pallas/fps_kernel.py) — the sequential pick latency is paid
exactly once for the batch (vmapped XLA fallback off-TPU).
- kNN: per-cloud masked_knn batched over B (distances + top_k vectorize
  cleanly; this is NOT the 4.7x-slower batched-neighborhood-gather
  pathology — no (B, N, K, C) gathers happen here).
- Indices are then offset per segment (b * level_capacity) into the packed
  flat layout, exactly like data/packing.py:pack_pyramids.

Semantics mirror data/pyramid.py row for row: seed-0 FPS over the valid
prefix, self-excluded kNN with the reference kernel's phantom index-0
padding (CLAUDE.md), 3-NN inverse-distance upsampling weights, and ZEROED
pad rows in every field (the host writes its valid-prefix results into
zeros-initialized buffers). Replaces the reference's CPU/CUDA
precompute+transfer design (functions/pointops.py furthestsampling/
knnquery) with an on-device one the tunnel never sees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from roitr_tpu.data.pyramid import CloudPyramid
from roitr_tpu.ops.fps import furthest_point_sampling
from roitr_tpu.ops.neighbors import masked_knn


def _row_mask(capacity: int, counts: jnp.ndarray) -> jnp.ndarray:
    """(B, capacity) bool: row rank < per-cloud valid count."""
    r = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    return r < counts[:, None].astype(jnp.int32)


def _fps_batched(pts: jnp.ndarray, counts: jnp.ndarray, m: int) -> jnp.ndarray:
    """(B, N, 3), (B,) -> (B, m) int32 FPS picks, all clouds lockstep."""
    from roitr_tpu.ops.pallas import fps_kernel

    if jax.default_backend() == "tpu" and fps_kernel.supported_n(pts.shape[1]):
        return fps_kernel.fps_pairs(pts, counts, m)
    return jax.vmap(furthest_point_sampling, in_axes=(0, 0, None))(pts, counts, m)


def build_pyramids_packed(
    points_flat: jnp.ndarray,  # (B*N, 3) packed same-bucket clouds
    counts: jnp.ndarray,  # (B,) valid rows per segment
    strides=(1, 4, 4, 4),
    nsample=(8, 16, 16, 16),
    method: str = "exact",
) -> CloudPyramid:
    """Build B clouds' pyramids on device, indices offset into the flat
    packed layout (drop-in for pack_pyramids(host build_cloud_pyramid))."""
    counts = jnp.asarray(counts, jnp.int32)
    b = counts.shape[0]
    pts = points_flat.reshape(b, -1, 3)

    knn = jax.vmap(
        lambda q, kkeys, kcnt, k, excl: masked_knn(
            q, kkeys, kcnt, k, exclude_self=excl, method=method)[0],
        in_axes=(0, 0, 0, None, None),
    )
    knn_d = jax.vmap(
        lambda q, kkeys, kcnt, k: masked_knn(q, kkeys, kcnt, k, method=method),
        in_axes=(0, 0, 0, None),
    )

    cur, cur_cnt = pts, counts
    fps_fields, cross_fields, self_fields, up_fields = {}, {}, {}, {}
    for lvl, (stride, k) in enumerate(zip(strides, nsample)):
        n = cur.shape[1]
        if stride != 1:
            m = n // stride
            idx = _fps_batched(cur, cur_cnt, m)  # (B, m)
            new_cnt = jnp.maximum(cur_cnt // stride, 1)
            # host zeroes picks past the per-cloud valid sample count
            # (greedy FPS prefixes are m-independent, so ranks below it agree)
            idx = jnp.where(_row_mask(m, new_cnt), idx, 0)
            fps_fields[f"fps_idx{lvl + 1}"] = idx
            new = jnp.take_along_axis(cur, idx[..., None], axis=1)

            # decoder 3-NN upsampling: parent queries -> sampled keys
            kk = min(3, m)
            up_i, up_d = knn_d(cur, new, new_cnt, kk)
            # clouds with fewer valid keys than columns: the host twin
            # edge-pads with the last VALID column's index at distance 1e10
            # (data/pyramid.py kk=min(3, len(new)) + edge pad); masked_knn
            # instead returns pad-key indices there — rewrite them
            col = jnp.arange(kk, dtype=jnp.int32)[None, None, :]
            nvalid = jnp.maximum(new_cnt, 1)[:, None, None]
            edge_col = jnp.broadcast_to(jnp.minimum(col, nvalid - 1), up_i.shape)
            up_i = jnp.take_along_axis(up_i, edge_col, axis=-1)
            up_d = jnp.where(col >= nvalid, 1e10, up_d)
            if kk < 3:
                up_i = jnp.concatenate(
                    [up_i, jnp.repeat(up_i[..., -1:], 3 - kk, axis=-1)], axis=-1)
                up_d = jnp.concatenate(
                    [up_d, jnp.full(up_d.shape[:-1] + (3 - kk,), 1e10,
                                    up_d.dtype)], axis=-1)
            recip = 1.0 / jnp.clip(up_d, min=1e-8)
            w = (recip / jnp.sum(recip, axis=-1, keepdims=True)).astype(jnp.float32)
            pmask = _row_mask(n, cur_cnt)[..., None]
            up_fields[f"up_idx{lvl + 1}"] = jnp.where(pmask, up_i, 0)
            up_fields[f"up_w{lvl + 1}"] = jnp.where(pmask, w, 0.0)
        else:
            m = n
            new, new_cnt = cur, cur_cnt

        nmask = _row_mask(m, new_cnt)[..., None]
        cross = knn(new, cur, cur_cnt, k, True)
        cross_fields[f"cross_idx{lvl + 1}"] = jnp.where(nmask, cross, 0)
        self_i = knn(new, new, new_cnt, k, True)
        self_fields[f"self_idx{lvl + 1}"] = jnp.where(nmask, self_i, 0)

        cur, cur_cnt = new, new_cnt

    # offset each field into the flat layout (pack_pyramids key-size table)
    sizes, cap = {}, pts.shape[1]
    for lvl, stride in enumerate(strides, start=1):
        cap //= stride
        sizes[lvl] = cap
    key_size = {
        "fps_idx2": sizes[1], "fps_idx3": sizes[2], "fps_idx4": sizes[3],
        "cross_idx1": sizes[1], "cross_idx2": sizes[1],
        "cross_idx3": sizes[2], "cross_idx4": sizes[3],
        "self_idx1": sizes[1], "self_idx2": sizes[2],
        "self_idx3": sizes[3], "self_idx4": sizes[4],
        "up_idx2": sizes[2], "up_idx3": sizes[3], "up_idx4": sizes[4],
    }
    fields = {**fps_fields, **cross_fields, **self_fields, **up_fields}
    out = {}
    for name, arr in fields.items():
        if name.startswith("up_w"):
            out[name] = arr.reshape((-1,) + arr.shape[2:])
            continue
        off = jnp.arange(b, dtype=jnp.int32) * key_size[name]
        shaped = off.reshape((b,) + (1,) * (arr.ndim - 1))
        out[name] = (arr + shaped).reshape((-1,) + arr.shape[2:]).astype(jnp.int32)
    return CloudPyramid(**out)


def device_prep_pair(pair, cfg, est=(True, True), pyramid=True):
    """In-program geometry prep for ONE padded pair: normals for the sides
    the caller didn't supply, plus both sides' exact FPS/kNN pyramids.

    The device twin of the host dataset prep (data/preprocess.py
    preprocess_pair: estimate_normals_np + build_cloud_pyramid) — pyramid
    indices are bitwise-equal to the host build (tests/test_device_pyramid),
    normals are certified against the numpy twin (tests/test_ops_normals).
    Source normals/pyramid come from the RAW source geometry, like the
    datasets (reference fdmatch.py:85-90, RIGA_v2.py:62). method="exact"
    regardless of cfg.knn_method so device prep never drifts from the host
    path (ADVICE r4 #1).
    """
    from roitr_tpu.ops.normals import estimate_normals

    k = cfg.normal_knn
    if est[0]:
        pair = pair._replace(
            src_normals=estimate_normals(pair.src_raw_points, pair.src_count, k=k))
    if est[1]:
        pair = pair._replace(
            tgt_normals=estimate_normals(pair.tgt_points, pair.tgt_count, k=k))
    if not pyramid:
        return pair
    build = lambda pts, cnt: build_pyramids_packed(
        pts, jnp.reshape(jnp.asarray(cnt, jnp.int32), (1,)),
        strides=tuple(cfg.enc_strides), nsample=tuple(cfg.enc_nsample),
        method="exact")
    return pair._replace(
        src_pyramid=build(pair.src_raw_points, pair.src_count),
        tgt_pyramid=build(pair.tgt_points, pair.tgt_count))


def device_prep_packed(pair, cfg, est=(True, True), pyramid=True):
    """device_prep_pair for a PACKED flat batch ((B*N, ...) leaves, (B,)
    counts) — segmented normals + batch pyramid build, indices offset into
    the flat layout (data/packing.py twin)."""
    from roitr_tpu.ops.normals import estimate_normals_segmented

    k = cfg.normal_knn
    if est[0]:
        pair = pair._replace(src_normals=estimate_normals_segmented(
            pair.src_raw_points, pair.src_count, k=k))
    if est[1]:
        pair = pair._replace(tgt_normals=estimate_normals_segmented(
            pair.tgt_points, pair.tgt_count, k=k))
    if not pyramid:
        return pair
    build = lambda pts, cnt: build_pyramids_packed(
        pts, cnt, strides=tuple(cfg.enc_strides),
        nsample=tuple(cfg.enc_nsample), method="exact")
    return pair._replace(
        src_pyramid=build(pair.src_raw_points, pair.src_count),
        tgt_pyramid=build(pair.tgt_points, pair.tgt_count))
