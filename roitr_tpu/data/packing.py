"""Host-side packing of B same-bucket pairs into one flat "packed batch".

Motivation (tools/probe_small_buckets.py, one v5e chip): the production
forward has a ~2.2 ms fixed pool — per-gather DMA setup, sub-tile ops at the
coarse levels, dispatch — that dominates small buckets (half the 4.5 ms at
N=2048). vmapping the pipeline is NOT the answer (XLA lowers batched
neighborhood gathers 4.7x slower, PERFORMANCE.md); instead B pairs are packed
as ONE flat cloud of B*N rows per side:

- every per-point op (dense layers, attention, PPF) is row-wise and runs
  unchanged on the flat arrays;
- every neighborhood gather stays a plain 2D row gather because the host
  pyramid's indices are offset per segment (pure index arithmetic here);
- per-pair semantics (counts, pooling, the coarse-level transformer, the
  matching heads) are restored by the aligned layout: segment b of a level
  with per-pair capacity m occupies rows [b*m, (b+1)*m), so a (B, m, ...)
  view is a free reshape.

The reference cannot batch at all (torch pipeline locked to batch 1,
collate_fn common.py:50-126 concatenates but every config runs batch 1).

Packed batches REQUIRE host pyramids: device-side FPS/kNN is per-cloud
(and production configs precompute the pyramid anyway — PERFORMANCE.md).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from roitr_tpu.data.pyramid import CloudPyramid, build_cloud_pyramid


def _level_sizes(pyr: CloudPyramid) -> dict:
    return {lvl: getattr(pyr, f"self_idx{lvl}").shape[0] for lvl in (1, 2, 3, 4)}


def pack_pyramids(pyramids: Sequence[CloudPyramid]) -> CloudPyramid:
    """Concatenate per-pair pyramids with per-segment index offsets.

    Index fields point into the level that provides their KEYS:
    - fps_idx{l} and cross_idx{l} index the parent level l-1 (level 0 ==
      level 1: stride 1);
    - self_idx{l} indexes level l;
    - up_idx{l} indexes level l (3-NN keys for upsampling to level l-1).
    Offsetting each pair's indices by b * (key level size) makes them valid
    into the concatenated arrays; up_w weights concatenate unchanged.
    """
    s = _level_sizes(pyramids[0])
    key_size = {
        "fps_idx2": s[1], "fps_idx3": s[2], "fps_idx4": s[3],
        "cross_idx1": s[1], "cross_idx2": s[1],
        "cross_idx3": s[2], "cross_idx4": s[3],
        "self_idx1": s[1], "self_idx2": s[2],
        "self_idx3": s[3], "self_idx4": s[4],
        "up_idx2": s[2], "up_idx3": s[3], "up_idx4": s[4],
    }
    fields = {}
    for name in CloudPyramid._fields:
        arrs = [np.asarray(getattr(p, name)) for p in pyramids]
        if name.startswith("up_w"):
            fields[name] = np.concatenate(arrs, axis=0)
        else:
            ks = key_size[name]
            fields[name] = np.concatenate(
                [a.astype(np.int64) + b * ks for b, a in enumerate(arrs)], axis=0
            ).astype(np.int32)
    return CloudPyramid(**fields)


def pack_pairs(pairs: Sequence["PairInputs"],
               require_pyramids: bool = True) -> "PairInputs":
    """Pack B same-bucket PairInputs into one flat packed PairInputs.

    The packed form is detected by the model via `src_count.ndim == 1`:
    point leaves are (B*N, ...) concatenations, counts are (B,) vectors,
    rot/trans gain a leading batch axis, and the pyramids carry globally
    offset indices. Every pair must already have host pyramids attached
    (build them with `attach_pyramids` / data.pyramid.build_cloud_pyramid)
    — unless `require_pyramids=False`, for consumers that build them
    device-side in the same program (ops/pyramid.py, serving prep="device"),
    in which case the packed pyramids are None.
    """
    from roitr_tpu.models.roitr import PairInputs

    # the packed forward derives the per-pair segment size as
    # len(flat)/B on BOTH sides, so src AND tgt of every pair must share
    # one bucket (preprocess.py pads both sides of a pair to the same
    # bucket, but nothing downstream would catch a violation — it would
    # silently mix pairs' points within segments)
    buckets = {
        np.asarray(p.src_points).shape[0] for p in pairs
    } | {np.asarray(p.tgt_points).shape[0] for p in pairs}
    if len(buckets) != 1:
        raise ValueError(
            f"packed batch needs one shared src/tgt bucket, got {sorted(buckets)}")
    has_pyramids = all(
        p.src_pyramid is not None and p.tgt_pyramid is not None for p in pairs)
    if require_pyramids and not has_pyramids:
        raise ValueError(
            "packed batches require host pyramids on every pair "
            "(build them, or pass require_pyramids=False for device-side "
            "pyramid construction)"
        )

    cat = lambda name: np.concatenate(
        [np.asarray(getattr(p, name)) for p in pairs], axis=0
    )
    return PairInputs(
        src_points=cat("src_points"),
        src_raw_points=cat("src_raw_points"),
        src_normals=cat("src_normals"),
        src_feats=cat("src_feats"),
        src_count=np.asarray([int(p.src_count) for p in pairs], np.int32),
        tgt_points=cat("tgt_points"),
        tgt_normals=cat("tgt_normals"),
        tgt_feats=cat("tgt_feats"),
        tgt_count=np.asarray([int(p.tgt_count) for p in pairs], np.int32),
        rot=np.stack([np.asarray(p.rot) for p in pairs]),
        trans=np.stack([np.asarray(p.trans) for p in pairs]),
        src_pyramid=pack_pyramids([p.src_pyramid for p in pairs])
        if has_pyramids else None,
        tgt_pyramid=pack_pyramids([p.tgt_pyramid for p in pairs])
        if has_pyramids else None,
    )


def attach_pyramids(pair: "PairInputs", strides, nsample) -> "PairInputs":
    """Build and attach host pyramids for one pair (no-op if present)."""
    if pair.src_pyramid is not None and pair.tgt_pyramid is not None:
        return pair
    src = build_cloud_pyramid(
        np.asarray(pair.src_raw_points), int(pair.src_count),
        strides=tuple(strides), nsample=tuple(nsample))
    tgt = build_cloud_pyramid(
        np.asarray(pair.tgt_points), int(pair.tgt_count),
        strides=tuple(strides), nsample=tuple(nsample))
    return pair._replace(src_pyramid=src, tgt_pyramid=tgt)
