"""Shared true-oracle harness: run the REAL reference and roitr_tpu on the
same pair and return both output sets.

Extracted from tests/test_reference_parity.py so the envelope suite
(test_reference_parity_envelope.py: padded counts, host pyramid, approx kNN,
the full production combination) reuses one implementation. See
reference_oracle.py for how the reference runs on CPU.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def build_pair_inputs(cfg, arr, src_normals, tgt_normals):
    """PairInputs from make_pair_arrays output + precomputed normals,
    attaching host pyramids when cfg.host_pyramid (the production lever,
    data/pyramid.py)."""
    import jax
    import jax.numpy as jnp

    from roitr_tpu.models.roitr import PairInputs

    bucket = arr["src_points"].shape[0]
    pair = PairInputs(
        src_points=jnp.array(arr["src_points"]),
        src_raw_points=jnp.array(arr["src_raw_points"]),
        src_normals=jnp.array(src_normals),
        src_feats=jnp.ones((bucket, 1), jnp.float32),
        src_count=jnp.int32(arr["src_count"]),
        tgt_points=jnp.array(arr["tgt_points"]),
        tgt_normals=jnp.array(tgt_normals),
        tgt_feats=jnp.ones((bucket, 1), jnp.float32),
        tgt_count=jnp.int32(arr["tgt_count"]),
        rot=jnp.array(arr["rot"]),
        trans=jnp.array(arr["trans"]),
    )
    if cfg.host_pyramid:
        from roitr_tpu.data.pyramid import build_cloud_pyramid

        as_jnp = lambda pyr: jax.tree_util.tree_map(jnp.asarray, pyr)
        pair = pair._replace(
            src_pyramid=as_jnp(build_cloud_pyramid(
                arr["src_raw_points"], int(arr["src_count"]),
                strides=tuple(cfg.enc_strides), nsample=tuple(cfg.enc_nsample))),
            tgt_pyramid=as_jnp(build_cloud_pyramid(
                arr["tgt_points"], int(arr["tgt_count"]),
                strides=tuple(cfg.enc_strides), nsample=tuple(cfg.enc_nsample))),
        )
    return pair


def run_both(cfg, bucket, n_src, n_tgt, seed=7, ref_seed=0, aligned=True,
             weight_noise=0.0, make_arrays=None):
    """Run reference (exact-size clouds) and ours (padded bucket) on one
    seeded pair with converted weights.

    `make_arrays` defaults to make_pair_arrays (rigid); pass
    make_flow_pair_arrays for the 4DMatch deformed-source convention.
    Normals always come from the RAW source geometry, like the reference
    datasets (dataset/fdmatch.py:42).

    Returns (arr, ref, ref_aligned, ours); ref_aligned is None when
    aligned=False (skips the second reference forward — enough for
    descriptor/GT-level assertions)."""
    import jax
    import jax.numpy as jnp

    from reference_oracle import run_reference_forward
    from roitr_tpu.data.synthetic import make_pair_arrays
    from roitr_tpu.models.roitr import RoITr
    from roitr_tpu.ops.normals import estimate_normals
    from roitr_tpu.utils.convert import torch_state_dict_to_params

    rng = np.random.RandomState(seed)
    arr = (make_arrays or make_pair_arrays)(rng, bucket, n_src, n_tgt)
    sn = np.asarray(
        estimate_normals(jnp.array(arr["src_raw_points"]), arr["src_count"], k=33))
    tn = np.asarray(estimate_normals(jnp.array(arr["tgt_points"]), arr["tgt_count"], k=33))

    sd, ref = run_reference_forward(cfg, arr, sn, tn, seed=ref_seed,
                                    weight_noise=weight_noise)

    params = jax.tree_util.tree_map(
        jnp.asarray,
        torch_state_dict_to_params(sd, cfg.transformer_architecture, cfg.enc_blocks),
    )
    pair = build_pair_inputs(cfg, arr, sn, tn)
    model = RoITr(cfg)
    ours = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(params, pair)
    ours = jax.tree_util.tree_map(np.asarray, ours)

    ref_aligned = None
    if aligned:
        # second reference run with OUR coarse selection injected: downstream
        # OT + fine matching then run on identical patches on both sides
        m = ours["node_corr_masks"]
        _, ref_aligned = run_reference_forward(
            cfg, arr, sn, tn, seed=ref_seed, weight_noise=weight_noise,
            coarse_override=(ours["tgt_node_corr_indices"][m],
                             ours["src_node_corr_indices"][m]),
        )
    return arr, ref, ref_aligned, ours


def cos_rows(a, b):
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
    return num / den
