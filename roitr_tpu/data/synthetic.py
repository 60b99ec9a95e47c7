"""Synthetic partially-overlapping pair generation (host-side numpy).

Used by the benchmark harness, the compile-check entry points, and tests.
Produces geometry with the same statistics the pipeline sees from 3DMatch:
surface-like local structure (so PCA normals are meaningful), a random SO(3)
GT transform, and prefix-packed padding to a static bucket size.
"""

from __future__ import annotations

import numpy as np

from roitr_tpu.config import Config


def random_rotation(rng: np.random.RandomState) -> np.ndarray:
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def make_surface_cloud(rng: np.random.RandomState, n: int, scale: float = 3.0) -> np.ndarray:
    """Points sampled near a smooth random height-field surface — locally
    planar so normal estimation behaves like on indoor scans."""
    xy = rng.rand(n, 2).astype(np.float32) * scale
    freqs = rng.randn(4, 2).astype(np.float32)
    phases = rng.rand(4).astype(np.float32) * 2 * np.pi
    amps = (rng.rand(4).astype(np.float32) * 0.3 + 0.1) / np.arange(1, 5)
    z = sum(a * np.sin(xy @ f + p) for a, f, p in zip(amps, freqs, phases))
    pts = np.stack([xy[:, 0], xy[:, 1], z], axis=1)
    pts += rng.randn(n, 3).astype(np.float32) * 0.005
    return pts.astype(np.float32)


def make_pair_arrays(
    rng: np.random.RandomState,
    bucket: int,
    n_valid: int,
    m_valid: int,
    overlap: float = 0.7,
):
    """Returns dict of numpy arrays for one padded pair with GT transform
    (convention: src @ rot.T + trans.T ~ tgt on the overlap,
    reference lib/loss.py:129)."""
    total = n_valid + int(m_valid * (1 - overlap)) + 8
    scene = make_surface_cloud(rng, total)
    rot = random_rotation(rng)
    trans = (rng.randn(3, 1) * 0.5).astype(np.float32)

    src_tgtframe = scene[:n_valid]
    start = max(int((1 - overlap) * n_valid), 0)
    tgt_view = scene[start : start + m_valid]
    if tgt_view.shape[0] < m_valid:  # wrap if the scene ran short
        reps = int(np.ceil(m_valid / max(tgt_view.shape[0], 1)))
        tgt_view = np.tile(tgt_view, (reps, 1))[:m_valid]
    src_view = (src_tgtframe - trans.T) @ rot

    src = np.zeros((bucket, 3), np.float32)
    tgt = np.zeros((bucket, 3), np.float32)
    src[:n_valid] = src_view
    tgt[:m_valid] = tgt_view
    return {
        "src_points": src,
        "src_raw_points": src.copy(),
        "src_count": np.int32(n_valid),
        "tgt_points": tgt,
        "tgt_count": np.int32(m_valid),
        "rot": rot,
        "trans": trans,
    }


def make_flow_pair_arrays(
    rng: np.random.RandomState,
    bucket: int,
    n_valid: int,
    m_valid: int,
    overlap: float = 0.7,
    flow_scale: float = 0.08,
):
    """Non-rigid (4DMatch-style) pair: the source deforms under a smooth
    synthetic flow field before the rigid transform (reference
    dataset/fdmatch.py:31-98 semantics: src_points = s_pc + s2t_flow is the
    matching geometry, src_raw_points = s_pc carries the normals/backbone
    geometry). Returns the make_pair_arrays dict plus 'flow' (bucket, 3)."""
    arr = make_pair_arrays(rng, bucket, n_valid, m_valid, overlap)
    # make_pair_arrays guarantees src @ rot.T + trans.T ~ tgt; keep that
    # cloud as the DEFORMED matching geometry and bend the raw source
    # backwards by a smooth low-frequency field, so
    # raw + flow == deformed transforms onto tgt exactly like the reference
    # convention (deformed source is what registers).
    deformed = arr["src_points"]
    freqs = rng.randn(3, 3).astype(np.float32) * 1.5
    phases = rng.rand(3).astype(np.float32) * 2 * np.pi
    flow = flow_scale * np.stack(
        [np.sin(deformed @ freqs[i] + phases[i]) for i in range(3)], axis=1
    ).astype(np.float32)
    flow[arr["src_count"]:] = 0.0
    arr["src_raw_points"] = (deformed - flow).astype(np.float32)
    arr["src_points"] = deformed
    arr["flow"] = flow
    return arr


def make_pair_inputs(rng: np.random.RandomState, bucket: int, n_valid: int, m_valid: int,
                     overlap: float = 0.7, normal_k: int = 16):
    """Full PairInputs (jnp) including device-side normal estimation."""
    import jax.numpy as jnp

    from roitr_tpu.models.roitr import PairInputs
    from roitr_tpu.ops.normals import estimate_normals

    arr = make_pair_arrays(rng, bucket, n_valid, m_valid, overlap)
    src_n = estimate_normals(jnp.array(arr["src_points"]), arr["src_count"], k=normal_k)
    tgt_n = estimate_normals(jnp.array(arr["tgt_points"]), arr["tgt_count"], k=normal_k)
    ones = jnp.ones((bucket, 1), jnp.float32)
    return PairInputs(
        src_points=jnp.array(arr["src_points"]),
        src_raw_points=jnp.array(arr["src_raw_points"]),
        src_normals=src_n,
        src_feats=ones,
        src_count=jnp.int32(arr["src_count"]),
        tgt_points=jnp.array(arr["tgt_points"]),
        tgt_normals=tgt_n,
        tgt_feats=ones,
        tgt_count=jnp.int32(arr["tgt_count"]),
        rot=jnp.array(arr["rot"]),
        trans=jnp.array(arr["trans"]),
    )


def stack_pairs(pairs):
    """Stack a list of PairInputs into one batched PairInputs."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: jax.numpy.stack(xs), *pairs)
