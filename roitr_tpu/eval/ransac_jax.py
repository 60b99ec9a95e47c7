"""Correspondence RANSAC on the TPU (jitted, all hypotheses in parallel).

Same semantics as eval/ransac.py (the numpy port of Open3D's
registration_ransac_based_on_correspondence, reference
registration/benchmark_utils.py:165-209): 3-point hypotheses, edge-length
+ distance checkers, inlier-count ranking with RMSE tie-break, final
refinement on the best hypothesis's inliers.

TPU-first design:
- hypothesis indices are sampled on host (same numpy RandomState protocol
  as the numpy backend) and shipped once; everything else is ONE jitted
  program per (padded_n, iterations) bucket;
- rotations come from Horn's quaternion method — the dominant eigenvector
  of the 4x4 correlation form via shifted power iteration (branch-free,
  exactly orthonormal by construction; TPU fp32 SVD has ~1e-3
  orthonormality error and batched tiny SVDs lower poorly);
- inlier counting streams hypothesis chunks with lax.map so the (H, N)
  distance field never materializes at full H;
- correspondences pad to 512-multiples (one compiled program per bucket),
  the final fp64 polish (one 3-point-set Kabsch on the winner's inliers)
  runs on host.

50k hypotheses x 5k correspondences is ~5 GFLOP — milliseconds on a chip
vs ~1 s vectorized numpy per pair; the offline benchmark runs 1623 pairs
x 5 n_points settings.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_JITTED = {}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _build(padded_n: int, iters: int, chunk: int):
    import jax
    import jax.numpy as jnp

    def horn_rotation(s0, t0):
        """Batched optimal rotation src->tgt from centered triplets.

        s0/t0: (B, 3, 3). Returns (B, 3, 3) rotation matrices, exactly
        orthonormal (built from unit quaternions)."""
        s = jnp.einsum("hma,hmc->hac", s0, t0)  # S_ac = sum_m s_a t_c
        sxx, sxy, sxz = s[:, 0, 0], s[:, 0, 1], s[:, 0, 2]
        syx, syy, syz = s[:, 1, 0], s[:, 1, 1], s[:, 1, 2]
        szx, szy, szz = s[:, 2, 0], s[:, 2, 1], s[:, 2, 2]
        row0 = jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1)
        row1 = jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1)
        row2 = jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1)
        row3 = jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1)
        nmat = jnp.stack([row0, row1, row2, row3], -2)  # (B, 4, 4)
        # shift so the MAX eigenvalue is also the dominant-|.| one:
        # |lambda| <= 2 sum |s_m||t_m| is a safe bound
        bound = 2.0 * jnp.sum(
            jnp.linalg.norm(s0, axis=-1) * jnp.linalg.norm(t0, axis=-1), axis=-1
        )
        nmat = nmat + (bound + 1e-6)[:, None, None] * jnp.eye(4)

        q = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), nmat.shape[:1] + (4,))

        def step(q, _):
            q = jnp.einsum("bij,bj->bi", nmat, q)
            q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)
            return q, None

        q, _ = jax.lax.scan(step, q, None, length=40)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        # R such that R @ src ~ tgt (Horn's convention with S = s (x) t)
        r = jnp.stack(
            [
                jnp.stack([w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
                jnp.stack([2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)], -1),
                jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z], -1),
            ],
            -2,
        )
        return r

    def run(src, tgt, valid, idx, thr, ratio):
        """src/tgt: (padded_n, 3) f32; valid (padded_n,) bool;
        idx (iters, 3) int32; thr/ratio scalars. Returns
        (best_r (3,3), best_t (3,), best_count i32).

        Ranking is the numpy backend's lexicographic order exactly:
        max inlier count first, then min RMSE, earliest hypothesis on
        ties (eval/ransac.py:121-128) — a two-stage argmax/argmin, not a
        combined score (count - rmse inverts across counts when
        thr >= 1 and quantizes the tie-break in fp32)."""
        s_tri = src[idx]  # (H, 3, 3)
        t_tri = tgt[idx]

        # edge-length checker (both directions)
        ok = jnp.ones(idx.shape[0], bool)
        for i, j in ((0, 1), (1, 2), (0, 2)):
            ls = jnp.linalg.norm(s_tri[:, i] - s_tri[:, j], axis=-1)
            lt = jnp.linalg.norm(t_tri[:, i] - t_tri[:, j], axis=-1)
            ok &= (ls > ratio * lt) & (lt > ratio * ls)

        s_c = s_tri.mean(1, keepdims=True)
        t_c = t_tri.mean(1, keepdims=True)
        r = horn_rotation(s_tri - s_c, t_tri - t_c)  # (H, 3, 3)
        t = t_c[:, 0] - jnp.einsum("bij,bj->bi", r, s_c[:, 0])

        # distance checker on the sampled triplet
        s_tr = jnp.einsum("bij,bkj->bki", r, s_tri) + t[:, None]
        ok &= jnp.all(jnp.linalg.norm(s_tr - t_tri, axis=-1) < thr, axis=-1)

        def count_chunk(args):
            rc, tc, okc = args  # (C, 3, 3), (C, 3), (C,)
            s_all = jnp.einsum("cij,nj->cni", rc, src) + tc[:, None]  # (C, N, 3)
            d2 = jnp.sum((s_all - tgt[None]) ** 2, axis=-1)
            inl = (d2 < thr * thr) & valid[None]
            counts = jnp.sum(inl, axis=-1)
            rmse = jnp.sqrt(
                jnp.sum(jnp.where(inl, d2, 0.0), axis=-1)
                / jnp.clip(counts, 1, None)
            )
            return jnp.where(okc, counts, -1), rmse

        h = idx.shape[0]
        rc = r.reshape(h // chunk, chunk, 3, 3)
        tc = t.reshape(h // chunk, chunk, 3)
        okc = ok.reshape(h // chunk, chunk)
        counts, rmse = jax.lax.map(count_chunk, (rc, tc, okc))
        counts, rmse = counts.reshape(h), rmse.reshape(h)

        best_count = jnp.max(counts)  # -1 iff every hypothesis failed checks
        # among max-count hypotheses, first min-RMSE (argmin returns the
        # first minimum -> earliest hypothesis wins exact ties)
        best = jnp.argmin(jnp.where(counts == best_count, rmse, jnp.inf))
        return r[best], t[best], best_count.astype(jnp.int32)

    return jax.jit(run)


def ransac_pose_estimation_correspondences_jax(
    src_pts: np.ndarray,
    tgt_pts: np.ndarray,
    correspondences: Optional[np.ndarray] = None,
    distance_threshold: float = 0.05,
    ransac_n: int = 3,
    max_iterations: int = 50000,
    edge_length_ratio: float = 0.9,
    seed: Optional[int] = None,
    chunk: int = 4096,
    confidence: Optional[float] = None,  # accepted for API parity; ignored
) -> np.ndarray:
    """Drop-in jax/TPU variant of ransac.ransac_pose_estimation_correspondences.

    Runs the full hypothesis budget in one jitted program (no early stop —
    the reference protocol runs the full budget too). The final refinement
    on the winner's inliers happens in fp64 on host, exactly like the numpy
    backend, so the returned transform has the same precision class.
    """
    if ransac_n != 3:
        raise NotImplementedError("jax backend implements ransac_n=3")
    from roitr_tpu.eval.ransac import kabsch

    src_pts = np.asarray(src_pts, np.float64)
    tgt_pts = np.asarray(tgt_pts, np.float64)
    if correspondences is not None:
        correspondences = np.asarray(correspondences)
        src_pts = src_pts[correspondences[:, 0]]
        tgt_pts = tgt_pts[correspondences[:, 1]]
    n = src_pts.shape[0]
    eye = np.eye(4)
    if n < ransac_n:
        return eye

    rng = np.random.RandomState(seed)
    idx = rng.randint(0, n, size=(max_iterations, ransac_n)).astype(np.int32)

    padded_n = _round_up(n, 512)
    iters = _round_up(max_iterations, chunk)
    if iters > max_iterations:  # pad with repeats of hypothesis 0
        idx = np.concatenate([idx, np.tile(idx[:1], (iters - max_iterations, 1))])

    key = (padded_n, iters, chunk)
    if key not in _JITTED:
        _JITTED[key] = _build(padded_n, iters, chunk)
    fn = _JITTED[key]

    src_p = np.zeros((padded_n, 3), np.float32)
    tgt_p = np.zeros((padded_n, 3), np.float32)
    src_p[:n] = src_pts
    tgt_p[:n] = tgt_pts
    valid = np.zeros(padded_n, bool)
    valid[:n] = True

    r, t, count = fn(
        src_p, tgt_p, valid, idx,
        np.float32(distance_threshold), np.float32(edge_length_ratio),
    )
    count = int(count)
    if count < 0:
        return eye
    r = np.asarray(r, np.float64)
    t = np.asarray(t, np.float64)

    # final refinement on inliers, fp64 on host (numpy-backend parity)
    s_all = src_pts @ r.T + t
    inl = np.linalg.norm(s_all - tgt_pts, axis=-1) < distance_threshold
    if inl.sum() >= ransac_n:
        r, t = kabsch(src_pts[inl], tgt_pts[inl])
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out
