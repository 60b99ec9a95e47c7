"""Pallas kernel parity (interpreter mode on CPU; real lowering on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roitr_tpu.ops.sinkhorn import log_sinkhorn_ot


def test_pallas_sinkhorn_matches_xla(rng, monkeypatch):
    """The fused kernel (interpret mode on CPU) must match the XLA scan."""
    from jax.experimental import pallas as pl

    import roitr_tpu.ops.pallas.sinkhorn_kernel as sk

    orig = pl.pallas_call
    monkeypatch.setattr(
        sk.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )

    b, m, n = 4, 9, 7
    scores = rng.randn(b, m, n).astype(np.float32)
    row_masks = rng.rand(b, m) > 0.2
    col_masks = rng.rand(b, n) > 0.2
    row_masks[:, 0] = col_masks[:, 0] = True
    alpha = jnp.float32(1.1)

    ref = np.asarray(
        log_sinkhorn_ot(jnp.array(scores), jnp.array(row_masks), jnp.array(col_masks),
                        alpha, num_iter=25, backend="xla")
    )
    got = np.asarray(
        log_sinkhorn_ot(jnp.array(scores), jnp.array(row_masks), jnp.array(col_masks),
                        alpha, num_iter=25, backend="pallas")
    )
    valid = ref > -1e5
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-4, atol=1e-4)


def test_pallas_sinkhorn_backward_matches_xla_scan(rng, monkeypatch):
    """The on-core trajectory-recompute VJP (interpret mode) == AD through
    the checkpointed XLA scan: dscores and dalpha (learnable dustbin) at
    fp32 tolerance, under realistic masks and a cotangent that only reads
    valid entries (the fine loss never touches -1e6 masked slots — whose
    +-1e6 exponent arithmetic is the one place the two backends' rounding
    legitimately diverges)."""
    from jax.experimental import pallas as pl

    import roitr_tpu.ops.pallas.sinkhorn_kernel as sk

    orig = pl.pallas_call
    monkeypatch.setattr(
        sk.pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )

    b, k, t = 4, 8, 20
    scores = jnp.asarray(rng.randn(b, k, k).astype(np.float32))
    row_masks = jnp.asarray(rng.rand(b, k) > 0.25)
    col_masks = jnp.asarray(rng.rand(b, k) > 0.25)
    alpha = jnp.float32(0.7)
    valid = (
        jnp.concatenate([row_masks, jnp.ones((b, 1), bool)], 1)[:, :, None]
        & jnp.concatenate([col_masks, jnp.ones((b, 1), bool)], 1)[:, None, :]
    )
    proj = jnp.asarray(rng.randn(b, k + 1, k + 1).astype(np.float32)) * valid

    def loss(backend, s, a):
        out = log_sinkhorn_ot(s, row_masks, col_masks, a, num_iter=t,
                              backend=backend, differentiable=True)
        return jnp.sum(out * proj)

    g_x = jax.grad(loss, argnums=(1, 2))("xla", scores, alpha)
    g_p = jax.grad(loss, argnums=(1, 2))("pallas", scores, alpha)
    for name, a, b_ in zip(("dscores", "dalpha"), g_x, g_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_pallas_sinkhorn_bwd_vmem_gate():
    """Training shapes gate on the backward's trajectory-stack budget: the
    production (65, 65) x 100 fits; doubling the patch grid must not."""
    from roitr_tpu.ops.pallas.sinkhorn_kernel import (
        supported_shape,
        supported_shape_bwd,
    )

    assert supported_shape_bwd(65, 65, 100)
    assert not supported_shape_bwd(129, 129, 100)
    # bwd support is strictly tighter than fwd support
    assert supported_shape(97, 97) and not supported_shape_bwd(97, 97, 400)


def test_pallas_sinkhorn_oversized_falls_back(rng):
    """Patch shapes whose VMEM block set exceeds the kernel budget must
    route to the XLA scan instead of failing at compile time."""
    from roitr_tpu.ops.pallas.sinkhorn_kernel import supported_shape

    assert supported_shape(65, 65) and not supported_shape(129, 129)
    b, m, n = 2, 128, 128  # (129, 129) padded -> over budget
    scores = jnp.asarray(rng.randn(b, m, n).astype(np.float32))
    masks = jnp.ones((b, m), bool)
    out = log_sinkhorn_ot(scores, masks, jnp.ones((b, n), bool),
                          jnp.float32(1.0), num_iter=5, backend="pallas")
    assert np.isfinite(np.asarray(out)).all()


def test_fused_geo_embedding_matches_xla(rng):
    """Pallas (interpret mode on CPU) fused sin-basis+proj+max == the XLA
    path, forward and weight gradients (custom VJP)."""
    import jax
    import jax.numpy as jnp

    from roitr_tpu.ops.pallas.geo_embedding_kernel import (
        _xla_forward,
        fused_geo_embedding,
    )

    R, K, H = 2048, 3, 256
    d_idx = jnp.asarray(rng.rand(R).astype(np.float32) * 30)
    a_idx = jnp.asarray(rng.rand(R, K).astype(np.float32) * 12)
    wd = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.05)
    wa = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.05)
    bd = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    ba = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)

    ref = _xla_forward(d_idx, a_idx, wd, bd, wa, ba)
    out = fused_geo_embedding(d_idx, a_idx, wd, bd, wa, ba, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_fused(wd, bd, wa, ba):
        o = fused_geo_embedding(d_idx, a_idx, wd, bd, wa, ba, True)
        return jnp.sum(o * jnp.cos(o))  # non-trivial cotangent

    def loss_xla(wd, bd, wa, ba):
        o = _xla_forward(d_idx, a_idx, wd, bd, wa, ba)
        return jnp.sum(o * jnp.cos(o))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(wd, bd, wa, ba)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(wd, bd, wa, ba)
    # wa's max-over-k gradient routes by argmax; near-ties (within matmul
    # rounding) may flip between the forward and the bwd recompute — allow a
    # tiny mismatch fraction but require the gradient as a whole to agree
    for a, b in zip(g_fused, g_xla):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, rtol=2e-4, atol=2e-4)
        assert close.mean() > 0.995, f"{1 - close.mean():.4%} mismatched"
        rel_err = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel_err < 1e-4, rel_err


def test_geo_embedding_module_backends_agree(rng):
    """GeometricStructureEmbedding(backend=pallas_interpret) == xla backend
    on the same params (module-level wiring check incl. converter-compatible
    param tree)."""
    import jax
    import jax.numpy as jnp

    from roitr_tpu.models.embeddings import GeometricStructureEmbedding

    pts = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 2)
    m_x = GeometricStructureEmbedding(256, backend="xla")
    m_p = GeometricStructureEmbedding(256, backend="pallas_interpret")
    params = m_x.init(jax.random.PRNGKey(0), pts, jnp.int32(60))["params"]
    assert set(params) == {"proj_d", "proj_a"}
    assert set(params["proj_d"]) == {"kernel", "bias"}
    a = m_x.apply({"params": params}, pts, jnp.int32(60))
    b = m_p.apply({"params": params}, pts, jnp.int32(60))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_rpe_attention_matches_xla(rng):
    """Fused global RPE self-attention (interpret mode) == the XLA einsum
    formulation, forward and gradients, incl. key masking, self-exclusion,
    bf16-stored embedding, and a row count that needs TN padding."""
    from roitr_tpu.ops.pallas.rpe_attention_kernel import (
        fused_rpe_self_attention,
        xla_forward,
    )

    n, h, d = 20, 4, 64  # n % TN != 0 exercises the padding path
    q2 = jnp.asarray(rng.randn(n, d).astype(np.float32))
    k2 = jnp.asarray(rng.randn(n, d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(n, d).astype(np.float32))
    qwp = jnp.asarray(rng.randn(n, h, d).astype(np.float32) * 0.3)
    embed = jnp.asarray(rng.randn(n, n, d).astype(np.float32)).astype(jnp.bfloat16)
    mask = np.ones(n, np.float32)
    mask[17:] = 0.0  # padded key tail
    mask = jnp.asarray(mask)

    hid_p, ae_p = fused_rpe_self_attention(q2, k2, v2, qwp, embed, mask, True)
    hid_x, ae_x = xla_forward(q2, k2, v2, qwp, embed, mask)
    np.testing.assert_allclose(np.asarray(hid_p), np.asarray(hid_x), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ae_p), np.asarray(ae_x), rtol=1e-4, atol=1e-5)

    def loss(f):
        def inner(q2, k2, v2, qwp, embed):
            hid, ae = f(q2, k2, v2, qwp, embed)
            return jnp.sum(hid * jnp.cos(hid)) + jnp.sum(ae**2)

        return inner

    g_p = jax.grad(loss(lambda *a: fused_rpe_self_attention(*a, mask, True)),
                   argnums=(0, 1, 2, 3, 4))(q2, k2, v2, qwp, embed)
    g_x = jax.grad(loss(lambda *a: xla_forward(*a, mask)),
                   argnums=(0, 1, 2, 3, 4))(q2, k2, v2, qwp, embed)
    # dembed is a bf16 cotangent (matches the stored-embedding dtype). The
    # XLA path rounds its two einsum contributions to bf16 SEPARATELY and
    # adds them in bf16; the kernel accumulates in f32 and rounds once —
    # more accurate, but near-cancelling elements can land a bf16 ULP of
    # the contribution magnitude apart. Allow that class a small mismatch
    # fraction bounded in absolute size; everything else must agree tight.
    for i, (a, b) in enumerate(zip(g_p, g_x)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        if i == 4:  # dembed
            close = np.isclose(a, b, rtol=1e-2, atol=1e-3)
            assert close.mean() > 0.995, f"{1 - close.mean():.4%} mismatched"
            # backstop scaled to the contribution magnitude: the two
            # pre-rounded halves can each carry an ULP of their own size
            np.testing.assert_allclose(a, b, atol=8e-3 * max(1.0, np.abs(a).max()))
        else:
            np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


def test_fps_kernel_matches_xla_loop(rng):
    """On-core FPS kernel (interpret mode) == the XLA fori_loop version,
    bit-exact indices, incl. padded lanes and a cloud with fewer valid
    points than requested samples (seed-repeat semantics)."""
    from roitr_tpu.ops.fps import furthest_point_sampling
    from roitr_tpu.ops.pallas.fps_kernel import fps_pairs

    n, m = 256, 64
    pts = rng.randn(2, n, 3).astype(np.float32)
    counts = np.array([n, 40], np.int32)  # cloud 1: 40 valid < 64 samples
    pts[1, 40:] = 37.0  # garbage in the padded tail must never be picked

    ref = np.stack([
        np.asarray(furthest_point_sampling(jnp.asarray(pts[c]), counts[c], m))
        for c in (0, 1)
    ])
    got = np.asarray(fps_pairs(jnp.asarray(pts), jnp.asarray(counts), m,
                               interpret=True))
    np.testing.assert_array_equal(got, ref)
    assert (got[1] < 40).all()


def test_rpe_attention_pallas_backward_exact_fp32(rng):
    """The one-pass Pallas backward kernel == jax.vjp(xla_forward) at f32
    tolerance when the embedding is stored f32 (no storage-cast rounding):
    certifies the eight gradient matmuls and both softmax VJPs."""
    from roitr_tpu.ops.pallas.rpe_attention_kernel import (
        fused_rpe_self_attention,
        xla_forward,
    )

    n, h, d = 13, 4, 64  # n % BTN != 0 exercises the backward padding path
    q2 = jnp.asarray(rng.randn(n, d).astype(np.float32))
    k2 = jnp.asarray(rng.randn(n, d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(n, d).astype(np.float32))
    qwp = jnp.asarray(rng.randn(n, h, d).astype(np.float32) * 0.3)
    embed = jnp.asarray(rng.randn(n, n, d).astype(np.float32) * 0.5)
    mask = np.ones(n, np.float32)
    mask[11:] = 0.0
    mask = jnp.asarray(mask)

    hid_ct = jnp.asarray(rng.randn(n, d).astype(np.float32))
    ae_ct = jnp.asarray(rng.randn(n, h, d).astype(np.float32))

    def run(f):
        def inner(q2, k2, v2, qwp, embed):
            hid, ae = f(q2, k2, v2, qwp, embed)
            return jnp.sum(hid * hid_ct) + jnp.sum(ae * ae_ct)

        return jax.grad(inner, argnums=(0, 1, 2, 3, 4))(q2, k2, v2, qwp, embed)

    g_p = run(lambda *a: fused_rpe_self_attention(*a, mask, True))
    g_x = run(lambda *a: xla_forward(*a, mask))
    for name, a, b in zip(("dq", "dk", "dv", "dqwp", "dembed"), g_p, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_rpe_attention_module_backends_agree(rng):
    """GlobalRPESelfAttention(backend=pallas_interpret) == xla backend on
    the same params (wiring + converter-compatible param tree)."""
    from roitr_tpu.models.attention import GlobalRPESelfAttention

    n, d = 12, 64
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    embed = jnp.asarray(rng.randn(n, n, d).astype(np.float32) * 0.3)
    mask = jnp.asarray(np.arange(n) < 10)

    m_x = GlobalRPESelfAttention(d, 4, backend="xla")
    m_p = GlobalRPESelfAttention(d, 4, backend="pallas_interpret")
    params = m_x.init(jax.random.PRNGKey(0), x, embed, mask)["params"]
    assert set(params) >= {"proj_q", "proj_k", "proj_v", "proj_p_kernel",
                           "proj_p_bias", "proj_vp_kernel", "proj_vp_bias"}
    hx, px = m_x.apply({"params": params}, x, embed, mask)
    hp, pp = m_p.apply({"params": params}, x, embed, mask)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(px), rtol=1e-4, atol=1e-5)
