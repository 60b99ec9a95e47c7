"""Parity tests: flax attention layers vs torch implementations of the
reference formulas (attention.py / geoattention.py in /root/reference),
using identical weights. Validates in particular that the factored RPE
attention (no materialized (N,N,d) projections) is exact."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from roitr_tpu.models.attention import (
    AttentionOutput,
    CrossAttentionLayer,
    LocalPPFTransformer,
    RPESelfLayer,
)
from roitr_tpu.models.embeddings import sinusoidal_embedding

torch.manual_seed(0)


def t(x):
    return torch.tensor(np.asarray(x, np.float32))


def dense_t(params, name, x):
    """Apply a flax Dense params dict as torch linear."""
    w = t(params[name]["kernel"])  # (in, out)
    b = t(params[name]["bias"])
    return x @ w + b


def layernorm_t(params, name, x):
    w = t(params[name]["scale"])
    b = t(params[name]["bias"])
    return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-5)


def split_heads_t(x, h):
    # '(h c)' head-major split + move head axis front: (N, H, c)
    n = x.shape[0]
    return x.reshape(n, h, -1)


def test_sinusoidal_embedding_matches_torch():
    d = 16
    idx = np.random.RandomState(0).rand(5, 7).astype(np.float32) * 10
    got = np.asarray(sinusoidal_embedding(jnp.array(idx), d))

    div_indices = torch.arange(0, d, 2).float()
    div_term = torch.exp(div_indices * (-np.log(10000.0) / d))
    omegas = t(idx).view(-1, 1, 1) * div_term.view(1, -1, 1)
    emb = torch.cat([torch.sin(omegas), torch.cos(omegas)], dim=2).view(5, 7, d)
    np.testing.assert_allclose(got, emb.numpy(), atol=1e-5)


def test_local_ppf_transformer_matches_torch(rng):
    n, m, k, d_in, d_hid, d_out, h = 24, 10, 6, 8, 16, 12, 4
    feats = rng.randn(n, d_in).astype(np.float32)
    node_idx = rng.choice(n, m, replace=False).astype(np.int32)
    group_idx = rng.randint(0, n, (m, k)).astype(np.int32)
    ppf = rng.randn(m, k, 4).astype(np.float32)

    mod = LocalPPFTransformer(d_in, d_hid, d_out, h)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(feats), jnp.array(node_idx),
                      jnp.array(group_idx), jnp.array(ppf))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.array(feats), jnp.array(node_idx),
                               jnp.array(group_idx), jnp.array(ppf)))

    # ---- torch reference math (ppftransformer.py:227-253 + attention.py:152-200,290-320)
    pos = dense_t(params, "embedding_proj", t(ppf))  # (M, K, hid)
    x = dense_t(params, "in_proj", t(feats))  # (N, hid)
    ap = params["attention"]
    q = dense_t(ap, "proj_q", x)[t(node_idx).long()]  # (M, hid)
    kk = dense_t(ap, "proj_k", x)[t(group_idx).long()]  # (M, K, hid)
    v = dense_t(ap, "proj_v", x)[t(group_idx).long()]
    p = dense_t(ap, "proj_p", pos)
    vp = dense_t(ap, "proj_vp", pos)
    c = d_hid // h
    qh = q.reshape(m, h, c)  # (M, H, c)
    kh = kk.reshape(m, k, h, c).permute(0, 2, 1, 3)  # (M, H, K, c)
    vh = v.reshape(m, k, h, c).permute(0, 2, 1, 3)
    ph = p.reshape(m, k, h, c).permute(0, 2, 1, 3)
    vph = vp.reshape(m, k, h, c).permute(0, 2, 1, 3)
    scores = (
        torch.einsum("mhc,mhkc->mhk", qh, kh) + torch.einsum("mhc,mhkc->mhk", qh, ph)
    ) / c**0.5
    a = torch.softmax(scores, dim=-1)
    hidden = torch.einsum("mhk,mhkc->mhc", a, vh + vph).reshape(m, d_hid)
    hidden = dense_t(ap, "linear", hidden)
    out = layernorm_t(ap, "norm", hidden + x[t(node_idx).long()])
    out = dense_t(params, "out_proj", out)

    np.testing.assert_allclose(got, out.numpy(), rtol=1e-4, atol=1e-5)


def _ffn_t(params, x):
    hgt = dense_t(params, "expand", x)
    hgt = torch.relu(hgt)
    hgt = dense_t(params, "squeeze", hgt)
    return layernorm_t(params, "norm", x + hgt)


def test_rpe_self_layer_matches_torch(rng):
    n, d, h = 12, 16, 4
    x = rng.randn(n, d).astype(np.float32)
    embed = rng.randn(n, n, d).astype(np.float32)

    mod = RPESelfLayer(d, h)
    params = mod.init(jax.random.PRNGKey(1), jnp.array(x), jnp.array(embed))["params"]
    got_out, got_pos = mod.apply({"params": params}, jnp.array(x), jnp.array(embed))

    # ---- torch reference math (geoattention.py:87-136,196-261), with the
    # (N, N, d) projections fully materialized
    ap = params["attention"]
    c = d // h
    q = split_heads_t(dense_t(ap, "proj_q", t(x)), h)  # (N, H, c)
    k = split_heads_t(dense_t(ap, "proj_k", t(x)), h)
    v = split_heads_t(dense_t(ap, "proj_v", t(x)), h)
    wp = t(ap["proj_p_kernel"])  # (in, out)
    bp = t(ap["proj_p_bias"])
    wvp = t(ap["proj_vp_kernel"])
    bvp = t(ap["proj_vp_bias"])
    p = (t(embed) @ wp + bp).reshape(n, n, h, c)  # (N, M, H, c)
    vp = (t(embed) @ wvp + bvp).reshape(n, n, h, c)
    scores_p = torch.einsum("nhc,nmhc->hnm", q, p)
    scores_e = torch.einsum("nhc,mhc->hnm", q, k)
    scores = (scores_e + scores_p) / c**0.5
    a = torch.softmax(scores, dim=-1)
    hidden = torch.einsum("hnm,mhc->nhc", a, v).reshape(n, d)

    mask = torch.eye(n, dtype=torch.bool)
    scores_excl = scores.masked_fill(mask.unsqueeze(0), float("-inf"))
    a2 = torch.softmax(scores_excl, dim=-1)
    pos_states = torch.einsum("hnm,nmhc->nhc", a2, vp).reshape(n, d)

    hidden = dense_t(params, "linear", hidden)
    out = layernorm_t(params, "norm", hidden + t(x))
    pos = dense_t(params, "pos_linear", pos_states)
    pos = layernorm_t(params, "pos_norm", pos)
    out = _ffn_t(params["output"], out)
    pos = _ffn_t(params["pos_proj"], pos)

    np.testing.assert_allclose(np.asarray(got_out), out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_pos), pos.numpy(), rtol=1e-4, atol=1e-5)


def test_rpe_self_layer_dense_layout():
    """pos_linear / attention layers must exist so torch ckpt conversion maps
    one-to-one (smoke check of parameter naming)."""
    mod = RPESelfLayer(8, 2)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((4, 8)), jnp.zeros((4, 4, 8)))["params"]
    for name in ["attention", "output", "pos_proj"]:
        assert name in params
    for name in ["proj_q", "proj_k", "proj_v"]:
        assert name in params["attention"]
    for name in ["linear", "norm", "pos_linear", "pos_norm"]:
        assert name in params


def test_cross_attention_matches_torch(rng):
    n, m, d, h = 9, 11, 16, 4
    x = rng.randn(n, d).astype(np.float32)
    mem = rng.randn(m, d).astype(np.float32)
    pos_q = rng.randn(n, d).astype(np.float32)
    pos_k = rng.randn(m, d).astype(np.float32)

    mod = CrossAttentionLayer(d, h)
    params = mod.init(jax.random.PRNGKey(2), jnp.array(x), jnp.array(mem),
                      jnp.array(pos_q), jnp.array(pos_k))["params"]
    got = mod.apply({"params": params}, jnp.array(x), jnp.array(mem),
                    jnp.array(pos_q), jnp.array(pos_k))

    c = d // h
    in_q = t(x) + t(pos_q)
    in_k = t(mem) + t(pos_k)
    q = split_heads_t(dense_t(params, "proj_q", in_q), h)
    k = split_heads_t(dense_t(params, "proj_k", in_k), h)
    v = split_heads_t(dense_t(params, "proj_v", t(mem)), h)
    scores = torch.einsum("nhc,mhc->hnm", q, k) / c**0.5
    a = torch.softmax(scores, dim=-1)
    hidden = torch.einsum("hnm,mhc->nhc", a, v).reshape(n, d)
    hidden = dense_t(params, "linear", hidden)
    out = layernorm_t(params, "norm", hidden + t(x))
    out = _ffn_t(params["output"], out)

    np.testing.assert_allclose(np.asarray(got), out.numpy(), rtol=1e-4, atol=1e-5)


def test_masked_softmax_all_masked_rows():
    from roitr_tpu.models.attention import masked_softmax

    scores = jnp.ones((2, 3))
    mask = jnp.array([[True, True, False], [False, False, False]])
    out = np.asarray(masked_softmax(scores, mask))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], 0.0)
