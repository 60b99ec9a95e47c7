"""Pallas TPU kernel: fused log-domain Sinkhorn iteration.

The XLA implementation (ops/sinkhorn.py) runs the 100-iteration loop as a
lax.scan over (P, M+1, N+1) tensors — ~3.1 ms of device time at the
reference shape (256, 65, 65) x 100, which is >50% of the whole 2k-bucket
forward. Two Pallas formulations were measured:

- v1 (round 2): patches grouped on the OUTER dim, (G, 65, 65) blocks.
  5.5-5.6 ms for G in {32, 64, 128} — the 65-wide lane dim idles half the
  VPU and the dependent u->v reduce chain dominates; group size is
  irrelevant. Conclusively worse than the scan (PERFORMANCE.md).
- v2 (this file): the patch axis becomes the LANE dim — blocks are
  (M+1, N+1, G=128) with every lane busy; the u-update's logsumexp
  reduces over sublanes, the v-update's over the outer axis, and the
  whole `num_iter` loop runs on-core per grid step with a single HBM
  read/write of the score block.

Training (round 5): `sinkhorn_iterate_pallas` now carries a custom VJP
backed by a second lane-major kernel (`_sinkhorn_bwd_kernel`): it
recomputes the u/v trajectory on-core into VMEM scratch stacks (the
forward saves only its inputs), then runs the reverse-mode loop over the
iterations entirely on-core, emitting dscores/dmu/dnu in one HBM pass.
The XLA scan's checkpointed AD instead re-runs the forward under remat
and streams per-iteration softmax VJPs through HBM. Shapes whose scratch
stacks would blow VMEM (`supported_shape_bwd`) fall back to the scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP_SIZE = 128  # patches per grid step, on the lane dimension
_VMEM_LIMIT = 32 * 1024 * 1024  # raised scoped-vmem budget (v5e has headroom)


def supported_shape(m1: int, n1: int) -> bool:
    """The kernel holds the (M1, N1, G) score block plus ~4 same-sized loop
    temps in VMEM. Default shapes (65, 65) use ~11M of the 32M budget;
    refuse anything that would not fit so callers fall back to the XLA
    scan instead of failing at compile time."""
    per_block = m1 * n1 * GROUP_SIZE * 4
    return 6 * per_block <= _VMEM_LIMIT


def supported_shape_bwd(m1: int, n1: int, num_iter: int) -> bool:
    """The backward kernel additionally holds the (num_iter, M1/N1, G)
    u/v trajectory stacks plus ~5 (M1, N1, G) loop temps in VMEM. At the
    training shape (65, 65) x 100 the stacks are ~7.4M and the blocks/temps
    ~22M of the 48M budget; refuse anything bigger so `log_sinkhorn_ot`
    keeps the differentiable XLA scan there."""

    def pad8(x):
        return -(-x // 8) * 8

    stacks = num_iter * (pad8(m1) + pad8(n1)) * GROUP_SIZE * 4
    blocks = 10 * m1 * n1 * GROUP_SIZE * 4
    return supported_shape(m1, n1) and stacks + blocks <= 40 * 1024 * 1024


def _sinkhorn_kernel(num_iter: int, scores_ref, mu_ref, nu_ref, out_ref):
    s = scores_ref[...]  # (M1, N1, G) fp32, already padded/masked (finite)
    mu = mu_ref[...]  # (M1, 1, G)
    nu = nu_ref[...]  # (1, N1, G)

    def lse(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))

    def body(_, uv):
        u, v = uv
        u = mu - lse(s + v, 1)  # (M1, 1, G)
        v = nu - lse(s + u, 0)  # (1, N1, G)
        return u, v

    u, v = jax.lax.fori_loop(
        0, num_iter, body, (jnp.zeros_like(mu), jnp.zeros_like(nu))
    )
    out_ref[...] = s + u + v


def _pallas_forward(
    padded_scores: jnp.ndarray,  # (P, M1, N1) fp32, invalid entries ~ -1e6
    log_mu: jnp.ndarray,  # (P, M1)
    log_nu: jnp.ndarray,  # (P, N1)
    num_iter: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Runs the u/v iteration fully in VMEM; returns scores + u + v."""
    p, m1, n1 = padded_scores.shape
    g = GROUP_SIZE
    pad = (-p) % g
    if pad:
        padded_scores = jnp.pad(padded_scores, ((0, pad), (0, 0), (0, 0)))
        log_mu = jnp.pad(log_mu, ((0, pad), (0, 0)))
        log_nu = jnp.pad(log_nu, ((0, pad), (0, 0)))
    pp = p + pad

    # patch axis -> lanes: every lane busy (the (G, 65, 65) layout idled
    # half the VPU on its 65-wide lane dim)
    scores_t = jnp.transpose(padded_scores, (1, 2, 0))  # (M1, N1, P)
    mu_t = jnp.transpose(log_mu, (1, 0))[:, None, :]  # (M1, 1, P)
    nu_t = jnp.transpose(log_nu, (1, 0))[None, :, :]  # (1, N1, P)

    kernel = functools.partial(_sinkhorn_kernel, num_iter)
    out = pl.pallas_call(
        kernel,
        grid=(pp // g,),
        in_specs=[
            pl.BlockSpec((m1, n1, g), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, g), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, g), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m1, n1, g), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m1, n1, pp), jnp.float32),
        # the transposed score tensor is a transient — writing the result
        # over it saves a (M1, N1, G) VMEM block
        input_output_aliases={0: 0},
        # the loop body's (M1, N1, G) temps put the kernel stack 637K over
        # the default 16M scoped-vmem limit at G=128; v5e has headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scores_t, mu_t, nu_t)
    return jnp.transpose(out, (2, 0, 1))[:p]


_BWD_VMEM_LIMIT = 48 * 1024 * 1024  # fwd blocks + trajectory stacks + temps


def _sinkhorn_bwd_kernel(num_iter: int, scores_ref, mu_ref, nu_ref, g_ref,
                         ds_ref, dmu_ref, dnu_ref, u_stack, v_stack):
    """Reverse-mode Sinkhorn, whole loop on-core. Forward recompute writes
    the u/v trajectory into VMEM scratch stacks ((T, M1/N1, G) — dense
    sublane layout; the (M1, 1, G) <-> (1, M1, G) casts are unit-dim moves,
    layout-free in Mosaic), then the reverse loop walks the iterations
    backwards:

        u_t = mu - lse_N(s + v_{t-1})   =>  a_t = exp(s + v_{t-1} - mu + u_t)
        v_t = nu - lse_M(s + u_t)       =>  b_t = exp(s + u_t  - nu + v_t)
        out = s + u_T + v_T

        du_T = sum_N g, dv_T = sum_M g, ds = g
        per t (descending):  dnu += dv;  ds -= dv.b_t;  du -= sum_N(dv.b_t)
                             dmu += du;  ds -= du.a_t;  dv = -sum_M(du.a_t)

    a_t/b_t are the row/column softmaxes (exponents <= 0, masked -1e6
    entries decay to 0 exactly as in the XLA scan's AD)."""
    s = scores_ref[...]  # (M1, N1, G) fp32
    mu = mu_ref[...]  # (M1, 1, G)
    nu = nu_ref[...]  # (1, N1, G)
    m1 = s.shape[0]
    n1 = s.shape[1]
    g = s.shape[2]

    def lse(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))

    def fwd_body(t, uv):
        u, v = uv
        u = mu - lse(s + v, 1)  # (M1, 1, G)
        v = nu - lse(s + u, 0)  # (1, N1, G)
        u_stack[pl.ds(t, 1)] = u.reshape(1, m1, g)
        v_stack[pl.ds(t, 1)] = v.reshape(1, n1, g)
        return u, v

    jax.lax.fori_loop(
        0, num_iter, fwd_body, (jnp.zeros_like(mu), jnp.zeros_like(nu))
    )

    gout = g_ref[...]  # (M1, N1, G)

    def bwd_body(i, carry):
        ds, du, dv, dmu, dnu = carry
        t = num_iter - 1 - i
        u_t = u_stack[pl.ds(t, 1)].reshape(m1, 1, g)
        v_t = v_stack[pl.ds(t, 1)].reshape(1, n1, g)
        v_prev = jnp.where(
            t > 0,
            v_stack[pl.ds(jnp.maximum(t - 1, 0), 1)].reshape(1, n1, g),
            jnp.zeros_like(nu),
        )
        b_t = jnp.exp(s + u_t - nu + v_t)  # (M1, N1, G) column softmax
        dnu = dnu + dv
        dvb = dv * b_t
        ds = ds - dvb
        du = du - jnp.sum(dvb, axis=1, keepdims=True)  # (M1, 1, G)
        a_t = jnp.exp(s + v_prev - mu + u_t)  # row softmax
        dmu = dmu + du
        dua = du * a_t
        ds = ds - dua
        dv = -jnp.sum(dua, axis=0, keepdims=True)  # cotangent for v_{t-1}
        return ds, jnp.zeros_like(du), dv, dmu, dnu

    ds, _, _, dmu, dnu = jax.lax.fori_loop(
        0,
        num_iter,
        bwd_body,
        (
            gout,
            jnp.sum(gout, axis=1, keepdims=True),
            jnp.sum(gout, axis=0, keepdims=True),
            jnp.zeros_like(mu),
            jnp.zeros_like(nu),
        ),
    )
    ds_ref[...] = ds
    dmu_ref[...] = dmu
    dnu_ref[...] = dnu


def _pallas_backward(padded_scores, log_mu, log_nu, g, num_iter, interpret=False):
    p, m1, n1 = padded_scores.shape
    gsz = GROUP_SIZE
    pad = (-p) % gsz
    if pad:
        padded_scores = jnp.pad(padded_scores, ((0, pad), (0, 0), (0, 0)))
        log_mu = jnp.pad(log_mu, ((0, pad), (0, 0)))
        log_nu = jnp.pad(log_nu, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    pp = p + pad

    scores_t = jnp.transpose(padded_scores, (1, 2, 0))  # (M1, N1, P)
    mu_t = jnp.transpose(log_mu, (1, 0))[:, None, :]  # (M1, 1, P)
    nu_t = jnp.transpose(log_nu, (1, 0))[None, :, :]  # (1, N1, P)
    g_t = jnp.transpose(g, (1, 2, 0))  # (M1, N1, P)

    kernel = functools.partial(_sinkhorn_bwd_kernel, num_iter)
    ds, dmu, dnu = pl.pallas_call(
        kernel,
        grid=(pp // gsz,),
        in_specs=[
            pl.BlockSpec((m1, n1, gsz), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, gsz), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, gsz), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, n1, gsz), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m1, n1, gsz), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, gsz), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1, gsz), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m1, n1, pp), jnp.float32),
            jax.ShapeDtypeStruct((m1, 1, pp), jnp.float32),
            jax.ShapeDtypeStruct((1, n1, pp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_iter, m1, gsz), jnp.float32),
            pltpu.VMEM((num_iter, n1, gsz), jnp.float32),
        ],
        # the transposed cotangent block is a transient — overwrite it
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=interpret,
    )(scores_t, mu_t, nu_t, g_t)
    return (
        jnp.transpose(ds, (2, 0, 1))[:p],
        jnp.transpose(dmu[:, 0, :], (1, 0))[:p],
        jnp.transpose(dnu[0], (1, 0))[:p],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sinkhorn_iterate_pallas(padded_scores, log_mu, log_nu, num_iter,
                            interpret=False):
    """Differentiable fused Sinkhorn: forward = `_pallas_forward`, backward
    = `_pallas_backward` (on-core trajectory recompute + reverse loop).
    Callers must gate training shapes on `supported_shape_bwd`."""
    return _pallas_forward(padded_scores, log_mu, log_nu, num_iter,
                           interpret=interpret)


def _vjp_fwd(padded_scores, log_mu, log_nu, num_iter, interpret=False):
    out = _pallas_forward(padded_scores, log_mu, log_nu, num_iter,
                          interpret=interpret)
    return out, (padded_scores, log_mu, log_nu)


def _vjp_bwd(num_iter, interpret, res, g):
    padded_scores, log_mu, log_nu = res
    ds, dmu, dnu = _pallas_backward(
        padded_scores, log_mu, log_nu, g.astype(jnp.float32), num_iter,
        interpret=interpret,
    )
    return ds, dmu, dnu


sinkhorn_iterate_pallas.defvjp(_vjp_fwd, _vjp_bwd)
