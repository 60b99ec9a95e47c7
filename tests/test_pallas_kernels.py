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
        sk.pl, "pallas_call", lambda *a, **k: orig(*a, interpret=True, **k)
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
