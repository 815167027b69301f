"""Fused Pallas GRU scan == lax.scan GRU, values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aec_tpu.kernels.pallas_gru import _gru_scan_fused_fwd
from aec_tpu.ops.gru import gru_init, gru_scan


@pytest.mark.parametrize("b,t,i,h", [(4, 37, 64, 32), (1, 8, 16, 8)])
def test_fused_matches_scan(b, t, i, h):
    key = jax.random.PRNGKey(0)
    params = gru_init(key, i, h)
    x = jax.random.normal(jax.random.fold_in(key, 1), (b, t, i), jnp.float32)
    h0 = jax.random.normal(jax.random.fold_in(key, 2), (b, h), jnp.float32)

    ys_ref, hT_ref = gru_scan(params, x, h0, fused=False)
    ys, hT = _gru_scan_fused_fwd(params, x, h0, interpret=True, unroll=4)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=2e-6)


def test_fused_unroll_padding():
    # T not a multiple of unroll: padded steps must not leak into outputs.
    params = gru_init(jax.random.PRNGKey(3), 8, 8)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8), jnp.float32)
    h0 = jnp.zeros((2, 8), jnp.float32)
    ys_ref, hT_ref = gru_scan(params, x, h0, fused=False)
    ys, hT = _gru_scan_fused_fwd(params, x, h0, interpret=True, unroll=4)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=2e-6)


def test_custom_bwd_matches_scan_vjp():
    # gru_scan_fused's backward recomputes through the scan formulation; the
    # custom bwd fed the fused residuals must equal jax.vjp of the scan.
    from aec_tpu.kernels.pallas_gru import _bwd

    params = gru_init(jax.random.PRNGKey(5), 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 11, 16), jnp.float32)
    h0 = jax.random.normal(jax.random.PRNGKey(7), (3, 8), jnp.float32)

    ys, hT = gru_scan(params, x, h0, fused=False)
    g = (jnp.ones_like(ys) * 0.5, jnp.ones_like(hT))

    _, vjp = jax.vjp(lambda *a: gru_scan(*a, fused=False), params, x, h0)
    want = vjp(g)
    got = _bwd(False, (params, x, h0), g)  # interpret is a nondiff argnum
    for w, got_leaf in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(got_leaf), np.asarray(w), rtol=1e-5, atol=1e-6
        )
