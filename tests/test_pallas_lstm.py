"""Fused grouped complex-LSTM kernel (kernels/pallas_lstm.py) vs the
grouped scan (ops/lstm.complex_lstm_scan), interpret mode + gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.ops.lstm import complex_lstm_init, complex_lstm_scan


def test_fused_complex_lstm_matches_scan_and_grads(rng):
    """Forward within bf16 weight rounding (the kernel ships w_hh as bf16 —
    the same single-pass-bf16 tier the scan's DEFAULT einsum uses on TPU;
    on CPU the scan runs fp32, so the delta here IS that rounding), and
    the custom_vjp backward recomputes through the scan exactly."""
    params = complex_lstm_init(jax.random.PRNGKey(1), 64, 64)
    r = jnp.asarray(rng.standard_normal((1, 96, 32)).astype(np.float32))
    i = jnp.asarray(rng.standard_normal((1, 96, 32)).astype(np.float32))
    ro, io = complex_lstm_scan(params, r, i, fused=False)
    rf, if_ = complex_lstm_scan(params, r, i, fused=True)  # interpret off-TPU
    scale = float(jnp.abs(ro).max())
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ro),
                               atol=5e-3 * scale)
    np.testing.assert_allclose(np.asarray(if_), np.asarray(io),
                               atol=5e-3 * scale)

    def loss(p, fused):
        a, b = complex_lstm_scan(p, r, i, fused=fused)
        return jnp.sum(a * a) + jnp.sum(b * b)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    # the backward recomputes through the scan, but the cotangents enter at
    # the FUSED forward's outputs, so grads inherit the forward's bf16
    # weight rounding (~5e-3 rel) — same tier as the forward tolerance
    for l0, l1 in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        s = max(float(jnp.abs(l0).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   atol=2e-2 * s)


def test_fused_complex_lstm_batched(rng):
    """The auto-route now covers b<=16 (measured winner at every swept
    batch — benchmarks/results/ab_lstm_batch_r3.json); pin batched-forward
    parity in interpret mode."""
    params = complex_lstm_init(jax.random.PRNGKey(2), 48, 48)
    r = jnp.asarray(rng.standard_normal((4, 80, 24)).astype(np.float32))
    i = jnp.asarray(rng.standard_normal((4, 80, 24)).astype(np.float32))
    ro, io = complex_lstm_scan(params, r, i, fused=False)
    rf, if_ = complex_lstm_scan(params, r, i, fused=True)
    scale = float(jnp.abs(ro).max())
    np.testing.assert_allclose(np.asarray(rf), np.asarray(ro), atol=5e-3 * scale)
    np.testing.assert_allclose(np.asarray(if_), np.asarray(io), atol=5e-3 * scale)


def test_int8_resident_kernel_matches_int8_scan(rng):
    """Round-4 (verdict item 3): the int8-RESIDENT Pallas LSTM
    (kernels/pallas_lstm.lstm_int8_fused — quantized weights pinned in
    VMEM, h carried as int8 scratch) is numerically the SAME recurrence as
    ops/lstm.lstm_scan's int8 branch: requantizing f32 h each step is a
    pure function of h, so the int8 carry is equivalent. Interpret mode;
    covers a non-divisible unroll tail (t=70 vs unroll=8) and the final
    (h, c) state contract."""
    from aec_tpu.ops.lstm import lstm_init, lstm_scan

    params = lstm_init(jax.random.PRNGKey(7), 256, 128)
    x = jnp.asarray(0.3 * rng.standard_normal((2, 70, 256)).astype(np.float32))
    y_s, (h_s, c_s) = lstm_scan(params, x, recurrent_dtype="int8",
                                int8_kernel=False)
    y_k, (h_k, c_k) = lstm_scan(params, x, recurrent_dtype="int8",
                                int8_kernel=True)
    scale = float(jnp.abs(y_s).max())
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_s),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_s),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_s),
                               atol=1e-5 * max(float(jnp.abs(c_s).max()), 1.0))
