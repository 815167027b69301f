"""GRU scan parity against torch.nn.GRU (the reference's recurrence)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.ops.gru import gru_init, gru_scan
from oracles import torch_gru_forward


def test_gru_matches_torch(rng):
    key = jax.random.PRNGKey(0)
    params = gru_init(key, 64, 32)
    x = rng.standard_normal((3, 50, 64)).astype(np.float32)
    ours, h_last = gru_scan(params, jnp.asarray(x))
    np_params = jax.tree.map(np.asarray, dict(params))
    want = torch_gru_forward(np_params, x)
    np.testing.assert_allclose(np.asarray(ours), want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_last), want[:, -1], atol=2e-5, rtol=1e-4)


def test_gru_initial_state_continuation(rng):
    # scanning [0:T] must equal scanning [0:T1] then [T1:T] with carried h
    key = jax.random.PRNGKey(1)
    params = gru_init(key, 8, 4)
    x = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
    full, _ = gru_scan(params, x)
    first, h = gru_scan(params, x[:, :9])
    second, _ = gru_scan(params, x[:, 9:], h0=h)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([first, second], axis=1)),
        np.asarray(full),
        atol=1e-6,
    )


def test_gru_param_shapes_and_orthogonality():
    params = gru_init(jax.random.PRNGKey(2), 64, 32)
    assert params["w_ih"].shape == (96, 64)
    assert params["w_hh"].shape == (96, 32)
    # orthogonal init: columns of (96, 32) are orthonormal
    w = np.asarray(params["w_hh"], dtype=np.float64)
    np.testing.assert_allclose(w.T @ w, np.eye(32), atol=1e-5)
