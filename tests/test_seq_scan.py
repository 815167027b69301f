"""Pipelined sequence-parallel scan == plain sequential scan (8-dev mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig
from aec_tpu.linear.kalman import kalman_init, kalman_step
from aec_tpu.ops.gru import gru_init, gru_cell
from aec_tpu.parallel.mesh import make_mesh
from aec_tpu.parallel.seq_scan import pipelined_scan


def test_pipelined_gru_matches_sequential(cpu_devices, rng):
    mesh = make_mesh()
    params = gru_init(jax.random.PRNGKey(0), 8, 4)

    def step(h, x_t):
        x_proj = x_t[None, :] @ params["w_ih"].T + params["b_ih"]
        h_next = gru_cell(params, h[None, :], x_proj)[0]
        return h_next, h_next

    s, t = 5, 48  # 5 sequences, 48 frames -> 6 frames/device
    xs = jnp.asarray(rng.standard_normal((s, t, 8)).astype(np.float32))
    h0 = jnp.zeros((4,), jnp.float32)

    ys, finals = pipelined_scan(step, h0, xs, mesh)
    assert ys.shape == (s, t, 4)
    assert finals.shape == (s, 4)

    for i in range(s):
        want_h, want_ys = jax.lax.scan(step, h0, xs[i])
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(want_ys), atol=1e-5)
        np.testing.assert_allclose(np.asarray(finals[i]), np.asarray(want_h), atol=1e-5)


def test_pipelined_kalman_matches_sequential(cpu_devices, rng):
    mesh = make_mesh()
    cfg = KalmanConfig(n_blocks=4)
    k = 257

    def step(state, xd):
        x_t, d_t = xd
        return kalman_step(cfg, state, x_t, d_t, block=256)

    s, t = 3, 16  # 3 utterances, 16 blocks -> 2 blocks/device
    x_spec = jnp.asarray(rng.standard_normal((s, t, 2 * k)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((s, t, 256)).astype(np.float32))
    init = kalman_init(cfg, k)

    ys, finals = pipelined_scan(step, init, (x_spec, d), mesh)
    assert ys.shape == (s, t, 256)
    for i in range(s):
        _, want = jax.lax.scan(step, init, (x_spec[i], d[i]))
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(want), atol=1e-4)
