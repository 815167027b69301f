"""Stateful-model SPMD training (DCCRN on the 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from aec_tpu.models.dccrn import DccrnConfig, dccrn_init, dccrn_loss_v1
from aec_tpu.parallel.mesh import make_mesh, shard_batch
from aec_tpu.train.loop import make_stateful_train_step


def _scene(rng, b, n):
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(np.float32)
    echo = np.stack([np.convolve(f, 0.3 * rir)[:n] for f in far]).astype(np.float32)
    near = (0.2 * rng.standard_normal((b, n))).astype(np.float32)
    return near + echo, far, near, echo


def test_dccrn_stateful_step_on_mesh(cpu_devices, rng):
    cfg = DccrnConfig(
        use_clstm=False, use_cbn=False, conv_channels=(4, 8, 16), masking_mode="C"
    )  # real BN pinned: the assertion below checks real-BN running stats
    params, state = dccrn_init(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    mesh = make_mesh()

    def loss_fn(p, s, mic, far, near, echo):
        return dccrn_loss_v1(p, s, mic, far, near, echo, cfg, train=True)

    step = make_stateful_train_step(loss_fn, opt, mesh)
    mic, far, near, echo = _scene(rng, 8, 4096)
    batch = shard_batch(mesh, {"mic": mic, "far": far, "near": near, "echo": echo})
    losses = []
    for _ in range(3):
        params, opt_state, state, loss = step(
            params, opt_state, state, batch["mic"], batch["far"], batch["near"], batch["echo"]
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # BN running stats moved away from init
    assert float(jnp.abs(state["encoder"][0]["bn"]["mean"]).max()) > 0


def test_dccrn_stateful_step_single_device(rng):
    cfg = DccrnConfig(use_clstm=False, conv_channels=(4, 8), masking_mode="R")
    params, state = dccrn_init(jax.random.PRNGKey(1), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, s, mic, far, near, echo):
        return dccrn_loss_v1(p, s, mic, far, near, echo, cfg, train=True)

    step = make_stateful_train_step(loss_fn, opt)
    mic, far, near, echo = map(jnp.asarray, _scene(rng, 2, 4096))
    params, opt_state, state, loss = step(params, opt_state, state, mic, far, near, echo)
    assert np.isfinite(float(loss))
