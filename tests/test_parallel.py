"""Multi-chip data-parallel tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.configs import TrainConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.models.little_net import little_net_init, little_net_loss
from aec_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_batch
from aec_tpu.train.loop import make_optimizer, make_train_step


def test_mesh_construction(cpu_devices):
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_sharded_train_step_matches_single_device(cpu_devices, rng):
    b, n = 8, 4096
    mic = rng.standard_normal((b, n)).astype(np.float32)
    ref = rng.standard_normal((b, n)).astype(np.float32)
    near = (0.2 * rng.standard_normal((b, n))).astype(np.float32)
    erb = jnp.asarray(erb_filterbank())
    params = little_net_init(jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=1e-3)
    opt = make_optimizer(cfg, steps_per_epoch=100)

    # single-device reference step
    p1 = jax.tree.map(jnp.copy, params)
    step1 = make_train_step(little_net_loss, opt)
    p1, _, loss1 = step1(p1, opt.init(p1), jnp.asarray(mic), jnp.asarray(ref), jnp.asarray(near), erb)

    # 8-way data-parallel step
    mesh = make_mesh()
    p8 = jax.tree.map(jnp.copy, params)
    step8 = make_train_step(little_net_loss, opt, mesh)
    batch = shard_batch(mesh, {"mic": mic, "ref": ref, "near": near})
    p8, _, loss8 = step8(p8, opt.init(p8), batch["mic"], batch["ref"], batch["near"], erb)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    # params after one Adam step: grad all-reduce order can flip the sign of
    # near-zero grads through Adam's rescale, so bound by the update scale
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3 * cfg.lr)


def test_batch_inference_sharded(cpu_devices, rng):
    # embarrassingly-parallel utterance sharding for batch inference
    from aec_tpu.models.little_net import little_net_apply

    mesh = make_mesh()
    erb = jnp.asarray(erb_filterbank())
    params = little_net_init(jax.random.PRNGKey(1))
    mic = rng.standard_normal((16, 4096)).astype(np.float32)
    ref = rng.standard_normal((16, 4096)).astype(np.float32)

    fn = jax.jit(
        lambda p, m, r: little_net_apply(p, m, r, erb, normalize=False)["wav"],
        in_shardings=(replicated(mesh), data_sharding(mesh), data_sharding(mesh)),
        out_shardings=data_sharding(mesh),
    )
    wav = fn(params, jnp.asarray(mic), jnp.asarray(ref))
    assert wav.shape == (16, 4096)
    single = little_net_apply(
        params, jnp.asarray(mic[:1]), jnp.asarray(ref[:1]), erb, normalize=False
    )["wav"]
    np.testing.assert_allclose(np.asarray(wav[0]), np.asarray(single[0]), rtol=1e-4, atol=1e-3)


def test_tp_lstm_matches_dense_scan(cpu_devices, rng):
    """Gate-sharded tensor-parallel LSTM == ops.lstm.lstm_scan (the
    contraction is never split, so parity is tight)."""
    from aec_tpu.ops.lstm import lstm_init, lstm_scan
    from aec_tpu.parallel.tp_lstm import lstm_scan_tp, shard_lstm_params

    b, t, i, h = 3, 17, 12, 32
    params = lstm_init(jax.random.PRNGKey(0), i, h)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    ref, (h_ref, c_ref) = lstm_scan(params, x)

    mesh = make_mesh(n_data=1, n_model=8)
    ys, (h_t, c_t) = jax.jit(
        lambda p, x: lstm_scan_tp(p, x, mesh, "model")
    )(params, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(h_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(c_t), np.asarray(c_ref), atol=2e-6)

    # pre-sharded placement gives the same result
    sp = shard_lstm_params(params, mesh, "model")
    ys2, _ = jax.jit(lambda p, x: lstm_scan_tp(p, x, mesh, "model"))(sp, x)
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys), atol=1e-6)


def test_tp_lstm_initial_state_and_mixed_mesh(cpu_devices, rng):
    """h0/c0 round through the TP scan on a data x model (2x4) mesh."""
    from aec_tpu.ops.lstm import lstm_init, lstm_scan
    from aec_tpu.parallel.tp_lstm import lstm_scan_tp

    b, t, i, h = 2, 9, 8, 16
    params = lstm_init(jax.random.PRNGKey(1), i, h)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    ref, _ = lstm_scan(params, x, h0=h0, c0=c0)
    mesh = make_mesh(n_data=2, n_model=4)
    ys, _ = jax.jit(lambda p, x: lstm_scan_tp(p, x, mesh, "model", h0=h0, c0=c0))(params, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=2e-6)


def test_att_ccrn_tp_bottleneck_matches(cpu_devices, rng):
    """att_ccrn_apply(lstm_mesh=...) == the dense forward."""
    from aec_tpu.models.att_ccrn import AttCcrnConfig, att_ccrn_apply, att_ccrn_init

    cfg = AttCcrnConfig(channels=(1, 2, 4, 4, 8))
    params, state = att_ccrn_init(jax.random.PRNGKey(0), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    ref, _ = att_ccrn_apply(params, state, mic, far, cfg)
    mesh = make_mesh(n_data=1, n_model=8)
    out, _ = jax.jit(
        lambda p, s, m, f: att_ccrn_apply(p, s, m, f, cfg, lstm_mesh=mesh)
    )(params, state, mic, far)
    np.testing.assert_allclose(
        np.asarray(out["wav"]), np.asarray(ref["wav"]), atol=1e-5
    )


def test_att_ccrn_mesh_rejects_recurrent_dtype(cpu_devices, rng):
    """ADVICE r3: lstm_recurrent_dtype was silently ignored when lstm_mesh
    was set (caller asked for int8, got bf16 with no signal) — now raises."""
    import pytest

    from aec_tpu.models.att_ccrn import AttCcrnConfig, att_ccrn_apply, att_ccrn_init

    cfg = AttCcrnConfig(channels=(1, 2, 4, 4, 8))
    params, state = att_ccrn_init(jax.random.PRNGKey(0), cfg)
    mic = jnp.zeros((1, 4000), jnp.float32)
    mesh = make_mesh(n_data=1, n_model=8)
    with pytest.raises(ValueError, match="lstm_recurrent_dtype"):
        att_ccrn_apply(
            params, state, mic, mic, cfg,
            lstm_mesh=mesh, lstm_recurrent_dtype="int8",
        )


def test_tp_lstm_gradients_match_dense(cpu_devices, rng):
    """jax.grad flows through the shard_map TP scan and matches the dense
    scan's gradients (ATT-CCRN remains trainable with lstm_mesh set)."""
    from aec_tpu.ops.lstm import lstm_init, lstm_scan
    from aec_tpu.parallel.tp_lstm import lstm_scan_tp

    b, t, i, h = 2, 11, 8, 16
    params = lstm_init(jax.random.PRNGKey(2), i, h)
    x = jnp.asarray(rng.standard_normal((b, t, i)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((b, t, h)).astype(np.float32))
    mesh = make_mesh(n_data=1, n_model=8)

    loss_dense = lambda p: jnp.mean((lstm_scan(p, x)[0] - tgt) ** 2)
    loss_tp = lambda p: jnp.mean((lstm_scan_tp(p, x, mesh, "model")[0] - tgt) ** 2)
    g_dense = jax.grad(loss_dense)(params)
    g_tp = jax.jit(jax.grad(loss_tp))(params)
    for k in g_dense:
        np.testing.assert_allclose(
            np.asarray(g_tp[k]), np.asarray(g_dense[k]), atol=1e-6,
            err_msg=f"grad mismatch on {k}",
        )
