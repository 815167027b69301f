"""DCCRN model family tests: shapes, conv geometry parity vs torch, losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from aec_tpu.models.dccrn import DccrnConfig, dccrn_apply, dccrn_init, dccrn_loss_v1, dccrn_loss_sisnr
from aec_tpu.ops import complex_layers as cl
from aec_tpu.ops.lstm import lstm_init, lstm_scan


def test_complex_conv_matches_torch(rng):
    """Our fused complex conv == torch's two-conv formulation (dccrn.py:141-153)."""
    key = jax.random.PRNGKey(0)
    params = cl.complex_conv_init(key, 4, 8, (5, 1))
    x = rng.standard_normal((2, 16, 10, 4)).astype(np.float32)  # [B,F,T,C]
    got = np.asarray(cl.complex_conv(params, jnp.asarray(x), (2, 1), [(2, 2), (0, 0)]))

    # torch oracle in NCHW
    conv_r = torch.nn.Conv2d(2, 4, (5, 1), (2, 1), padding=(2, 0))
    conv_i = torch.nn.Conv2d(2, 4, (5, 1), (2, 1), padding=(2, 0))
    with torch.no_grad():
        # HWIO -> OIHW
        conv_r.weight.copy_(torch.from_numpy(np.transpose(np.asarray(params["w_r"]), (3, 2, 0, 1))))
        conv_i.weight.copy_(torch.from_numpy(np.transpose(np.asarray(params["w_i"]), (3, 2, 0, 1))))
        conv_r.bias.copy_(torch.from_numpy(np.asarray(params["b_r"])))
        conv_i.bias.copy_(torch.from_numpy(np.asarray(params["b_i"])))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
        xr, xi = xt[:, :2], xt[:, 2:]
        yr = conv_r(xr) - conv_i(xi)
        yi = conv_i(xr) + conv_r(xi)
        want = torch.cat([yr, yi], 1).numpy()
    want = np.transpose(want, (0, 2, 3, 1))  # back to NHWC
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_complex_conv_transpose_matches_torch(rng):
    key = jax.random.PRNGKey(1)
    params = cl.complex_conv_init(key, 8, 4, (5, 1))
    x = rng.standard_normal((2, 8, 10, 8)).astype(np.float32)
    got = np.asarray(
        cl.complex_conv_transpose(params, jnp.asarray(x), (2, 1), (2, 0), (1, 0))
    )
    tconv_r = torch.nn.ConvTranspose2d(4, 2, (5, 1), (2, 1), padding=(2, 0), output_padding=(1, 0))
    tconv_i = torch.nn.ConvTranspose2d(4, 2, (5, 1), (2, 1), padding=(2, 0), output_padding=(1, 0))
    with torch.no_grad():
        # HWIO -> IOHW (torch transpose-conv weight is (in, out, kh, kw))
        tconv_r.weight.copy_(torch.from_numpy(np.transpose(np.asarray(params["w_r"]), (2, 3, 0, 1))))
        tconv_i.weight.copy_(torch.from_numpy(np.transpose(np.asarray(params["w_i"]), (2, 3, 0, 1))))
        tconv_r.bias.copy_(torch.from_numpy(np.asarray(params["b_r"])))
        tconv_i.bias.copy_(torch.from_numpy(np.asarray(params["b_i"])))
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        xr, xi = xt[:, :4], xt[:, 4:]
        yr = tconv_r(xr) - tconv_i(xi)
        yi = tconv_i(xr) + tconv_r(xi)
        want = np.transpose(torch.cat([yr, yi], 1).numpy(), (0, 2, 3, 1))
    assert got.shape == want.shape  # (2, 16, 10, 4)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_lstm_matches_torch(rng):
    params = lstm_init(jax.random.PRNGKey(2), 16, 8)
    x = rng.standard_normal((3, 12, 16)).astype(np.float32)
    ours, _ = lstm_scan(params, jnp.asarray(x))
    ref = torch.nn.LSTM(16, 8, num_layers=1, batch_first=True)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["w_ih"])))
        ref.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["w_hh"])))
        ref.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["b_ih"])))
        ref.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["b_hh"])))
        want = ref(torch.from_numpy(x))[0].numpy()
    np.testing.assert_allclose(np.asarray(ours), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("mode", ["E", "C", "R"])
def test_dccrn_forward_shapes(rng, mode):
    cfg = DccrnConfig(masking_mode=mode, use_clstm=False)
    params, state = dccrn_init(jax.random.PRNGKey(3), cfg)
    n = 4096
    mic = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    out, _ = dccrn_apply(params, state, mic, far, cfg)
    assert out["wav"].shape == (2, n)
    assert out["mask_re"].shape == (2, 257, n // 256 + 1)
    assert bool(jnp.isfinite(out["wav"]).all())


def test_dccrn_clstm_forward(rng):
    cfg = DccrnConfig(use_clstm=True, rnn_layers=2)
    params, state = dccrn_init(jax.random.PRNGKey(4), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    out, _ = dccrn_apply(params, state, mic, far, cfg)
    assert out["wav"].shape == (1, 4096)
    assert bool(jnp.isfinite(out["wav"]).all())


def test_dccrn_v1_loss_trains(rng):
    import optax

    cfg = DccrnConfig(use_clstm=False, masking_mode="C")
    params, state = dccrn_init(jax.random.PRNGKey(5), cfg)
    n = 4096
    far = rng.standard_normal((1, n)).astype(np.float32)
    rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(np.float32)
    echo = np.stack([np.convolve(far[0], 0.3 * rir)[:n]]).astype(np.float32)
    near = (0.2 * rng.standard_normal((1, n))).astype(np.float32)
    mic, far, near, echo = map(jnp.asarray, (near + echo, far, near, echo))

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, state):
        def lf(p):
            loss, aux = dccrn_loss_v1(p, state, mic, far, near, echo, cfg)
            return loss, aux["state"]

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, new_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, state, loss = step(params, opt_state, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dccrn_sisnr_loss_finite(rng):
    cfg = DccrnConfig(use_clstm=False)
    params, state = dccrn_init(jax.random.PRNGKey(6), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    near = jnp.asarray((0.3 * rng.standard_normal((1, 4096))).astype(np.float32))
    loss, aux = dccrn_loss_sisnr(params, state, mic, far, near, cfg)
    assert np.isfinite(float(loss))


def test_lstm_bf16_recurrent_stream_close_to_f32(rng):
    """The TPU-default bf16 recurrent-weight stream (op-equivalent to the
    MXU's DEFAULT-precision operand rounding; halves the per-step HBM
    weight traffic — ops/lstm.lstm_scan) tracks the f32 scan within bf16
    rounding, and gradients flow through the cast."""
    params = lstm_init(jax.random.PRNGKey(2), 16, 8)
    x = jnp.asarray(rng.standard_normal((3, 40, 16)).astype(np.float32))
    f32, _ = lstm_scan(params, x)
    b16, _ = lstm_scan(params, x, recurrent_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(b16), np.asarray(f32),
        atol=3e-2 * float(jnp.abs(f32).max()),
    )
    g = jax.grad(
        lambda p: jnp.sum(lstm_scan(p, x, recurrent_dtype=jnp.bfloat16)[0] ** 2)
    )(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_lstm_int8_recurrent_stream_close_to_f32(rng):
    """The opt-in int8 recurrent-weight stream (per-row symmetric weight
    quant + fixed-scale int8 hidden state, s8xs8->s32 matmul — halves the
    HBM weight stream vs bf16; ops/lstm.lstm_scan) tracks the f32 scan
    within the quantization grid. Inference-only (round has zero grad)."""
    from aec_tpu.ops.lstm import quantize_rows_int8

    params = lstm_init(jax.random.PRNGKey(3), 32, 32)
    # per-row quant round-trips within half a grid step
    w_q, scale = quantize_rows_int8(params["w_hh"])
    back = np.asarray(w_q, np.float64) * np.asarray(scale, np.float64)[:, None]
    np.testing.assert_allclose(
        back, np.asarray(params["w_hh"], np.float64),
        atol=float(scale.max()) * 0.5 + 1e-12,
    )
    x = jnp.asarray(rng.standard_normal((2, 50, 32)).astype(np.float32))
    f32, (h32, c32) = lstm_scan(params, x, recurrent_dtype=jnp.float32)
    i8, (h8, c8) = lstm_scan(params, x, recurrent_dtype="int8")
    rel = float(jnp.linalg.norm(i8 - f32) / jnp.linalg.norm(f32))
    assert rel < 0.03, rel  # measured ~5e-3 at H=32..4096 (ab_lstm_int8)
    assert h8.shape == h32.shape and c8.shape == c32.shape


def test_lstm_recurrent_dtype_spellings(rng):
    """ADVICE r3: dtype-object spellings must match the string route (the
    old code's .astype(int8) in the cast branch silently truncated weights
    to 0); other integer dtypes raise; out-of-range h0 is clipped, not
    implementation-defined."""
    import pytest

    params = lstm_init(jax.random.PRNGKey(5), 8, 8)
    x = jnp.asarray(0.3 * rng.standard_normal((2, 20, 8)).astype(np.float32))
    y_str, _ = lstm_scan(params, x, recurrent_dtype="int8")
    for spelling in (jnp.int8, np.int8, np.dtype("int8")):
        y_obj, _ = lstm_scan(params, x, recurrent_dtype=spelling)
        np.testing.assert_array_equal(np.asarray(y_obj), np.asarray(y_str))
    for bad in (jnp.int16, jnp.int32, "int32", np.uint8):
        with pytest.raises(ValueError):
            lstm_scan(params, x, recurrent_dtype=bad)
    # bf16 string spelling == dtype spelling
    y_b1, _ = lstm_scan(params, x, recurrent_dtype="bfloat16")
    y_b2, _ = lstm_scan(params, x, recurrent_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(y_b1), np.asarray(y_b2))
    # |h0| > 1 (foreign-scaled state) stays finite through the int8 quant
    h0 = jnp.full((2, 8), 3.0, jnp.float32)
    y_oob, _ = lstm_scan(params, x, h0=h0, recurrent_dtype="int8")
    assert np.isfinite(np.asarray(y_oob)).all()


def test_att_ccrn_int8_lstm_route(rng):
    """att_ccrn_apply(lstm_recurrent_dtype="int8") runs and stays close to
    the default path end-to-end (the batch-1 serving knob)."""
    from aec_tpu.models.att_ccrn import AttCcrnConfig, att_ccrn_apply, att_ccrn_init

    cfg = AttCcrnConfig()
    params, state = att_ccrn_init(jax.random.PRNGKey(4), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    ref, _ = att_ccrn_apply(params, state, mic, far, cfg)
    out, _ = att_ccrn_apply(
        params, state, mic, far, cfg, lstm_recurrent_dtype="int8"
    )
    ref_w, out_w = np.asarray(ref["wav"]), np.asarray(out["wav"])
    err = np.linalg.norm(out_w - ref_w) / max(np.linalg.norm(ref_w), 1e-12)
    assert err < 0.05, err
