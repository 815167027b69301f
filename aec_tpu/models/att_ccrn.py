"""ATT-CCRN — attention-gated dual-encoder CRN post-filter (REPAIRED).

The reference's ATT_CCRN cannot run: its forward references undefined
variables and a nonexistent ``self.encoder`` (attention_ccrn.py:390,394;
SURVEY §2.3). This module implements the architecture the reference's
module declarations describe (attention_ccrn.py:240-374):

- TWO magnitude encoders — mic (PReLU) and far-end (ReLU) conv stacks
  (attention_ccrn.py:286-327, realized with real convs since the inputs are
  magnitudes);
- an additive attention gate per level (``Attention_block``,
  attention_ccrn.py:240-273: 1x1 convs + BN, psi = sigmoid(conv(relu(g+x))),
  output x * psi) gating far-end features by mic features;
- LSTM bottleneck over the concatenated deepest features
  (attention_ccrn.py:369);
- a decoder with gated skip concats emitting a 2-channel complex mask
  (tanh), DC bin re-padded, applied multiplicatively to the mic complex
  spectrum, then iSTFT (attention_ccrn.py:412-420).

Layout/TPU notes as in models/dccrn.py: NHWC grids [B, F, T, C], functional
BatchNorm state, scan LSTM.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig, split_complex
from aec_tpu.ops import complex_layers as cl
from aec_tpu.ops.lstm import lstm_init, lstm_scan


@dataclasses.dataclass(frozen=True)
class AttCcrnConfig:
    channels: tuple[int, ...] = (1, 16, 32, 64, 128)
    kernel: tuple[int, int] = (5, 1)
    stride: tuple[int, int] = (2, 1)
    padding: tuple[int, int] = (2, 0)
    stft: StftConfig = StftConfig()


def _conv_init(key, c_in, c_out, kernel, dtype):
    k1, _ = jax.random.split(key)
    return {
        "w": 0.05 * jax.random.normal(k1, (*kernel, c_in, c_out), dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def _conv(p, x, stride, padding):
    dn = ("NHWC", "HWIO", "NHWC")
    return (
        jax.lax.conv_general_dilated(
            x, p["w"], stride, padding, dimension_numbers=dn
        )
        + p["b"]
    )


def _tconv(p, x, stride, padding, output_padding):
    kh, kw = p["w"].shape[:2]
    ph, pw = padding
    pad = [
        (kh - 1 - ph, kh - 1 - ph + output_padding[0]),
        (kw - 1 - pw, kw - 1 - pw + output_padding[1]),
    ]
    dn = ("NHWC", "HWIO", "NHWC")
    return (
        jax.lax.conv_general_dilated(
            x, jnp.flip(p["w"], (0, 1)), (1, 1), pad, lhs_dilation=stride,
            dimension_numbers=dn,
        )
        + p["b"]
    )


def _att_init(key, f_g, f_l, f_int, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    bn_g = cl.batch_norm_init(f_int, dtype)
    bn_x = cl.batch_norm_init(f_int, dtype)
    bn_psi = cl.batch_norm_init(1, dtype)
    return (
        {
            "w_g": _conv_init(k1, f_g, f_int, (1, 1), dtype),
            "w_x": _conv_init(k2, f_l, f_int, (1, 1), dtype),
            "psi": _conv_init(k3, f_int, 1, (1, 1), dtype),
            "bn_g": bn_g[0],
            "bn_x": bn_x[0],
            "bn_psi": bn_psi[0],
        },
        {"bn_g": bn_g[1], "bn_x": bn_x[1], "bn_psi": bn_psi[1]},
    )


def _att_apply(p, s, g, x, *, train):
    """Attention_block forward (attention_ccrn.py:268-273)."""
    g1 = _conv(p["w_g"], g, (1, 1), [(0, 0), (0, 0)])
    g1, bn_g = cl.batch_norm(p["bn_g"], s["bn_g"], g1, train=train)
    x1 = _conv(p["w_x"], x, (1, 1), [(0, 0), (0, 0)])
    x1, bn_x = cl.batch_norm(p["bn_x"], s["bn_x"], x1, train=train)
    psi = jax.nn.relu(g1 + x1)
    psi = _conv(p["psi"], psi, (1, 1), [(0, 0), (0, 0)])
    psi, bn_psi = cl.batch_norm(p["bn_psi"], s["bn_psi"], psi, train=train)
    psi = jax.nn.sigmoid(psi)
    return x * psi, {"bn_g": bn_g, "bn_x": bn_x, "bn_psi": bn_psi}


def att_ccrn_init(key: jax.Array, cfg: AttCcrnConfig = AttCcrnConfig(), dtype=jnp.float32):
    chans = cfg.channels
    n = len(chans) - 1
    keys = jax.random.split(key, 4 * n + 1)
    params: dict[str, Any] = {"mic_enc": [], "far_enc": [], "att": [], "decoder": []}
    state: dict[str, Any] = {"mic_enc": [], "far_enc": [], "att": [], "decoder": []}
    for i in range(n):
        for name, k in (("mic_enc", keys[4 * i]), ("far_enc", keys[4 * i + 1])):
            conv = _conv_init(k, chans[i], chans[i + 1], cfg.kernel, dtype)
            bn_p, bn_s = cl.batch_norm_init(chans[i + 1], dtype)
            params[name].append({"conv": conv, "bn": bn_p, "prelu": cl.prelu_init(dtype)})
            state[name].append({"bn": bn_s})
        att_p, att_s = _att_init(keys[4 * i + 2], chans[i + 1], chans[i + 1], max(chans[i + 1] // 2, 1), dtype)
        params["att"].append(att_p)
        state["att"].append(att_s)
        # decoder level i consumes [up(out) || mic_skip || far_gated_skip]
        c_dec_in = (2 * chans[n - i]) if i == 0 else chans[n - i] + 2 * chans[n - i]
        c_out = chans[n - i - 1] if i < n - 1 else 2
        dconv = _conv_init(keys[4 * i + 3], c_dec_in, c_out, cfg.kernel, dtype)
        bn_p, bn_s = cl.batch_norm_init(c_out, dtype)
        params["decoder"].append({"conv": dconv, "bn": bn_p, "prelu": cl.prelu_init(dtype)})
        state["decoder"].append({"bn": bn_s})

    f_bottom = (cfg.stft.n_freqs - 1) // (cfg.stride[0] ** n)
    feat = 2 * chans[-1] * f_bottom
    params["lstm"] = lstm_init(keys[-1], feat, feat, dtype)
    return params, state


def att_ccrn_apply(
    params,
    state,
    mic: jax.Array,
    far: jax.Array,
    cfg: AttCcrnConfig = AttCcrnConfig(),
    *,
    train: bool = False,
    lstm_mesh=None,
    lstm_axis: str = "model",
    lstm_recurrent_dtype=None,
):
    """mic/far wav [B, n] -> (outputs dict, new_state).

    ``lstm_mesh``: optional ``jax.sharding.Mesh`` — routes the 4096-unit
    bottleneck LSTM (the model's single-chip cost: its per-step recurrent
    weight stream is HBM-bandwidth-bound, 134 MB bf16/step at batch 1)
    through the tensor-parallel scan (parallel/tp_lstm.py), splitting the
    weight stream ``mesh.shape[lstm_axis]`` ways with a per-step hidden
    all-gather over ICI. Numerically op-identical to the dense scan.

    ``lstm_recurrent_dtype``: forwarded to ``lstm_scan`` (single-chip path
    only). ``"int8"`` streams the bottleneck's recurrent weights quantized
    (inference-only; ~2x less HBM weight traffic than the bf16 default —
    the batch-1 cost — at a graded quality cost, see
    benchmarks/ab_lstm_int8.py).
    """
    scfg = cfg.stft
    mic_spec = stft_mod.stft(mic, scfg)  # [B, T, 2K]
    far_spec = stft_mod.stft(far, scfg)
    mic_mag = stft_mod.magnitude(mic_spec)  # [B, T, K]
    far_mag = stft_mod.magnitude(far_spec)
    # grids [B, F, T, 1], DC dropped
    xm = jnp.swapaxes(mic_mag, -1, -2)[:, 1:, :, None]
    xf = jnp.swapaxes(far_mag, -1, -2)[:, 1:, :, None]

    pad = [(cfg.padding[0],) * 2, (cfg.padding[1],) * 2]
    new_state: dict[str, Any] = {"mic_enc": [], "far_enc": [], "att": [], "decoder": []}
    skips = []
    for i in range(len(params["mic_enc"])):
        lm, lf = params["mic_enc"][i], params["far_enc"][i]
        xm = _conv(lm["conv"], xm, cfg.stride, pad)
        xm, bn_m = cl.batch_norm(lm["bn"], state["mic_enc"][i]["bn"], xm, train=train)
        xm = cl.prelu(lm["prelu"], xm)
        xf = _conv(lf["conv"], xf, cfg.stride, pad)
        xf, bn_f = cl.batch_norm(lf["bn"], state["far_enc"][i]["bn"], xf, train=train)
        xf = jax.nn.relu(xf)
        gated, att_s = _att_apply(params["att"][i], state["att"][i], xm, xf, train=train)
        new_state["mic_enc"].append({"bn": bn_m})
        new_state["far_enc"].append({"bn": bn_f})
        new_state["att"].append(att_s)
        skips.append(jnp.concatenate([xm, gated], axis=-1))

    x = skips[-1]  # [B, F', T, 2C]
    b, f_b, t, c = x.shape
    lstm_in = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f_b)
    if lstm_mesh is not None:
        if lstm_recurrent_dtype is not None:
            # the TP scan has no quantized-stream path; silently ignoring
            # the request would hand back bf16 numerics/perf with no signal
            raise ValueError(
                "lstm_recurrent_dtype is not supported with lstm_mesh "
                "(the tensor-parallel scan streams bf16); drop one of them"
            )
        from aec_tpu.parallel.tp_lstm import lstm_scan_tp

        seq, _ = lstm_scan_tp(params["lstm"], lstm_in, lstm_mesh, lstm_axis)
    else:
        seq, _ = lstm_scan(
            params["lstm"], lstm_in, recurrent_dtype=lstm_recurrent_dtype
        )
    x = seq.reshape(b, t, c, f_b).transpose(0, 3, 1, 2)

    for i, layer in enumerate(params["decoder"]):
        if i > 0:
            x = jnp.concatenate([x, skips[-1 - i]], axis=-1)
        x = _tconv(layer["conv"], x, cfg.stride, cfg.padding, (1, 0))
        x, bn_s = cl.batch_norm(layer["bn"], state["decoder"][i]["bn"], x, train=train)
        last = i == len(params["decoder"]) - 1
        x = jnp.tanh(x) if last else cl.prelu(layer["prelu"], x)
        new_state["decoder"].append({"bn": bn_s})

    mask_re = jnp.pad(x[..., 0], [(0, 0), (1, 0), (0, 0)])  # [B, K, T]
    mask_im = jnp.pad(x[..., 1], [(0, 0), (1, 0), (0, 0)])
    re, im = split_complex(mic_spec)
    re, im = jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)
    est_re = re * mask_re - im * mask_im
    est_im = re * mask_im + im * mask_re
    out_spec = jnp.concatenate(
        [jnp.swapaxes(est_re, -1, -2), jnp.swapaxes(est_im, -1, -2)], axis=-1
    )
    wav = stft_mod.istft(out_spec, scfg)
    return {"wav": wav, "mask_re": mask_re, "mask_im": mask_im, "out_spec": out_spec}, new_state


def att_ccrn_loss(
    params, state, mic, far, near, cfg: AttCcrnConfig = AttCcrnConfig(), *, train=True
):
    """Compressed-magnitude MSE on the masked spectrum vs near-end."""
    out, new_state = att_ccrn_apply(params, state, mic, far, cfg, train=train)
    near_mag = stft_mod.magnitude(stft_mod.stft(near, cfg.stft))
    est_mag = stft_mod.magnitude(out["out_spec"])
    diff = jnp.sqrt(est_mag) - jnp.sqrt(near_mag)
    loss = jnp.mean(diff * diff)
    return loss, {"wav": out["wav"], "state": new_state}
