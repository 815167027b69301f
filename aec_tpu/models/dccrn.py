"""DCCRN — deep complex convolution recurrent network for AEC.

TPU-native rebuild of the reference's DCCRN family (dccrn.py:453-594 v1,
dccrn2.py v2 with clstm/masking modes). Architecture:

- inputs mic + far-end as a 2-complex-channel spectrogram grid (DC bin
  dropped, dccrn.py:552-553), layout [B, F, T, C] NHWC with channels
  [reals || imags];
- encoder: 6 complex convs (channels 4->16->...->512 total, kernel (5,1),
  stride (2,1) over frequency) + real BatchNorm + PReLU (net_conf,
  configs.py:29-46);
- bottleneck: plain LSTM over (channels x freq) features (v1,
  dccrn.py:517,560-566) or a complex-LSTM stack (v2 ``use_clstm``,
  dccrn2.py:165-174);
- decoder: mirror transposed complex convs with complex skip-concats;
  final 2-channel (complex) mask, DC bin re-padded;
- masking modes (dccrn2.py:194-212): 'E' tanh-magnitude + phase rotation,
  'C' complex multiply, 'R' real multiply. v1's loss = 0.3 * cIRM-mask MSE
  + 0.7 * echo-leak MSE (dccrn.py:547-588); SI-SNR loss also provided.

All convolutions are NHWC (XLA:TPU's preferred layout); the only recurrence
is the bottleneck scan. BatchNorm runs functionally with explicit state.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig, split_complex
from aec_tpu.ops import complex_layers as cl
from aec_tpu.ops.lstm import complex_lstm_init, complex_lstm_scan, lstm_init, lstm_scan
from aec_tpu.train.metrics import si_snr


@dataclasses.dataclass(frozen=True)
class DccrnConfig:
    """Defaults mirror net_conf (configs.py:29-46)."""

    conv_channels: tuple[int, ...] = (4, 16, 32, 64, 128, 256, 512)
    kernel: tuple[int, int] = (5, 1)
    stride: tuple[int, int] = (2, 1)
    padding: tuple[int, int] = (2, 0)
    masking_mode: str = "E"  # 'E' | 'C' | 'R'
    use_clstm: bool = True
    # complex whitening BN (dccrn2 'use_cbn') vs real BN; the reference's
    # net_conf defaults this ON (configs.py:38)
    use_cbn: bool = True
    rnn_layers: int = 2
    # v2 head (dccrn2.py:99-111): the FINAL decoder stage is a bare complex
    # transposed conv — no BN, no activation (v1 ends in BN+Tanh,
    # dccrn.py:495-510). Defaults True: net_conf (configs.py:29-46) is only
    # consumed by the v2 constructor, so the net_conf-faithful default
    # architecture is v2 end-to-end (clstm + cbn + bare head + 'E' masking).
    v2_head: bool = True
    stft: StftConfig = StftConfig()


def dccrn_init(key: jax.Array, cfg: DccrnConfig = DccrnConfig(), dtype=jnp.float32):
    """Returns (params, state) pytrees. ``state`` carries BN running stats."""
    chans = cfg.conv_channels
    n_enc = len(chans) - 1
    keys = jax.random.split(key, 2 * n_enc + 2)
    def bn_init(k, c):
        if cfg.use_cbn:
            return cl.complex_batch_norm_init(k, c, dtype)
        return cl.batch_norm_init(c, dtype)

    bn_keys = jax.random.split(jax.random.fold_in(key, 1), 2 * n_enc)
    enc, enc_state = [], []
    for i in range(n_enc):
        conv = cl.complex_conv_init(keys[i], chans[i], chans[i + 1], cfg.kernel, dtype)
        bn_p, bn_s = bn_init(bn_keys[i], chans[i + 1])
        enc.append({"conv": conv, "bn": bn_p, "prelu": cl.prelu_init(dtype)})
        enc_state.append({"bn": bn_s})

    dec, dec_state = [], []
    for i in range(n_enc - 1, -1, -1):
        c_out = chans[i] if i > 0 else 2
        conv = cl.complex_conv_init(
            keys[n_enc + (n_enc - 1 - i)], chans[i + 1] * 2, c_out, cfg.kernel, dtype
        )
        layer = {"conv": conv}
        if i > 0 or not cfg.v2_head:
            bn_p, bn_s = bn_init(bn_keys[n_enc + (n_enc - 1 - i)], c_out)
            layer["bn"] = bn_p
        else:  # v2: bare conv on the final stage (dccrn2.py:99-111)
            bn_s = {}
        if i > 0:  # final v1 stage ends in Tanh, no PReLU (dccrn.py:495-510)
            layer["prelu"] = cl.prelu_init(dtype)
        dec.append(layer)
        dec_state.append({"bn": bn_s})

    # bottleneck feature width: channels * freq at the deepest level
    f_bottom = (cfg.stft.n_freqs - 1) // (cfg.stride[0] ** n_enc)
    feat = chans[-1] * f_bottom
    if cfg.use_clstm:
        rnn = [
            complex_lstm_init(k, feat, feat, dtype)
            for k in jax.random.split(keys[-1], cfg.rnn_layers)
        ]
    else:
        rnn = lstm_init(keys[-1], feat, feat, dtype)

    params = {"encoder": enc, "decoder": dec, "rnn": rnn}
    state = {"encoder": enc_state, "decoder": dec_state}
    return params, state


def _to_grid(spec: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, T, 2K] -> real/imag grids [B, K, T] (frequency-major)."""
    re, im = split_complex(spec)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def dccrn_apply(
    params,
    state,
    mic: jax.Array,
    far: jax.Array,
    cfg: DccrnConfig = DccrnConfig(),
    *,
    train: bool = False,
) -> tuple[dict[str, jax.Array], Any]:
    """mic/far wav [B, n] -> (outputs dict, new_state).

    Outputs: ``wav`` [B, n], ``mask_re``/``mask_im`` [B, K, T],
    ``mic_spec`` [B, T, 2K].
    """
    scfg = cfg.stft
    mic_spec = stft_mod.stft(mic, scfg)  # [B, T, 2K]
    far_spec = stft_mod.stft(far, scfg)
    mic_re, mic_im = _to_grid(mic_spec)  # [B, K, T]
    far_re, far_im = _to_grid(far_spec)

    # channel stack [mic_r, far_r || mic_i, far_i], drop DC (dccrn.py:552-553)
    x = jnp.stack([mic_re, far_re, mic_im, far_im], axis=-1)[:, 1:]  # [B,F,T,4]

    bn_apply = cl.complex_batch_norm if cfg.use_cbn else cl.batch_norm

    new_enc_state, skips = [], []
    pad = [(cfg.padding[0],) * 2, (cfg.padding[1],) * 2]
    for layer, lstate in zip(params["encoder"], state["encoder"]):
        x = cl.complex_conv(layer["conv"], x, cfg.stride, pad)
        x, bn_s = bn_apply(layer["bn"], lstate["bn"], x, train=train)
        x = cl.prelu(layer["prelu"], x)
        new_enc_state.append({"bn": bn_s})
        skips.append(x)

    # bottleneck: [B, F', T, C] -> [B, T, C*F'] (channel-major like the
    # reference's reshape, dccrn.py:562-563)
    b, f_b, t, c = x.shape
    seq = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f_b)
    if cfg.use_clstm:
        half = (c // 2) * f_b
        r_seq = jnp.transpose(x[..., : c // 2], (0, 2, 3, 1)).reshape(b, t, half)
        i_seq = jnp.transpose(x[..., c // 2 :], (0, 2, 3, 1)).reshape(b, t, half)
        for lp in params["rnn"]:
            r_seq, i_seq = complex_lstm_scan(lp, r_seq, i_seq)
        r_g = r_seq.reshape(b, t, c // 2, f_b).transpose(0, 3, 1, 2)
        i_g = i_seq.reshape(b, t, c // 2, f_b).transpose(0, 3, 1, 2)
        x = jnp.concatenate([r_g, i_g], axis=-1)
    else:
        seq, _ = lstm_scan(params["rnn"], seq)
        x = seq.reshape(b, t, c, f_b).transpose(0, 3, 1, 2)

    new_dec_state = []
    for i, (layer, lstate) in enumerate(zip(params["decoder"], state["decoder"])):
        x = cl.complex_cat([x, skips[-1 - i]])
        x = cl.complex_conv_transpose(
            layer["conv"], x, cfg.stride, cfg.padding, output_padding=(1, 0)
        )
        last = i == len(params["decoder"]) - 1
        if last and cfg.v2_head:  # bare conv (dccrn2.py:99-111)
            bn_s = lstate["bn"]
        else:
            x, bn_s = bn_apply(layer["bn"], lstate["bn"], x, train=train)
            x = jnp.tanh(x) if last else cl.prelu(layer["prelu"], x)
        new_dec_state.append({"bn": bn_s})

    # mask: re-pad the DC bin (dccrn.py:576-577)
    mask_re = jnp.pad(x[..., 0], [(0, 0), (1, 0), (0, 0)])  # [B, K, T]
    mask_im = jnp.pad(x[..., 1], [(0, 0), (1, 0), (0, 0)])

    if cfg.masking_mode == "E":
        mask_mag = jnp.sqrt(mask_re**2 + mask_im**2)
        mask_phase = jnp.arctan2(
            mask_im / (mask_mag + 1e-8), mask_re / (mask_mag + 1e-8)
        )
        # in-sqrt 1e-8 matches the v2 reference (dccrn2.py:139) — the only
        # reference 'E' path; v1 hard-codes complex-multiply masking
        mic_mag = jnp.sqrt(mic_re**2 + mic_im**2 + 1e-8)
        mic_phase = jnp.arctan2(mic_im, mic_re)
        est_mag = jnp.tanh(mask_mag) * mic_mag
        est_phase = mic_phase + mask_phase
        est_re, est_im = est_mag * jnp.cos(est_phase), est_mag * jnp.sin(est_phase)
    elif cfg.masking_mode == "C":
        est_re = mic_re * mask_re - mic_im * mask_im
        est_im = mic_re * mask_im + mic_im * mask_re
    elif cfg.masking_mode == "R":
        est_re, est_im = mic_re * mask_re, mic_im * mask_im
    else:
        raise ValueError(f"unknown masking mode {cfg.masking_mode!r}")

    out_spec = jnp.concatenate(
        [jnp.swapaxes(est_re, -1, -2), jnp.swapaxes(est_im, -1, -2)], axis=-1
    )
    wav = stft_mod.istft(out_spec, scfg)
    outputs = {
        "wav": wav,
        "mask_re": mask_re,
        "mask_im": mask_im,
        "mic_spec": mic_spec,
        "out_spec": out_spec,
    }
    new_state = {"encoder": new_enc_state, "decoder": new_dec_state}
    return outputs, new_state


def dccrn_loss_v1(
    params,
    state,
    mic: jax.Array,
    far: jax.Array,
    near: jax.Array,
    echo: jax.Array,
    cfg: DccrnConfig = DccrnConfig(),
    *,
    train: bool = True,
) -> tuple[jax.Array, dict]:
    """v1 objective (dccrn.py:547-588): 0.3 * MSE(mask, cIRM) +
    0.7 * MSE(complex-masked echo, 0)."""
    out, new_state = dccrn_apply(params, state, mic, far, cfg, train=train)
    scfg = cfg.stft
    near_re, near_im = _to_grid(stft_mod.stft(near, scfg))
    echo_re, echo_im = _to_grid(stft_mod.stft(echo, scfg))
    mic_re, mic_im = _to_grid(out["mic_spec"])
    den = mic_re**2 + mic_im**2 + 1e-9
    cirm_r = (mic_re * near_re + mic_im * near_im) / den
    cirm_i = (mic_re * near_im - mic_im * near_re) / den
    loss_mask = jnp.mean((out["mask_re"] - cirm_r) ** 2) + jnp.mean(
        (out["mask_im"] - cirm_i) ** 2
    )
    leak_r = echo_re * out["mask_re"] - echo_im * out["mask_im"]
    leak_i = echo_re * out["mask_im"] + echo_im * out["mask_re"]
    loss_echo = jnp.mean(leak_r**2) + jnp.mean(leak_i**2)
    loss = 0.3 * loss_mask + 0.7 * loss_echo
    return loss, {"wav": out["wav"], "state": new_state}


def dccrn_loss_sisnr(
    params, state, mic, far, near, cfg: DccrnConfig = DccrnConfig(), *, train=True
) -> tuple[jax.Array, dict]:
    """v2-style objective: maximize SI-SNR of the enhanced waveform."""
    out, new_state = dccrn_apply(params, state, mic, far, cfg, train=train)
    n = min(out["wav"].shape[-1], near.shape[-1])
    loss = -si_snr(out["wav"][..., :n], near[..., :n])
    return loss, {"wav": out["wav"], "state": new_state}
