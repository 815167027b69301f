"""FullSubNet-style dual-mask AEC model (full-band + sub-band LSTMs).

The reference's alternative driver (scripts/models.py) trains/evaluates a
``FullSubNet`` whose module is MISSING from its tree (imports nonexistent
``utils.fullsubnet``; SURVEY §2.3) — only the contract survives:

- STFT 320/160 (models.py:116), mel filterbank option (models.py:117);
- training: net(mic, ref, fbank) -> complex spectrum, MSE vs near complex
  spectrum (models.py:192-197);
- inference: dual masks ``mask_near, mask_echo = net(stack([mic_mag,
  ref_mag]))`` applied multiplicatively with mic phase (models.py:417-443).

This is a working TPU-native realization in the published FullSubNet
structure (Hao et al., ICASSP 2021): a full-band LSTM over the whole
magnitude spectrum emits a per-bin embedding; a SHARED sub-band LSTM runs
per frequency bin over [local neighborhood || full-band embedding]
(vmapped over bins — 161 independent scans batched into one), emitting the
two masks. Mic + far-end magnitudes are the input pair.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig, split_complex
from aec_tpu.ops.lstm import lstm_cell, lstm_init, lstm_scan


@dataclasses.dataclass(frozen=True)
class FullSubNetConfig:
    stft: StftConfig = StftConfig(win_len=320, hop=160, fft_len=320)
    fb_hidden: int = 256
    sb_hidden: int = 96
    neighborhood: int = 5  # sub-band context: +-neighborhood bins
    # append mel-filterbank energies to the full-band input — the reference
    # driver passes a 21-filter bank into the net (models.py:117,192)
    use_mel: bool = False
    mel_filters: int = 21

    @property
    def n_freqs(self) -> int:
        return self.stft.n_freqs  # 161

    @property
    def fb_input(self) -> int:
        base = 2 * self.n_freqs
        return base + (2 * self.mel_filters if self.use_mel else 0)

    @property
    def sb_input(self) -> int:
        # per bin: mic neighborhood + far neighborhood + fb embedding
        return 2 * (2 * self.neighborhood + 1) + 1


def fullsubnet_init(key: jax.Array, cfg: FullSubNetConfig = FullSubNetConfig(), dtype=jnp.float32):
    k_fb, k_fbo, k_sb, k_sbo = jax.random.split(key, 4)
    f = cfg.n_freqs
    import numpy as np

    def linear(k, i, o):
        bound = 1.0 / np.sqrt(i)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (o, i), dtype, -bound, bound),
            "b": jnp.zeros((o,), dtype),
        }

    return {
        "fb_lstm": lstm_init(k_fb, cfg.fb_input, cfg.fb_hidden, dtype),
        "fb_out": linear(k_fbo, cfg.fb_hidden, f),
        "sb_lstm": lstm_init(k_sb, cfg.sb_input, cfg.sb_hidden, dtype),
        "sb_out": linear(k_sbo, cfg.sb_hidden, 2),  # (mask_near, mask_echo)
    }


def _unfold_bins(mag: jax.Array, n: int) -> jax.Array:
    """[B, T, F] -> [B, T, F, 2n+1] reflect-padded frequency neighborhoods."""
    padded = jnp.pad(mag, [(0, 0), (0, 0), (n, n)], mode="reflect")
    cols = [padded[..., i : i + mag.shape[-1]] for i in range(2 * n + 1)]
    return jnp.stack(cols, axis=-1)


def _fb_input(mic_mag, ref_mag, cfg: FullSubNetConfig):
    fb_parts = [mic_mag, ref_mag]
    if cfg.use_mel:
        from aec_tpu.dsp.mel import mel_filterbank

        mel = jnp.asarray(
            mel_filterbank(cfg.mel_filters, cfg.stft.fft_len), dtype=mic_mag.dtype
        )
        fb_parts += [mic_mag @ mel, ref_mag @ mel]
    return jnp.concatenate(fb_parts, axis=-1)  # [B, T, fb_input]


def fullsubnet_masks(
    params,
    mic_mag: jax.Array,
    ref_mag: jax.Array,
    cfg: FullSubNetConfig = FullSubNetConfig(),
    *,
    fused: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Magnitudes [B, T, F] -> (mask_near, mask_echo) in [0, 1]^[B, T, F].

    ``fused=True`` (default) runs BOTH LSTM stages in ONE ``lax.scan`` over
    time: the full-band cell feeds its embedding straight into the sub-band
    cell of the same step, so the frame axis is traversed once instead of
    twice and the [B, T, F] embedding never round-trips HBM between scans.
    The per-frame dependency chain is identical to the two-scan form (both
    stages are causal), and the math is the same up to one re-association:
    the sub-band input projection is split into the hoisted neighborhood
    columns and the in-scan fb-embedding column (agreement ~1e-6; pinned by
    tests/test_fullsubnet.py). ``fused=False`` keeps the reference-shaped
    two-scan composition."""
    b, t, f = mic_mag.shape
    fb_in = _fb_input(mic_mag, ref_mag, cfg)
    n = cfg.neighborhood
    nb = 2 * (2 * n + 1)  # hoistable neighborhood columns of the sb input
    sb_nb = jnp.concatenate(
        [_unfold_bins(mic_mag, n), _unfold_bins(ref_mag, n)], axis=-1
    )  # [B, T, F, nb]

    if not fused:
        fb_seq, _ = lstm_scan(params["fb_lstm"], fb_in)
        fb_emb = jax.nn.relu(
            fb_seq @ params["fb_out"]["w"].T + params["fb_out"]["b"]
        )  # [B, T, F]
        sb_in = jnp.concatenate([sb_nb, fb_emb[..., None]], axis=-1)
        sb_in = jnp.transpose(sb_in, (0, 2, 1, 3)).reshape(b * f, t, cfg.sb_input)
        sb_seq, _ = lstm_scan(params["sb_lstm"], sb_in)  # [B*F, T, H]
        masks = jax.nn.sigmoid(
            sb_seq @ params["sb_out"]["w"].T + params["sb_out"]["b"]
        )  # [B*F, T, 2]
        masks = masks.reshape(b, f, t, 2).transpose(0, 2, 1, 3)  # [B, T, F, 2]
        return masks[..., 0], masks[..., 1]

    fb_p, sb_p = params["fb_lstm"], params["sb_lstm"]
    # hoisted input projections (one MXU matmul each over all frames),
    # with BOTH bias halves folded in (lstm bias placement commutes)
    xp_fb = (
        jnp.matmul(fb_in, fb_p["w_ih"].T) + fb_p["b_ih"] + fb_p["b_hh"]
    )  # [B, T, 4Hfb]
    xp_sb = (
        jnp.matmul(sb_nb, sb_p["w_ih"][:, :nb].T)
        + sb_p["b_ih"] + sb_p["b_hh"]
    )  # [B, T, F, 4Hsb]

    # NOT routed to kernels/pallas_fullsubnet.fsn_joint_fused: the Pallas
    # port measured SLOWER than this unroll=8 scan on-chip (3.85 vs
    # 3.32 ms per 8 s utterance at batch 1) — see its docstring for why
    hs_seq = _joint_scan_hs(params, xp_fb, xp_sb)  # [B, T, F, Hsb]
    masks = jax.nn.sigmoid(
        hs_seq @ params["sb_out"]["w"].T + params["sb_out"]["b"]
    )  # [B, T, F, 2]
    return masks[..., 0], masks[..., 1]


def _joint_scan_hs(params, xp_fb: jax.Array, xp_sb: jax.Array) -> jax.Array:
    """The joint full->sub recurrence on hoisted projections (ALL biases
    already folded into xp_*): ([B,T,4Hfb], [B,T,F,4Hsb]) -> sb hidden
    sequence [B,T,F,Hsb]. Shared by the scan path and as the recompute
    target of the fused kernel's custom_vjp (kernels/pallas_fullsubnet)."""
    fb_p, sb_p = params["fb_lstm"], params["sb_lstm"]
    b, t, four_hfb = xp_fb.shape
    f = xp_sb.shape[2]
    h_fb, h_sb = four_hfb // 4, xp_sb.shape[-1] // 4
    nb = sb_p["w_ih"].shape[1] - 1
    w_fb_col = sb_p["w_ih"][:, nb]  # (4Hsb,) — the fb-embedding column
    # recurrent weights stream bf16 on TPU (cast hoisted out of the scan;
    # op-equivalent to DEFAULT MXU operand rounding — see ops/lstm.lstm_scan)
    wdt = jnp.bfloat16 if jax.default_backend() == "tpu" else xp_fb.dtype
    w_hh_fb = fb_p["w_hh"].T.astype(wdt)
    w_hh_sb = sb_p["w_hh"].T.astype(wdt)

    def cell(w_hh_t, h, c, gates_x):
        gates = gates_x + jnp.dot(
            h.astype(w_hh_t.dtype), w_hh_t, preferred_element_type=xp_fb.dtype
        )
        i, f_, g, o = jnp.split(gates, 4, axis=-1)
        c_next = jax.nn.sigmoid(f_) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c_next), c_next

    def step(carry, xp_t):
        hf, cf, hs, cs = carry
        xp_fb_t, xp_sb_t = xp_t  # [B, 4Hfb], [B, F, 4Hsb]
        hf, cf = cell(w_hh_fb, hf, cf, xp_fb_t)
        fb_emb_t = jax.nn.relu(
            hf @ params["fb_out"]["w"].T + params["fb_out"]["b"]
        )  # [B, F]
        sb_x = (xp_sb_t + fb_emb_t[..., None] * w_fb_col).reshape(b * f, 4 * h_sb)
        hs, cs = cell(w_hh_sb, hs, cs, sb_x)
        return (hf, cf, hs, cs), hs

    carry0 = (
        jnp.zeros((b, h_fb), xp_fb.dtype),
        jnp.zeros((b, h_fb), xp_fb.dtype),
        jnp.zeros((b * f, h_sb), xp_fb.dtype),
        jnp.zeros((b * f, h_sb), xp_fb.dtype),
    )
    _, hs_seq = jax.lax.scan(
        step, carry0, (jnp.swapaxes(xp_fb, 0, 1), jnp.swapaxes(xp_sb, 0, 1)),
        # unroll amortizes the while-loop overhead that dominates this
        # small-per-step body at batch 1 (on-chip slope A/B, 8 s utterance:
        # u1 4.37 / u8 3.32 / u16 3.93 ms) — semantics-preserving
        unroll=8,
    )  # [T, B*F, Hsb]
    return hs_seq.reshape(t, b, f, h_sb).transpose(1, 0, 2, 3)


def fullsubnet_apply(
    params,
    mic: jax.Array,
    ref: jax.Array,
    cfg: FullSubNetConfig = FullSubNetConfig(),
) -> dict[str, jax.Array]:
    """wav [B, n] -> dual-mask enhancement (models.py:417-443 contract):
    near estimate = mask_near * |mic| with mic phase; echo estimate
    likewise with mask_echo."""
    scfg = cfg.stft
    mic_spec = stft_mod.stft(mic, scfg)
    ref_spec = stft_mod.stft(ref, scfg)
    mic_mag = stft_mod.magnitude(mic_spec)
    ref_mag = stft_mod.magnitude(ref_spec)
    mask_near, mask_echo = fullsubnet_masks(params, mic_mag, ref_mag, cfg)

    re, im = split_complex(mic_spec)
    phase = jnp.arctan2(im, re)
    est_mag = mask_near * mic_mag
    est = jnp.concatenate([est_mag * jnp.cos(phase), est_mag * jnp.sin(phase)], axis=-1)
    wav = stft_mod.istft(est, scfg)
    echo_mag = mask_echo * mic_mag
    echo_spec = jnp.concatenate(
        [echo_mag * jnp.cos(phase), echo_mag * jnp.sin(phase)], axis=-1
    )
    echo_wav = stft_mod.istft(echo_spec, scfg)
    return {
        "wav": wav,
        "echo_wav": echo_wav,
        "mask_near": mask_near,
        "mask_echo": mask_echo,
        "out_spec": est,
    }


def fullsubnet_loss(
    params,
    mic: jax.Array,
    ref: jax.Array,
    near: jax.Array,
    echo: jax.Array,
    cfg: FullSubNetConfig = FullSubNetConfig(),
) -> tuple[jax.Array, dict]:
    """Complex-spectrum MSE vs near (models.py:195-197) + the symmetric
    echo-mask term implied by the dual-mask contract."""
    out = fullsubnet_apply(params, mic, ref, cfg)
    scfg = cfg.stft
    near_spec = stft_mod.stft(near, scfg)
    echo_spec = stft_mod.stft(echo, scfg)
    re, im = split_complex(out["out_spec"])
    nre, nim = split_complex(near_spec)
    loss_near = jnp.mean((re - nre) ** 2) + jnp.mean((im - nim) ** 2)
    mic_mag = stft_mod.magnitude(stft_mod.stft(mic, scfg))
    echo_mag_t = stft_mod.magnitude(echo_spec)
    loss_echo = jnp.mean((out["mask_echo"] * mic_mag - echo_mag_t) ** 2)
    return loss_near + loss_echo, {"wav": out["wav"]}
