"""DCT-domain experimental nets (reference: scripts/network/networks.py).

The reference file holds two vestigial experiments that hard-code CUDA and
are mostly commented out (SURVEY §2.3): a time-frame DCT MLP (``DNN``,
networks.py:254-348) and a DCT U-Net whose forward only returns features
(``CNN``, networks.py:350-474). This module provides working TPU-native
equivalents:

- :func:`dct_matrix` — the exact DCT-II basis construction the reference
  uses (networks.py:301-306), as a host precompute;
- :func:`dct_features` — enframe -> hann window -> DCT (the live part of
  CNN.forward, networks.py:424-443);
- ``dnn_*`` — the DCT MLP: clamp to [-1,1], keep the first ``keep`` coeffs,
  Linear+PReLU x2 -> Linear+Tanh, zero-pad, inverse DCT, raw overlap-add
  (Filpframe_OverlapA, networks.py:59-74 — NO envelope normalization);
- ``cnn_*`` — a working realization of the CNN file's commented intent:
  conv encoder over DCT frames + GRU bottleneck + transposed-conv decoder
  with skips, emitting a DCT-domain mask.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp.stft import frame_signal, overlap_add
from aec_tpu.dsp.windows import periodic_window
from aec_tpu.ops.gru import gru_init, gru_scan


@functools.lru_cache(maxsize=8)
def _dct_matrix_np(n: int) -> np.ndarray:
    """DCT-II basis (win, win): M[t, k] = sqrt(2/N) cos((t+1/2) pi k / N),
    first column scaled by sqrt(1/2) (networks.py:301-306)."""
    k = np.arange(n)[None, :]
    t = (np.arange(n)[:, None] + 0.5) * np.pi / n
    m = np.sqrt(2.0 / n) * np.cos(t @ k)
    m[:, 0] *= np.sqrt(0.5)
    return m


def dct_matrix(n: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_dct_matrix_np(n), dtype=dtype)


def dct_features(x: jax.Array, win: int = 512, hop: int = 256) -> jax.Array:
    """[B, n] -> [B, T, win] windowed DCT frames (no padding, like unfold)."""
    frames = frame_signal(x, win, hop)
    w = jnp.asarray(periodic_window("hann", win), dtype=x.dtype)
    return (frames * w) @ dct_matrix(win, x.dtype)


def raw_overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Filpframe_OverlapA semantics (networks.py:59-74): plain OLA sum."""
    return overlap_add(frames, hop)


@dataclasses.dataclass(frozen=True)
class DctDnnConfig:
    win: int = 512
    hop: int = 256
    keep: int = 100  # DCT coefficients kept (networks.py:334-336)
    hidden: int = 100


def dnn_init(key: jax.Array, cfg: DctDnnConfig = DctDnnConfig(), dtype=jnp.float32):
    ks = jax.random.split(key, 3)

    def linear(k, i, o):
        bound = 1.0 / np.sqrt(i)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (o, i), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (o,), dtype, -bound, bound),
        }

    return {
        "lin1": linear(ks[0], cfg.keep, cfg.hidden),
        "lin2": linear(ks[1], cfg.hidden, cfg.hidden),
        "lin3": linear(ks[2], cfg.hidden, cfg.keep),
        "prelu1": jnp.asarray(0.25, dtype),
        "prelu2": jnp.asarray(0.25, dtype),
    }


def dnn_apply(params, noisy: jax.Array, cfg: DctDnnConfig = DctDnnConfig()):
    """[B, n] -> dict(out_dct [B,T,keep], wav [B, (T-1)*hop + win])."""
    d = dct_features(noisy, cfg.win, cfg.hop)
    d = jnp.clip(d, -1.0, 1.0)[..., : cfg.keep]  # networks.py:330-336
    h = d @ params["lin1"]["w"].T + params["lin1"]["b"]
    h = jnp.where(h >= 0, h, params["prelu1"] * h)
    h = h @ params["lin2"]["w"].T + params["lin2"]["b"]
    h = jnp.where(h >= 0, h, params["prelu2"] * h)
    out_dct = jnp.tanh(h @ params["lin3"]["w"].T + params["lin3"]["b"])
    padded = jnp.pad(out_dct, [(0, 0)] * (out_dct.ndim - 1) + [(0, cfg.win - cfg.keep)])
    frames = padded @ dct_matrix(cfg.win, noisy.dtype).T  # inverse DCT
    wav = raw_overlap_add(frames, cfg.hop)
    return {"out_dct": out_dct, "wav": wav}


def dnn_loss(params, noisy, clean, cfg: DctDnnConfig = DctDnnConfig()):
    """MSE between estimated and clean clamped/truncated DCT frames."""
    out = dnn_apply(params, noisy, cfg)
    clean_dct = jnp.clip(dct_features(clean, cfg.win, cfg.hop), -1.0, 1.0)[..., : cfg.keep]
    return jnp.mean((out["out_dct"] - clean_dct) ** 2), out


@dataclasses.dataclass(frozen=True)
class DctCnnConfig:
    win: int = 512
    hop: int = 256
    keep: int = 128
    channels: tuple[int, ...] = (1, 8, 16, 32)
    gru_hidden: int = 128


def cnn_init(key: jax.Array, cfg: DctCnnConfig = DctCnnConfig(), dtype=jnp.float32):
    from aec_tpu.ops.complex_layers import prelu_init

    chans = cfg.channels
    n_layers = len(chans) - 1
    keys = jax.random.split(key, 2 * n_layers + 1)
    f_bottom = cfg.keep // (2**n_layers)

    def conv(k, ci, co):
        return {
            "w": 0.05 * jax.random.normal(k, (1, 3, ci, co), dtype),
            "b": jnp.zeros((co,), dtype),
        }

    enc = [
        {"conv": conv(keys[i], chans[i], chans[i + 1]), "prelu": prelu_init(dtype)}
        for i in range(n_layers)
    ]
    dec = [
        {
            "conv": conv(keys[n_layers + i], 2 * chans[n_layers - i], chans[n_layers - i - 1] if i < n_layers - 1 else 1),
            "prelu": prelu_init(dtype),
        }
        for i in range(n_layers)
    ]
    gru = gru_init(keys[-1], chans[-1] * f_bottom, chans[-1] * f_bottom, orthogonal=False, dtype=dtype)
    return {"encoder": enc, "decoder": dec, "gru": gru}


def cnn_apply(params, noisy: jax.Array, cfg: DctCnnConfig = DctCnnConfig()):
    """[B, n] -> DCT-domain masking denoiser (intent of networks.py:444-468)."""
    d = dct_features(noisy, cfg.win, cfg.hop)[..., : cfg.keep]  # [B, T, F]
    x = d[..., None]  # [B, T, F, 1] — NHWC with (T, F) spatial
    dn = ("NHWC", "HWIO", "NHWC")
    skips = []
    for layer in params["encoder"]:
        x = jax.lax.conv_general_dilated(
            x, layer["conv"]["w"], (1, 2), [(0, 0), (1, 1)], dimension_numbers=dn
        ) + layer["conv"]["b"]
        x = jnp.where(x >= 0, x, layer["prelu"] * x)
        skips.append(x)

    b, t, f_b, c = x.shape
    seq, _ = gru_scan(params["gru"], x.reshape(b, t, f_b * c))
    x = seq.reshape(b, t, f_b, c)

    for i, layer in enumerate(params["decoder"]):
        x = jnp.concatenate([x, skips[-1 - i]], axis=-1)
        w_flip = jnp.flip(layer["conv"]["w"], axis=(0, 1))
        x = jax.lax.conv_general_dilated(
            x, w_flip, (1, 1), [(0, 0), (1, 2)], lhs_dilation=(1, 2),
            dimension_numbers=dn,
        ) + layer["conv"]["b"]
        last = i == len(params["decoder"]) - 1
        x = jnp.tanh(x) if last else jnp.where(x >= 0, x, layer["prelu"] * x)

    mask = x[..., 0][:, :, : cfg.keep]  # [B, T, keep]
    est_dct = mask * d
    padded = jnp.pad(est_dct, [(0, 0), (0, 0), (0, cfg.win - cfg.keep)])
    frames = padded @ dct_matrix(cfg.win, noisy.dtype).T
    wav = raw_overlap_add(frames, cfg.hop)
    return {"est_dct": est_dct, "mask": mask, "wav": wav}


def cnn_loss(params, noisy, clean, cfg: DctCnnConfig = DctCnnConfig()):
    out = cnn_apply(params, noisy, cfg)
    clean_dct = dct_features(clean, cfg.win, cfg.hop)[..., : cfg.keep]
    return jnp.mean((out["est_dct"] - clean_dct) ** 2), out
