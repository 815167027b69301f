"""STFT / iSTFT front-end as MXU-friendly matmuls.

The reference implements analysis/synthesis as ``F.conv1d`` /
``F.conv_transpose1d`` with DFT-basis kernels (attention_ccrn.py:8-101).
Mathematically the analysis is ``rfft(window * frame)`` stacked as
[real || imag] rows, and the synthesis is the Moore-Penrose pseudo-inverse of
the (unwindowed) analysis basis, re-windowed, followed by overlap-add and
division by the OLA'd squared-window envelope (attention_ccrn.py:94-97) with
``win_len - hop`` samples trimmed from both ends (attention_ccrn.py:99).

Here the same math is a framing reshape + one matmul per direction — the
natural TPU formulation (frames x basis rides the 128x128 MXU; no conv
lowering, no dynamic shapes). Padding, epsilons, and the pinv-based synthesis
basis reproduce the reference numerics exactly:

- analysis pad: ``win_len - hop`` zeros on BOTH sides (attention_ccrn.py:48);
- synthesis envelope division by ``coff + 1e-8`` (attention_ccrn.py:97);
- edge trim of ``win_len - hop`` samples per side (attention_ccrn.py:99).

Spec layout: internally frame-major ``[..., T, 2K]`` with K = fft//2 + 1 and
real parts in columns [0, K), imaginary in [K, 2K) — matching the reference's
row split at ``win_len // 2 + 1`` (ERB.py:267-274) transposed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp.windows import periodic_window

# Parity-sensitive matmuls run at full fp32 precision; TPU defaults would
# otherwise use bf16 passes on the MXU.
_HIGHEST = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class StftConfig:
    win_len: int = 512
    hop: int = 256
    fft_len: int = 512
    win_type: str = "hann"

    @property
    def n_freqs(self) -> int:
        return self.fft_len // 2 + 1

    @property
    def pad(self) -> int:
        return self.win_len - self.hop


@functools.lru_cache(maxsize=None)
def _bases(cfg: StftConfig) -> tuple[np.ndarray, np.ndarray]:
    """Host-side (analysis, synthesis) basis matrices, float64.

    analysis:  (win_len, 2K) — frame @ A == [Re rfft(w*frame) || Im ...]
    synthesis: (2K, win_len) — spec  @ S == windowed pinv reconstruction
    (equations from attention_ccrn.py:14-24; built once and cached).
    """
    k = cfg.fft_len // 2 + 1
    window = periodic_window(cfg.win_type, cfg.win_len)
    # rfft of the identity: dft[t, f] = exp(-2i*pi*t*f / fft_len)
    dft = np.fft.rfft(np.eye(cfg.fft_len))[: cfg.win_len]  # (win, K) complex
    basis = np.concatenate([dft.real, dft.imag], axis=1)  # (win, 2K)
    analysis = basis * window[:, None]
    # Synthesis: pinv of the *unwindowed* stacked basis (as rows), rewindowed.
    # Reference: kernel = pinv(basis.T).T * window  => S[c, t].
    synthesis = np.linalg.pinv(basis.T).T * window[None, :]  # (2K, win)
    return analysis, synthesis  # (win, 2K), (2K, win)


def analysis_matrix(cfg: StftConfig, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_bases(cfg)[0], dtype=dtype)


def synthesis_matrix(cfg: StftConfig, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_bases(cfg)[1], dtype=dtype)


def num_frames(n_samples: int, cfg: StftConfig) -> int:
    """Frame count produced by ``stft`` for an input of ``n_samples``.

    With the both-side pad of (win-hop) this is n//hop + 1 for the default
    512/256 config (padded length n + 2*(win-hop); frames =
    (padded - win)//hop + 1).
    """
    padded = n_samples + 2 * cfg.pad
    return (padded - cfg.win_len) // cfg.hop + 1


def frame_signal(x: jax.Array, win_len: int, hop: int) -> jax.Array:
    """Strided framing ``[..., n] -> [..., F, win_len]`` without gathers.

    When ``win_len % hop == 0`` (the framework's operating point) frames are
    grouped by start offset mod win_len: group j holds frames j, j+r, j+2r...
    whose starts are exactly ``win_len`` apart, so each group is a plain
    reshape of a shifted slice. Groups are then interleaved with one
    stack+reshape. This keeps XLA on cheap layout ops instead of gathers.
    """
    n = x.shape[-1]
    n_frames = (n - win_len) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal too short to frame: {n} < {win_len}")
    if win_len % hop != 0:
        starts = np.arange(n_frames) * hop
        idx = starts[:, None] + np.arange(win_len)[None, :]
        return x[..., idx]
    r = win_len // hop
    groups = []
    for j in range(r):
        m_j = (n_frames - j + r - 1) // r  # frames in group j
        need = j * hop + m_j * win_len
        xs = x[..., j * hop :]
        avail = n - j * hop
        if need - j * hop > avail:
            xs = jnp.pad(xs, [(0, 0)] * (x.ndim - 1) + [(0, need - j * hop - avail)])
        else:
            xs = xs[..., : m_j * win_len]
        groups.append(xs.reshape(*x.shape[:-1], m_j, win_len))
    m_max = groups[0].shape[-2]
    groups = [
        jnp.pad(g, [(0, 0)] * (x.ndim - 1) + [(0, m_max - g.shape[-2]), (0, 0)])
        for g in groups
    ]
    stacked = jnp.stack(groups, axis=-2)  # (..., m_max, r, win)
    frames = stacked.reshape(*x.shape[:-1], m_max * r, win_len)
    return frames[..., :n_frames, :]


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add ``[..., F, win] -> [..., (F-1)*hop + win]``.

    Requires ``win % hop == 0``. Each frame is split into r = win/hop chunks;
    chunk j of frame f lands at output block f + j. Implemented as r shifted
    zero-padded block stacks summed together — pure reshapes/adds, no scatter.
    """
    *lead, n_frames, win_len = frames.shape
    if win_len % hop != 0:
        raise ValueError("overlap_add requires hop | win_len")
    r = win_len // hop
    out_blocks = n_frames + r - 1
    total = jnp.zeros((*lead, out_blocks, hop), dtype=frames.dtype)
    for j in range(r):
        chunk = frames[..., :, j * hop : (j + 1) * hop]  # (..., F, hop)
        pad = [(0, 0)] * len(lead) + [(j, out_blocks - n_frames - j), (0, 0)]
        total = total + jnp.pad(chunk, pad)
    return total.reshape(*lead, out_blocks * hop)


@functools.lru_cache(maxsize=None)
def _window_sq(cfg: StftConfig) -> np.ndarray:
    return periodic_window(cfg.win_type, cfg.win_len) ** 2


@functools.lru_cache(maxsize=64)
def _ola_envelope_np(n_frames: int, cfg: StftConfig) -> np.ndarray:
    wsq = _window_sq(cfg)
    out = np.zeros((n_frames - 1) * cfg.hop + cfg.win_len)
    for f in range(n_frames):
        out[f * cfg.hop : f * cfg.hop + cfg.win_len] += wsq
    return out


def ola_envelope(n_frames: int, cfg: StftConfig, dtype=jnp.float32) -> jax.Array:
    """OLA of the squared window over ``n_frames`` frames (host precompute).

    Equals the reference's ``conv_transpose1d(window^2, eye)`` normalizer
    (attention_ccrn.py:94-96); length (n_frames-1)*hop + win.
    """
    return jnp.asarray(_ola_envelope_np(n_frames, cfg), dtype=dtype)


def stft(x: jax.Array, cfg: StftConfig, *, precision=_HIGHEST) -> jax.Array:
    """Analysis STFT: ``[..., n] -> [..., F, 2K]`` (real || imag columns).

    Matches ConvSTFT 'complex' mode (attention_ccrn.py:45-52) transposed to
    frame-major layout.
    """
    pad = [(0, 0)] * (x.ndim - 1) + [(cfg.pad, cfg.pad)]
    xp = jnp.pad(x, pad)
    frames = frame_signal(xp, cfg.win_len, cfg.hop)
    a = analysis_matrix(cfg, dtype=frames.dtype)
    return jnp.matmul(frames, a, precision=precision)


def istft(spec: jax.Array, cfg: StftConfig, *, precision=_HIGHEST) -> jax.Array:
    """Synthesis iSTFT: ``[..., F, 2K] -> [..., n]``.

    Mirrors ConviSTFT (attention_ccrn.py:82-101): pinv-basis projection,
    overlap-add, division by (envelope + 1e-8), trim win-hop per side.
    """
    s = synthesis_matrix(cfg, dtype=spec.dtype)
    frames = jnp.matmul(spec, s, precision=precision)  # (..., F, win)
    wav = overlap_add(frames, cfg.hop)
    env = ola_envelope(spec.shape[-2], cfg, dtype=spec.dtype)
    wav = wav / (env + 1e-8)
    return wav[..., cfg.pad : wav.shape[-1] - cfg.pad]


def split_complex(spec: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[..., 2K] -> ([..., K], [..., K])`` real/imag split (ERB.py:267-274)."""
    k = spec.shape[-1] // 2
    return spec[..., :k], spec[..., k:]


def magnitude(spec: jax.Array, eps: float = 1e-9) -> jax.Array:
    """|spec| with the reference's in-sqrt epsilon (ERB.py:277-279)."""
    re, im = split_complex(spec)
    return jnp.sqrt(re * re + im * im + eps)
