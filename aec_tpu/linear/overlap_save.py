"""Shared overlap-save machinery for the stage-1 adaptive filters.

Classical partitioned-block frequency-domain adaptive filtering (MDF,
Soo & Pang 1990; state-space variant Enzner & Vary 2006): block size B,
FFT size N = 2B; far-end frame t is the rfft of samples [(t-1)B, (t+1)B);
the filter output is the LAST B samples of the inverse FFT (overlap-save),
which models true linear convolution exactly — unlike multiplicative
filtering in a windowed-STFT domain, which leaks and caps ERLE.

SPECTRUM REPRESENTATION: all spectra here are REAL arrays in "ri" layout —
``[..., 2K]`` with real parts in columns [0, K) and imaginary in [K, 2K)
(K = N/2 + 1). Two reasons, both TPU-first: (a) every transform becomes a
fixed DFT-basis matmul on the MXU (the gradient constraint collapses to ONE
precomputed (2K, 2K) projection — measured ~1.5x faster than jnp.fft in the
scan on v5e); (b) no complex dtype anywhere — this image's TPU backend has
no eager complex64 support at all, and XLA decomposes complex to real pairs
internally anyway.

All helpers are static-shape and jit/vmap-friendly. BASELINE.json config #1
("512-pt STFT, hop 256") corresponds to B=256, N=512.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp.stft import frame_signal

# Parity-grade fp32 matmuls (TPU would otherwise use bf16 passes).
_HIGHEST = jax.lax.Precision.HIGHEST
# Stage-1 production default: PER-OP mixed precision (p_y, p_e, p_constrain).
# Only the Y transform (echo-estimate spectrum -> time block) is
# cancellation-critical: e = d - y subtracts two nearly equal signals, so y's
# relative matmul error bounds the reachable ERLE (see kalman.kalman_step).
# Measured on v5e (benchmarks/validate_precision.py, tail ERLE vs HIGHEST):
#   all-HIGH:        +-0.000 dB on every scene; 32.5 ms for 256 x 8.2 s
#   mixed (this):    -0.16 dB worst case, ONLY on scenes already >40 dB ERLE
#                    (echo-only 46.6 dB, long-RIR 40.3 dB); 0.000 dB on
#                    double-talk and path-change; 20.6 ms (1.58x)
#   all-DEFAULT:     -1.4 dB worst case; 19.7 ms
# The residual -0.16 dB lives in the constraint projection (HHD == HDD when
# measured separately), which is also the FLOP-dominant matmul — so this is
# the Pareto point. Precision.HIGH / HIGHEST stay available via precision=.
_STAGE1_DEFAULT = (
    jax.lax.Precision.HIGH,
    jax.lax.Precision.DEFAULT,
    jax.lax.Precision.DEFAULT,
)
# Far-end analysis STFT default. Measured on v5e (batch 256 x 8.2 s slope):
# HIGHEST 9.2 ms / HIGH 6.4 ms / DEFAULT 5.7 ms — 44% of the whole stage-1
# scan path at HIGHEST. Tail-ERLE across all four validate_precision scenes:
# HIGH == HIGHEST to +-0.00 dB; DEFAULT loses up to -1.46 dB (echo-only).
# X feeds the cancellation-critical y product, so single-pass bf16 is out,
# but the 3-pass split is quality-free. HIGHEST stays available via the
# ``precision=`` argument for parity-grade runs.
_SPECTRA_DEFAULT = jax.lax.Precision.HIGH


@functools.lru_cache(maxsize=8)
def _dft_mats(block: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Real matrices implementing the step's three transforms as matmuls.

    Returns (fwd [N, 2K], inv_tail [2K, block], constrain [2K, 2K]) where
    spectra are real-concatenated [re || im].
    """
    n = 2 * block
    k = n // 2 + 1
    dft = np.fft.rfft(np.eye(n))  # (N, K) complex
    fwd = np.concatenate([dft.real, dft.imag], axis=1)  # (N, 2K)
    inv = np.concatenate(
        [np.fft.irfft(np.eye(k), n=n), np.fft.irfft(1j * np.eye(k), n=n)], axis=0
    )  # (2K, N)
    constrain = inv[:, :block] @ fwd[:block, :]  # (2K, 2K)
    return (
        fwd.astype(np.float32),
        inv[:, block:].astype(np.float32),  # last-half columns only
        constrain.astype(np.float32),
    )


def spectra_precision_for(precision):
    """Analysis-STFT precision implied by a stage-1 ``precision`` argument.

    ``None`` (library default) keeps the measured-quality-free
    ``_SPECTRA_DEFAULT`` (HIGH). A single ``jax.lax.Precision`` applies
    end-to-end — ``precision=HIGHEST`` really is an all-fp32 path, analysis
    STFT included. A per-op ``(p_y, p_e, p_constrain)`` tuple maps the
    analysis STFT to ``p_y``: X feeds the cancellation-critical y product,
    so the two share a quality class (overlap_save module docstring).
    """
    if precision is None:
        return _SPECTRA_DEFAULT
    if isinstance(precision, tuple):
        return precision[0]
    return precision


def ri_split(x_ri: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., 2K] -> ([..., K], [..., K]) real/imag halves."""
    k = x_ri.shape[-1] // 2
    return x_ri[..., :k], x_ri[..., k:]


def ri_join(re: jax.Array, im: jax.Array) -> jax.Array:
    return jnp.concatenate([re, im], axis=-1)


def ri_from_complex(x) -> jax.Array:
    """numpy/complex array -> ri layout (host-side test convenience)."""
    return jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=-1)


def block_count(n: int, block: int) -> int:
    return -(-n // block)  # ceil


def pad_to_blocks(wav: jax.Array, block: int) -> jax.Array:
    n = wav.shape[-1]
    rem = (-n) % block
    if rem:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, rem)])
    return wav


def far_end_spectra(
    far: jax.Array, block: int, precision=_SPECTRA_DEFAULT
) -> jax.Array:
    """[..., n] (n % block == 0) -> [..., T, 2K] ri frames.

    Frame t covers samples [(t-1)B, (t+1)B) with a leading zero block, so
    frame t is causally aligned with mic block t. Computed as one DFT-basis
    matmul (no complex dtype, MXU-friendly).
    """
    farp = jnp.pad(far, [(0, 0)] * (far.ndim - 1) + [(block, 0)])
    frames = frame_signal(farp, 2 * block, block)  # [..., T, 2B]
    fwd, _, _ = _dft_mats(block)
    return jnp.matmul(frames, jnp.asarray(fwd), precision=precision)


def frame_to_spectrum(
    frame: jax.Array, block: int, precision=_SPECTRA_DEFAULT
) -> jax.Array:
    """[..., 2B] time frame -> [..., 2K] ri spectrum (streaming use)."""
    fwd, _, _ = _dft_mats(block)
    return jnp.matmul(frame, jnp.asarray(fwd), precision=precision)


def mic_blocks(mic: jax.Array, block: int) -> jax.Array:
    """[..., n] -> [..., T, B] contiguous blocks."""
    return mic.reshape(*mic.shape[:-1], -1, block)


def spectrum_to_block(y_ri: jax.Array, block: int, precision=_HIGHEST) -> jax.Array:
    """Last B samples of the inverse FFT — the linear-convolution output.

    One (2K, B) matmul."""
    _, inv_tail, _ = _dft_mats(block)
    return jnp.matmul(y_ri, jnp.asarray(inv_tail), precision=precision)


def block_to_spectrum(e_block: jax.Array, block: int, precision=_HIGHEST) -> jax.Array:
    """rfft of [zeros_B || e_block] -> ri spectrum.

    == e_block @ fwd[block:, :] (the zero half contributes nothing)."""
    fwd, _, _ = _dft_mats(block)
    return jnp.matmul(e_block, jnp.asarray(fwd[block:, :]), precision=precision)


def constrain_gradient(g_ri: jax.Array, block: int, precision=_HIGHEST) -> jax.Array:
    """Project per-partition updates onto causal B-tap time support.

    Mathematically irfft -> zero the last half -> rfft (the 'constrained'
    FDAF update; without it the filter models circular convolution and
    leaks) — collapsed into a single fixed (2K, 2K) projection matmul.
    """
    _, _, constrain = _dft_mats(block)
    return jnp.matmul(g_ri, jnp.asarray(constrain), precision=precision)
