"""Shared overlap-save machinery for the stage-1 adaptive filters.

Classical partitioned-block frequency-domain adaptive filtering (MDF,
Soo & Pang 1990; state-space variant Enzner & Vary 2006): block size B,
FFT size N = 2B; far-end frame t is the rfft of samples [(t-1)B, (t+1)B);
the filter output is the LAST B samples of the inverse FFT (overlap-save),
which models true linear convolution exactly — unlike multiplicative
filtering in a windowed-STFT domain, which leaks and caps ERLE.

All helpers are static-shape and jit/vmap-friendly. BASELINE.json config #1
("512-pt STFT, hop 256") corresponds to B=256, N=512.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aec_tpu.dsp.stft import frame_signal


def block_count(n: int, block: int) -> int:
    return -(-n // block)  # ceil


def pad_to_blocks(wav: jax.Array, block: int) -> jax.Array:
    n = wav.shape[-1]
    rem = (-n) % block
    if rem:
        wav = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, rem)])
    return wav


def far_end_spectra(far: jax.Array, block: int) -> jax.Array:
    """[..., n] (n % block == 0) -> [..., T, N//2+1] rfft frames.

    Frame t covers samples [(t-1)B, (t+1)B) with a leading zero block, so
    frame t is causally aligned with mic block t.
    """
    farp = jnp.pad(far, [(0, 0)] * (far.ndim - 1) + [(block, 0)])
    frames = frame_signal(farp, 2 * block, block)  # [..., T, 2B]
    return jnp.fft.rfft(frames, axis=-1)


def mic_blocks(mic: jax.Array, block: int) -> jax.Array:
    """[..., n] -> [..., T, B] contiguous blocks."""
    return mic.reshape(*mic.shape[:-1], -1, block)


def spectrum_to_block(y_spec: jax.Array, block: int) -> jax.Array:
    """Last B samples of the inverse FFT — the linear-convolution output."""
    y_time = jnp.fft.irfft(y_spec, n=2 * block, axis=-1)
    return y_time[..., block:]


def block_to_spectrum(e_block: jax.Array, block: int) -> jax.Array:
    """rfft of [zeros_B || e_block] — overlap-save error spectrum."""
    e_time = jnp.concatenate([jnp.zeros_like(e_block), e_block], axis=-1)
    return jnp.fft.rfft(e_time, axis=-1)


def constrain_gradient(g_spec: jax.Array, block: int) -> jax.Array:
    """Project per-partition updates onto causal B-tap time support.

    irfft -> zero the last half -> rfft. This is the 'constrained' FDAF
    update; without it the filter models circular convolution and leaks.
    Applied over the last axis (frequency); any leading axes (partitions).
    """
    g_time = jnp.fft.irfft(g_spec, n=2 * block, axis=-1)
    g_time = g_time.at[..., block:].set(0.0)
    return jnp.fft.rfft(g_time, axis=-1)
