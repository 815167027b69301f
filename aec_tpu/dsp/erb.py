"""Equivalent Rectangular Bandwidth (ERB) filterbank.

Re-derivation of the reference's Hohmann-2002-style filterbank
(Stage2_lhm/scripts/network/ERB.py:10-71) as a host-side matrix precompute.

Parity notes (SURVEY.md §2.4.2): the reference also computes perfect-
reconstruction low-/high-pass edge bands but *returns the matrix without
them* (ERB.py:60-71 returns ``cos_filts``). We reproduce that analysis-only
matrix by default and additionally expose the perfect-reconstruction variant
(``perfect=True``) as the fixed/extended option.
"""

from __future__ import annotations

import functools

import numpy as np

_EAR_Q = 9.265  # ERB.py:17
_MIN_BW = 24.7  # ERB.py:18


def freq_to_erb(freq_hz):
    """[Hohmann2002] Eq. 16 (ERB.py:29-31)."""
    return _EAR_Q * np.log(1.0 + np.asarray(freq_hz, dtype=np.float64) / (_MIN_BW * _EAR_Q))


def erb_to_freq(erb):
    """[Hohmann2002] Eq. 17 (ERB.py:33-35)."""
    return (np.exp(np.asarray(erb, dtype=np.float64) / _EAR_Q) - 1.0) * _MIN_BW * _EAR_Q


@functools.lru_cache(maxsize=16)
def _erb_filterbank_np(
    n_freqs: int,
    sample_rate: int,
    n_bands: int,
    low_freq: float,
    max_freq: float,
    perfect: bool,
) -> np.ndarray:
    if low_freq is None:
        low_freq = 20.0
    if max_freq is None:
        max_freq = sample_rate / 2
    freqs = np.linspace(0.0, max_freq, n_freqs)  # Hz per STFT bin (ERB.py:16)
    # n_bands raised-cosine bands, 50% overlapped, between ERB-uniform cutoffs
    # (ERB.py:20-27): cutoff i..i+2 bound band i.
    erb_lims = np.linspace(freq_to_erb(low_freq), freq_to_erb(max_freq), n_bands + 2)
    cutoffs = erb_to_freq(erb_lims)

    cos_bands = np.zeros((n_freqs, n_bands))
    for i in range(n_bands):
        lo_hz, hi_hz = cutoffs[i], cutoffs[i + 2]
        lo = int(np.min(np.where(freqs > lo_hz)))  # ERB.py:52 (strict >)
        hi = int(np.max(np.where(freqs < hi_hz)))  # ERB.py:53 (strict <)
        center = (freq_to_erb(lo_hz) + freq_to_erb(hi_hz)) / 2.0
        width = freq_to_erb(hi_hz) - freq_to_erb(lo_hz)
        cos_bands[lo : hi + 1, i] = np.cos(
            (freq_to_erb(freqs[lo : hi + 1]) - center) / width * np.pi
        )
    if not perfect:
        # Reference quirk: LP/HP reconstruction bands are computed then
        # discarded (ERB.py:60-71 returns cos_filts). This is the parity path.
        return cos_bands

    full = np.zeros((n_freqs, n_bands + 2))
    full[:, 1 : n_bands + 1] = cos_bands
    hi = int(np.max(np.where(freqs < cutoffs[1])))
    full[: hi + 1, 0] = np.sqrt(1.0 - full[: hi + 1, 1] ** 2)
    lo = int(np.min(np.where(freqs > cutoffs[n_bands])))
    full[lo:, n_bands + 1] = np.sqrt(1.0 - full[lo:, n_bands] ** 2)
    return full


def erb_filterbank(
    n_freqs: int = 257,
    sample_rate: int = 16000,
    n_bands: int = 32,
    low_freq: float = 0.0,
    max_freq: float = 8000.0,
    *,
    perfect: bool = False,
    dtype=np.float32,
) -> np.ndarray:
    """ERB projection matrix ``(n_freqs, n_bands)`` (float host array).

    Defaults mirror erb_conf (configs.py:21-27). Use
    ``jnp.asarray(erb_filterbank(...))`` to place on device; used as
    ``mag @ erb`` for analysis and ``erb_mag @ erb.T`` for the un-normalized
    back-projection (ERB.py:282-284, 306-307).
    """
    fb = _erb_filterbank_np(
        int(n_freqs), int(sample_rate), int(n_bands), float(low_freq), float(max_freq), bool(perfect)
    )
    return fb.astype(dtype)
