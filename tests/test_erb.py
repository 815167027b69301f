"""ERB filterbank golden tests against a float64 oracle of ERB.py:10-71."""

import numpy as np

from aec_tpu.dsp import erb as E


def oracle_erb(n_freqs=257, sr=16000, n_bands=32, low=0.0, high=8000.0):
    ear_q, min_bw = 9.265, 24.7
    f2e = lambda f: ear_q * np.log(1 + np.asarray(f, float) / (min_bw * ear_q))
    e2f = lambda e: (np.exp(np.asarray(e, float) / ear_q) - 1) * min_bw * ear_q
    freqs = np.linspace(0, high, n_freqs)
    cutoffs = e2f(np.linspace(f2e(low), f2e(high), n_bands + 2))
    filts = np.zeros((n_freqs, n_bands))
    for i in range(n_bands):
        lo = np.min(np.where(freqs > cutoffs[i]))
        hi = np.max(np.where(freqs < cutoffs[i + 2]))
        avg = (f2e(cutoffs[i]) + f2e(cutoffs[i + 2])) / 2
        rng_ = f2e(cutoffs[i + 2]) - f2e(cutoffs[i])
        filts[lo : hi + 1, i] = np.cos((f2e(freqs[lo : hi + 1]) - avg) / rng_ * np.pi)
    return filts


def test_erb_matches_oracle():
    got = E.erb_filterbank(dtype=np.float64)
    want = oracle_erb()
    assert got.shape == (257, 32)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_erb_maps_roundtrip():
    f = np.array([0.0, 100.0, 1000.0, 8000.0])
    np.testing.assert_allclose(E.erb_to_freq(E.freq_to_erb(f)), f, rtol=1e-12)


def test_erb_analysis_only_quirk():
    # Parity path drops the LP/HP perfect-reconstruction bands (ERB.py:60-71):
    # column sums do NOT reach 1 at the spectrum edges.
    fb = E.erb_filterbank(dtype=np.float64)
    band_cover = fb.sum(axis=1)
    assert band_cover[0] == 0.0  # DC bin uncovered in parity matrix
    full = E.erb_filterbank(perfect=True, dtype=np.float64)
    assert full.shape == (257, 34)
    assert full[0, 0] > 0.0  # LP band covers DC in the fixed variant


def test_erb_values_are_cosine_shaped():
    fb = E.erb_filterbank(dtype=np.float64)
    assert np.all(fb <= 1.0) and np.all(fb >= -1.0)
    # every band has support
    assert np.all((fb != 0).sum(axis=0) > 0)
