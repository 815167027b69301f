"""STFT/iSTFT parity against a float64 numpy oracle of the reference math.

Oracle re-states the ConvSTFT/ConviSTFT equations (attention_ccrn.py:8-101)
directly: conv1d with DFT-basis kernels == rfft of windowed frames; synthesis
== pinv basis + OLA + squared-window envelope division + edge trim.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import aec_tpu.dsp.stft as S
from aec_tpu.dsp.windows import periodic_window


CFG = S.StftConfig()


def oracle_stft(x: np.ndarray, cfg: S.StftConfig) -> np.ndarray:
    """[B, n] -> [B, F, 2K] float64, frame-major."""
    pad = cfg.win_len - cfg.hop
    xp = np.pad(x.astype(np.float64), [(0, 0), (pad, pad)])
    w = periodic_window(cfg.win_type, cfg.win_len)
    n_frames = (xp.shape[-1] - cfg.win_len) // cfg.hop + 1
    out = np.zeros((x.shape[0], n_frames, 2 * cfg.n_freqs))
    for f in range(n_frames):
        seg = xp[:, f * cfg.hop : f * cfg.hop + cfg.win_len] * w
        spec = np.fft.rfft(seg, n=cfg.fft_len, axis=-1)
        out[:, f, : cfg.n_freqs] = spec.real
        out[:, f, cfg.n_freqs :] = spec.imag
    return out


def oracle_istft(spec: np.ndarray, cfg: S.StftConfig) -> np.ndarray:
    """[B, F, 2K] -> [B, n] float64 via pinv synthesis + OLA + envelope."""
    w = periodic_window(cfg.win_type, cfg.win_len)
    dft = np.fft.rfft(np.eye(cfg.fft_len))[: cfg.win_len]
    basis = np.concatenate([dft.real, dft.imag], axis=1).T  # (2K, win)
    syn = np.linalg.pinv(basis).T * w  # (2K, win): pinv kernel rows, rewindowed
    b, n_frames, _ = spec.shape
    out_len = (n_frames - 1) * cfg.hop + cfg.win_len
    wav = np.zeros((b, out_len))
    env = np.zeros(out_len)
    for f in range(n_frames):
        wav[:, f * cfg.hop : f * cfg.hop + cfg.win_len] += spec[:, f] @ syn
        env[f * cfg.hop : f * cfg.hop + cfg.win_len] += w**2
    wav = wav / (env + 1e-8)
    pad = cfg.win_len - cfg.hop
    return wav[:, pad:-pad]


def test_frame_signal_matches_strided(rng):
    x = rng.standard_normal((3, 2049)).astype(np.float32)
    frames = np.asarray(S.frame_signal(jnp.asarray(x), 512, 256))
    n_frames = (2049 - 512) // 256 + 1
    assert frames.shape == (3, n_frames, 512)
    for f in range(n_frames):
        np.testing.assert_array_equal(frames[:, f], x[:, f * 256 : f * 256 + 512])


def test_overlap_add_matches_loop(rng):
    frames = rng.standard_normal((2, 9, 512)).astype(np.float32)
    got = np.asarray(S.overlap_add(jnp.asarray(frames), 256))
    want = np.zeros((2, 8 * 256 + 512), dtype=np.float64)
    for f in range(9):
        want[:, f * 256 : f * 256 + 512] += frames[:, f]
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("n", [4096, 5000, 16000])
def test_stft_matches_oracle(rng, n):
    x = rng.standard_normal((2, n)).astype(np.float32)
    got = np.asarray(S.stft(jnp.asarray(x), CFG))
    want = oracle_stft(x, CFG)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_stft_frame_count_matches_conv_formula(rng):
    # conv formulation: frames = n//hop + 1 for win=2*hop (SURVEY §2.4.5)
    for n in (4096, 5000, 16000):
        assert S.num_frames(n, CFG) == n // CFG.hop + 1


@pytest.mark.parametrize("n", [4096, 16000])
def test_istft_roundtrip_matches_oracle(rng, n):
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec = oracle_stft(x, CFG)
    got = np.asarray(S.istft(jnp.asarray(spec, dtype=jnp.float32), CFG))
    want = oracle_istft(spec, CFG)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_roundtrip_reconstructs_signal(rng):
    # With the pinv synthesis + envelope normalization, interior samples
    # reconstruct the input (reference's implicit property).
    x = rng.standard_normal((1, 8192)).astype(np.float32)
    y = np.asarray(S.istft(S.stft(jnp.asarray(x), CFG), CFG))
    assert y.shape == x.shape
    np.testing.assert_allclose(y[:, 512:-512], x[:, 512:-512], atol=1e-3)


@pytest.mark.parametrize("cfg", [
    S.StftConfig(win_len=320, hop=160, fft_len=320),  # FullSubNet geometry
    S.StftConfig(win_len=512, hop=256, fft_len=512, win_type="hamming"),
])
def test_other_geometries_roundtrip(rng, cfg):
    x = rng.standard_normal((1, 16 * cfg.hop)).astype(np.float32)
    y = np.asarray(S.istft(S.stft(jnp.asarray(x), cfg), cfg))
    assert y.shape == x.shape
    interior = slice(cfg.win_len, -cfg.win_len)
    np.testing.assert_allclose(y[:, interior], x[:, interior], atol=2e-3)


def test_magnitude_epsilon():
    spec = jnp.zeros((1, 4, 2 * CFG.n_freqs))
    mag = np.asarray(S.magnitude(spec))
    np.testing.assert_allclose(mag, np.sqrt(1e-9), rtol=1e-5)
