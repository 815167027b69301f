"""Bulk-delay estimation + pre-alignment (dsp/delay.py) and the Kalman
cold-start deadlock it routes around (KalmanConfig.q_min)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp.delay import align_far, estimate_and_align, gcc_phat_delay
from aec_tpu.linear.kalman import kalman_cancel

SR = 16000
N = 8 * SR


@pytest.fixture(scope="module")
def delayed_scene():
    rng = np.random.default_rng(0)
    far = rng.standard_normal((2, N)).astype(np.float32)
    rir = (
        np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)
    ).astype(np.float32) * 0.4
    delays = [250 * 16, 73 * 16]  # 250 ms (beyond the 160 ms span), 73 ms
    mic = np.stack(
        [
            np.convolve(np.pad(f, (d, 0))[:N], rir)[:N]
            for f, d in zip(far, delays)
        ]
    ).astype(np.float32)
    return far, mic, delays, rir


def _tail_erle(mic, out):
    t = slice(N // 2, None)
    return 10.0 * np.log10(
        np.sum(mic[t] ** 2) / (np.sum(np.asarray(out)[t] ** 2) + 1e-12)
    )


def test_gcc_phat_finds_dominant_path(delayed_scene):
    far, mic, delays, rir = delayed_scene
    d = np.asarray(
        jax.jit(lambda f, m: gcc_phat_delay(f, m, max_delay=8000))(
            jnp.asarray(far), jnp.asarray(mic)
        )
    )
    # the whitened peak lands on a dominant EARLY path of the RIR — within
    # the first few ms after the true bulk delay (exact tap is
    # RIR-dependent: whitening reweights the taps)
    for est, true in zip(d, delays):
        assert true <= est <= true + 64, (est, true)


def test_align_far_shift_semantics():
    far = jnp.asarray(np.arange(1, 11, dtype=np.float32))[None]
    out = np.asarray(align_far(far, jnp.asarray([3]), 4))[0]
    np.testing.assert_array_equal(out, [0, 0, 0, 1, 2, 3, 4, 5, 6, 7])


def test_alignment_restores_cancellation(delayed_scene):
    """A 250 ms bulk delay exceeds the default Kalman span (10 x 16 ms) —
    measured 0.0 dB ERLE unaligned; block-quantized pre-alignment restores
    40+ dB on both utterances (CPU runs a few dB below, so assert > 25)."""
    far, mic, _, _ = delayed_scene
    fj, mj = jnp.asarray(far), jnp.asarray(mic)
    raw = kalman_cancel(KalmanConfig(), fj, mj)["wav"]
    assert _tail_erle(mic[0], raw[0]) < 5.0  # the failure mode is real
    fa, shifts = jax.jit(
        lambda f, m: estimate_and_align(f, m, max_delay=8000)
    )(fj, mj)
    assert all(int(s) % 256 == 0 for s in np.asarray(shifts))
    out = kalman_cancel(KalmanConfig(), fa, mj)["wav"]
    for i in range(2):
        assert _tail_erle(mic[i], out[i]) > 25.0, i


def test_qmin_escapes_cold_start_deadlock(delayed_scene):
    """The measured Kalman cold-start deadlock (configs.py q_min doc): a
    sub-block-aligned silent far prefix with ~0.5-block residual delay
    freezes the default filter at ~1 dB ERLE forever; the absolute
    process-noise floor q_min=1e-3 escapes it (38 dB measured on TPU)."""
    far, mic, _, _ = delayed_scene
    fs = jnp.asarray(np.pad(far[0], (3517, 0))[:N])[None]
    mj = jnp.asarray(mic[0])[None]
    stuck = kalman_cancel(KalmanConfig(), fs, mj, fused=False)["wav"]
    assert _tail_erle(mic[0], stuck[0]) < 10.0  # deadlock reproduces
    cfg = dataclasses.replace(KalmanConfig(), q_min=1e-3)
    ok = kalman_cancel(cfg, fs, mj, fused=False)["wav"]
    assert _tail_erle(mic[0], ok[0]) > 25.0


def test_qmin_flows_through_fused_kernels(delayed_scene):
    """q_min is state DYNAMICS — the fused kernels must match the scan's
    recursion exactly when it is nonzero (interpret mode, high tier)."""
    from aec_tpu.kernels.pallas_kalman import (
        kalman_cancel_fused,
        kalman_cancel_fused_batched_bl,
    )

    far, mic, _, _ = delayed_scene
    n = 12 * 256
    fj = jnp.asarray(far[:, :n])
    mj = jnp.asarray(mic[:, :n])
    cfg = dataclasses.replace(KalmanConfig(), q_min=1e-3)
    want = kalman_cancel(
        cfg, fj, mj, fused=False, precision=jax.lax.Precision.HIGHEST
    )["wav"]
    scale = float(jnp.abs(want).max())
    got_bl = kalman_cancel_fused_batched_bl(
        cfg, fj, mj, tile=2, interpret=True, dot_mode="high"
    )["wav"]
    got_1 = kalman_cancel_fused(
        cfg, fj[0], mj[0], interpret=True, dot_mode="high"
    )["wav"]
    np.testing.assert_allclose(np.asarray(got_bl), np.asarray(want),
                               atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(got_1), np.asarray(want[0]),
                               atol=2e-4 * scale)
