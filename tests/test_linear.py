"""Stage-1 adaptive filter tests: convergence, ERLE, streaming consistency.

No reference implementation exists to compare against (SURVEY §0.1) — the
oracle is the physics: a known FIR echo path must be identified, yielding
large ERLE on echo-only signals and near-passthrough of near-end speech.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.linear import (
    kalman_cancel,
    kalman_filter,
    kalman_init,
    nlms_cancel,
    nlms_filter,
    nlms_init,
)
from aec_tpu.linear import overlap_save as ols
from aec_tpu.train.metrics import erle, erle_segments


def _echo_scene(rng, n=4 * 16384, rir_len=1024, near_scale=0.0):
    """far-end noise through a decaying random RIR (+ optional near-end)."""
    far = rng.standard_normal(n).astype(np.float32)
    rir = rng.standard_normal(rir_len) * np.exp(-np.arange(rir_len) / 150.0)
    rir = (0.5 * rir / np.max(np.abs(rir))).astype(np.float32)
    echo = np.convolve(far, rir)[:n].astype(np.float32)
    near = near_scale * rng.standard_normal(n).astype(np.float32)
    return far, echo + near, near


def test_nlms_converges_echo_only(rng):
    far, mic, _ = _echo_scene(rng)
    out = jax.jit(lambda f, m: nlms_cancel(NlmsConfig(), f, m))(
        jnp.asarray(far), jnp.asarray(mic)
    )
    e = np.asarray(out["wav"])
    assert e.shape == mic.shape
    tail = slice(-16384, None)
    tail_erle = float(erle(jnp.asarray(mic[tail]), jnp.asarray(e[tail])))
    assert tail_erle > 25.0, f"NLMS tail ERLE too low: {tail_erle:.1f} dB"


def test_kalman_converges_echo_only(rng):
    far, mic, _ = _echo_scene(rng)
    out = jax.jit(lambda f, m: kalman_cancel(KalmanConfig(), f, m))(
        jnp.asarray(far), jnp.asarray(mic)
    )
    e = np.asarray(out["wav"])
    tail = slice(-16384, None)
    tail_erle = float(erle(jnp.asarray(mic[tail]), jnp.asarray(e[tail])))
    assert tail_erle > 30.0, f"Kalman tail ERLE too low: {tail_erle:.1f} dB"


def test_both_filters_converge_deep_on_stationary_echo(rng):
    """Round-1 asserted kalman >= nlms - 3 dB; the round-3 NLMS robustness
    terms (configs.NlmsConfig eps_rel/beta) made NLMS the DEEPER converger
    on stationary scenes (88 vs 47 dB on the 8 s battery) — the Kalman's
    steady state is capped by its process noise (1-a^2)|W|^2, the price of
    its tracking ability (tests/test_scene_battery.py has the per-scene
    relation). Here: both must converge deep, and the Kalman must still be
    inside 25 dB of the NLMS (it cancels, not diverges)."""
    far, mic, _ = _echo_scene(rng)
    f, m = jnp.asarray(far), jnp.asarray(mic)
    e_n = nlms_cancel(NlmsConfig(), f, m)["wav"]
    e_k = kalman_cancel(KalmanConfig(), f, m)["wav"]
    seg_n = np.asarray(erle_segments(m, e_n, seg=16384))
    seg_k = np.asarray(erle_segments(m, e_k, seg=16384))
    assert seg_k[-1] > 25.0, f"kalman final-seg ERLE {seg_k[-1]:.1f}"
    assert seg_n[-1] > 25.0, f"nlms final-seg ERLE {seg_n[-1]:.1f}"
    assert seg_k[-1] >= seg_n[-1] - 25.0


def test_near_end_preserved_double_talk(rng):
    # near-end must survive: residual should stay correlated with near speech
    far, mic, near = _echo_scene(rng, near_scale=0.5)
    out = kalman_cancel(KalmanConfig(), jnp.asarray(far), jnp.asarray(mic))
    e = np.asarray(out["wav"])
    tail = slice(-16384, None)
    c = np.corrcoef(e[tail], near[tail])[0, 1]
    assert c > 0.9, f"near-end destroyed, corr={c:.2f}"


def test_zero_far_end_passthrough(rng):
    # with silent far-end the canceller is exactly identity (overlap-save,
    # no analysis/synthesis approximation)
    n = 16384
    mic = rng.standard_normal(n).astype(np.float32)
    far = np.zeros(n, dtype=np.float32)
    for fn, cfg in ((nlms_cancel, NlmsConfig()), (kalman_cancel, KalmanConfig())):
        e = np.asarray(fn(cfg, jnp.asarray(far), jnp.asarray(mic))["wav"])
        np.testing.assert_allclose(e, mic, atol=1e-6)


@pytest.mark.parametrize("which", ["nlms", "kalman"])
def test_scan_equals_streaming_chunks(rng, which):
    # filtering one long sequence == filtering chunked with carried state
    n, block = 60 * 256, 256
    far = rng.standard_normal(n).astype(np.float32)
    mic = rng.standard_normal(n).astype(np.float32)
    x_spec = np.asarray(ols.far_end_spectra(jnp.asarray(far), block))
    d_blocks = np.asarray(ols.mic_blocks(jnp.asarray(mic), block))
    if which == "nlms":
        cfg, init, filt = NlmsConfig(), nlms_init, nlms_filter
    else:
        cfg, init, filt = KalmanConfig(), kalman_init, kalman_filter
    full, _ = filt(cfg, jnp.asarray(x_spec), jnp.asarray(d_blocks))
    st = init(cfg, x_spec.shape[-1] // 2)  # ri layout: last dim = 2K
    outs = []
    for lo in range(0, x_spec.shape[0], 17):
        e, st = filt(
            cfg, jnp.asarray(x_spec[lo : lo + 17]), jnp.asarray(d_blocks[lo : lo + 17]), st
        )
        outs.append(np.asarray(e))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=0), np.asarray(full), atol=1e-5, rtol=1e-4
    )


def test_batched_vmap_matches_single(rng):
    far = rng.standard_normal((2, 32768)).astype(np.float32)
    mic = rng.standard_normal((2, 32768)).astype(np.float32)
    cfg = NlmsConfig()
    batched = nlms_cancel(cfg, jnp.asarray(far), jnp.asarray(mic))["wav"]
    for b in range(2):
        single = nlms_cancel(cfg, jnp.asarray(far[b]), jnp.asarray(mic[b]))["wav"]
        # batched vs single matmul reduction order shifts fp32 at ~1e-4
        np.testing.assert_allclose(np.asarray(batched[b]), np.asarray(single), atol=1e-3)


def test_kalman_tracks_echo_path_change(rng):
    # abrupt RIR switch mid-signal: the Kalman filter must re-converge
    # (the a<1 drift model keeps covariance alive — this is why it exists)
    n = 8 * 16384
    far = rng.standard_normal(n).astype(np.float32)
    rir1 = (np.exp(-np.arange(800) / 120.0) * rng.standard_normal(800)).astype(np.float32)
    rir2 = (np.exp(-np.arange(800) / 120.0) * rng.standard_normal(800)).astype(np.float32)
    echo1 = np.convolve(far, 0.5 * rir1)[:n]
    echo2 = np.convolve(far, 0.5 * rir2)[:n]
    half = n // 2
    mic = np.where(np.arange(n) < half, echo1, echo2).astype(np.float32)
    out = kalman_cancel(KalmanConfig(), jnp.asarray(far), jnp.asarray(mic))
    e = np.asarray(out["wav"])
    final = slice(-16384, None)
    final_erle = float(erle(jnp.asarray(mic[final]), jnp.asarray(e[final])))
    assert final_erle > 20.0, f"no re-convergence after path change: {final_erle:.1f} dB"


def test_identifies_short_rir_exactly(rng):
    # RIR shorter than one partition, echo-only: near-perfect cancellation
    far, mic, _ = _echo_scene(rng, n=4 * 16384, rir_len=200)
    out = kalman_cancel(KalmanConfig(), jnp.asarray(far), jnp.asarray(mic))
    tail = slice(-16384, None)
    tail_erle = float(erle(jnp.asarray(mic[tail]), jnp.asarray(np.asarray(out["wav"])[tail])))
    assert tail_erle > 35.0, f"short-RIR ERLE: {tail_erle:.1f} dB"
