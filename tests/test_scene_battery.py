"""Physics regression on the speech-realistic scene battery (round-3).

Runs BOTH stage-1 filters over all eight scenes of benchmarks/scenes.py —
including speech-like far-end, memoryless loudspeaker nonlinearity, 30 ms
bulk delay, and speech double-talk — and pins converged-tail ERLE floors.
Thresholds sit ~30-40% below the measured CPU values (recorded inline) so
real regressions trip while fp32 jitter does not.

This battery is what exposed (and now guards) the round-3 NLMS robustness
fix: the textbook eps-only update DIVERGED on harmonic far-ends
(speech_far -36 dB, nonlinear -14 dB, speech_dtalk -27 dB tail ERLE); the
eps_rel + beta denominator terms (configs.NlmsConfig) rescue all three and
improve the white-noise scenes too.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.linear.nlms import nlms_cancel
from benchmarks.scenes import erle_tail, make_scenes

N = 8 * 16384  # 8.2 s — the battery's calibration length

# measured (CPU, 2026-08): kalman / nlms tail ERLE in dB
#   echo_only    46.6 / 88.1      long_rir   40.3 / 81.0
#   double_talk  14.8 / 15.0      path_change 17.3 / 23.2
#   speech_far   26.7 / 33.1      nonlinear   12.2 / 15.5
#   bulk_delay   39.8 / 83.8      speech_dtalk 10.6 / 10.6
FLOORS = {
    "echo_only": (35.0, 55.0),
    "long_rir": (30.0, 50.0),
    "double_talk": (10.0, 10.0),
    "path_change": (10.0, 14.0),
    "speech_far": (18.0, 22.0),
    "nonlinear": (8.0, 10.0),
    "bulk_delay": (28.0, 55.0),
    "speech_dtalk": (6.5, 6.5),
}


@pytest.fixture(scope="module")
def battery(request):
    rng = np.random.default_rng(0)
    scenes = make_scenes(rng, n=N)
    names = list(scenes)
    far = jnp.asarray(np.stack([scenes[k][0] for k in names]))
    mic = jnp.asarray(np.stack([scenes[k][1] for k in names]))
    ek = np.asarray(kalman_cancel(KalmanConfig(), far, mic)["wav"])
    en = np.asarray(nlms_cancel(NlmsConfig(), far, mic)["wav"])
    return scenes, names, ek, en


@pytest.mark.parametrize("scene", list(FLOORS))
def test_stage1_erle_floor(battery, scene):
    scenes, names, ek, en = battery
    i = names.index(scene)
    mic = scenes[scene][1]
    k_floor, n_floor = FLOORS[scene]
    got_k = erle_tail(mic, ek[i])
    got_n = erle_tail(mic, en[i])
    assert got_k > k_floor, f"kalman {scene}: {got_k:.1f} dB < {k_floor}"
    assert got_n > n_floor, f"nlms {scene}: {got_n:.1f} dB < {n_floor}"


def test_near_end_preserved_in_speech_double_talk(battery):
    """The cancelled output must still BE the near-end speech (not merely
    low-energy): tail correlation with the near signal stays high."""
    scenes, names, ek, en = battery
    _, _, near = scenes["speech_dtalk"]
    i = names.index("speech_dtalk")
    lo = 3 * N // 4
    for out, label in ((ek[i], "kalman"), (en[i], "nlms")):
        c = float(np.corrcoef(out[lo:], near[lo:])[0, 1])
        assert c > 0.85, f"{label} near-end corr {c:.3f}"


def test_classic_nlms_diverges_on_speech(battery):
    """Characterize WHY the robustness terms are defaults: the textbook
    update (eps_rel=0, beta=0) measurably diverges on the harmonic far-end
    scene (negative tail ERLE = energy injection)."""
    scenes, _, _, _ = battery
    far, mic, _ = scenes["speech_far"]
    classic = NlmsConfig(eps_rel=0.0, beta=0.0)
    out = np.asarray(
        nlms_cancel(classic, jnp.asarray(far), jnp.asarray(mic))["wav"]
    )
    assert erle_tail(mic, out) < 0.0  # the failure mode is real
