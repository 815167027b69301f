"""Guard the shipped pretrained checkpoints.

Two checkpoints ship, with a measured specialization trade-off the round-3
scene battery exposed:

- ``little_net_synthetic.npz`` — trained on speech-shaped-noise scenes only
  (the reference-style training distribution). On its home scene the
  two-stage pipeline reaches ~90 dB ERLE (vs ~32 dB stage-1 alone), but on
  a NONLINEAR loudspeaker scene it actively injects energy (measured
  -13.9 dB two-stage vs +9.7 dB stage-1 alone) — pinned below as the
  motivation for the robust checkpoint.
- ``little_net_robust.npz`` — trained on the round-3 mix (harmonic
  speech-like far-ends, tanh loudspeaker saturation, bulk delay). On the
  nonlinear scene it reaches ~73 dB two-stage ERLE; on the clean scene it
  keeps a positive but smaller margin than stage-1 alone (~22 vs ~32 dB) —
  the price of robustness with a 12.5k-parameter suppressor.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "checkpoints")
SPECIALIST = os.path.join(CKPT_DIR, "little_net_synthetic.npz")
ROBUST = os.path.join(CKPT_DIR, "little_net_robust.npz")


def _load(path):
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.train import checkpoints

    return checkpoints.restore(
        path, {"params": little_net_init(jax.random.PRNGKey(0))}
    )["params"]


@pytest.fixture(scope="module")
def scenes():
    """(clean speech-shaped-noise scene, nonlinear loudspeaker scene)."""
    from benchmarks.scenes import loudspeaker, speech_like

    rng = np.random.default_rng(1234)
    n, sr = 4 * 16384, 16000
    t = np.arange(n) / sr
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / sr)
    far = np.fft.irfft(spec / np.maximum(f / 500.0, 1.0), n=n)
    far = (
        far / np.max(np.abs(far))
        * (0.5 + 0.5 * np.clip(np.sin(2 * np.pi * 4 * t), 0, None))
    ).astype(np.float32)
    rir = (np.exp(-np.arange(1600) / 300.0) * rng.standard_normal(1600)).astype(
        np.float32
    )
    rir = 0.7 * rir / np.max(np.abs(rir))
    mic = np.convolve(far, rir)[:n].astype(np.float32)
    mic = (mic / np.max(np.abs(mic))).astype(np.float32)

    far2 = speech_like(np.random.default_rng(7), n, f0=125.0)
    mic2 = np.convolve(loudspeaker(far2), 0.5 * rir / np.abs(rir).max())[
        :n
    ].astype(np.float32)
    mic2 = (mic2 / np.max(np.abs(mic2))).astype(np.float32)
    return {"clean": (far, mic), "nonlinear": (far2, mic2)}


def _erles(params, far, mic):
    from aec_tpu.configs import KalmanConfig
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.pipeline.two_stage import two_stage_cancel
    from aec_tpu.train.metrics import erle

    erb = jnp.asarray(erb_filterbank())
    out = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        stage1="kalman", lin_cfg=KalmanConfig(),
    )
    tail = slice(len(mic) // 2, None)
    return (
        float(erle(jnp.asarray(mic[tail]), out["linear_wav"][tail])),
        float(erle(jnp.asarray(mic[tail]), out["wav"][tail])),
    )


@pytest.mark.skipif(not os.path.isfile(SPECIALIST), reason="checkpoint absent")
def test_specialist_beats_stage1_on_clean(scenes):
    e_lin, e_two = _erles(_load(SPECIALIST), *scenes["clean"])
    assert e_two > e_lin + 10.0, (e_lin, e_two)  # measured ~32 -> ~90 dB


@pytest.mark.skipif(not os.path.isfile(ROBUST), reason="checkpoint absent")
def test_robust_beats_stage1_on_nonlinear(scenes):
    e_lin, e_two = _erles(_load(ROBUST), *scenes["nonlinear"])
    assert e_two > e_lin + 20.0, (e_lin, e_two)  # measured ~10 -> ~73 dB


@pytest.mark.skipif(not os.path.isfile(ROBUST), reason="checkpoint absent")
def test_robust_stays_strong_on_clean(scenes):
    _, e_two = _erles(_load(ROBUST), *scenes["clean"])
    assert e_two > 15.0, e_two  # measured ~22 dB (stage-1 alone: ~32)


@pytest.mark.skipif(not os.path.isfile(SPECIALIST), reason="checkpoint absent")
def test_specialist_fails_nonlinear_scene(scenes):
    """Characterize WHY the robust checkpoint ships: the speech-noise
    specialist actively injects energy on loudspeaker-saturated echo
    (measured -13.9 dB). If this ever passes, the specialist got robust and
    the dual-checkpoint story should be revisited."""
    e_lin, e_two = _erles(_load(SPECIALIST), *scenes["nonlinear"])
    assert e_two < e_lin  # the failure mode is real


GENERAL = os.path.join(CKPT_DIR, "little_net_general.npz")


@pytest.mark.skipif(not os.path.isfile(GENERAL), reason="checkpoint absent")
def test_general_strong_on_both_scenes(scenes):
    """Round-3 third checkpoint: same mixed-scene recipe as robust at 4x
    the compute (6000 steps, batch 128 — examples/train_synthetic.py).
    On-chip battery grade (checkpoint_quality_r3.json): beats robust on 6
    of 8 scenes (echo_only 45->73 dB, long_rir 42->85, bulk_delay 61->99,
    speech_far 71->89, speech_dtalk 66->73) at <=0.02 STOI cost. On THIS
    file's clean speech-noise scene it behaves like robust (measured
    ~20 dB vs robust's ~22; the specialist's ~90 dB there remains
    unmatched by any mixed-trained model — extra compute does not close
    the specialization gap, it widens the battery wins). Pinned: strong
    nonlinear margin + the robust-grade clean floor."""
    params = _load(GENERAL)
    _, e_two_c = _erles(params, *scenes["clean"])
    e_lin_n, e_two_n = _erles(params, *scenes["nonlinear"])
    assert e_two_c > 15.0, e_two_c  # measured ~20.0 dB
    assert e_two_n > e_lin_n + 20.0, (e_lin_n, e_two_n)
