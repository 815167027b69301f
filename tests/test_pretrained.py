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
DTALK = os.path.join(CKPT_DIR, "little_net_dtalk.npz")


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


@pytest.fixture(scope="module")
def battery():
    """The round-3/4 quality battery's double-talk scenes (scenes.py)."""
    from benchmarks.scenes import make_scenes

    s = make_scenes(np.random.default_rng(0), n=4 * 16384)
    return {
        k: s[k]
        for k in ("speech_dtalk", "double_talk", "echo_only", "path_change")
    }


def _two_stage_wav(params, far, mic, gain_norm=False):
    from aec_tpu.configs import KalmanConfig
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.pipeline.two_stage import two_stage_cancel

    erb = jnp.asarray(erb_filterbank())
    return np.asarray(
        two_stage_cancel(
            params, jnp.asarray(far), jnp.asarray(mic), erb,
            stage1="kalman", lin_cfg=KalmanConfig(), gain_norm=gain_norm,
        )["wav"]
    )


def _erle_tail(mic, wav):
    t = slice(len(mic) // 2, None)
    return 10.0 * np.log10(
        (np.mean(np.asarray(mic)[t] ** 2) + 1e-30)
        / (np.mean(np.asarray(wav)[t] ** 2) + 1e-30)
    )


@pytest.mark.skipif(not os.path.isfile(DTALK), reason="checkpoint absent")
def test_dtalk_speech_preservation_floors(battery):
    """Round-4 (VERDICT item 2): CI floors for the speech-preservation axis.

    ``little_net_dtalk.npz`` is the preservation checkpoint: asym_weight=3
    (the reference's commented-out asymmetric term, ERB.py:184-198) plus
    the round-4 waveform SI-SNR term at sisnr_weight=0.2 (little_net_loss;
    optimizes the deployed double-talk metric through gain_norm synthesis
    — the w=0.2 sweep winner, w=0.5/1.0 regressed path_change/suppression),
    run with the scale-sane ERB synthesis (gain_norm=True; the reference's
    un-normalized back-projection makes wav scale ill-defined for
    preservation masks — models/little_net.py). Graded on-battery
    (checkpoint_quality_r4_gn.json; dtalk_v1 = the asym-only round-4
    predecessor): speech_dtalk STOI 0.7299 / SI-SNR +5.40 dB, double_talk
    ERLE 39.8 / SI-SNR -2.4, echo_only 55.3, path_change 82.2 (v1: 39.2),
    nonlinear 61.9 (v1: 48.6), bulk_delay 80.2 (v1: 52.2). Floors below
    carry safety margin; a retrain that trades near-end speech for ERLE
    fails here."""
    from aec_tpu.train.metrics import si_snr
    from aec_tpu.train.stoi import stoi

    params = _load(DTALK)
    far, mic, near = battery["speech_dtalk"]
    wav = _two_stage_wav(params, far, mic, gain_norm=True)
    assert float(stoi(near, wav)) > 0.65
    assert float(si_snr(jnp.asarray(wav)[None], jnp.asarray(near)[None])) > 3.0
    far, mic, _ = battery["double_talk"]
    wav = _two_stage_wav(params, far, mic, gain_norm=True)
    assert _erle_tail(mic, wav) > 35.0
    far, mic, _ = battery["echo_only"]
    wav = _two_stage_wav(params, far, mic, gain_norm=True)
    assert _erle_tail(mic, wav) > 45.0
    # round-4 dtalk-v2: path_change was the sweep's discriminator (w=0.5
    # collapsed it to 26.9 dB; v1 measured 39.2, shipped v2 82.2)
    far, mic, _ = battery["path_change"]
    wav = _two_stage_wav(params, far, mic, gain_norm=True)
    assert _erle_tail(mic, wav) > 30.0


@pytest.mark.skipif(not os.path.isfile(ROBUST), reason="checkpoint absent")
def test_robust_double_talk_erle_floor(battery):
    """Round-4 (VERDICT item 2): the round-3 verdict flagged the general
    checkpoint regressing double_talk ERLE to 13.89 dB vs robust's 32.43
    with nothing guarding it. Pin the shipped default-path behavior:
    robust keeps >= 25 dB two-stage ERLE on the battery double_talk scene
    (measured 32.4 reference-synthesis / 49.6 gain_norm)."""
    params = _load(ROBUST)
    far, mic, _ = battery["double_talk"]
    wav = _two_stage_wav(params, far, mic)
    assert _erle_tail(mic, wav) > 25.0
