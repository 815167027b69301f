"""Guard the shipped pretrained checkpoint: the two-stage pipeline must beat
stage-1 alone on echo-only scenes (the BASELINE north-star behavior)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints", "little_net_synthetic.npz")


@pytest.mark.skipif(not os.path.isfile(CKPT), reason="pretrained checkpoint not present")
def test_pretrained_two_stage_beats_stage1(rng):
    from aec_tpu.configs import KalmanConfig
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.pipeline.two_stage import two_stage_cancel
    from aec_tpu.train import checkpoints
    from aec_tpu.train.metrics import erle

    params = checkpoints.restore(
        CKPT, {"params": little_net_init(jax.random.PRNGKey(0))}
    )["params"]
    erb = jnp.asarray(erb_filterbank())

    # echo-only scene in the training distribution's envelope style
    n = 4 * 16384
    sr = 16000
    t = np.arange(n) / sr
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / sr)
    far = np.fft.irfft(spec / np.maximum(f / 500.0, 1.0), n=n)
    far = (far / np.max(np.abs(far)) * (0.5 + 0.5 * np.clip(np.sin(2 * np.pi * 4 * t), 0, None))).astype(np.float32)
    rir = (np.exp(-np.arange(1600) / 300.0) * rng.standard_normal(1600)).astype(np.float32)
    rir = 0.7 * rir / np.max(np.abs(rir))
    mic = np.convolve(far, rir)[:n].astype(np.float32)
    mic = (mic / np.max(np.abs(mic))).astype(np.float32)

    out = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        stage1="kalman", lin_cfg=KalmanConfig(),
    )
    tail = slice(n // 2, None)
    e_lin = float(erle(jnp.asarray(mic[tail]), out["linear_wav"][tail]))
    e_two = float(erle(jnp.asarray(mic[tail]), out["wav"][tail]))
    assert e_two > e_lin + 10.0, (e_lin, e_two)
