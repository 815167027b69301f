"""End-to-end demo: synthetic echo scene -> two-stage AEC -> wavs + metrics.

  python examples/demo_two_stage.py [--out_dir demo_out] [--seconds 8]

Builds an AEC-Challenge-style scene (far-end speech-shaped noise through a
decaying room impulse response + near-end speech-shaped noise), runs the
stage-1 Kalman canceller and the stage-2 LittleNet post-filter (random init
— substitute a trained checkpoint via --model_file), and reports
ERLE / SI-SNR plus the realtime factor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def speech_shaped_noise(rng, n, sr=16000):
    """White noise shaped by a crude 1/f speech-like spectral tilt + 4 Hz
    syllabic envelope."""
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f = np.fft.rfftfreq(n, 1 / sr)
    tilt = 1.0 / np.maximum(f / 500.0, 1.0)
    shaped = np.fft.irfft(spec * tilt, n=n)
    env = 0.5 + 0.5 * np.clip(np.sin(2 * np.pi * 4.0 * np.arange(n) / sr), 0, None)
    out = shaped * env
    return (out / np.max(np.abs(out))).astype(np.float32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="demo_out")
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--model_file",
                   default=os.path.join(os.path.dirname(__file__), "..", "checkpoints", "little_net_synthetic.npz"),
                   help="trained checkpoint (.npz or reference .pt); '' = random init")
    p.add_argument("--echo_gain", type=float, default=0.7)
    args = p.parse_args()

    from aec_tpu.configs import KalmanConfig
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.pipeline.audio_io import write_wav
    from aec_tpu.pipeline.two_stage import two_stage_cancel
    from aec_tpu.train.metrics import erle, si_snr

    sr = 16000
    n = int(args.seconds * sr) // 256 * 256
    rng = np.random.default_rng(0)

    far = speech_shaped_noise(rng, n)
    rir = (np.exp(-np.arange(1600) / 300.0) * rng.standard_normal(1600)).astype(np.float32)
    rir = args.echo_gain * rir / np.max(np.abs(rir))
    echo = np.convolve(far, rir)[:n].astype(np.float32)
    near = 0.3 * speech_shaped_noise(np.random.default_rng(1), n)
    mic = (echo + near).astype(np.float32)

    if args.model_file:
        from aec_tpu.cli.infer import load_params

        params = load_params(args.model_file)
    else:
        params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())

    out = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        stage1="kalman", lin_cfg=KalmanConfig(),
    )
    enhanced = np.asarray(out["wav"])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rep = two_stage_cancel(
            params, jnp.asarray(far), jnp.asarray(mic), erb,
            stage1="kalman", lin_cfg=KalmanConfig(),
        )
        np.asarray(rep["wav"][:4])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    lin = np.asarray(out["linear_wav"])
    tail = slice(n // 2, None)

    # echo-only variant of the same scene: ERLE is meaningful there (in
    # double talk, preserving near-end rightly LOWERS ERLE)
    out_e = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(echo), erb,
        stage1="kalman", lin_cfg=KalmanConfig(),
    )
    lin_e, enh_e = np.asarray(out_e["linear_wav"]), np.asarray(out_e["wav"])
    report = {
        "echo_only_erle_stage1_db": round(float(erle(jnp.asarray(echo[tail]), jnp.asarray(lin_e[tail]))), 2),
        "echo_only_erle_two_stage_db": round(float(erle(jnp.asarray(echo[tail]), jnp.asarray(enh_e[tail]))), 2),
        "double_talk_sisnr_linear_db": round(float(si_snr(jnp.asarray(lin[tail]), jnp.asarray(near[tail]))), 2),
        "double_talk_sisnr_enhanced_db": round(float(si_snr(jnp.asarray(enhanced[tail]), jnp.asarray(near[tail]))), 2),
        "xrt": round(args.seconds / dt, 1),
    }
    os.makedirs(args.out_dir, exist_ok=True)
    for name, wav in (("far", far), ("mic", mic), ("near", near),
                      ("linear", lin), ("enhanced", enhanced)):
        write_wav(os.path.join(args.out_dir, f"{name}.wav"), wav, sr)
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
