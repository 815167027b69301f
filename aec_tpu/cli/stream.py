"""Streaming AEC CLI — process a wav pair hop-by-hop like a live call.

Simulates the serving loop: 16 ms far/mic blocks go through the two-stage
streaming runtime (stage-1 Kalman/NLMS + LittleNet) one step at a time,
reporting per-block latency percentiles and realtime margin.

  python -m aec_tpu.cli.stream --far far.wav --mic mic.wav --out enhanced.wav \
      [--model_file checkpoints/little_net_synthetic.npz] [--stage1 kalman]

Latency caveat: per-block wall latency includes one host<->device dispatch
round trip. On this image's tunneled TPU that round trip alone is ~25-30 ms
(device compute is ~1.3 ms/block amortized — see the concurrent-streams
benchmark); on a directly-attached TPU the loop runs comfortably inside the
16 ms budget.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.models.little_net import little_net_init
from aec_tpu.pipeline.audio_io import read_wav, write_wav
from aec_tpu.pipeline.streaming import stream_flush, stream_init, stream_step


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Hop-by-hop streaming enhancement")
    p.add_argument("--far", required=True)
    p.add_argument("--mic", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model_file", default="")
    p.add_argument("--stage1", choices=("kalman", "nlms", "none"), default="kalman")
    p.add_argument("--normalize", action=argparse.BooleanOptionalAction, default=False,
                   help="causal running-stats pseudo-norm for checkpoints "
                        "trained with the reference's in-forward norm "
                        "(ERB.py:254-256); default off = causal raw mode")
    p.add_argument("--gain-norm", action="store_true",
                   help="scale-sane ERB synthesis (models/little_net.py) — "
                        "use for preservation-trained checkpoints, e.g. "
                        "little_net_dtalk.npz")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    far, sr = read_wav(args.far, args.sr)
    mic, _ = read_wav(args.mic, args.sr)
    n = min(len(far), len(mic))
    cfg = StftConfig()
    n = n // cfg.hop * cfg.hop
    far, mic = far[:n], mic[:n]

    if args.model_file:
        from aec_tpu.cli.infer import load_params

        params = load_params(args.model_file)
    else:
        params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    lin_cfg = {"kalman": KalmanConfig(), "nlms": NlmsConfig(), "none": None}[args.stage1]

    state = stream_init(cfg=cfg, stage1=args.stage1, lin_cfg=lin_cfg)
    # warmup/compile on a zero block so the live loop is jitter-free
    _, _ = stream_step(
        params, state, jnp.zeros((cfg.hop,)), jnp.zeros((cfg.hop,)), erb, cfg,
        stage1=args.stage1, lin_cfg=lin_cfg, normalize=args.normalize,
        gain_norm=args.gain_norm,
    )

    outs, lat = [], []
    for lo in range(0, n, cfg.hop):
        f = jnp.asarray(far[lo : lo + cfg.hop])
        m = jnp.asarray(mic[lo : lo + cfg.hop])
        t0 = time.perf_counter()
        state, out = stream_step(
            params, state, f, m, erb, cfg, stage1=args.stage1,
            lin_cfg=lin_cfg, normalize=args.normalize,
            gain_norm=args.gain_norm,
        )
        out = np.asarray(out)  # force completion: this is the block latency
        lat.append(time.perf_counter() - t0)
        outs.append(out)
    outs.append(np.asarray(stream_flush(
        params, state, erb, cfg, normalize=args.normalize,
        gain_norm=args.gain_norm,
    )))
    wav = np.concatenate(outs)[cfg.hop :][:n]  # drop the trimmed left edge
    write_wav(args.out, wav.astype(np.float32), sr)

    lat_ms = np.asarray(lat[1:]) * 1e3  # skip first (cache warm)
    block_ms = cfg.hop / sr * 1e3
    report = {
        "blocks": len(lat),
        "block_ms": block_ms,
        "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 3),
        "latency_ms_p95": round(float(np.percentile(lat_ms, 95)), 3),
        "realtime": bool(np.percentile(lat_ms, 95) < block_ms),
        "algorithmic_latency_ms": block_ms,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
