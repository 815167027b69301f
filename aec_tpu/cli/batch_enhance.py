"""Bulk two-stage enhancement over utterance sets (BASELINE config #5).

Processes every utterance of the given test ``.ex`` files through the full
two-stage pipeline (stage-1 Kalman/NLMS + stage-2 post-filter) in large
fixed-shape device batches, the utterance axis sharded over all chips
(``--mesh``), writing ``<id>_enhanced.wav`` files and a throughput report.

  python -m aec_tpu.cli.batch_enhance --tt_list lists/tt_list.txt \
      --model_file exp/models/best_loss.npz --out_dir enhanced \
      [--mesh] [--batch 64] [--stage1 kalman]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.linear.nlms import nlms_cancel
from aec_tpu.models.little_net import little_net_apply
from aec_tpu.pipeline.audio_io import write_wav
from aec_tpu.pipeline.datasets import EvalLoader
from aec_tpu.pipeline.h5io import read_filelist
from aec_tpu.utils.tools import get_logger

logger = get_logger(__name__)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Bulk two-stage enhancement")
    p.add_argument("--tt_list", required=True)
    p.add_argument("--model_file", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--stage1", choices=("kalman", "nlms", "none"), default="kalman")
    p.add_argument("--normalize", action=argparse.BooleanOptionalAction, default=True,
                   help="reference Tester pseudo-norm (ERB.py:254-256), applied "
                        "per utterance so each batched result equals a batch=1 "
                        "reference run; --no-normalize for the causal mode")
    p.add_argument("--gain-norm", action="store_true",
                   help="scale-sane ERB synthesis (models/little_net.py) — "
                        "use for preservation-trained checkpoints")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--bucket", type=int, default=16384, help="length quantum")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    from aec_tpu.cli.infer import load_params

    params = load_params(args.model_file)
    erb = jnp.asarray(erb_filterbank())
    scfg = StftConfig()
    lin_cfg = {"kalman": KalmanConfig(), "nlms": NlmsConfig(), "none": None}[args.stage1]

    def pipeline(params, far, mic, erb):
        if args.stage1 == "kalman":
            lin = kalman_cancel(lin_cfg, far, mic, block=scfg.hop)["wav"]
        elif args.stage1 == "nlms":
            lin = nlms_cancel(lin_cfg, far, mic, block=scfg.hop)["wav"]
        else:
            lin = mic
        return little_net_apply(
            params, lin, far, erb, scfg,
            normalize=args.normalize, per_utt_norm=True,
            gain_norm=args.gain_norm,
        )["wav"]

    if args.mesh:
        from aec_tpu.parallel.mesh import data_sharding, make_mesh, replicated

        mesh = make_mesh()
        fn = jax.jit(
            pipeline,
            in_shardings=(replicated(mesh), data_sharding(mesh), data_sharding(mesh), replicated(mesh)),
            out_shardings=data_sharding(mesh),
        )
        pad_batch = mesh.shape["data"]
        logger.info("mesh: %d devices on the data axis", pad_batch)
    else:
        fn = jax.jit(pipeline)
        pad_batch = 1

    os.makedirs(args.out_dir, exist_ok=True)
    total_audio_s, total_wall, total_utts = 0.0, 0.0, 0
    for tt_file in read_filelist(args.tt_list):
        loader = EvalLoader(tt_file, batch_size=args.batch, bucket_quantum=args.bucket)
        for bi, egs in enumerate(loader):
            mic, far = egs["nearend_mic"], egs["farend_speech"]
            b = mic.shape[0]
            if b % pad_batch:  # pad to a shardable batch
                padn = pad_batch - b % pad_batch
                mic = np.concatenate([mic, np.zeros((padn, mic.shape[1]), np.float32)])
                far = np.concatenate([far, np.zeros((padn, far.shape[1]), np.float32)])
            t0 = time.perf_counter()
            wav = fn(params, jnp.asarray(far), jnp.asarray(mic), erb)
            wav = np.asarray(wav)[:b]
            dt = time.perf_counter() - t0
            total_wall += dt
            total_audio_s += b * mic.shape[1] / args.sr
            for j in range(b):
                k = bi * args.batch + j
                write_wav(
                    os.path.join(args.out_dir, f"{k}_enhanced.wav"),
                    wav[j][: egs["n_samples"]],
                    args.sr,
                )
            total_utts += b
    report = {
        "utterances": total_utts,
        "audio_seconds": round(total_audio_s, 1),
        "wall_seconds": round(total_wall, 3),
        "xrt": round(total_audio_s / max(total_wall, 1e-9), 1),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
