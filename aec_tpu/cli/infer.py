"""Inference / enhancement CLI (reference: scripts/test.py:70-212 Tester).

Per utterance of each test ``.ex`` file, runs the post-filter (optionally
preceded by stage-1 linear AEC — a capability the reference lacks) and
writes five wavs: ``{k}_near_est/near/far/mic/echo.wav`` at 16 kHz
(test.py:165-169 contract). Also accepts reference ``.pt`` checkpoints.

  python -m aec_tpu.cli.infer --tt_list lists/tt_list.txt --ckpt_dir exp \
      --model_file exp/models/best_loss.npz --est_path out [--stage1 kalman]

Note: the reference's loop has an indexing bug (always re-opens
tt_list[0], test.py:138); we iterate every listed file.
"""

from __future__ import annotations

import argparse
import os
import pprint

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.models.little_net import little_net_init
from aec_tpu.pipeline.audio_io import write_wav
from aec_tpu.pipeline.datasets import EvalLoader
from aec_tpu.pipeline.h5io import read_filelist
from aec_tpu.pipeline.two_stage import two_stage_cancel
from aec_tpu.train import checkpoints
from aec_tpu.utils.tools import get_logger, num_params

logger = get_logger(__name__)


def load_params(model_file: str):
    params = little_net_init(jax.random.PRNGKey(0))
    if model_file.endswith(".pt"):
        from aec_tpu.utils.torch_compat import (
            little_net_params_from_state_dict,
            load_reference_checkpoint,
        )

        _, state = load_reference_checkpoint(model_file)
        return little_net_params_from_state_dict(state)
    return checkpoints.restore(model_file, {"params": params})["params"]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Enhance test utterances and dump wavs",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--tt_list", type=str, required=True)
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--model_file", type=str, required=True)
    p.add_argument("--est_path", type=str, required=True)
    p.add_argument("--filename_list", type=str, default="")
    p.add_argument("--stage1", choices=("none", "kalman", "nlms"), default="none",
                   help="optional linear AEC before the post-filter")
    p.add_argument("--normalize", action="store_true",
                   help="apply the reference's global pseudo-norm (training parity)")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    log = get_logger(os.path.join(args.ckpt_dir, "test.log"), log_file=True)
    log.info("Arguments:\n%s", pprint.pformat(vars(args)))

    try:
        params = load_params(args.model_file)
        log.info("Loaded model from %s", args.model_file)
    except FileNotFoundError:
        params = little_net_init(jax.random.PRNGKey(0))
        log.info("No checkpoint at %s; using fresh init", args.model_file)
    log.info("Trainable parameter count: {:,d}".format(num_params(params)))

    erb = jnp.asarray(erb_filterbank())
    scfg = StftConfig()
    lin_cfg = {"kalman": KalmanConfig(), "nlms": NlmsConfig(), "none": None}[args.stage1]

    for tt_file in read_filelist(args.tt_list):
        sub = os.path.join(
            args.est_path, os.path.basename(tt_file).replace(".ex", "")
        )
        os.makedirs(sub, exist_ok=True)
        loader = EvalLoader(tt_file, batch_size=1, bucket_quantum=scfg.hop)
        log.info("Estimating on %s (%d utts)", tt_file, loader.n)
        for k, egs in enumerate(loader):
            n = egs["n_samples"]
            out = two_stage_cancel(
                params,
                jnp.asarray(egs["farend_speech"]),
                jnp.asarray(egs["nearend_mic"]),
                erb,
                stage1=args.stage1,
                lin_cfg=lin_cfg,
                scfg=scfg,
                normalize=args.normalize,
            )
            est = np.asarray(out["wav"])[0][:n]
            write_wav(os.path.join(sub, f"{k}_near_est.wav"), est, args.sr)
            write_wav(os.path.join(sub, f"{k}_near.wav"), egs["nearend_speech"][0][:n], args.sr)
            write_wav(os.path.join(sub, f"{k}_far.wav"), egs["farend_speech"][0][:n], args.sr)
            write_wav(os.path.join(sub, f"{k}_mic.wav"), egs["nearend_mic"][0][:n], args.sr)
            write_wav(os.path.join(sub, f"{k}_echo.wav"), egs["echo"][0][:n], args.sr)


if __name__ == "__main__":
    main()
