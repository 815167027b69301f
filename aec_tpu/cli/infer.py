"""Inference / enhancement CLI (reference: scripts/test.py:70-212 Tester).

Per utterance of each test ``.ex`` file, runs the selected post-filter
family (optionally preceded by stage-1 linear AEC — a capability the
reference lacks) and writes five wavs: ``{k}_near_est/near/far/mic/echo.wav``
at 16 kHz (test.py:165-169 contract). Accepts this framework's ``.npz``
checkpoints (any family) and the reference's pickled ``.pt`` (LittleNet).

  python -m aec_tpu.cli.infer --tt_list lists/tt_list.txt --ckpt_dir exp \
      --model_file exp/models/best_loss.npz --est_path out \
      [--model little_net] [--stage1 kalman]

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
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.linear.nlms import nlms_cancel
from aec_tpu.models.little_net import little_net_init
from aec_tpu.pipeline.audio_io import write_wav
from aec_tpu.pipeline.datasets import EvalLoader
from aec_tpu.pipeline.h5io import read_filelist
from aec_tpu.train import checkpoints
from aec_tpu.utils.tools import get_logger, num_params

logger = get_logger(__name__)


def load_params(model_file: str):
    """LittleNet loader (framework .npz or reference .pt)."""
    params = little_net_init(jax.random.PRNGKey(0))
    if model_file.endswith(".pt"):
        from aec_tpu.utils.torch_compat import (
            little_net_params_from_state_dict,
            load_reference_checkpoint,
        )

        _, state = load_reference_checkpoint(model_file)
        return little_net_params_from_state_dict(state)
    return checkpoints.restore(model_file, {"params": params})["params"]


def _make_enhancer(
    model: str, model_file: str, stage1: str, scfg: StftConfig,
    normalize: bool = True, align_far_ms: float = 0.0,
    lstm_dtype: str = "auto", gain_norm: bool = False,
):
    """Returns enhance(far [B,n], mic [B,n]) -> wav [B,n], loading weights.

    ``normalize`` reproduces the reference Tester's behavior: the net runs
    with its in-forward pseudo-norm (test.py:156 -> ERB.py:254-256). It only
    affects little_net — the other reference families apply no input
    normalization (TwoLayerGRUNet comments it out, ERB.py:125-127).
    """
    if model != "little_net" and model_file.endswith(".pt"):
        raise ValueError(
            f".pt checkpoint interop is little_net-only (reference .pt files "
            f"hold Little_net weights, tools.py:65-82); --model {model} needs "
            f"a framework .npz checkpoint"
        )
    lin_cfg = {"kalman": KalmanConfig(), "nlms": NlmsConfig(), "none": None}[stage1]
    # GCC-PHAT search window: the requested range plus guard headroom (the
    # applied shift is guard-backed-off and block-quantized INSIDE
    # estimate_and_align; flooring the window itself would truncate the
    # search and can miss the true peak entirely)
    max_shift = int(align_far_ms / 1e3 * 16000) + 512

    def prealign(far, mic):
        """Returns the (possibly aligned) far used by BOTH stages — the
        stage-2 post-filter's far-reference features must see the same
        alignment the canceller does."""
        if align_far_ms <= 0:
            return far
        from aec_tpu.dsp.delay import estimate_and_align

        return estimate_and_align(
            far, mic, max_delay=max_shift, block=scfg.hop
        )[0]

    def stage1_fn(far, mic):
        if stage1 == "kalman":
            return kalman_cancel(lin_cfg, far, mic, block=scfg.hop)["wav"]
        if stage1 == "nlms":
            return nlms_cancel(lin_cfg, far, mic, block=scfg.hop)["wav"]
        return mic

    if model in ("little_net", "two_layer_gru"):
        erb = jnp.asarray(erb_filterbank())
        if model == "little_net":
            from aec_tpu.models.little_net import little_net_apply as apply_fn

            params = load_params(model_file)
        else:
            from aec_tpu.models.two_layer_gru import (
                two_layer_gru_apply,
                two_layer_gru_init,
            )

            params = checkpoints.restore(
                model_file, {"params": two_layer_gru_init(jax.random.PRNGKey(0))}
            )["params"]
            apply_fn = lambda p, m, f, e, c, **kw: two_layer_gru_apply(p, m, f, e, c)
            if gain_norm:
                raise ValueError("--gain-norm is little_net-only (the ERB "
                                 "synthesis quirk lives in ERB.py:306-310)")

        @jax.jit
        def enhance(far, mic):
            far = prealign(far, mic)
            lin = stage1_fn(far, mic)
            return apply_fn(params, lin, far, erb, scfg, normalize=normalize,
                            gain_norm=gain_norm)["wav"]

        return enhance, params

    from aec_tpu.train.generic import make_adapter

    adapter = make_adapter(model, scfg)
    p0, s0 = adapter.init(jax.random.PRNGKey(0))
    restored = checkpoints.restore(model_file, {"params": p0, "model_state": s0})
    params, model_state = restored["params"], restored["model_state"]

    if model == "fullsubnet":
        from aec_tpu.models.fullsubnet import FullSubNetConfig, fullsubnet_apply

        cfg = FullSubNetConfig()

        @jax.jit
        def enhance(far, mic):
            far = prealign(far, mic)
            lin = stage1_fn(far, mic)
            return fullsubnet_apply(params, lin, far, cfg)["wav"]

        return enhance, params

    if model == "dccrn":
        from aec_tpu.models.dccrn import DccrnConfig, dccrn_apply

        cfg = DccrnConfig()

        @jax.jit
        def enhance(far, mic):
            far = prealign(far, mic)
            lin = stage1_fn(far, mic)
            return dccrn_apply(params, model_state, lin, far, cfg, train=False)[0]["wav"]

        return enhance, params

    if model == "att_ccrn":
        from aec_tpu.models.att_ccrn import AttCcrnConfig, att_ccrn_apply

        cfg = AttCcrnConfig()
        # inference default on TPU: int8 recurrent-weight streaming for the
        # 4096-unit bottleneck LSTM — 91.4 -> 25.6 ms per 8 s utterance at
        # batch 1 (87.5x -> 312.8x realtime), graded at >= 71.4 dB wav SNR
        # vs the bf16 path on all 8 battery scenes
        # (benchmarks/results/ab_lstm_int8_r4.json). Training paths are
        # untouched (int8's round() has zero gradient); --lstm_dtype opts
        # out. Off-TPU stays f32 (XLA CPU has no fast s8 dot; oracles).
        if lstm_dtype == "auto":
            rd = "int8" if jax.default_backend() == "tpu" else None
        else:
            rd = {"int8": "int8", "bf16": jnp.bfloat16,
                  "f32": jnp.float32}[lstm_dtype]

        @jax.jit
        def enhance(far, mic):
            far = prealign(far, mic)
            lin = stage1_fn(far, mic)
            return att_ccrn_apply(
                params, model_state, lin, far, cfg, train=False,
                lstm_recurrent_dtype=rd,
            )[0]["wav"]

        return enhance, params

    raise KeyError(f"no inference adapter for model {model!r}")


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
    p.add_argument("--model", type=str, default="little_net",
                   choices=("little_net", "two_layer_gru", "fullsubnet",
                            "dccrn", "att_ccrn"))
    p.add_argument("--stage1", choices=("none", "kalman", "nlms"), default="none",
                   help="optional linear AEC before the post-filter")
    p.add_argument("--align-far-ms", type=float, default=0.0,
                   help="if > 0, estimate each utterance's far/mic bulk "
                        "delay up to this many ms (GCC-PHAT, dsp/delay.py) "
                        "and pre-align the far end before stage 1 — needed "
                        "when the delay exceeds the canceller's partition "
                        "span (160 ms at the Kalman defaults)")
    p.add_argument("--normalize", action=argparse.BooleanOptionalAction, default=True,
                   help="apply the reference's in-forward pseudo-norm "
                        "(ERB.py:254-256; the Tester default, test.py:156). "
                        "--no-normalize gives the causal/streaming-equivalent "
                        "mode. little_net only; other families have no "
                        "reference-side input normalization.")
    p.add_argument("--gain-norm", action="store_true",
                   help="little_net only: scale-sane ERB synthesis (divide "
                        "the reference's magnitude-valued back-projection "
                        "by the unmasked one — gain becomes a [0,1] convex "
                        "combination of the sigmoid mask). Recommended with "
                        "the preservation-trained little_net_dtalk.npz "
                        "checkpoint; see models/little_net.py.")
    p.add_argument("--lstm_dtype", choices=("auto", "int8", "bf16", "f32"),
                   default="auto",
                   help="att_ccrn only: recurrent-weight streaming dtype of "
                        "the bottleneck LSTM. auto = int8 on TPU (3.6x "
                        "faster, graded >= 71 dB wav SNR vs bf16 on all 8 "
                        "battery scenes — ab_lstm_int8_r4.json), f32 "
                        "elsewhere; set bf16/f32 to opt out.")
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    log = get_logger(os.path.join(args.ckpt_dir, "test.log"), log_file=True)
    log.info("Arguments:\n%s", pprint.pformat(vars(args)))

    scfg = StftConfig()
    try:
        enhance, params = _make_enhancer(
            args.model, args.model_file, args.stage1, scfg,
            normalize=args.normalize, align_far_ms=args.align_far_ms,
            lstm_dtype=args.lstm_dtype, gain_norm=args.gain_norm,
        )
        log.info("Loaded %s from %s", args.model, args.model_file)
    except FileNotFoundError:
        enhance, params = None, None
        if args.model != "little_net":
            raise
        # reference behavior tolerated for the default model: fresh init
        erb = jnp.asarray(erb_filterbank())
        from aec_tpu.models.little_net import little_net_apply

        params = little_net_init(jax.random.PRNGKey(0))
        lin_cfg = {"kalman": KalmanConfig(), "nlms": NlmsConfig(), "none": None}[args.stage1]

        @jax.jit
        def enhance(far, mic):
            if args.stage1 == "kalman":
                lin = kalman_cancel(lin_cfg, far, mic, block=scfg.hop)["wav"]
            elif args.stage1 == "nlms":
                lin = nlms_cancel(lin_cfg, far, mic, block=scfg.hop)["wav"]
            else:
                lin = mic
            return little_net_apply(
                params, lin, far, erb, scfg, normalize=args.normalize
            )["wav"]

        log.info("No checkpoint at %s; using fresh init", args.model_file)
    log.info("Trainable parameter count: {:,d}".format(num_params(params)))

    for tt_file in read_filelist(args.tt_list):
        sub = os.path.join(
            args.est_path, os.path.basename(tt_file).replace(".ex", "")
        )
        os.makedirs(sub, exist_ok=True)
        loader = EvalLoader(tt_file, batch_size=1, bucket_quantum=scfg.hop)
        log.info("Estimating on %s (%d utts)", tt_file, loader.n)
        for k, egs in enumerate(loader):
            n = egs["n_samples"]
            wav = enhance(
                jnp.asarray(egs["farend_speech"]), jnp.asarray(egs["nearend_mic"])
            )
            est = np.asarray(wav)[0][:n]
            if len(est) < n:  # hop-mismatch tail (e.g. 320/160 models)
                est = np.pad(est, (0, n - len(est)))
            write_wav(os.path.join(sub, f"{k}_near_est.wav"), est, args.sr)
            write_wav(os.path.join(sub, f"{k}_near.wav"), egs["nearend_speech"][0][:n], args.sr)
            write_wav(os.path.join(sub, f"{k}_far.wav"), egs["farend_speech"][0][:n], args.sr)
            write_wav(os.path.join(sub, f"{k}_mic.wav"), egs["nearend_mic"][0][:n], args.sr)
            write_wav(os.path.join(sub, f"{k}_echo.wav"), egs["echo"][0][:n], args.sr)


if __name__ == "__main__":
    main()
