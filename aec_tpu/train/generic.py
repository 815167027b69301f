"""Generic trainer: one epoch-loop driver for EVERY model family.

The reference has one hand-written driver per model family (train1.py for
LittleNet, the broken models.py for FullSubNet). Here a single orchestrator
adapts the registry's families — stateless (LittleNet/TwoLayerGRU/DCT),
stateless-with-echo (FullSubNet), and stateful BatchNorm models
(DCCRN/ATT-CCRN) — to the same SPMD step/checkpoint/validation loop.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

from aec_tpu.configs import TrainConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.parallel.mesh import (
    globalize_batch,
    is_primary,
    make_mesh,
    process_local_files,
)
from aec_tpu.pipeline.datasets import EvalLoader, TrainLoader
from aec_tpu.train import checkpoints
from aec_tpu.train.loop import make_optimizer, make_stateful_train_step
from aec_tpu.utils.tools import count_frames, get_logger, num_params


@dataclasses.dataclass
class ModelAdapter:
    """Normalizes a model family to: init() -> (params, state|{}),
    loss(params, state, mic, far, near, echo, train) -> (loss, new_state),
    and enhance(params, state, mic, far) -> wav (eval mode, for metrics)."""

    init: Callable[[jax.Array], tuple[Any, Any]]
    loss: Callable[..., tuple[jax.Array, Any]]
    stateful: bool
    enhance: Callable[..., jax.Array] | None = None


def make_adapter(name: str, scfg: StftConfig = StftConfig()) -> ModelAdapter:
    if name in ("little_net", "two_layer_gru"):
        from aec_tpu.models.registry import get_model

        spec = get_model(name)
        erb = jnp.asarray(erb_filterbank(scfg.n_freqs, 16000, 32))

        def init(key):
            return spec.init(key), {}

        def loss(params, state, mic, far, near, echo, train):
            l, _ = spec.loss(params, mic, far, near, erb, scfg, sqrt_eps=1e-12)
            return l, state

        def enhance(params, state, mic, far):
            return spec.apply(params, mic, far, erb, scfg)["wav"]

        return ModelAdapter(init, loss, stateful=False, enhance=enhance)

    if name == "fullsubnet":
        from aec_tpu.models.fullsubnet import (
            FullSubNetConfig,
            fullsubnet_init,
            fullsubnet_loss,
        )

        cfg = FullSubNetConfig()

        def init(key):
            return fullsubnet_init(key, cfg), {}

        def loss(params, state, mic, far, near, echo, train):
            l, _ = fullsubnet_loss(params, mic, far, near, echo, cfg)
            return l, state

        def enhance(params, state, mic, far):
            from aec_tpu.models.fullsubnet import fullsubnet_apply

            return fullsubnet_apply(params, mic, far, cfg)["wav"]

        return ModelAdapter(init, loss, stateful=False, enhance=enhance)

    if name == "dccrn":
        from aec_tpu.models.dccrn import DccrnConfig, dccrn_init, dccrn_loss_v1

        cfg = DccrnConfig()

        def init(key):
            return dccrn_init(key, cfg)

        def loss(params, state, mic, far, near, echo, train):
            l, aux = dccrn_loss_v1(params, state, mic, far, near, echo, cfg, train=train)
            return l, aux["state"]

        def enhance(params, state, mic, far):
            from aec_tpu.models.dccrn import dccrn_apply

            return dccrn_apply(params, state, mic, far, cfg, train=False)[0]["wav"]

        return ModelAdapter(init, loss, stateful=True, enhance=enhance)

    if name == "att_ccrn":
        from aec_tpu.models.att_ccrn import AttCcrnConfig, att_ccrn_init, att_ccrn_loss

        cfg = AttCcrnConfig()

        def init(key):
            return att_ccrn_init(key, cfg)

        def loss(params, state, mic, far, near, echo, train):
            l, aux = att_ccrn_loss(params, state, mic, far, near, cfg, train=train)
            return l, aux["state"]

        def enhance(params, state, mic, far):
            from aec_tpu.models.att_ccrn import att_ccrn_apply

            return att_ccrn_apply(params, state, mic, far, cfg, train=False)[0]["wav"]

        return ModelAdapter(init, loss, stateful=True, enhance=enhance)

    raise KeyError(f"no training adapter for model {name!r}")


@dataclasses.dataclass
class GenericTrainer:
    """Model-agnostic epoch loop with the reference cadence."""

    model: str
    tr_list: list[str]
    cv_file: str
    ckpt_dir: str
    cfg: TrainConfig = TrainConfig()
    scfg: StftConfig = StftConfig()
    use_mesh: bool = False
    bucket_quantum: int = 4096
    resume_model: str = ""
    time_log: str = ""  # per-batch timing lines, like Trainer (train1.py:231-240)
    # optional cv metrics ("stoi", "sisdr") with best_<metric>.npz slots —
    # same contract as Trainer.validate_metrics, for every family
    validate_metrics: tuple[str, ...] = ()

    def __post_init__(self):
        unknown = set(self.validate_metrics) - {"stoi", "sisdr"}
        if unknown:
            raise ValueError(
                f"unknown validate_metrics {sorted(unknown)}; supported: stoi, sisdr"
            )

    def train(self) -> dict:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        logger = get_logger(os.path.join(self.ckpt_dir, "train.log"), log_file=True)
        adapter = make_adapter(self.model, self.scfg)

        mesh = make_mesh() if self.use_mesh else None
        multiproc = mesh is not None and jax.process_count() > 1
        tr_files, local_bs, pad_to = self.tr_list, self.cfg.batch_size, 0
        if multiproc:
            pc = jax.process_count()
            if self.cfg.batch_size % pc:
                raise ValueError(
                    f"global batch_size {self.cfg.batch_size} must divide "
                    f"evenly over {pc} processes"
                )
            local_bs = self.cfg.batch_size // pc
            tr_files = process_local_files(self.tr_list)
            from aec_tpu.pipeline.h5io import utterance_length

            longest = max(utterance_length(p) for p in self.tr_list)
            pad_to = -(-longest // self.bucket_quantum) * self.bucket_quantum
            steps_cap = (len(self.tr_list) // pc) // max(local_bs, 1)
        else:
            steps_cap = None

        loader = TrainLoader(
            tr_files, local_bs,
            bucket_quantum=self.bucket_quantum, pad_to=pad_to,
            seed=self.cfg.seed,
        )
        cv_loader = EvalLoader(self.cv_file, batch_size=1)

        params, model_state = adapter.init(jax.random.PRNGKey(self.cfg.seed))
        steps_per_epoch = max(len(self.tr_list) // self.cfg.batch_size, 1)
        optimizer = make_optimizer(self.cfg, steps_per_epoch)
        opt_state = optimizer.init(params)
        logger.info("model %s: %s params", self.model, f"{num_params(params):,d}")

        # one shared SPMD step builder for every family (stateless adapters
        # simply thread their empty state through)
        def step_loss(p, s, mic, far, near, echo):
            loss, new_state = adapter.loss(p, s, mic, far, near, echo, True)
            return loss, {"state": new_state}

        train_step = make_stateful_train_step(step_loss, optimizer, mesh)

        eval_step = jax.jit(
            lambda p, s, mic, far, near, echo: adapter.loss(
                p, s, mic, far, near, echo, False
            )[0]
        )
        enhance_step = (
            jax.jit(adapter.enhance)
            if self.validate_metrics and adapter.enhance is not None
            else None
        )

        ckpt_info = {"cur_epoch": 0, "cur_iter": 0, "best_loss": float("inf"),
                     "model": self.model}
        for m in self.validate_metrics:
            ckpt_info[f"cv_{m}"] = None
            ckpt_info[f"best_{m}"] = float("-inf")  # higher is better
        if self.resume_model:
            template = {"params": params, "opt_state": opt_state,
                        "model_state": model_state}
            restored = checkpoints.restore(self.resume_model, template)
            params, opt_state = restored["params"], restored["opt_state"]
            model_state = restored["model_state"]
            ckpt_info.update(checkpoints.load_info(self.resume_model))

        logging_period = self.cfg.logging_period or max(
            len(self.tr_list) // self.cfg.batch_size, 1
        )
        while ckpt_info["cur_epoch"] < self.cfg.max_n_epochs:
            accu_loss, accu_frames = 0.0, 0
            for n_iter, batch in enumerate(loader):
                if steps_cap is not None and n_iter >= steps_cap:
                    break
                t0 = time.perf_counter()
                keys = ("nearend_mic", "farend_speech", "nearend_speech", "echo")
                if mesh is not None:
                    arrays = globalize_batch(mesh, [batch[k] for k in keys])
                else:
                    arrays = [jnp.asarray(batch[k]) for k in keys]
                params, opt_state, model_state, loss = train_step(
                    params, opt_state, model_state, *arrays
                )
                loss_val = float(loss)
                batch_time = time.perf_counter() - t0
                n_frames = count_frames(batch["n_samples"], self.scfg.win_len, self.scfg.hop)
                accu_loss += loss_val * n_frames
                accu_frames += n_frames
                if self.time_log and is_primary():
                    with open(self.time_log, "a") as f:
                        print(
                            f"Epoch [{ckpt_info['cur_epoch'] + 1}/"
                            f"{self.cfg.max_n_epochs}], Iter [{n_iter}], "
                            f"tr_loss = {loss_val:.4f} / "
                            f"{accu_loss / accu_frames:.4f}, "
                            f"batch_time (s) = {batch_time:.4f}",
                            file=f,
                        )
                if (n_iter + 1) % logging_period == 0:
                    cv_loss, cv_frames = 0.0, 0
                    msum = {m: 0.0 for m in self.validate_metrics}
                    mcount = {m: 0 for m in self.validate_metrics}
                    for egs in cv_loader:
                        mic_b = jnp.asarray(egs["nearend_mic"])
                        far_b = jnp.asarray(egs["farend_speech"])
                        near_b = jnp.asarray(egs["nearend_speech"])
                        l = eval_step(
                            params, model_state, mic_b, far_b, near_b,
                            jnp.asarray(egs["echo"]),
                        )
                        f = count_frames(egs["n_samples"], self.scfg.win_len, self.scfg.hop)
                        cv_loss += float(l) * f
                        cv_frames += f
                        if enhance_step is not None:
                            import numpy as _np

                            from aec_tpu.train.metrics import si_snr
                            from aec_tpu.train.stoi import stoi

                            est = _np.asarray(
                                enhance_step(params, model_state, mic_b, far_b)
                            )
                            clean = egs["nearend_speech"]
                            nn = min(egs["n_samples"], est.shape[-1])
                            for b in range(clean.shape[0]):
                                e, c = est[b][:nn], clean[b][:nn]
                                if "sisdr" in msum:
                                    msum["sisdr"] += float(
                                        si_snr(jnp.asarray(e), jnp.asarray(c))
                                    )
                                    mcount["sisdr"] += 1
                                if "stoi" in msum:
                                    s_val = stoi(c, e)
                                    if _np.isfinite(s_val):
                                        msum["stoi"] += s_val
                                        mcount["stoi"] += 1
                    cv_loss /= max(cv_frames, 1)
                    ckpt_info.update(
                        cur_iter=n_iter, tr_loss=accu_loss / accu_frames, cv_loss=cv_loss
                    )
                    is_best = cv_loss < ckpt_info["best_loss"]
                    if is_best:
                        ckpt_info["best_loss"] = cv_loss
                    extra_best = {}
                    for m in self.validate_metrics:
                        val = msum[m] / max(mcount[m], 1)
                        ckpt_info[f"cv_{m}"] = val
                        improved = val > ckpt_info[f"best_{m}"]
                        if improved:
                            ckpt_info[f"best_{m}"] = val
                        extra_best[f"best_{m}"] = improved
                    if is_primary():
                        checkpoints.save_latest_best(
                            os.path.join(self.ckpt_dir, "models"),
                            {"params": params, "opt_state": opt_state,
                             "model_state": model_state},
                            ckpt_info, is_best,
                            extra_best=extra_best,
                        )
                        # structured metrics (SURVEY §5.5), Trainer schema
                        audio_s = batch["nearend_mic"].shape[0] * (
                            batch["nearend_mic"].shape[1] / 16000.0
                        )
                        with open(
                            os.path.join(self.ckpt_dir, "metrics.jsonl"), "a"
                        ) as f:
                            f.write(json.dumps({
                                "epoch": ckpt_info["cur_epoch"] + 1,
                                "iter": n_iter,
                                "model": self.model,
                                "tr_loss": ckpt_info["tr_loss"],
                                "cv_loss": cv_loss,
                                "batch_time_s": round(batch_time, 5),
                                "train_xrt": round(audio_s / batch_time, 1),
                            }) + "\n")
                    logger.info(
                        "epoch %d iter %d tr_loss %.4f cv_loss %.4f",
                        ckpt_info["cur_epoch"] + 1, n_iter,
                        ckpt_info["tr_loss"], cv_loss,
                    )
                    accu_loss, accu_frames = 0.0, 0
            ckpt_info["cur_epoch"] += 1
        return {"params": params, "model_state": model_state, "ckpt_info": ckpt_info}
