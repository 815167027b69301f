"""Training loop: pjit train step, Adam + stepped decay, reference cadence.

Replaces the reference Trainer (train1.py:77-346) with a functional, SPMD
design:

- ONE jitted ``train_step`` (value_and_grad + optax update) with explicit
  shardings: batch split over the mesh's ``data`` axis, params/opt-state
  replicated; XLA inserts the ``psum`` for gradients (vs DataParallel's
  scatter/gather, SURVEY §2.5);
- Adam(lr=1e-5) + StepLR(period=5 epochs, gamma=0.5) exactly as train_conf
  (configs.py:10-19), via an optax step-count schedule;
- frame-weighted loss accounting with the reference's ``countFrames``
  formula (tools.py:30-32), validation once per logging period
  (= once/epoch, train1.py:105), checkpoint latest/best-on-cv-loss
  (train1.py:252-278);
- deliberate divergence: gradients ARE reset every step (optax semantics).
  The reference never calls ``optimizer.zero_grad()`` (train1.py:204-218),
  a training bug we do not reproduce (SURVEY §2.4.4).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from aec_tpu.configs import TrainConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.models.little_net import little_net_init, little_net_loss
from aec_tpu.parallel.mesh import (
    data_sharding,
    globalize_batch,
    is_primary,
    make_mesh,
    process_local_files,
    replicated,
)
from aec_tpu.pipeline.datasets import EvalLoader, TrainLoader
from aec_tpu.train import checkpoints
from aec_tpu.utils.tools import count_frames, get_logger, loss_log, num_params

LossFn = Callable[..., tuple[jax.Array, dict]]


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """torch StepLR semantics: lr0 * gamma^(epoch // period) (train1.py:156)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return cfg.lr * (cfg.lr_decay_factor ** (epoch // cfg.lr_decay_period))

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    tx = [optax.clip_by_global_norm(cfg.clip_norm)] if cfg.clip_norm >= 0 else []
    tx.append(optax.adam(make_lr_schedule(cfg, steps_per_epoch)))
    return optax.chain(*tx)


def make_train_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    mesh=None,
    *,
    scfg: StftConfig = StftConfig(),
    sqrt_eps: float = 1e-12,
):
    """Build the jitted SPMD train step.

    ``loss_fn(params, mic, ref, near, erb, cfg, sqrt_eps=...)`` must return
    (scalar loss, aux). With a mesh, batch args are data-sharded and
    params/opt replicated (GSPMD turns the global-batch loss sum into the
    gradient all-reduce).
    """

    def step(params, opt_state, mic, ref, near, erb):
        def lf(p):
            loss, _ = loss_fn(p, mic, ref, near, erb, scfg, sqrt_eps=sqrt_eps)
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step, static_argnames=(), donate_argnums=(0, 1))
    dsh, rep = data_sharding(mesh), replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, dsh, dsh, dsh, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def make_stateful_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh=None,
):
    """SPMD train step for models carrying non-trainable state (BatchNorm
    running stats): DCCRN / ATT-CCRN / FullSubNet-with-echo families.

    ``loss_fn(params, model_state, *batch_arrays)`` must return
    (loss, aux_dict with key "state" holding the updated model state).
    Batch arrays are data-sharded over the mesh; params/opt/model state
    replicated (BatchNorm stats are computed over the GLOBAL batch thanks to
    GSPMD's global-semantics reductions).
    """

    def step(params, opt_state, model_state, *batch):
        def lf(p):
            loss, aux = loss_fn(p, model_state, *batch)
            return loss, aux["state"]

        (loss, new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_state, loss

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2))
    dsh, rep = data_sharding(mesh), replicated(mesh)

    # The sharding spec depends on the number of batch arrays, which only
    # becomes known at the first call; jit once per arity and reuse (a fresh
    # jax.jit per call would re-trace every step).
    jit_by_arity: dict[int, Callable] = {}

    def jitted(params, opt_state, model_state, *batch):
        fn = jit_by_arity.get(len(batch))
        if fn is None:
            fn = jax.jit(
                step,
                in_shardings=(rep, rep, rep) + (dsh,) * len(batch),
                out_shardings=(rep, rep, rep, rep),
                donate_argnums=(0, 1, 2),
            )
            jit_by_arity[len(batch)] = fn
        return fn(params, opt_state, model_state, *batch)

    return jitted


def make_eval_step(loss_fn: LossFn, *, scfg: StftConfig = StftConfig()):
    """Jitted (loss, enhanced_wav) eval step; the wav feeds the optional
    stoi/sisdr validation metrics."""

    def step(params, mic, ref, near, erb):
        loss, aux = loss_fn(params, mic, ref, near, erb, scfg)
        return loss, aux["wav"]

    return jax.jit(step)


@dataclasses.dataclass
class Trainer:
    """Epoch-loop orchestrator with the reference's cadence and logging."""

    tr_list: list[str]
    cv_file: str
    ckpt_dir: str
    cfg: TrainConfig = TrainConfig()
    scfg: StftConfig = StftConfig()
    erb_bands: int = 32
    resume_model: str = ""
    time_log: str = ""
    loss_log_name: str = "loss.txt"
    use_mesh: bool = False
    bucket_quantum: int = 4096
    loss_fn: LossFn = little_net_loss
    init_fn: Callable[[jax.Array], Any] = little_net_init
    # optional cv metrics ("stoi", "sisdr"): the WORKING realization of the
    # reference's dead validate_conf/ckpt_conf intent (configs.py:49-57 —
    # declared there, never computed, train1.py:341-346). Each metric gets a
    # best_<metric>.npz slot; higher is better.
    validate_metrics: tuple[str, ...] = ()

    def __post_init__(self):
        # once-per-epoch validation/checkpoint cadence (train1.py:105)
        self.logging_period = self.cfg.logging_period or max(
            len(self.tr_list) // self.cfg.batch_size, 1
        )
        unknown = set(self.validate_metrics) - {"stoi", "sisdr"}
        if unknown:
            raise ValueError(
                f"unknown validate_metrics {sorted(unknown)}; "
                "supported: stoi, sisdr — the reference's validate_conf set "
                "(configs.py:49-52). PESQ scoring lives in cli/measure.py "
                "(external impl preferred, from-spec fallback opt-in)."
            )

    def train(self) -> dict:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        logger = get_logger(os.path.join(self.ckpt_dir, "train.log"), log_file=True)

        mesh = make_mesh() if self.use_mesh else None
        # multi-host: each process loads a disjoint shard of the file list at
        # the per-process batch size; fixed-length padding makes local shards
        # assemblable into one global batch (mesh.globalize_batch)
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
            # every process must enter the SAME number of collective steps;
            # cap at the smallest shard's batch count
            steps_cap = (len(self.tr_list) // pc) // max(local_bs, 1)
        else:
            steps_cap = None

        loader = TrainLoader(
            tr_files,
            local_bs,
            bucket_quantum=self.bucket_quantum,
            pad_to=pad_to,
            seed=self.cfg.seed,
        )
        cv_loader = EvalLoader(self.cv_file, batch_size=1)

        params = self.init_fn(jax.random.PRNGKey(self.cfg.seed))
        erb = jnp.asarray(
            erb_filterbank(self.scfg.n_freqs, 16000, self.erb_bands)
        )
        steps_per_epoch = max(len(self.tr_list) // self.cfg.batch_size, 1)
        optimizer = make_optimizer(self.cfg, steps_per_epoch)
        opt_state = optimizer.init(params)

        train_step = make_train_step(self.loss_fn, optimizer, mesh, scfg=self.scfg)
        eval_step = make_eval_step(self.loss_fn, scfg=self.scfg)

        logger.info(
            "Trainable parameter count: {:,d} -> {:.2f} MB".format(
                num_params(params), num_params(params) * 4 / 2**20
            )
        )

        ckpt_info = {
            "cur_epoch": 0,
            "cur_iter": 0,
            "tr_loss": None,
            "cv_loss": None,
            "best_loss": float("inf"),
        }
        for m in self.validate_metrics:
            # higher-is-better metrics start at -inf (the reference's dead
            # ckpt_conf seeds them at +inf, configs.py:54-57 — a bug that
            # would never update; fixed here)
            ckpt_info[f"cv_{m}"] = None
            ckpt_info[f"best_{m}"] = float("-inf")
        if self.resume_model:
            template = {"params": params, "opt_state": opt_state}
            restored = checkpoints.restore(self.resume_model, template)
            params, opt_state = restored["params"], restored["opt_state"]
            ckpt_info.update(checkpoints.load_info(self.resume_model))
            logger.info(f"Resumed from {self.resume_model}: {ckpt_info}")

        while ckpt_info["cur_epoch"] < self.cfg.max_n_epochs:
            accu_loss, accu_frames = 0.0, 0
            for n_iter, batch in enumerate(loader):
                if steps_cap is not None and n_iter >= steps_cap:
                    break
                t0 = time.perf_counter()
                keys = ("nearend_mic", "farend_speech", "nearend_speech")
                if mesh is not None:
                    mic, ref, near = globalize_batch(
                        mesh, [batch[k] for k in keys]
                    )
                else:
                    mic, ref, near = (jnp.asarray(batch[k]) for k in keys)
                params, opt_state, loss = train_step(
                    params, opt_state, mic, ref, near, erb
                )
                loss_val = float(loss)
                batch_time = time.perf_counter() - t0
                n_frames = count_frames(
                    batch["n_samples"], self.scfg.win_len, self.scfg.hop
                )
                accu_loss += loss_val * n_frames
                accu_frames += n_frames

                msg = (
                    f"Epoch [{ckpt_info['cur_epoch'] + 1}/{self.cfg.max_n_epochs}], "
                    f"Iter [{n_iter}], tr_loss = {loss_val:.4f} / "
                    f"{accu_loss / accu_frames:.4f}, batch_time (s) = {batch_time:.4f}"
                )
                if self.time_log and is_primary():
                    with open(self.time_log, "a") as f:
                        print(msg, file=f)

                if (n_iter + 1) % self.logging_period == 0:
                    metrics = self.validate(eval_step, params, erb, cv_loader)
                    ckpt_info["cur_iter"] = n_iter
                    ckpt_info["tr_loss"] = accu_loss / accu_frames
                    ckpt_info["cv_loss"] = metrics["loss"]
                    is_best = metrics["loss"] < ckpt_info["best_loss"]
                    if is_best:
                        ckpt_info["best_loss"] = metrics["loss"]
                    extra_best = {}
                    for m in self.validate_metrics:
                        ckpt_info[f"cv_{m}"] = metrics[m]
                        improved = metrics[m] > ckpt_info[f"best_{m}"]
                        if improved:
                            ckpt_info[f"best_{m}"] = metrics[m]
                        extra_best[f"best_{m}"] = improved
                    if is_primary():
                        checkpoints.save_latest_best(
                            os.path.join(self.ckpt_dir, "models"),
                            {"params": params, "opt_state": opt_state},
                            ckpt_info,
                            is_best,
                            extra_best=extra_best,
                        )
                        loss_log(
                            os.path.join(self.ckpt_dir, self.loss_log_name),
                            ckpt_info,
                            metrics,
                        )
                        # structured per-period metrics (SURVEY §5.5): jsonl
                        # with loss + throughput (xRT = audio s / wall s)
                        import json as _json

                        audio_s = batch["nearend_mic"].shape[0] * (
                            batch["nearend_mic"].shape[1] / 16000.0
                        )
                        with open(
                            os.path.join(self.ckpt_dir, "metrics.jsonl"), "a"
                        ) as f:
                            f.write(
                                _json.dumps(
                                    {
                                        "epoch": ckpt_info["cur_epoch"] + 1,
                                        "iter": n_iter,
                                        "tr_loss": ckpt_info["tr_loss"],
                                        "cv_loss": metrics["loss"],
                                        "batch_time_s": round(batch_time, 5),
                                        "train_xrt": round(audio_s / batch_time, 1),
                                    }
                                )
                                + "\n"
                            )
                    logger.info(
                        "Epoch [{:d}/{:d}], ( tr_loss: {:.4f} | best_loss: {:.4f} )".format(
                            ckpt_info["cur_epoch"] + 1,
                            self.cfg.max_n_epochs,
                            ckpt_info["tr_loss"],
                            ckpt_info["best_loss"],
                        )
                    )
                    accu_loss, accu_frames = 0.0, 0
            ckpt_info["cur_epoch"] += 1
        return {"params": params, "opt_state": opt_state, "ckpt_info": ckpt_info}

    def validate(self, eval_step, params, erb, cv_loader) -> dict:
        """Frame-weighted mean cv loss (train1.py:300-346) plus the optional
        waveform metrics (mean over utterances; stoi may be nan on clips too
        short for a 384 ms segment — skipped)."""
        accu_loss, accu_frames = 0.0, 0
        metric_sums = {m: 0.0 for m in self.validate_metrics}
        metric_counts = {m: 0 for m in self.validate_metrics}
        for batch in cv_loader:
            loss, wav = eval_step(
                params,
                jnp.asarray(batch["nearend_mic"]),
                jnp.asarray(batch["farend_speech"]),
                jnp.asarray(batch["nearend_speech"]),
                erb,
            )
            n_frames = count_frames(
                batch["n_samples"], self.scfg.win_len, self.scfg.hop
            )
            accu_loss += float(loss) * n_frames
            accu_frames += n_frames
            if self.validate_metrics:
                import numpy as _np

                from aec_tpu.train.metrics import si_snr
                from aec_tpu.train.stoi import stoi

                est = _np.asarray(wav)
                clean = batch["nearend_speech"]
                n = batch["n_samples"]
                for b in range(clean.shape[0]):
                    e, c = est[b][:n], clean[b][:n]
                    if "sisdr" in metric_sums:
                        metric_sums["sisdr"] += float(
                            si_snr(jnp.asarray(e), jnp.asarray(c))
                        )
                        metric_counts["sisdr"] += 1
                    if "stoi" in metric_sums:
                        s = stoi(c, e)
                        if _np.isfinite(s):
                            metric_sums["stoi"] += s
                            metric_counts["stoi"] += 1
        out = {"loss": accu_loss / max(accu_frames, 1)}
        for m in self.validate_metrics:
            out[m] = metric_sums[m] / max(metric_counts[m], 1)
        return out
