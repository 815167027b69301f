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
    # "" (host loader, reference loop shape) or "int16"/"bfloat16"/"float32":
    # cache the ENTIRE corpus in device memory and scan a whole epoch of
    # steps in one dispatch (pipeline/device_cache.py — at reference scale
    # the host loop is tunnel-upload-bound at ~2 s/step on this image vs
    # ~3 ms of device time). Identical update math, cadence, and shuffle
    # stream; single-host only; validate_metrics unsupported (wav readback
    # would reintroduce the transfer bound).
    device_cache: str = ""

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

        if self.device_cache:
            if self.use_mesh:
                raise ValueError("device_cache is single-host/single-chip")
            if self.validate_metrics:
                raise ValueError(
                    "validate_metrics need per-utterance wav readback — "
                    "use the host loader (device_cache='')"
                )
            return self._train_cached(logger)

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

    def _train_cached(self, logger) -> dict:
        """Device-resident-corpus training: one dispatch per EPOCH.

        Same update math, optimizer schedule, shuffle stream
        (np.default_rng(seed), one shuffle per epoch — TrainLoader's
        stream), per-epoch validation and latest/best checkpointing as
        the host-loader loop; the difference is purely mechanical: the
        corpus lives in HBM (pipeline/device_cache.py) and the epoch's
        steps run inside one ``lax.scan`` so neither the ~15 MB/s tunnel
        upload nor the ~25 ms per-dispatch round trip is on the step
        path. cv loss is scanned at batch 1 on the cached cv set —
        numerically the host validate() (uniform-length corpus)."""
        import json as _json
        from functools import partial

        import numpy as np

        from aec_tpu.pipeline import device_cache as dc

        cfg = self.cfg
        t_load0 = time.perf_counter()
        logger.info(
            "device_cache=%s: caching %d train files + cv on device",
            self.device_cache, len(self.tr_list),
        )
        corpus = dc.from_files(
            self.tr_list,
            dtype=self.device_cache,
            bucket_quantum=self.bucket_quantum,
            progress=lambda i, n: logger.info("  cached %d/%d", i, n),
        )
        cv = dc.from_grouped(
            self.cv_file,
            dtype=self.device_cache,
            bucket_quantum=self.bucket_quantum,
        )
        t_load = time.perf_counter() - t_load0
        logger.info(
            "corpus resident: %d x %d (%s) in %.1f s",
            corpus.n_utts, corpus.arrays[dc.CACHE_KEYS[0]].shape[1],
            self.device_cache, t_load,
        )

        params = self.init_fn(jax.random.PRNGKey(cfg.seed))
        erb = jnp.asarray(
            erb_filterbank(self.scfg.n_freqs, 16000, self.erb_bands)
        )
        steps_per_epoch = max(corpus.n_utts // cfg.batch_size, 1)
        optimizer = make_optimizer(cfg, steps_per_epoch)
        opt_state = optimizer.init(params)
        logger.info(
            "Trainable parameter count: {:,d} -> {:.2f} MB".format(
                num_params(params), num_params(params) * 4 / 2**20
            )
        )

        dtype = self.device_cache
        scales = [corpus.scales[k] for k in dc.CACHE_KEYS]
        cv_scales = [cv.scales[k] for k in dc.CACHE_KEYS]
        loss_fn, scfg = self.loss_fn, self.scfg

        # resident arrays are threaded as ARGUMENTS (closures would bake
        # gigabytes into the program as constants — the axon HTTP 413 trap)
        @partial(jax.jit, donate_argnums=(0, 1))
        def epoch_fn(params, opt_state, mic_c, ref_c, near_c, idx, erb):
            def body(carry, ib):
                p, o = carry
                mic, ref, near = (
                    dc.dequant(jnp.take(a, ib, axis=0), dtype, s)
                    for a, s in zip((mic_c, ref_c, near_c), scales)
                )

                def lf(pp):
                    loss, _ = loss_fn(
                        pp, mic, ref, near, erb, scfg, sqrt_eps=1e-12
                    )
                    return loss

                loss, grads = jax.value_and_grad(lf)(p)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), idx
            )
            return params, opt_state, losses

        @jax.jit
        def cv_fn(params, mic_c, ref_c, near_c, idx, erb):
            def body(_, ib):
                mic, ref, near = (
                    dc.dequant(jnp.take(a, ib, axis=0), dtype, s)
                    for a, s in zip((mic_c, ref_c, near_c), cv_scales)
                )
                loss, _ = loss_fn(params, mic, ref, near, erb, scfg)
                return None, loss

            return jax.lax.scan(body, None, idx)[1]

        ckpt_info = {
            "cur_epoch": 0,
            "cur_iter": 0,
            "tr_loss": None,
            "cv_loss": None,
            "best_loss": float("inf"),
        }
        if self.resume_model:
            template = {"params": params, "opt_state": opt_state}
            restored = checkpoints.restore(self.resume_model, template)
            params, opt_state = restored["params"], restored["opt_state"]
            ckpt_info.update(checkpoints.load_info(self.resume_model))
            logger.info(f"Resumed from {self.resume_model}: {ckpt_info}")

        rng = np.random.default_rng(cfg.seed)
        cv_idx = jnp.arange(cv.n_utts, dtype=jnp.int32)[:, None]  # batch 1
        tr_args = [corpus.arrays[k] for k in dc.CACHE_KEYS]
        cv_args = [cv.arrays[k] for k in dc.CACHE_KEYS]
        n_frames = count_frames(
            corpus.n_samples, self.scfg.win_len, self.scfg.hop
        )
        audio_s = cfg.batch_size * corpus.n_samples / 16000.0

        while ckpt_info["cur_epoch"] < cfg.max_n_epochs:
            order = np.arange(corpus.n_utts)
            rng.shuffle(order)
            idx = jnp.asarray(
                order[: steps_per_epoch * cfg.batch_size]
                .reshape(steps_per_epoch, cfg.batch_size)
                .astype(np.int32)
            )
            t0 = time.perf_counter()
            params, opt_state, losses = epoch_fn(
                params, opt_state, *tr_args, idx, erb
            )
            losses = np.asarray(losses)  # one readback per epoch
            epoch_time = time.perf_counter() - t0
            batch_time = epoch_time / steps_per_epoch

            if self.time_log and is_primary():
                with open(self.time_log, "a") as f:
                    for n_iter, loss_val in enumerate(losses):
                        print(
                            f"Epoch [{ckpt_info['cur_epoch'] + 1}/"
                            f"{cfg.max_n_epochs}], Iter [{n_iter}], "
                            f"tr_loss = {loss_val:.4f} / "
                            f"{losses[: n_iter + 1].mean():.4f}, "
                            f"batch_time (s) = {batch_time:.4f}",
                            file=f,
                        )

            cv_losses = np.asarray(cv_fn(params, *cv_args, cv_idx, erb))
            metrics = {"loss": float(cv_losses.mean())}
            ckpt_info["cur_iter"] = steps_per_epoch - 1
            # uniform-length corpus: frame weights are equal, the
            # frame-weighted mean reduces to the plain mean
            ckpt_info["tr_loss"] = float(losses.mean())
            ckpt_info["cv_loss"] = metrics["loss"]
            is_best = metrics["loss"] < ckpt_info["best_loss"]
            if is_best:
                ckpt_info["best_loss"] = metrics["loss"]
            if is_primary():
                checkpoints.save_latest_best(
                    os.path.join(self.ckpt_dir, "models"),
                    {"params": params, "opt_state": opt_state},
                    ckpt_info,
                    is_best,
                )
                loss_log(
                    os.path.join(self.ckpt_dir, self.loss_log_name),
                    ckpt_info,
                    metrics,
                )
                with open(
                    os.path.join(self.ckpt_dir, "metrics.jsonl"), "a"
                ) as f:
                    f.write(
                        _json.dumps(
                            {
                                "epoch": ckpt_info["cur_epoch"] + 1,
                                "iter": ckpt_info["cur_iter"],
                                "tr_loss": ckpt_info["tr_loss"],
                                "cv_loss": metrics["loss"],
                                "batch_time_s": round(batch_time, 5),
                                "epoch_time_s": round(epoch_time, 3),
                                "train_xrt": round(audio_s / batch_time, 1),
                                "n_frames_per_batch": n_frames,
                            }
                        )
                        + "\n"
                    )
            logger.info(
                "Epoch [{:d}/{:d}] {:.2f}s, ( tr_loss: {:.4f} | cv_loss: "
                "{:.4f} | best_loss: {:.4f} )".format(
                    ckpt_info["cur_epoch"] + 1,
                    cfg.max_n_epochs,
                    epoch_time,
                    ckpt_info["tr_loss"],
                    metrics["loss"],
                    ckpt_info["best_loss"],
                )
            )
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
