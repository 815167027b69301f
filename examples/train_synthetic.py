"""Train the stage-2 LittleNet post-filter on synthetic echo scenes.

Produces the ROBUST pretrained checkpoint shipped at
``checkpoints/little_net_robust.npz`` (the speech-noise-only specialist
``little_net_synthetic.npz`` was trained by the round-2 version of this
script; tests/test_pretrained.py pins the measured trade-off between them):

  python examples/train_synthetic.py [--steps 3000] [--batch 64]

Scenes are AEC-Challenge-style: far-end speech-shaped noise OR harmonic
speech-like excitation (drifting pitch, syllabic envelope) through a random
decaying RIR with random bulk delay (0-40 ms) and, on a fraction of scenes,
memoryless loudspeaker saturation (tanh soft clip) — the round-3 quality
battery's regimes (benchmarks/scenes.py) — plus near-end speech-shaped
noise at random SNR. The net trains on the REAL two-stage configuration:
its mic input is the stage-1 Kalman canceller's output (residual echo +
near end), its reference is the far-end — exactly the deployment contract
(BASELINE.json north star). Training runs entirely on device; scene
synthesis is fully vectorized (FFT-domain convolution), so each step is
one jit call.
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
import optax


def make_scene_fn(n: int, rir_len: int = 1600, sr: int = 16000):
    """Returns a jittable key -> (far, mic, near) batch synthesizer."""

    def speech_shaped(key, b):
        white = jax.random.normal(key, (b, n))
        spec = jnp.fft.rfft(white)
        f = jnp.fft.rfftfreq(n, 1.0 / sr)
        tilt = 1.0 / jnp.maximum(f / 500.0, 1.0)
        shaped = jnp.fft.irfft(spec * tilt, n=n)
        k_env, _ = jax.random.split(key)
        rate = jax.random.uniform(k_env, (b, 1), minval=2.0, maxval=6.0)
        phase = jax.random.uniform(k_env, (b, 1), maxval=2 * jnp.pi)
        env = 0.5 + 0.5 * jnp.clip(
            jnp.sin(2 * jnp.pi * rate * jnp.arange(n) / sr + phase), 0.0, None
        )
        out = shaped * env
        return out / (jnp.max(jnp.abs(out), axis=-1, keepdims=True) + 1e-9)

    def harmonic_speech(key, b):
        """Speech-like far-end: drifting-pitch harmonic stack * syllabic
        envelope with pauses (benchmarks/scenes.py::speech_like, jittable)."""
        k_f0, k_ph, k_env, k_noise = jax.random.split(key, 4)
        t = jnp.arange(n) / sr
        f0 = jax.random.uniform(k_f0, (b, 1), minval=90.0, maxval=230.0)
        drift = 1.0 + 0.08 * jnp.sin(
            2 * jnp.pi * 0.7 * t[None, :]
            + jax.random.uniform(k_f0, (b, 1), maxval=6.28)
        )
        ph = 2 * jnp.pi * jnp.cumsum(f0 * drift, axis=-1) / sr
        sig = jnp.zeros((b, n))
        phases = jax.random.uniform(k_ph, (b, 6), maxval=6.28)
        for k_h, a in enumerate((1.0, 0.6, 0.45, 0.3, 0.2, 0.12)):
            sig = sig + a * jnp.sin((k_h + 1) * ph + phases[:, k_h : k_h + 1])
        rate = jax.random.uniform(k_env, (b, 1), minval=2.5, maxval=4.5)
        env = jnp.clip(
            jnp.sin(2 * jnp.pi * rate * t[None, :]
                    + jax.random.uniform(k_env, (b, 1), maxval=6.28)) + 0.25,
            0.0, None,
        ) ** 1.5
        sig = sig * env + 0.02 * jax.random.normal(k_noise, (b, n))
        return sig / (jnp.max(jnp.abs(sig), axis=-1, keepdims=True) + 1e-9)

    max_delay = 640  # up to 40 ms of bulk delay in the echo path

    def scenes(key, b):
        (k_far, k_near, k_rir, k_gain, k_snr, k_act, k_tilt,
         k_kind, k_nl, k_delay, k_nkind) = jax.random.split(key, 11)
        # ~half the scenes use harmonic speech-like far-ends (the regime
        # that exposed the classic-NLMS divergence; scenes.py)
        pick = (jax.random.uniform(k_kind, (b, 1)) < 0.5).astype(jnp.float32)
        far = pick * harmonic_speech(k_far, b) + (1.0 - pick) * speech_shaped(
            k_far, b
        )
        # near-end: half harmonic speech-like (round-4 — the battery's
        # speech_dtalk near IS harmonic, scenes.py speech_like f0=205;
        # training only on shaped noise left that regime out-of-dist),
        # half shaped noise with distinct random spectral emphasis
        near_sn = speech_shaped(k_near, b)
        f = jnp.fft.rfftfreq(n, 1.0 / sr)
        center = jax.random.uniform(k_tilt, (b, 1), minval=300.0, maxval=3000.0)
        emphasis = jnp.exp(-((jnp.log(f[None, :] + 30.0) - jnp.log(center)) ** 2))
        near_sn = jnp.fft.irfft(jnp.fft.rfft(near_sn) * emphasis, n=n)
        pick_n = (jax.random.uniform(k_nkind, (b, 1)) < 0.5).astype(jnp.float32)
        near = pick_n * harmonic_speech(k_near, b) + (1.0 - pick_n) * near_sn
        near = near / (jnp.max(jnp.abs(near), axis=-1, keepdims=True) + 1e-9)
        # ~30% of scenes have a silent near end (teaches full suppression)
        active = (jax.random.uniform(k_act, (b, 1)) < 0.7).astype(jnp.float32)

        decay = jax.random.uniform(k_rir, (b, 1), minval=100.0, maxval=500.0)
        # random bulk delay folded into the RIR support (no gathers: the
        # decay formula is evaluated at idx - delay and masked causal)
        L = rir_len + max_delay
        delay = jax.random.randint(k_delay, (b, 1), 0, max_delay).astype(
            jnp.float32
        )
        idx = jnp.arange(L)[None, :].astype(jnp.float32)
        rir = (
            jax.random.normal(k_rir, (b, L))
            * jnp.exp(-jnp.maximum(idx - delay, 0.0) / decay)
            * (idx >= delay)
        )
        rir = rir / (jnp.max(jnp.abs(rir), axis=-1, keepdims=True) + 1e-9)
        gain = jax.random.uniform(k_gain, (b, 1), minval=0.3, maxval=1.0)
        # ~30% of scenes: memoryless loudspeaker saturation before the room
        nl = (jax.random.uniform(k_nl, (b, 1)) < 0.3).astype(jnp.float32)
        far_ls = nl * (jnp.tanh(2.5 * far) / 2.5) + (1.0 - nl) * far
        m = n + L  # linear convolution via zero-padded FFT
        echo = jnp.fft.irfft(
            jnp.fft.rfft(far_ls, n=m) * jnp.fft.rfft(gain * rir, n=m), n=m
        )[:, :n]
        near_gain = active * jax.random.uniform(k_snr, (b, 1), minval=0.2, maxval=0.8)
        near = near_gain * near
        mic = echo + near
        # joint level normalization (stable net input scale; preserves the
        # mic/near relationship the loss needs)
        scale = 1.0 / (jnp.max(jnp.abs(mic), axis=-1, keepdims=True) + 1e-9)
        return far, mic * scale, near * scale

    return scenes


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--out", type=str, default="checkpoints/little_net_robust.npz")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--balance", action="store_true",
        help="per-scene self-normalized loss: each scene's gradient is "
        "scaled by 1/stop_grad(its own loss), so easy scenes (tiny stage-1 "
        "residual) are not drowned out by hard (nonlinear/harmonic) ones. "
        "MEASURED (v5e, 3000 steps): suppression jumps dramatically "
        "(speech_far 71->113 dB, nonlinear 69->111, battery dtalk ERLE "
        "132 dB) but the model over-suppresses the NEAR end in double talk "
        "(battery speech-dtalk STOI 0.614 vs 0.669 unbalanced; sine-near "
        "scene reduced to +2.6 dB ERLE) -- the shipped robust checkpoint "
        "therefore trains WITHOUT this flag; use it for suppression-max "
        "applications where near-end fidelity is secondary",
    )
    p.add_argument(
        "--asym", type=float, default=0.0,
        help="weight of the reference's asymmetric speech-preservation "
        "loss term (ERB.py:184-198, commented out there): penalizes only "
        "near-end energy the mask removed — counterweights double-talk "
        "over-suppression (little_net_loss asym_weight)",
    )
    p.add_argument(
        "--width", type=int, default=1,
        help="GRU width multiplier (little_net_init width=): 1 is the "
        "reference's 12,544-param geometry; 2/4 (33k/99k params) are the "
        "round-5 preservation-vs-suppression capacity experiment. Wider "
        "checkpoints run the XLA apply (fused kernels are width-1)",
    )
    p.add_argument(
        "--sisnr", type=float, default=0.0,
        help="weight of the waveform-domain SI-SNR speech-preservation "
        "term (little_net_loss sisnr_weight): optimizes the deployed "
        "double-talk metric directly through the synthesis path; implies "
        "gain_norm synthesis in the loss (the deployment contract for "
        "preservation checkpoints)",
    )
    args = p.parse_args()

    from aec_tpu.configs import KalmanConfig, TrainConfig
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.dsp.stft import StftConfig
    from aec_tpu.linear.kalman import kalman_cancel
    from aec_tpu.models.little_net import little_net_init, little_net_loss
    from aec_tpu.train import checkpoints
    from aec_tpu.train.metrics import erle

    n = int(args.seconds * 16000) // 256 * 256
    scfg, kcfg = StftConfig(), KalmanConfig()
    scenes = make_scene_fn(n)
    params = little_net_init(jax.random.PRNGKey(args.seed), width=args.width)
    erb = jnp.asarray(erb_filterbank())
    opt = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adam(optax.cosine_decay_schedule(args.lr, args.steps, 0.05)),
    )
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        far, mic, near = scenes(key, args.batch)
        lin = kalman_cancel(kcfg, far, mic, block=scfg.hop)["wav"]

        def lf(p):
            if args.balance:
                # per-scene losses, each self-normalized so hard scenes
                # don't drown out the easy-scene gradients. normalize=False:
                # (a) matches the deployment contract (two_stage_cancel
                # defaults to the causal un-normalized path), (b) the
                # per-scene pseudo-norm NaNs on the 30% silent-near scenes
                # (mean/std with std=0 — measured)
                def per_scene(l1, f1, n1):
                    li, _ = little_net_loss(
                        p, l1[None], f1[None], n1[None], erb, scfg,
                        normalize=False, sqrt_eps=1e-12,
                        asym_weight=args.asym,
                    )
                    return li

                li = jax.vmap(per_scene)(lin, far, near)
                return jnp.mean(li / (jax.lax.stop_gradient(li) + 1e-2))
            loss, _ = little_net_loss(
                p, lin, far, near, erb, scfg, sqrt_eps=1e-12,
                asym_weight=args.asym,
                sisnr_weight=args.sisnr,
                gain_norm=args.sisnr > 0,
            )
            return loss

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    from aec_tpu.models.little_net import little_net_apply
    from aec_tpu.train.metrics import si_snr

    def _sisnr_active(est, near, half):
        """Mean per-scene SI-SNR over scenes whose near end is active."""
        per = jax.vmap(lambda e, t: si_snr(e[None, half:], t[None, half:]))(est, near)
        act = (jnp.mean(near * near, axis=-1) > 1e-8).astype(jnp.float32)
        return jnp.sum(per * act) / jnp.maximum(jnp.sum(act), 1.0)

    @jax.jit
    def eval_metrics(params, key):
        far, mic, near = scenes(key, 16)
        half = n // 2
        # double-talk scenes: SI-SNR of the enhanced output vs near-end
        lin = kalman_cancel(kcfg, far, mic, block=scfg.hop)["wav"]
        enh = little_net_apply(params, lin, far, erb, scfg)["wav"]
        sisnr_lin = _sisnr_active(lin, near, half)
        sisnr_enh = _sisnr_active(enh, near, half)
        # echo-only scene: ERLE of stage-1 alone vs the full two-stage
        mic_e = mic - near
        lin_e = kalman_cancel(kcfg, far, mic_e, block=scfg.hop)["wav"]
        enh_e = little_net_apply(params, lin_e, far, erb, scfg)["wav"]
        return (
            erle(mic_e[:, half:], lin_e[:, half:]),
            erle(mic_e[:, half:], enh_e[:, half:]),
            sisnr_lin,
            sisnr_enh,
        )

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if step % 200 == 0 or step == args.steps - 1:
            e1, e2, s1, s2 = eval_metrics(params, jax.random.PRNGKey(123))
            print(
                f"step {step}: loss={float(loss):.4f} | echo-only ERLE "
                f"stage1={float(e1):.2f} two-stage={float(e2):.2f} dB | "
                f"double-talk SI-SNR lin={float(s1):.2f} enh={float(s2):.2f} dB "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    e1, e2, s1, s2 = eval_metrics(params, jax.random.PRNGKey(123))
    info = {
        "steps": args.steps,
        "echo_only_erle_stage1_db": round(float(e1), 2),
        "echo_only_erle_two_stage_db": round(float(e2), 2),
        "double_talk_sisnr_linear_db": round(float(s1), 2),
        "double_talk_sisnr_enhanced_db": round(float(s2), 2),
    }
    checkpoints.save(args.out, {"params": params}, info)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
