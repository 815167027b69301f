"""Quality validation for the reduced-precision production paths.

Compares, across four scene types (echo-only, long-RIR, double-talk,
echo-path change):

- stage-1: batched fused Pallas Kalman with bf16 / f32 MXU dots, and the
  XLA scan at Precision.DEFAULT, against the scan at HIGHEST (oracle) —
  converged-tail ERLE deltas;
- stage-2: ``little_net_apply`` with ``Precision.DEFAULT`` STFT/iSTFT
  matmuls against HIGHEST — relative waveform error.

Run on the TPU backend (the point is MXU numerics). Prints one JSON line.
This is the evidence behind the production defaults in
``linear.kalman.kalman_cancel`` and the benchmark configs.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.models.little_net import little_net_apply, little_net_init

SR = 16000


def _scenes(rng, n=8 * 16384):
    """Four scene types, each [n] float32 (far, mic) pairs."""
    out = {}
    t = np.arange(n)

    def rir(length, decay):
        h = np.exp(-np.arange(length) / decay) * rng.standard_normal(length)
        return (0.5 * h / np.abs(h).max()).astype(np.float32)

    far = rng.standard_normal(n).astype(np.float32)
    out["echo_only"] = (far, np.convolve(far, rir(512, 100))[:n].astype(np.float32))

    far2 = rng.standard_normal(n).astype(np.float32)
    out["long_rir"] = (
        far2,
        np.convolve(far2, rir(2048, 400))[:n].astype(np.float32),
    )

    far3 = rng.standard_normal(n).astype(np.float32)
    near = 0.3 * np.sin(2 * np.pi * 440 * t / SR).astype(np.float32)
    out["double_talk"] = (
        far3,
        (np.convolve(far3, rir(512, 100))[:n] + near).astype(np.float32),
    )

    far4 = rng.standard_normal(n).astype(np.float32)
    e1 = np.convolve(far4, rir(512, 100))[:n]
    e2 = np.convolve(far4, rir(512, 80))[:n]
    half = n // 2
    mic4 = np.concatenate([e1[:half], e2[half:]]).astype(np.float32)
    out["path_change"] = (far4, mic4)
    return out


def _erle_tail(mic, e, frac=0.25):
    lo = int(len(mic) * (1 - frac))
    num = float(np.sum(np.asarray(mic[lo:]) ** 2))
    den = float(np.sum(np.asarray(e[lo:]) ** 2)) + 1e-12
    return 10.0 * np.log10(num / den + 1e-12)


def main() -> None:
    rng = np.random.default_rng(0)
    scenes = _scenes(rng)
    kcfg = KalmanConfig()
    scfg = StftConfig()
    results = {"stage1_erle": {}, "stage2": {}}

    for name, (far, mic) in scenes.items():
        farb = jnp.asarray(np.stack([far] * 4))  # small batch for the kernel
        micb = jnp.asarray(np.stack([mic] * 4))
        oracle = np.asarray(
            kalman_cancel(
                kcfg, farb, micb, fused=False,
                precision=jax.lax.Precision.HIGHEST,
            )["wav"][0]
        )
        mixed = (
            jax.lax.Precision.HIGH,
            jax.lax.Precision.DEFAULT,
            jax.lax.Precision.DEFAULT,
        )
        cands = {
            "scan_high": kalman_cancel(
                kcfg, farb, micb, fused=False,
                precision=jax.lax.Precision.HIGH,
            )["wav"][0],
            "scan_mixed": kalman_cancel(
                kcfg, farb, micb, fused=False, precision=mixed
            )["wav"][0],
            "fused_mixed": kalman_cancel_fused_batched_bl(
                kcfg, farb, micb, tile=4, dot_mode="mixed"
            )["wav"][0],
            "fused_high": kalman_cancel_fused_batched_bl(
                kcfg, farb, micb, tile=4, dot_mode="high"
            )["wav"][0],
            "scan_default": kalman_cancel(
                kcfg, farb, micb, fused=False,
                precision=jax.lax.Precision.DEFAULT,
            )["wav"][0],
            "fused_bf16": kalman_cancel_fused_batched_bl(
                kcfg, farb, micb, tile=4, dot_mode="bf16"
            )["wav"][0],
        }
        e0 = _erle_tail(mic, oracle)
        row = {"oracle_db": round(e0, 2)}
        for cname, wav in cands.items():
            row[cname] = round(_erle_tail(mic, np.asarray(wav)) - e0, 3)
        results["stage1_erle"][name] = row
        print(name, row, flush=True)

    # stage-2 precision on the enhanced waveform
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    far, mic = scenes["double_talk"]
    lin = kalman_cancel(kcfg, jnp.asarray(far)[None], jnp.asarray(mic)[None])
    lw = lin["wav"]
    hi = np.asarray(
        little_net_apply(params, lw, jnp.asarray(far)[None], erb, scfg,
                         normalize=False)["wav"]
    )
    lo = np.asarray(
        little_net_apply(params, lw, jnp.asarray(far)[None], erb, scfg,
                         normalize=False,
                         precision=jax.lax.Precision.DEFAULT)["wav"]
    )
    rel = float(np.max(np.abs(hi - lo)) / (np.max(np.abs(hi)) + 1e-12))
    snr = 10.0 * np.log10(
        float(np.sum(hi**2)) / (float(np.sum((hi - lo) ** 2)) + 1e-30)
    )
    results["stage2"]["rel_wav_err_default_vs_highest"] = rel
    results["stage2"]["snr_db_default_vs_highest"] = round(float(snr), 1)
    print("stage2 rel err", rel, "snr dB", round(float(snr), 1), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    import time

    last = None
    for _ in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            print("retry after:", e, flush=True)
            time.sleep(5)
    else:
        raise last
