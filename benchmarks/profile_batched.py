"""Stage-by-stage slope profiling of the batched two-stage pipeline.

Times each component of the headline bench (bench.py: batch=256, n=128k)
separately with the two-point slope method (k=1 vs k=3 sequential runs in
one program) so the axon tunnel's ~25 ms dispatch floor cancels. Guides
where optimization effort goes (GRU scan vs Kalman scan vs STFT matmuls).
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.models.little_net import (
    little_net_apply,
    little_net_init,
)
from aec_tpu.ops.gru import gru_scan

SR = 16000
BATCH = 256
N = 128 * 1024


def slope_time(make_fn, gen_shape, key, reps=3):
    """make_fn(x[k, ...]) scans k repetitions; returns per-rep seconds."""

    @jax.jit
    def run_k(xs):
        def body(c, x):
            return c + make_fn(x), None

        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    @partial(jax.jit, static_argnums=1)
    def gen(k_, k):
        return jax.random.normal(k_, (k, *gen_shape), jnp.float32)

    med = {}
    for k in (1, 3):
        bufs = [gen(jax.random.fold_in(key, 10 * k + r), k) for r in range(reps + 1)]
        jax.block_until_ready(bufs)
        float(run_k(bufs[-1]))
        ts = []
        for b in bufs[:-1]:
            t0 = time.perf_counter()
            float(run_k(b))
            ts.append(time.perf_counter() - t0)
        med[k] = float(np.median(ts))
    per = (med[3] - med[1]) / 2.0
    if per < 1e-4:
        per = med[3] / 3.0
    return per


def main():
    scfg = StftConfig()
    kcfg = KalmanConfig()
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    key = jax.random.PRNGKey(7)
    audio_s = BATCH * N / SR
    t_frames = N // scfg.hop + 1

    results = {}
    import sys

    only = sys.argv[1:]  # substring filters; empty = run everything

    def report(name, per_call, work_s=audio_s):
        results[name] = {
            "ms": round(per_call * 1e3, 2),
            "xrt": round(work_s / per_call, 1),
        }
        print(name, results[name], flush=True)

    def maybe(name, thunk, work_s=audio_s):
        if only and not any(f in name for f in only):
            return
        report(name, thunk(), work_s)

    # 1. stage-1 Kalman batched (vmapped scan)
    maybe(
        "kalman_batched",
        lambda: slope_time(
            lambda x: jnp.sum(kalman_cancel(kcfg, x[0], x[1], block=scfg.hop)["wav"]),
            (2, BATCH, N),
            key,
        ),
    )

    # 2. stage-2 LittleNet full apply
    maybe(
        "little_net_apply",
        lambda: slope_time(
            lambda x: jnp.sum(
                little_net_apply(params, x[0], x[1], erb, scfg, normalize=False)["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, 1),
        ),
    )

    # 3. STFT alone (x2 signals, as in apply)
    maybe(
        "stft_x2",
        lambda: slope_time(
            lambda x: jnp.sum(stft_mod.magnitude(stft_mod.stft(x[0], scfg)))
            + jnp.sum(stft_mod.magnitude(stft_mod.stft(x[1], scfg))),
            (2, BATCH, N),
            jax.random.fold_in(key, 2),
        ),
    )

    # 4. iSTFT alone
    maybe(
        "istft",
        lambda: slope_time(
            lambda x: jnp.sum(stft_mod.istft(x, scfg)),
            (BATCH, t_frames, 2 * scfg.n_freqs),
            jax.random.fold_in(key, 3),
        ),
    )

    # 5. GRU scan alone on [B, T, 64]
    maybe(
        "gru_scan",
        lambda: slope_time(
            lambda x: jnp.sum(gru_scan(params["gru"], x, fused=False)[0]),
            (BATCH, t_frames, 64),
            jax.random.fold_in(key, 4),
        ),
    )

    # 6. fused Pallas GRU kernel
    maybe(
        "gru_fused",
        lambda: slope_time(
            lambda x: jnp.sum(gru_scan(params["gru"], x, fused=True)[0]),
            (BATCH, t_frames, 64),
            jax.random.fold_in(key, 5),
        ),
    )

    # 7. STFT x2 at Precision.HIGH (stage-1's production precision)
    maybe(
        "stft_x2_high",
        lambda: slope_time(
            lambda x: jnp.sum(
                stft_mod.magnitude(
                    stft_mod.stft(x[0], scfg, precision=jax.lax.Precision.HIGH)
                )
            )
            + jnp.sum(
                stft_mod.magnitude(
                    stft_mod.stft(x[1], scfg, precision=jax.lax.Precision.HIGH)
                )
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, 6),
        ),
    )

    # 8. Kalman batched at DEFAULT (single-pass bf16) stage-1 precision
    maybe(
        "kalman_batched_bf16",
        lambda: slope_time(
            lambda x: jnp.sum(
                kalman_cancel(
                    kcfg, x[0], x[1], block=scfg.hop,
                    precision=jax.lax.Precision.DEFAULT,
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, 7),
        ),
    )

    # 9. batched fused Pallas Kalman (VMEM-resident state per batch tile)
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched

    for tile in (16, 32):
        maybe(
            f"kalman_fused_batched_t{tile}",
            lambda tile=tile: slope_time(
                lambda x, tile=tile: jnp.sum(
                    kalman_cancel_fused_batched(
                        kcfg, x[0], x[1], block=scfg.hop, tile=tile
                    )["wav"]
                ),
                (2, BATCH, N),
                jax.random.fold_in(key, 8 + tile),
            ),
        )

    # 10. batched fused Kalman with bf16 MXU dot operands (f32 accum/state)
    maybe(
        "kalman_fused_batched_t32_bf16",
        lambda: slope_time(
            lambda x: jnp.sum(
                kalman_cancel_fused_batched(
                    kcfg, x[0], x[1], block=scfg.hop, tile=32,
                    dot_mode="bf16",
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, 60),
        ),
    )

    # 11. stage-2 apply with DEFAULT-precision STFT/iSTFT matmuls
    maybe(
        "little_net_apply_bf16_stft",
        lambda: slope_time(
            lambda x: jnp.sum(
                little_net_apply(
                    params, x[0], x[1], erb, scfg, normalize=False,
                    precision=jax.lax.Precision.DEFAULT,
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, 61),
        ),
    )

    print(json.dumps(results))


if __name__ == "__main__":
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
