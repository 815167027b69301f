"""Same-process slope timing: the "balanced" stage-1 tier vs mixed/high.

Times the batched batch-in-lanes Kalman kernel at the three routed tiers
(tile=256, production defaults) on the headline shape (batch 256 x 8.2 s),
plus the NLMS kernel and the single two-stage kernel at balanced, in ONE
process so the tunnel's nonstationary latency cancels (CLAUDE.md:
always A/B within one process). Prints one JSON line.

Usage: python -m benchmarks.ab_balanced_time [substring filters]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl
from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused_batched_bl
from aec_tpu.kernels.pallas_two_stage import two_stage_fused
from aec_tpu.models.little_net import little_net_init

SR = 16000
BATCH = 256
N = 128 * 1024


def slope_time(make_fn, gen_shape, key, reps=3):
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


def main() -> None:
    kcfg = KalmanConfig()
    ncfg = NlmsConfig()
    scfg = StftConfig()
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    key = jax.random.PRNGKey(11)
    audio_s = BATCH * N / SR
    only = sys.argv[1:]
    results = {}

    def maybe(name, thunk):
        if only and not any(f in name for f in only):
            return
        per = thunk()
        results[name] = {"ms": round(per * 1e3, 2), "xrt": round(audio_s / per, 1)}
        print(name, results[name], flush=True)

    def kal(mode, unroll, i, ce=1, tile=None):
        return slope_time(
            lambda x: jnp.sum(
                kalman_cancel_fused_batched_bl(
                    kcfg, x[0], x[1], block=scfg.hop, dot_mode=mode,
                    unroll=unroll, constrain_every=ce, tile=tile,
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, i),
        )

    maybe("kalman_bl_mixed_u2", lambda: kal("mixed", 2, 0))
    maybe("kalman_bl_balanced_u2", lambda: kal("balanced", 2, 1))
    maybe("kalman_bl_balanced_u1", lambda: kal("balanced", 1, 2))
    maybe("kalman_bl_lean_u1", lambda: kal("lean", 1, 12))
    maybe("kalman_bl_high_u1", lambda: kal("high", 1, 3))
    maybe("kalman_bl_balanced_t128_u1", lambda: kal("balanced", 1, 24, tile=128))
    maybe("kalman_bl_balanced_t128_u2", lambda: kal("balanced", 2, 25, tile=128))
    maybe("kalman_bl_balanced_t192_u1", lambda: kal("balanced", 1, 26, tile=192))
    maybe("kalman_bl_balanced_u1_ce2", lambda: kal("balanced", 1, 14, 2))
    maybe("kalman_bl_balanced_u2_ce2", lambda: kal("balanced", 2, 15, 2))
    maybe("kalman_bl_balanced_u1_ce4", lambda: kal("balanced", 1, 16, 4))
    maybe("kalman_bl_mixed_u2_ce2", lambda: kal("mixed", 2, 17, 2))

    def nl(mode, unroll, i, ce=1):
        return slope_time(
            lambda x: jnp.sum(
                nlms_cancel_fused_batched_bl(
                    ncfg, x[0], x[1], block=scfg.hop, dot_mode=mode,
                    unroll=unroll, constrain_every=ce,
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, i),
        )

    maybe("nlms_bl_balanced_u2", lambda: nl("balanced", 2, 4))
    maybe("nlms_bl_balanced_u1", lambda: nl("balanced", 1, 7))
    maybe("nlms_bl_lean_u1", lambda: nl("lean", 1, 13))
    maybe("nlms_bl_mixed_u2", lambda: nl("mixed", 2, 11))
    maybe("nlms_bl_balanced_u1_ce2", lambda: nl("balanced", 1, 18, 2))

    def ts(mode, unroll, i):
        return slope_time(
            lambda x: jnp.sum(
                two_stage_fused(
                    params, x[0], x[1], erb, dot_mode=mode, unroll=unroll
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, i),
        )

    maybe("two_stage_single_balanced_u2", lambda: ts("balanced", 2, 5))
    maybe("two_stage_single_balanced_u1", lambda: ts("balanced", 1, 8))
    maybe("two_stage_single_mixed_u2", lambda: ts("mixed", 2, 6))

    # the production entry point at both qualities (routing as shipped):
    # parity composition (balanced stage-1 + fused stage-2) vs the single
    # kernel decides the parity route
    from aec_tpu.pipeline.two_stage import two_stage_cancel

    def prod(q, i):
        return slope_time(
            lambda x: jnp.sum(
                two_stage_cancel(params, x[0], x[1], erb, quality=q)["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, i),
        )

    maybe("two_stage_prod_parity", lambda: prod("parity", 9))
    maybe("two_stage_prod_fast", lambda: prod("fast", 10))

    # stage-2 kernel time-axis unroll (round-3: biggest relative SoL gap)
    from aec_tpu.kernels.pallas_stage2 import little_net_apply_fused_wav

    def s2(unroll, i):
        return slope_time(
            lambda x: jnp.sum(
                little_net_apply_fused_wav(
                    params, x[0], x[1], erb, normalize=False, unroll=unroll
                )["wav"]
            ),
            (2, BATCH, N),
            jax.random.fold_in(key, i),
        )

    maybe("stage2_bl_u1", lambda: s2(1, 20))
    maybe("stage2_bl_u2", lambda: s2(2, 21))
    maybe("stage2_bl_u4", lambda: s2(4, 22))
    maybe("stage2_bl_u8", lambda: s2(8, 23))

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
