"""Same-process cost A/B: gain_norm ERB synthesis on vs off (round 5).

VERDICT r4 item 3 put the scale-sane ERB synthesis (``gain_norm`` — one
extra back-projection contraction + reciprocal per frame, see
models/little_net.py and kernels/bl_common.py stage2_frame_step) on every
production fast path: the fused stage-2 kernel, the single-kernel
two-stage fusion, the two-kernel parity composition, and the fused
serving step. This measures the cost of turning it on, same-process,
slope-timed (CLAUDE.md relay rules: distinct on-device buffers per rep,
scalar readback, 2-point slope to cancel the dispatch constant).

Writes ``benchmarks/results/ab_gain_norm_r5.json`` on a real TPU run.

Usage: python -m benchmarks.ab_gain_norm
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.models.little_net import little_net_init
from aec_tpu.pipeline.two_stage import two_stage_cancel

ARTIFACT = "benchmarks/results/ab_gain_norm_r5.json"
BATCH = 256
N = 128 * 1024  # 8.19 s per utterance
REPS = 3
K_LO, K_HI = 1, 4


def slope(run_k, key, shape):
    """Median 2-point slope (seconds per pipeline call) over REPS pairs."""

    @partial(jax.jit, static_argnums=1)
    def gen(k_, k):
        return jax.random.normal(k_, (k, *shape), jnp.float32)

    meds = {}
    for k in (K_LO, K_HI):
        ts = []
        warm = gen(jax.random.fold_in(key, 10 * k + 99), k)
        jax.block_until_ready(warm)
        float(run_k(warm))  # compile + warmup per shape
        del warm
        for r in range(REPS):
            b = gen(jax.random.fold_in(key, 10 * k + r), k)
            jax.block_until_ready(b)
            t0 = time.perf_counter()
            float(run_k(b))
            ts.append(time.perf_counter() - t0)
            del b
        meds[k] = ts
    slopes = [
        (meds[K_HI][i] - meds[K_LO][i]) / (K_HI - K_LO) for i in range(REPS)
    ]
    slopes = [s for s in slopes if s > 1e-4] or [
        float(np.median(meds[K_HI])) / K_HI
    ]
    return float(np.median(slopes))


def batched(params, erb, key, quality, gain_norm):
    """Two-stage production path, batch 256 x 8.2 s (the headline shape)."""

    @jax.jit
    def run_k(fm):
        def body(c, x):
            out = two_stage_cancel(
                params, x[0], x[1], erb, stage1="kalman",
                quality=quality, gain_norm=gain_norm,
            )
            return c + jnp.sum(out["wav"]), None

        return jax.lax.scan(body, jnp.float32(0.0), fm)[0]

    return slope(run_k, key, (2, BATCH, N))


def serving(params, erb, key, gain_norm):
    """Fused serving step, S=1024 sessions x one 16 ms block.

    Uses ab_serving's hardened least-squares slope (4 k-points x 5 reps,
    state-bandwidth floor guard) — the first capture of this A/B used a
    naive 2-point slope over only ~4 ms of signal and read 0.038 ms/step,
    BELOW the 0.139 ms floor: tunnel-jitter garbage, not data."""
    from aec_tpu.kernels.pallas_serving import serving_init, serving_step_fused
    from benchmarks.ab_serving import slope

    S = 1024
    state = serving_init(S, tile=128)

    @jax.jit
    def run_k(st, fm):  # state as ARG (a closure would bake 57 MB into HLO)
        def body(st, fm1):
            st, out = serving_step_fused(
                params, st, fm1[0], fm1[1], erb, gain_norm=gain_norm
            )
            return st, jnp.sum(out)

        return jnp.sum(jax.lax.scan(body, st, fm)[1])

    return slope(run_k, state, key)


def main() -> None:
    import sys

    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    key = jax.random.PRNGKey(7)
    audio_s = BATCH * N / 16000.0

    results = {}
    if not only or any("two_stage" in f for f in only):
        for qi, (name, q) in enumerate((("parity", "parity"), ("fast", "fast"))):
            for gn in (False, True):
                per = batched(
                    params, erb, jax.random.fold_in(key, 10 * qi + gn), q, gn
                )
                row = {
                    "ms": round(per * 1e3, 2),
                    "xrt": round(audio_s / per, 1),
                }
                results[f"two_stage_{name}_gn{int(gn)}"] = row
                print(f"two_stage_{name}_gn{int(gn)}", row, flush=True)
    if not only or any("serving" in f for f in only):
        for gn in (False, True):
            per = serving(params, erb, jax.random.fold_in(key, 50 + gn), gn)
            row = {
                "step_ms": round(per * 1e3, 3),
                "streams": round(1024 * (256 / 16000.0) / per, 1),
            }
            results[f"serving_fused_gn{int(gn)}"] = row
            print(f"serving_fused_gn{int(gn)}", row, flush=True)

    print(json.dumps(results))
    if jax.default_backend() == "tpu":
        os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
        # merge-update: a section rerun must not drop the other rows
        merged = {"batch": BATCH, "n": N, "slope_reps": REPS}
        if os.path.isfile(ARTIFACT):
            with open(ARTIFACT) as f:
                merged.update(json.load(f))
        merged.update(results)
        tmp = ARTIFACT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=1)
        os.replace(tmp, ARTIFACT)
        print("wrote", ARTIFACT, flush=True)


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
