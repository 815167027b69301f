"""Same-process slope A/B: fused Pallas serving step vs the XLA scan step.

S=1024 live two-stage sessions advanced k blocks inside one program
(lax.scan carrying the stream state — the serving recursion). The scan
step measures ~0.227 ms/block against a 0.139 ms state-bandwidth floor
(docs/ROOFLINE.md); the fused kernel (kernels/pallas_serving.py) pipelines
each stream-tile's state DMA against the previous tile's compute.

Round-5 hardening (VERDICT r4 item 2 — the round-3 artifact said fused
1.6x FASTER, the round-4 suite said 1.65x SLOWER, both plausibly tunnel
noise): the slope is now the same least-squares form as the driver's
config #6 — >=4 k values x >=5 reps, sub-floor readings rejected and
re-measured — and the run writes ``benchmarks/results/ab_serving_r5.json``
as the decisive same-process record.

Usage: python -m benchmarks.ab_serving [filters]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.kernels.pallas_serving import serving_init, serving_step_fused
from aec_tpu.models.little_net import little_net_init
from aec_tpu.pipeline.streaming import _stream_step_core, stream_init_batched

S = 1024
HOP = 256
KS = (4, 16, 28, 40)
REPS = 5
# per-stream serving state that must round-trip HBM every block (see
# docs/ROOFLINE.md §serving); sub-floor slopes are measurement failures
STATE_BYTES_PER_STREAM = 55_648
V5E_HBM_BYTES_PER_S = 819e9
ARTIFACT = "benchmarks/results/ab_serving_r5.json"


def slope(fn, state, key, reps=REPS, cols=HOP):
    """Least-squares per-dispatch slope over KS, median of reps each.

    Distinct on-device buffers per rep + scalar readback (CLAUDE.md relay
    rules); a slope under 95% of the state-bandwidth floor (scaled by the
    queued-block count cols/HOP) is re-measured up to 3x and clamped."""
    floor_s = 0.0
    if jax.default_backend() == "tpu":
        floor_s = (2.0 * S * STATE_BYTES_PER_STREAM / V5E_HBM_BYTES_PER_S
                   ) * (cols / HOP)

    @partial(jax.jit, static_argnums=1)
    def gen(k_, k):
        return jax.random.normal(k_, (k, 2, S, cols), jnp.float32)

    raw = None
    for attempt in range(3):
        meds = []
        for k in KS:
            # buffers are generated ONE AT A TIME (distinct per rep for the
            # relay-memoization rule) — materializing all reps at once OOMs
            # HBM for the chunked variants ((40,2,1024,8192) f32 = 2.7 GB
            # each; 6 live = 16 GB > the v5e's HBM)
            def buf(r):
                b = gen(jax.random.fold_in(key, 1000 * attempt + 10 * k + r), k)
                jax.block_until_ready(b)
                return b

            float(fn(state, buf(reps)))  # compile + warmup per shape
            ts = []
            for r in range(reps):
                b = buf(r)
                t0 = time.perf_counter()
                float(fn(state, b))
                ts.append(time.perf_counter() - t0)
                del b
            meds.append(float(np.median(ts)))
        per = float(np.polyfit(KS, meds, 1)[0])
        raw = per if raw is None else min(raw, per)
        if per >= max(floor_s * 0.95, 20e-6):
            return per
    if raw < 20e-6:  # timer-noise regime
        return meds[-1] / KS[-1]
    return max(raw, floor_s)


def main() -> None:
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    key = jax.random.PRNGKey(3)
    only = sys.argv[1:]
    results = {}

    def maybe(name, thunk):
        if only and not any(f in name for f in only):
            return
        per = thunk()
        cap = S * (HOP / 16000.0) / per
        results[name] = {"step_ms": round(per * 1e3, 3), "streams": round(cap, 1)}
        print(name, results[name], flush=True)

    def scan_step(stage1="kalman", i=0):
        state = stream_init_batched(S, stage1=stage1)

        @jax.jit
        def run_k(st, fm):
            def body(st, fm1):
                st, out = jax.vmap(
                    lambda s1, f, m: _stream_step_core(
                        params, s1, f, m, erb, StftConfig(), stage1, None
                    )
                )(st, fm1[0], fm1[1])
                return st, jnp.sum(out)

            return jnp.sum(jax.lax.scan(body, st, fm)[1])

        return slope(run_k, state, jax.random.fold_in(key, i))

    def fused(tile, mode, i, stage1="kalman", normalize=False):
        state = serving_init(S, tile=tile, stage1=stage1)

        @jax.jit
        def run_k(st, fm):
            def body(st, fm1):
                st, out = serving_step_fused(
                    params, st, fm1[0], fm1[1], erb,
                    dot_mode=mode, stage1=stage1, normalize=normalize,
                )
                return st, jnp.sum(out)

            return jnp.sum(jax.lax.scan(body, st, fm)[1])

        return slope(run_k, state, jax.random.fold_in(key, i))

    maybe("scan_step", scan_step)
    maybe("fused_t128_balanced", lambda: fused(128, "balanced", 1))
    maybe("fused_t256_balanced", lambda: fused(256, "balanced", 2))
    maybe("fused_t128_mixed", lambda: fused(128, "mixed", 3))
    maybe("fused_t512_balanced", lambda: fused(512, "balanced", 4))
    maybe("scan_step_nlms", lambda: scan_step("nlms", 5))
    maybe("fused_nlms_t128_balanced", lambda: fused(128, "balanced", 6, "nlms"))
    maybe("fused_nlms_t256_balanced", lambda: fused(256, "balanced", 7, "nlms"))
    maybe(
        "fused_norm_t128_balanced",
        lambda: fused(128, "balanced", 8, normalize=True),
    )

    def fused_chunked(tile, mode, i, kb):
        # k queued blocks per dispatch: the state round trip amortizes
        # over the chunk (near-line / catch-up serving); per-BLOCK cost
        state = serving_init(S, tile=tile)

        @jax.jit
        def run_k(st, fm):
            def body(st, fm1):
                st, out = serving_step_fused(
                    params, st, fm1[0], fm1[1], erb, dot_mode=mode
                )
                return st, jnp.sum(out)

            return jnp.sum(jax.lax.scan(body, st, fm)[1])

        per_chunk = slope(
            run_k, state, jax.random.fold_in(key, i), cols=kb * HOP
        )
        return per_chunk / kb

    maybe("fused_chunk8_t128_balanced",
          lambda: fused_chunked(128, "balanced", 9, 8))
    maybe("fused_chunk32_t128_balanced",
          lambda: fused_chunked(128, "balanced", 10, 32))

    print(json.dumps(results))
    if not only and jax.default_backend() == "tpu":
        # full run on the real chip = the decisive same-process record
        floor_ms = round(
            2.0 * S * STATE_BYTES_PER_STREAM / V5E_HBM_BYTES_PER_S * 1e3, 3
        )
        payload = {"slope": {"ks": list(KS), "reps": REPS},
                   "streams": S, "floor_ms": floor_ms, **results}
        import os

        os.makedirs(os.path.dirname(ARTIFACT), exist_ok=True)
        with open(ARTIFACT, "w") as f:
            json.dump(payload, f, indent=1)
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
