"""Same-process A/B: DCCRN grouped complex-LSTM kernel vs scan at batch 1-8.

The fused kernel (kernels/pallas_lstm.py) auto-routes b==1 only — its win is
the per-step XLA while-loop overhead, which the scan amortizes over the
batch. This grades the crossover so the route is measured, not guessed
(ROADMAP round-4 candidate). DCCRN production dims: per-branch H=1024,
input 1024, T=512 frames (8.2 s at hop 256).

Usage: python -m benchmarks.ab_lstm_batch [batches...]  (default 1 4 8)
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.ops.lstm import complex_lstm_init, complex_lstm_scan

T, I = 512, 2048  # DCCRN v1 defaults: feat = 512 ch * 4 freq = 2048


def slope_time(fn, b, key, reps=5):
    @jax.jit
    def run_k(xs):  # xs: (k, 2, B, T, I/2)
        def body(c, x):
            r, i = fn(x[0], x[1])
            return c + jnp.sum(r[:, -1]) + jnp.sum(i[:, -1]), None

        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    @partial(jax.jit, static_argnums=1)
    def gen(k_, k):
        return 0.1 * jax.random.normal(k_, (k, 2, b, T, I // 2), jnp.float32)

    # wide 12-unit slope: per-unit device cost here is 1-7 ms while the
    # tunnel round trip is a NONSTATIONARY 20-50 ms (CLAUDE.md) — a narrow
    # 2-unit slope measures noise (observed negative)
    med = {}
    for k in (2, 14):
        bufs = [gen(jax.random.fold_in(key, 10 * k + r), k) for r in range(reps + 1)]
        jax.block_until_ready(bufs)
        float(run_k(bufs[-1]))  # warm compile
        ts = []
        for buf in bufs[:-1]:
            t0 = time.perf_counter()
            float(run_k(buf))
            ts.append(time.perf_counter() - t0)
        med[k] = float(np.median(ts))
    return (med[14] - med[2]) / 12.0


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    params = complex_lstm_init(jax.random.PRNGKey(0), I, I)
    out = {}
    for b in batches:
        for name, fused in (("scan", False), ("fused", True)):
            fn = lambda r, i: complex_lstm_scan(params, r, i, fused=fused)
            per = slope_time(fn, b, jax.random.PRNGKey(b))
            out[f"b{b}_{name}"] = {
                "ms": round(per * 1e3, 3),
                "ms_per_utt": round(per * 1e3 / b, 3),
            }
            print(json.dumps({f"b{b}_{name}": out[f"b{b}_{name}"]}), flush=True)
    print(json.dumps({"desc": "complex_lstm fused-vs-scan crossover, "
                      f"T={T} I={I} (DCCRN dims), same process", **out}))


if __name__ == "__main__":
    main()
