"""Same-process A/B: the round-4 VPU lever on the balanced Kalman kernel.

docs/ROOFLINE.md names VPU-side state-op reduction as the last un-graded
lever for the parity (balanced) tier, which measures ~61% of its padded-MXU
floor — the gap is ~25 elementwise ops per block step over the (257, 2560)
state grids that the sequential grid cannot hide. ``vpu_opt=True``
(kernels/bl_common.kalman_block_step):

- reuses the (K, L*tile) product ``x2 * p_pred`` between the gain
  denominator and the P update (identical numerics);
- collapses the three per-step divides (er/den, ei/den on (K, tile); the
  full-grid x2/den in the P update) into ONE (K, tile) reciprocal +
  multiplies (one extra rounding per use — graded in
  validate_precision.py column ``fused_bal_vpu``).

Timing: the repo's decision-grade method — k pipeline invocations scanned
inside ONE program, slope over (1, 5), medians of 5 distinct-buffer reps,
BOTH arms timed on the same buffers within one process so tunnel drift and
data cancel.

Usage: python -m benchmarks.ab_vpu_opt
Artifact: benchmarks/results/ab_vpu_opt_r4.json
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig
from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl

SR = 16000
BATCH = 256
N = 128 * 1024


def main() -> None:
    kcfg = KalmanConfig()

    @partial(jax.jit, static_argnums=1)
    def run_k(xs, vpu_opt):  # xs: (k, 2, BATCH, N)
        def body(c, fm):
            e = kalman_cancel_fused_batched_bl(
                kcfg, fm[0], fm[1], dot_mode="balanced", vpu_opt=vpu_opt
            )["wav"]
            return c + jnp.sum(e), None

        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    @partial(jax.jit, static_argnums=1)
    def gen(k_, k):
        return 0.5 * jax.random.normal(k_, (k, 2, BATCH, N), jnp.float32)

    key = jax.random.PRNGKey(11)
    reps = 5
    med = {False: {}, True: {}}
    raw = {False: {}, True: {}}
    for k in (1, 5):
        ts = {False: [], True: []}
        for r in range(reps + 1):
            buf = jax.block_until_ready(gen(jax.random.fold_in(key, 10 * k + r), k))
            for arm in (False, True):
                t0 = time.perf_counter()
                float(run_k(buf, arm))
                dt = time.perf_counter() - t0
                if r:  # r=0 warms the compile for this (k, arm) shape
                    ts[arm].append(dt)
            del buf
        for arm in (False, True):
            med[arm][k] = float(np.median(ts[arm]))
            raw[arm][k] = [round(t * 1e3, 2) for t in sorted(ts[arm])]
    per = {arm: (med[arm][5] - med[arm][1]) / 4.0 for arm in (False, True)}
    out = {
        "desc": "balanced bl Kalman batch 256 x 8.2 s, same-process "
                "slope (k=1,5; 5 distinct-buffer reps; arms share buffers)",
        "backend": jax.default_backend(),
        "base_ms": round(per[False] * 1e3, 2),
        "vpu_opt_ms": round(per[True] * 1e3, 2),
        "delta_ms": round((per[False] - per[True]) * 1e3, 2),
        "speedup": round(per[False] / per[True], 4),
        "raw_ms": {"base": raw[False], "vpu_opt": raw[True]},
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "results",
                        "ab_vpu_opt_r4.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
