"""On-chip A/B: WHICH per-op dot drives the 'mixed' tier's ERLE loss?

The fused batched kernels' FLOPs are dominated by the 4 constraint-projection
matmuls (N = L*tile lanes); the residual-analysis dots (e -> spectrum) are
1/L of that.  If mixed's measured -0.16 dB worst case comes from the CHEAP
residual dot rather than the constraint projection, then a "balanced" kernel
tier (y + residual at bf16_3x, constraint single-pass) would run at
near-mixed speed with near-parity quality — worth a kernel dot_mode.

Grades the XLA scan (no kernel code needed) on the 8-scene battery with
per-op tuples (p_y, p_e, p_constrain):

    mixed    = (HIGH, DEFAULT, DEFAULT)   # production "fast"
    res_hi   = (HIGH, HIGH,    DEFAULT)   # hypothesis: residual matters
    con_hi   = (HIGH, DEFAULT, HIGH)      # alternative: constraint matters

against the HIGHEST fp32 oracle. Run on the TPU backend; prints a JSON line.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig
from aec_tpu.linear.kalman import kalman_cancel
from benchmarks.scenes import erle_tail, make_scenes

H = jax.lax.Precision.HIGH
D = jax.lax.Precision.DEFAULT

TUPLES = {
    "mixed_HDD": (H, D, D),
    "res_hi_HHD": (H, H, D),
    "con_hi_HDH": (H, D, H),
}


def main() -> None:
    rng = np.random.default_rng(0)
    scenes = make_scenes(rng)
    kcfg = KalmanConfig()
    results = {}
    for name, (far, mic, _near) in scenes.items():
        farb = jnp.asarray(np.stack([far] * 4))
        micb = jnp.asarray(np.stack([mic] * 4))
        oracle = np.asarray(
            kalman_cancel(
                kcfg, farb, micb, fused=False,
                precision=jax.lax.Precision.HIGHEST,
            )["wav"][0]
        )
        e0 = erle_tail(mic, oracle)
        row = {"oracle_db": round(e0, 2)}
        for cname, tup in TUPLES.items():
            wav = kalman_cancel(
                kcfg, farb, micb, fused=False, precision=tup
            )["wav"][0]
            row[cname] = round(erle_tail(mic, np.asarray(wav)) - e0, 3)
        results[name] = row
        print(name, row, flush=True)
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
