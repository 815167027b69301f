"""On-chip A/B #2: inside the constraint projection, WHICH rounding hurts?

ab_perop.py showed mixed's -0.16 dB worst-case tail ERLE comes from the
constraint-projection matmul (p_constrain), not the residual dot. A 1-pass
bf16 MXU matmul rounds BOTH sides; the two candidate 2-pass recoveries are

    matrix-split : m_hi@x_hi + m_lo@x_hi  (matrix exact, operand bf16)
    operand-split: m_hi@x_hi + m_hi@x_lo  (operand exact, matrix bf16)

Matrix rounding is a SYSTEMATIC bias of the projection operator (leaks the
same non-causal components every step -> accumulates in W); operand rounding
is per-step gradient noise (adaptive loops average it out). This script
isolates the two by pre-rounding one side and projecting at HIGHEST:

    c_op_bf16  = round the update to bf16, exact matrix  (== matrix-split)
    c_mat_bf16 = exact update, bf16-rounded matrix       (== operand-split)
    c_both     = both rounded (sanity: should track mixed's 1-pass loss)

Base precisions (H, D) for y/e — the combination ab_perop showed is quality-
neutral. Run on the TPU backend; prints one JSON line.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig
from aec_tpu.linear import overlap_save as ols
from aec_tpu.linear.kalman import kalman_cancel
from benchmarks.scenes import erle_tail, make_scenes

H = jax.lax.Precision.HIGH
D = jax.lax.Precision.DEFAULT
HI = jax.lax.Precision.HIGHEST

_orig = ols.constrain_gradient


def _bf(v):
    return v.astype(jnp.bfloat16).astype(jnp.float32)


def _c_op_bf16(g_ri, block, precision=None):
    return _orig(_bf(g_ri), block, HI)


def _c_mat_bf16(g_ri, block, precision=None):
    _, _, con = ols._dft_mats(block)
    return jnp.matmul(g_ri, _bf(jnp.asarray(con)), precision=HI)


def _c_both(g_ri, block, precision=None):
    _, _, con = ols._dft_mats(block)
    return jnp.matmul(_bf(g_ri), _bf(jnp.asarray(con)), precision=HI)


VARIANTS = {
    "c_op_bf16": _c_op_bf16,
    "c_mat_bf16": _c_mat_bf16,
    "c_both": _c_both,
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
            kalman_cancel(kcfg, farb, micb, fused=False, precision=HI)["wav"][0]
        )
        e0 = erle_tail(mic, oracle)
        row = {"oracle_db": round(e0, 2)}
        for cname, fn in VARIANTS.items():
            ols.constrain_gradient = fn
            try:
                wav = kalman_cancel(
                    kcfg, farb, micb, fused=False, precision=(H, D, HI)
                )["wav"][0]
            finally:
                ols.constrain_gradient = _orig
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
