"""Headline benchmark: realtime factor (xRT) of the full two-stage AEC.

Runs the flagship pipeline — stage-1 partitioned-block frequency-domain
Kalman + stage-2 LittleNet post-filter — over batches of 16 kHz utterances
on one chip, and reports audio-seconds processed per wall-second of DEVICE
time.

Timing notes (this image's axon relay):
- every dispatch pays a ~25 ms host<->TPU round trip, so a single timed call
  overstates device time; we time k=1 and k=3 pipeline repetitions executed
  sequentially inside one program (lax.scan) and take the slope, which
  cancels the constant dispatch term;
- identical executions may be memoized and ``block_until_ready`` can return
  early, so every repetition consumes DISTINCT on-device jax.random inputs
  and the result is reduced to a scalar fetched to host;
- inputs are generated on device (no multi-GB host uploads through the
  tunnel).

Prints ONE JSON line:
  {"metric": "two_stage_xrt_per_chip", "value": <xRT>, "unit": "x_realtime",
   "vs_baseline": <xRT / 1000>}
``vs_baseline`` is the ratio against the north-star target of 1000x realtime
per chip (BASELINE.json; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.pipeline.two_stage import two_stage_cancel

    sr = 16000
    batch = 256
    n = 128 * 1024  # 8.19 s per utterance, 512 blocks of 256
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())

    def pipeline(far, mic):
        # the production composition API; on TPU it auto-routes BOTH stages
        # to the fused batch-in-lanes Pallas kernels at the default
        # production precision policy (stage-1 per-op mixed, -0.16 dB
        # tail-ERLE worst case; stage-2 single-pass bf16, 1.6e-7 relative
        # waveform error -- benchmarks/validate_precision.py,
        # kernels/pallas_kalman.py, kernels/pallas_stage2.py)
        out = two_stage_cancel(params, far, mic, erb, stage1="kalman")
        return jnp.sum(out["wav"])

    @jax.jit
    def run_k(fm):  # (k, 2, batch, n) -> checksum; k sequential pipeline runs
        def body(c, x):
            return c + pipeline(x[0], x[1]), None

        return jax.lax.scan(body, jnp.float32(0.0), fm)[0]

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(key, k):  # distinct on-device inputs per repetition
        return jax.random.normal(key, (k, 2, batch, n), jnp.float32)

    key = jax.random.PRNGKey(42)
    # the tunnel's per-dispatch latency is NONSTATIONARY (observed 20-50 ms
    # across minutes), so the two-point slope needs a wide k spread and
    # several reps per point to keep the constant term from leaking into
    # the slope
    reps = 5
    k_lo, k_hi = 1, 5
    medians = {}
    for k in (k_lo, k_hi):
        bufs = [
            gen(jax.random.fold_in(key, 10 * k + r), k) for r in range(reps + 1)
        ]
        jax.block_until_ready(bufs)
        float(run_k(bufs[-1]))  # compile + warmup per shape
        ts = []
        for b in bufs[:-1]:
            t0 = time.perf_counter()
            float(run_k(b))
            ts.append(time.perf_counter() - t0)
        medians[k] = float(np.median(ts))

    per_call = (medians[k_hi] - medians[k_lo]) / (k_hi - k_lo)
    if per_call < 1e-3:  # slope under timer noise: conservative fallback
        per_call = medians[k_hi] / k_hi
    audio_seconds = batch * n / sr
    xrt = audio_seconds / per_call
    print(
        json.dumps(
            {
                "metric": "two_stage_xrt_per_chip",
                "value": round(xrt, 1),
                "unit": "x_realtime",
                "vs_baseline": round(xrt / 1000.0, 3),
                "pipeline_ms": round(per_call * 1e3, 2),
                "dispatch_floor_ms": round(
                    max(medians[k_lo] - k_lo * per_call, 0.0) * 1e3, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    # the axon remote-compile tunnel intermittently fails fresh compiles
    # with UNIMPLEMENTED; compiled programs are cached, so a retry succeeds.
    last_err = None
    for _ in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last_err = e
            time.sleep(5)
    else:
        raise last_err
