"""The five BASELINE.json benchmark configs, each printing one JSON line.

  python -m benchmarks.baseline_configs [--configs 1,2,3,4,5] [--small]

1. Freq-domain NLMS, one 16 kHz far/mic pair (512-pt FFT, hop/block 256)
2. Partitioned-block frequency-domain Kalman, 10-block partition, 1 utt
3. Stage-2 neural post-filter inference, one utterance
4. Batched feature extraction, 1k utterance pairs, vmapped on device
5. Full two-stage pipeline (Kalman + LittleNet) over a large utterance set,
   utterance axis sharded over all available chips (data parallel)

All timings use distinct input buffers per iteration and force completion
with a host readback (see bench.py notes). Metrics are realtime factors
(audio-seconds per wall-second) except #4 (utterances/second).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.linear.nlms import nlms_cancel
from aec_tpu.models.little_net import little_net_apply, little_net_init
from aec_tpu.pipeline.features import extract_features

SR = 16000


def _time(fn, inputs_list) -> float:
    """Median seconds/call over distinct inputs, scalar-readback forced."""
    float(fn(*inputs_list[-1]))  # compile + warmup
    times = []
    for inputs in inputs_list[:-1]:
        t0 = time.perf_counter()
        float(fn(*inputs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _wav_pairs(rng, count, batch, n):
    return [
        (
            jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32)),
        )
        for _ in range(count)
    ]


def bench_nlms(small=False) -> dict:
    n = 16 * SR if not small else 2 * SR
    n = n // 256 * 256
    rng = np.random.default_rng(0)
    fn = jax.jit(lambda f, m: jnp.sum(nlms_cancel(NlmsConfig(), f, m)["wav"]))
    pairs = [(f[0], m[0]) for f, m in _wav_pairs(rng, 4, 1, n)]
    dt = _time(fn, pairs)
    return {"metric": "nlms_single_pair_xrt", "value": round(n / SR / dt, 1),
            "unit": "x_realtime", "vs_baseline": None}


def bench_kalman(small=False) -> dict:
    n = 16 * SR if not small else 2 * SR
    n = n // 256 * 256
    rng = np.random.default_rng(1)
    fn = jax.jit(lambda f, m: jnp.sum(kalman_cancel(KalmanConfig(), f, m)["wav"]))
    pairs = [(f[0], m[0]) for f, m in _wav_pairs(rng, 4, 1, n)]
    dt = _time(fn, pairs)
    return {"metric": "kalman_10block_single_utt_xrt", "value": round(n / SR / dt, 1),
            "unit": "x_realtime", "vs_baseline": None}


def bench_stage2(small=False) -> dict:
    n = 16 * SR if not small else 2 * SR
    n = n // 256 * 256
    rng = np.random.default_rng(2)
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    fn = jax.jit(
        lambda m, f: jnp.sum(
            little_net_apply(params, m, f, erb, normalize=False)["wav"]
        )
    )
    pairs = [(f, m) for f, m in _wav_pairs(rng, 4, 1, n)]
    dt = _time(fn, pairs)
    return {"metric": "stage2_single_utt_xrt", "value": round(n / SR / dt, 1),
            "unit": "x_realtime", "vs_baseline": None}


def bench_features_1k(small=False) -> dict:
    n_utts = 1024 if not small else 32
    chunk = 256 if not small else 16
    n = 8 * SR // 256 * 256
    rng = np.random.default_rng(3)
    erb = jnp.asarray(erb_filterbank())
    scfg = StftConfig()

    fn = jax.jit(
        lambda m, f, nr: jnp.sum(
            extract_features(m, f, nr, erb, scfg)["gru_input"]
        )
    )
    batches = [
        tuple(
            jnp.asarray(rng.standard_normal((chunk, n)).astype(np.float32))
            for _ in range(3)
        )
        for _ in range(n_utts // chunk + 1)
    ]
    float(fn(*batches[-1]))
    t0 = time.perf_counter()
    for b in batches[:-1]:
        float(fn(*b))
    dt = time.perf_counter() - t0
    done = chunk * (len(batches) - 1)
    return {"metric": "feature_extraction_1k_utts", "value": round(done / dt, 1),
            "unit": "utts_per_sec", "vs_baseline": None}


def bench_two_stage_multichip(small=False) -> dict:
    """Config #5: utterance-sharded two-stage over all available chips.

    On the single-chip bench host the mesh has one device; the sharding
    path is identical to the multi-chip case (validated on an 8-device CPU
    mesh in tests/test_parallel.py and __graft_entry__.dryrun_multichip)."""
    from aec_tpu.parallel.mesh import data_sharding, make_mesh, replicated

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    batch = (256 if not small else 8) * n_dev
    n = 8 * SR // 256 * 256
    rng = np.random.default_rng(4)
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    scfg, kcfg = StftConfig(), KalmanConfig()

    def pipeline(params, far, mic, erb):
        lin = kalman_cancel(kcfg, far, mic, block=scfg.hop)["wav"]
        wav = little_net_apply(params, lin, far, erb, scfg, normalize=False)["wav"]
        return jnp.sum(wav)

    dsh, rep = data_sharding(mesh), replicated(mesh)
    fn = jax.jit(pipeline, in_shardings=(rep, dsh, dsh, rep))
    pairs = _wav_pairs(rng, 4, batch, n)
    dt = _time(lambda f, m: fn(params, f, m, erb), pairs)
    xrt = batch * n / SR / dt
    return {"metric": "two_stage_multichip_xrt", "value": round(xrt, 1),
            "unit": "x_realtime", "vs_baseline": round(xrt / 1000.0, 3),
            "devices": n_dev}


def bench_concurrent_streams(small=False) -> dict:
    """Serving metric: concurrent realtime streams per chip.

    Advances S live two-stage streaming sessions (Kalman + LittleNet,
    16 ms blocks, vmapped state) one block at a time; a chip sustains the
    load in real time iff the step latency stays under 16 ms. Reported
    capacity = S * (16 ms / measured step)."""
    from aec_tpu.pipeline.streaming import stream_init_batched, stream_step_batched
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.dsp.erb import erb_filterbank

    s = 1024 if not small else 8
    k_steps = 32 if not small else 4
    hop = 256
    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    rng = np.random.default_rng(5)
    state = stream_init_batched(s)
    blocks = [
        (
            jnp.asarray(rng.standard_normal((s, hop)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((s, hop)).astype(np.float32)),
        )
        for _ in range(k_steps)
    ]
    state, out = stream_step_batched(params, state, *blocks[0], erb)
    float(jnp.sum(out))  # compile + warmup
    # chained dispatches, ONE final readback: steps are sequential on device
    # (state dependency); per-dispatch host roundtrips are a property of the
    # bench harness, not the chip.
    t0 = time.perf_counter()
    for f, m in blocks:
        state, out = stream_step_batched(params, state, f, m, erb)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / k_steps
    capacity = s * (hop / 16000.0) / dt
    return {"metric": "concurrent_realtime_streams_per_chip", "value": round(capacity, 1),
            "unit": "streams", "vs_baseline": None, "step_ms": round(dt * 1e3, 3),
            "batch_streams": s}


BENCHES = {
    "1": bench_nlms,
    "2": bench_kalman,
    "3": bench_stage2,
    "4": bench_features_1k,
    "5": bench_two_stage_multichip,
    "6": bench_concurrent_streams,
}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", type=str, default="1,2,3,4,5")
    p.add_argument("--small", action="store_true", help="CI-sized shapes")
    args = p.parse_args(argv)
    for c in args.configs.split(","):
        print(json.dumps(BENCHES[c.strip()](small=args.small)))


if __name__ == "__main__":
    main()
