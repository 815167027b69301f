"""Benchmark suite driver: every BASELINE config as one JSON line each,
headline (two-stage xRT per chip) printed LAST with a 3-run spread.

Round-5 hardening (VERDICT r4 item 1 — the round-4 driver run timed out
at rc=124 with no headline of record): a 1-rep QUICK headline is printed
FIRST (so a killed run still has a two_stage_xrt_per_chip line on
stdout), every completed line is PERSISTED to
``benchmarks/results/bench_live.jsonl`` as it finishes (a killed run
leaves its completed configs in the repo for the round snapshot), the
suite runs high-value configs first (5,6,7,8 — the ones round 4 lost),
and the suite budget is dynamic: it reserves headline time out of a
TOTAL_BUDGET_S envelope sized with >=25% margin under the observed
driver timeout.

Runs the flagship pipeline — stage-1 partitioned-block frequency-domain
Kalman + stage-2 LittleNet post-filter — over batches of 16 kHz utterances
on one chip, plus the full config suite (benchmarks/baseline_configs.py):
NLMS / Kalman / stage-2 single-stream, batched features, multichip-sharded
two-stage, concurrent serving streams, TRAINING throughput, and the
non-flagship model zoo. The LAST stdout line is the headline metric (what
the round driver parses), with a compact per-config summary embedded under
``"suite"`` so the whole run is captured even if only that line survives.

Timing notes (this image's axon relay):
- every dispatch pays a ~25 ms (NONSTATIONARY, observed 20-50 ms)
  host<->TPU round trip, so all metrics are two-point slopes over k
  repetitions executed sequentially inside one program (lax.scan), which
  cancels the constant dispatch term;
- identical executions may be memoized and ``block_until_ready`` can return
  early, so every repetition consumes DISTINCT on-device jax.random inputs
  and the result is reduced to a scalar fetched to host;
- inputs are generated on device (no multi-GB host uploads).

``--check``: perf-bar regression guard — asserts configs #1-#3 clear the
1000x north star and that the default TPU routing really hits the fused
Pallas kernels (compiled HLO contains the custom call); exits nonzero on
violation.

``--quality``: also run the default-path quality knob comparison (parity
vs fast headline).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Total stdout envelope for quick headline + suite + final headline.
# The round-4 driver killed bench.py somewhere past ~45-50 min (rc=124
# after config #5 on a cold remote-compile cache); 40 min leaves >=25%
# margin under a 55-60 min external timeout. The suite budget is derived
# from this minus elapsed minus a reserve for the final headline.
TOTAL_BUDGET_S = 40 * 60
HEADLINE_RESERVE_S = 7 * 60  # final full-spread headline, warm cache
PERSIST_PATH = "benchmarks/results/bench_live.jsonl"


def _persist(line: dict) -> None:
    """Append one result line to the live artifact (survives a kill)."""
    try:
        import os

        os.makedirs(os.path.dirname(PERSIST_PATH), exist_ok=True)
        with open(PERSIST_PATH, "a") as f:
            f.write(json.dumps(line) + "\n")
    except OSError:
        pass  # persistence must never kill the bench run


def emit(line: dict) -> None:
    print(json.dumps(line), flush=True)
    _persist(line)


def headline(reps: int = 5, quality: str = "parity") -> dict:
    """Two-stage xRT per chip (slope method), at the given quality knob."""
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
        # to the fused batch-in-lanes Pallas kernels. quality="parity"
        # (production default) = dot_mode balanced (<=0.006 dB tail-ERLE
        # deviation on all 8 scenes); "fast" = per-op mixed
        # (benchmarks/validate_precision.py)
        out = two_stage_cancel(params, far, mic, erb, stage1="kalman",
                               quality=quality)
        return jnp.sum(out["wav"])

    @jax.jit
    def run_k(fm):  # (k, 2, batch, n) -> checksum; k sequential runs
        def body(c, x):
            return c + pipeline(x[0], x[1]), None

        return jax.lax.scan(body, jnp.float32(0.0), fm)[0]

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def gen(key, k):  # distinct on-device inputs per repetition
        return jax.random.normal(key, (k, 2, batch, n), jnp.float32)

    key = jax.random.PRNGKey(42)
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
        medians[k] = ts

    # 3 independent slope estimates -> median + spread (the tunnel latency
    # is nonstationary; a single 2-point slope can swing tens of percent)
    n_est = min(len(medians[k_lo]), len(medians[k_hi]), 3)
    slopes = [
        (medians[k_hi][i] - medians[k_lo][i]) / (k_hi - k_lo)
        for i in range(n_est)
    ]
    slopes = [s for s in slopes if s > 1e-3] or [
        float(np.median(medians[k_hi])) / k_hi
    ]
    per_call = float(np.median(slopes))
    audio_seconds = batch * n / sr
    xrt = audio_seconds / per_call
    return {
        "metric": "two_stage_xrt_per_chip",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1000.0, 3),
        "quality": quality,
        "pipeline_ms": round(per_call * 1e3, 2),
        "pipeline_ms_spread": [round(s * 1e3, 2) for s in sorted(slopes)],
        "dispatch_floor_ms": round(
            max(float(np.median(medians[k_lo])) - k_lo * per_call, 0.0) * 1e3, 1
        ),
    }


def run_suite(configs: str, small: bool, deadline: float | None = None) -> dict:
    """Run benchmarks.baseline_configs configs; returns {id: result|error}.

    ``deadline`` is an absolute time.monotonic() cutoff: configs not yet
    STARTED by then are skipped (the final headline must still fit).
    """
    from benchmarks import baseline_configs
    from benchmarks.baseline_configs import BENCHES

    # visible to multi-stage configs (#7) so a single config's optional
    # stages can't bust the envelope from INSIDE a BENCHES call
    baseline_configs.DEADLINE = deadline

    suite = {}
    for c in configs.split(","):
        c = c.strip()
        if not c:
            continue
        if deadline is not None and time.monotonic() > deadline:
            suite[c] = {"skipped": "suite time budget exceeded"}
            emit({"config": c, **suite[c]})
            continue
        t0 = time.monotonic()
        try:
            r = BENCHES[c](small=small)
            r["t_s"] = round(time.monotonic() - t0, 1)
            suite[c] = r
            emit(r)
        except Exception as e:  # noqa: BLE001 - one config must not kill the run
            suite[c] = {"error": f"{type(e).__name__}: {e}"[:200]}
            emit({"config": c, **suite[c]})
    return suite


def check(routing_only: bool = False) -> int:
    """Perf-bar + routing regression guard (VERDICT r2 item 8).

    The routing assertion (fused Pallas kernels present in the lowered HLO
    of the default calls) takes ~2 s. The perf bars re-run configs #1-#3,
    which on a COLD remote-compile cache costs 15-30 min on this image's
    tunnel (compile-bound, not execution-bound) — pass ``--routing-only``
    for the instant subset."""
    failures = []
    if jax.default_backend() == "tpu":
        # the default path must route to the fused Pallas kernels
        from aec_tpu.configs import KalmanConfig, NlmsConfig
        from aec_tpu.linear.kalman import kalman_cancel
        from aec_tpu.linear.nlms import nlms_cancel

        far = jnp.zeros((4096,), jnp.float32)
        for name, fn, cfg in (
            ("kalman", kalman_cancel, KalmanConfig()),
            ("nlms", nlms_cancel, NlmsConfig()),
        ):
            # lowered (StableHLO) text, NOT compiled: lowering is local and
            # instant, while a remote compile takes minutes on this tunnel;
            # the Pallas kernel shows up as the tpu_custom_call target
            hlo = (
                jax.jit(lambda f, m, fn=fn, cfg=cfg: fn(cfg, f, m)["wav"])
                .lower(far, far)
                .as_text()
            )
            if "tpu_custom_call" not in hlo:
                failures.append(f"{name}: fused kernel NOT in lowered HLO")

        # batched two-stage routing: quality='fast' must lower to ONE fused
        # kernel (the single two-stage kernel), 'parity' to the two-kernel
        # composition (stage-1 high + fused stage-2)
        from aec_tpu.dsp.erb import erb_filterbank
        from aec_tpu.models.little_net import little_net_init
        from aec_tpu.pipeline.two_stage import two_stage_cancel

        params = little_net_init(jax.random.PRNGKey(0))
        erb = jnp.asarray(erb_filterbank())
        farb = jnp.zeros((8, 4096), jnp.float32)
        for q, want in (("fast", 1), ("parity", 2)):
            hlo = (
                jax.jit(
                    lambda f, m, q=q: two_stage_cancel(
                        params, f, m, erb, quality=q
                    )["wav"]
                )
                .lower(farb, farb)
                .as_text()
            )
            got = hlo.count("tpu_custom_call")
            if got != want:
                failures.append(
                    f"two_stage quality={q}: {got} fused kernels in lowered"
                    f" HLO, expected {want}"
                )
        print(json.dumps({"routing": "fail" if failures else "ok"}), flush=True)
        if not routing_only:
            from benchmarks.baseline_configs import BENCHES

            for c in ("1", "2", "3"):
                r = BENCHES[c]()
                print(json.dumps(r), flush=True)
                if r["value"] < 1000.0:
                    failures.append(
                        f"config #{c} {r['metric']} = {r['value']} < 1000x"
                    )
    else:
        print(json.dumps({"check": "skipped (backend != tpu)"}))
    for f in failures:
        print("CHECK-FAIL:", f, flush=True)
    print(json.dumps({"check": "fail" if failures else "ok",
                      "failures": failures}))
    return 1 if failures else 0


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    # high-value configs (5 two-stage, 6 serving, 7 training, 8 zoo —
    # the rows the round-4 timeout lost) run FIRST; the cheap singles
    # last so a budget skip costs the least-informative rows
    p.add_argument("--configs", default="5,6,7,8,4,1,2,3")
    p.add_argument("--small", action="store_true")
    p.add_argument("--check", action="store_true")
    p.add_argument("--routing-only", action="store_true",
                   help="with --check: just the instant HLO routing guard")
    p.add_argument("--quality", action="store_true",
                   help="also measure the fast-mode headline")
    p.add_argument("--headline-only", action="store_true")
    args = p.parse_args(argv)

    if args.check:
        raise SystemExit(check(routing_only=args.routing_only))

    t0 = time.monotonic()
    # QUICK headline first: a killed run still has the round's metric on
    # stdout and in the live artifact (it also pre-warms the exact
    # compile shapes the final full-spread headline needs)
    quick = headline(reps=1)
    quick["phase"] = "quick"
    emit(quick)

    suite = {}
    if not args.headline_only:
        deadline = t0 + TOTAL_BUDGET_S - HEADLINE_RESERVE_S
        suite = run_suite(args.configs, args.small, deadline=deadline)
    if args.quality:
        fast = headline(reps=3, quality="fast")
        suite["headline_fast"] = fast
        emit(fast)

    head = headline()
    # compact per-config summary embedded in the (last) headline line
    head["suite"] = {
        k: {kk: v[kk] for kk in ("metric", "value", "unit") if kk in v}
        if isinstance(v, dict) and "metric" in v
        else v
        for k, v in suite.items()
    }
    head["t_total_s"] = round(time.monotonic() - t0, 1)
    emit(head)


if __name__ == "__main__":
    _persist({"run_start": time.strftime("%Y-%m-%dT%H:%M:%S")})
    # the axon remote-compile tunnel intermittently fails fresh compiles
    # with UNIMPLEMENTED; compiled programs are cached, so a retry succeeds.
    last_err = None
    for _ in range(3):
        try:
            main()
            break
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            last_err = e
            time.sleep(5)
    else:
        raise last_err
