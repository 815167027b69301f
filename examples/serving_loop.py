"""Realtime serving loop on the fused Pallas serving kernel.

Demonstrates the production pattern for kernels/pallas_serving.py
(measured 120k concurrent realtime two-stage sessions per v5e chip — AT
the per-stream state-bandwidth floor, docs/ROOFLINE.md):

1. ``serving_init`` allocates the kernel-layout state for S sessions;
2. each arriving 16 ms block batch is ONE ``serving_step_fused`` call —
   the state argument is DONATED (updated in place in HBM), so the loop
   must rebind it and never reuse a stale reference;
3. sessions that were running on the scan path (pipeline/streaming, e.g.
   because they needed the causal pseudo-norm or NLMS stage 1) can be
   migrated live with ``serving_state_from_stream``.

Run (any backend; on CPU pass --interpret):

  python examples/serving_loop.py [--streams 128] [--blocks 50] [--interpret]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--streams", type=int, default=128)
    p.add_argument("--blocks", type=int, default=50)
    p.add_argument("--tile", type=int, default=128)
    p.add_argument("--interpret", action="store_true",
                   help="run the kernel in interpret mode (CPU)")
    args = p.parse_args()

    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.kernels.pallas_serving import serving_init, serving_step_fused
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.train import checkpoints

    hop, sr = 256, 16000
    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "checkpoints", "little_net_general.npz"
    )
    params = little_net_init(jax.random.PRNGKey(0))
    if os.path.isfile(ckpt):
        params = checkpoints.restore(ckpt, {"params": params})["params"]
    erb = jnp.asarray(erb_filterbank())

    s = args.streams
    tile = min(args.tile, s)
    state = serving_init(s, tile=tile)

    # synthetic echo sessions: per-stream random RIR, shared far source
    rng = np.random.default_rng(0)
    n = args.blocks * hop
    far = rng.standard_normal((s, n)).astype(np.float32) * 0.3
    rirs = (
        np.exp(-np.arange(256) / 48.0)[None]
        * rng.standard_normal((s, 256))
    ).astype(np.float32) * 0.5
    mic = np.stack(
        [np.convolve(far[i], rirs[i])[:n] for i in range(s)]
    ).astype(np.float32)

    out = np.zeros_like(mic)
    lat = []
    for t in range(args.blocks):
        fb = jnp.asarray(far[:, t * hop : (t + 1) * hop])
        mb = jnp.asarray(mic[:, t * hop : (t + 1) * hop])
        t0 = time.perf_counter()
        # state is DONATED: rebind, never touch the old reference again
        state, blk = serving_step_fused(
            params, state, fb, mb, erb, interpret=args.interpret,
            # CPU interpret mode cannot execute the balanced tier's bf16
            # dots (DotThunk); "high" is the like-for-like parity grade
            dot_mode="high" if args.interpret else "balanced",
        )
        blk = np.asarray(blk)  # host readback == block completion
        lat.append(time.perf_counter() - t0)
        if t:  # one-hop output lag; the t=0 emission is the trimmed edge
            out[:, (t - 1) * hop : t * hop] = blk

    half = n // 2
    erle = 10 * np.log10(
        (mic[:, half:] ** 2).mean() / max((out[:, half:] ** 2).mean(), 1e-12)
    )
    # live per-session health: the kernel maintains mic/residual power EMAs
    # for free; serving_erle reads them without touching the audio path
    from aec_tpu.kernels.pallas_serving import serving_erle

    live = np.asarray(serving_erle(state))
    print(f"live monitor ERLE (dB): min {live.min():.1f} / "
          f"median {np.median(live):.1f} / max {live.max():.1f}")
    lat_ms = np.asarray(lat[1:]) * 1e3  # drop the compile call
    print(
        f"{s} sessions x {args.blocks} blocks: tail ERLE {erle:.1f} dB | "
        f"block latency p50 {np.percentile(lat_ms, 50):.2f} ms / "
        f"p99 {np.percentile(lat_ms, 99):.2f} ms "
        f"(16 ms realtime budget; on this dev image the axon tunnel adds "
        f"~25 ms per dispatch — see CLAUDE.md — so judge capacity by the "
        f"slope benchmark, benchmarks/ab_serving.py)"
    )


if __name__ == "__main__":
    main()
