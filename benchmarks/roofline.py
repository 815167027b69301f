"""Speed-of-light (roofline) model for the production Pallas kernels.

Counts, from the ACTUAL dot shapes in kernels/bl_common.py and
kernels/pallas_{kalman,nlms,two_stage}.py, the MXU work of one batched
block/frame step, scales to the headline shape (batch 256 x 8.19 s), and
compares the resulting compute floor against the measured same-process
timings (benchmarks/results/ab_balanced_time_r3.json). Two accountings:

- ``algo_gflop``: algorithmic fp32 MACs x2 (what an ideal fp32 machine
  would execute once) — hardware-independent.
- ``mxu_ms_floor``: bf16 MXU pass count per routed dot tier
  (bl_common.stage1_dots) x PADDED matmul dims (the MXU pads every matmul
  dim to 128 lanes / 8 sublanes; the k1 split already removes the worst
  257->384 contraction pad on the c/fb sites) / 197 TFLOPS bf16 (v5e).

The gap between mxu_ms_floor and the measured time is the honest
"distance from speed-of-light": sequential-grid scheduling, VPU
elementwise work (predict/gain/psi updates on (K, L*tile) grids), operand
hi/lo splitting, DMA of the far/mic blocks, and Mosaic pipeline bubbles.

Run on any backend (pure arithmetic): python -m benchmarks.roofline
"""

from __future__ import annotations

import json

# v5e public peaks
BF16_TFLOPS = 197.0
HBM_GBPS = 819.0

B = 256            # block / hop
K = 257            # rfft bins
KP = 256           # k1-split contraction (Nyquist handled on the VPU)
WIN = 512          # stage-2 window
L = 10             # stage-1 partitions
E = 32             # ERB bands
H = 32             # GRU hidden
TILE = 256         # utterance tile (== headline batch)
STEPS = 512        # blocks per 8.19 s utterance at hop 256


def pad(n: int, to: int) -> int:
    return -(-n // to) * to


def mm(m, k, n, *, padded: bool) -> float:
    """MACs of an (m,k)@(k,n) matmul, optionally MXU-padded."""
    if padded:
        m, k, n = pad(m, 8), pad(k, 128), pad(n, 128)
    return float(m) * k * n


# per-site dot shapes for ONE stage-1 block step at lane-tile TILE
# (kalman_block_step / the NLMS twin share them):
#   x: analysis STFT of the 2B far frame -> K bins        (re + im)
#   y: iDFT of the echo estimate, k1 split (KP contract)  (re + im)
#   e: analysis DFT of the residual block                 (re + im)
#   c: constraint head, k1 split, L partitions wide       (re + im)
#   fb: constraint tail, L partitions wide                (re + im)
STAGE1_SITES = {
    "x": (2, K, 2 * B, TILE),
    "y": (2, B, KP, TILE),
    "e": (2, K, B, TILE),
    "c": (2, B, KP, L * TILE),
    "fb": (2, K, B, L * TILE),
}

# bf16 MXU passes per site per routed tier (bl_common.stage1_dots)
PASSES = {
    "high": {"x": 3, "y": 3, "e": 3, "c": 3, "fb": 3},
    "balanced": {"x": 3, "y": 3, "e": 1, "c": 2, "fb": 2},
    "lean": {"x": 2, "y": 2, "e": 1, "c": 2, "fb": 2},
    "mixed": {"x": 3, "y": 3, "e": 1, "c": 1, "fb": 1},
}

# stage-2 frame step (stage2_frame_step; all dots single-pass bf16 at the
# production DEFAULT stage-2 tier): count, m, k, n
STAGE2_SITES = [
    (4, K, WIN, TILE),      # sr/si/fr/fi analysis
    (2, E, K, TILE),        # ERB features me/fe
    (1, 3 * H, 2 * E, TILE),  # GRU x-projection
    (1, 3 * H, H, TILE),    # GRU h-projection
    (1, E, 2 * E, TILE),    # head lin1
    (1, E, E, TILE),        # head lin2 (mask)
    (1, K, E, TILE),        # ERB back-projection
    (2, WIN, KP, TILE),     # synthesis iDFT (k1 split)
]


def stage1(mode: str) -> dict:
    algo = sum(c * mm(m, k, n, padded=False)
               for c, m, k, n in STAGE1_SITES.values())
    passes = sum(PASSES[mode][s] * c * mm(m, k, n, padded=True)
                 for s, (c, m, k, n) in STAGE1_SITES.items())
    return _scale(algo, passes)


def stage2() -> dict:
    algo = sum(c * mm(m, k, n, padded=False) for c, m, k, n in STAGE2_SITES)
    passes = sum(c * mm(m, k, n, padded=True) for c, m, k, n in STAGE2_SITES)
    return _scale(algo, passes)


def _scale(algo_macs_step: float, pass_macs_step: float) -> dict:
    algo_gf = 2 * algo_macs_step * STEPS / 1e9
    mxu_gf = 2 * pass_macs_step * STEPS / 1e9
    return {
        "algo_gflop_batch": round(algo_gf, 1),
        "mxu_bf16_gflop_batch": round(mxu_gf, 1),
        "mxu_ms_floor": round(mxu_gf / BF16_TFLOPS, 2),
    }


def main() -> None:
    # HBM floor: far+mic in, wav out, fp32, batch 256 x 128k samples
    io_bytes = 3 * TILE * STEPS * B * 4
    hbm_ms = io_bytes / (HBM_GBPS * 1e9) * 1e3

    # measured same-process values (ab_balanced_time_r3.json, process C/D;
    # see that artifact for the cross-process spread)
    measured = {
        ("stage1_kalman", "balanced"): 14.47,
        ("stage1_kalman", "mixed"): 11.29,
        ("stage1_kalman", "high"): 19.5,   # process A
        ("stage1_nlms", "balanced"): 14.65,  # mean of u1/u2, process D
        ("stage1_nlms", "mixed"): 10.51,
        ("two_stage_single", "mixed"): 14.6,
        ("two_stage_single", "balanced"): 17.86,
    }

    out = {"hbm_io_ms_floor": round(hbm_ms, 2), "kernels": {}}
    s2 = stage2()
    for mode in ("high", "balanced", "lean", "mixed"):
        s1 = stage1(mode)
        for name in ("stage1_kalman", "stage1_nlms"):
            ms = measured.get((name, mode))
            out["kernels"][f"{name}_{mode}"] = {
                **s1,
                "measured_ms": ms,
                "pct_of_sol": round(100 * s1["mxu_ms_floor"] / ms, 1)
                if ms else None,
            }
        ts = {
            k: round(s1[k] + s2[k], 2) if "ms" in k else round(s1[k] + s2[k], 1)
            for k in s1
        }
        ms = measured.get(("two_stage_single", mode))
        out["kernels"][f"two_stage_single_{mode}"] = {
            **ts,
            "measured_ms": ms,
            "pct_of_sol": round(100 * ts["mxu_ms_floor"] / ms, 1) if ms else None,
        }
    out["kernels"]["stage2_little_net"] = s2
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
