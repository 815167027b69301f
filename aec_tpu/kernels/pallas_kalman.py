"""Pallas TPU kernel: fused partitioned-block Kalman AEC scan.

The `lax.scan` formulation (aec_tpu/linear/kalman.py) round-trips the filter
state through XLA's loop machinery every block. Here the WHOLE recursion is
one `pallas_call`: the sequential time grid keeps the state — filter taps,
covariance, far-end ring buffer, noise psd (~0.5 MB) — resident in VMEM
scratch across grid steps, the three per-block DFT transforms are MXU
matmuls against constant basis matrices (see linear/overlap_save._dft_mats),
and each grid step streams in one (1, 2K) far-frame spectrum + one (1, B)
mic block and streams out one (1, B) echo-cancelled block.

Numerics match kalman_step exactly (same equations, fp32); verified in
tests/test_pallas_kalman.py via interpret mode, and against the scan
implementation on-device.

PERFORMANCE FINDING (v5e, corrected in round 2): this kernel is the
single-stream PRODUCTION PATH — **0.95 ms per 16 s utterance (16,778x
realtime) vs 8.1 ms (1,974x) for the XLA `lax.scan` formulation**, an 8.5x
speedup, measured as pure device time by the two-point slope over
sequentially scanned utterances (benchmarks/baseline_configs.py). Round 1
concluded the opposite ("~330x vs ~530x, kernel slower") because both
numbers were dominated by this image's ~25 ms per-dispatch tunnel round trip
— see CLAUDE.md "Performance log". `linear.kalman.kalman_cancel` auto-routes
single-stream TPU calls here; the vmapped scan remains the batched path.

BATCHED KERNEL FINDINGS (v5e, round 2, batch 256 x 512 blocks, slope
method, all same-process A/Bs):

- `kalman_filter_fused_batched` (batch tile in SUBLANES, K=257 bins in
  lanes) loses to the XLA scan at every equal quality tier (kernel 24.9-28.3
  ms vs scan 20.6-21.1 ms at mixed): it pays 50% VPU lane padding
  (257 -> 384) on every K-shaped op and 25% (514 -> 640) on every ri op,
  and is NOT matmul-bound (bf16 vs f32 dot operands measure identical).
- `kalman_filter_fused_batched_bl` (batch AND partitions in LANES, bins in
  sublanes, factored constraint — see its docstring) removes the padding.
  Built up in three measured steps: (a) a 3D-state variant with 4*L narrow
  per-partition (K,K)@(K,128) matmuls per step, 22.6 ms (latency-bound);
  (b) flattening partitions into lanes -> 4 wide N=L*tile matmuls, 21.2 ms
  (scan parity); (c) fusing the far-frame analysis STFT IN-kernel (the XLA
  spectra pass was 9.2 ms at HIGHEST / 6.4 at HIGH, plus a 538 MB frames
  materialization and a 269 MB layout transpose) and splitting the K=257
  contractions via the Nyquist rank-1 trick (precision.dot_*_lhs_k1):
  **12.4 ms vs 20.2 ms for the scan at mixed — the PRODUCTION batched
  path**, auto-routed by `kalman_cancel` for all default TPU calls and
  ERLE-identical to the scan within 0.13 dB on chip. Wins at batch 16
  (4.5 vs 6.4 ms) and 64 (1.8 vs 3.2 ms) too.

Quality per dot_mode is measured in benchmarks/validate_precision.py:
"high" == Precision.HIGH == fp32 ERLE; "mixed" == -0.16 dB worst case;
"bf16" == -1.45 dB worst case (both only on >40 dB-ERLE scenes).

ROUND-3 "native" mode: Mosaic DOES honor `precision=HIGHEST` on in-kernel
`lax.dot_general` (jax.lax.Precision.HIGH is rejected — that rejection is
why the manual bf16_3x split exists). It is EXACT fp32: 2.6e-7 max rel vs
the fp32 scan measured ON CHIP, slightly better than the 3x split. But it
is SLOWER than the split on this v5e (32.1 ms at its best config
tile=128/u1 vs 23.7 ms for "high" at 64/u2; 128/u2 fails remote compile) —
HIGHEST lowers to a 6-pass bf16 expansion vs the split's 3 passes, and the
larger tile doesn't recover the gap. Kept as the on-chip exactness oracle
(the fused_native column in benchmarks/validate_precision.py), not a
routed production mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aec_tpu.configs import KalmanConfig
from aec_tpu.kernels import bl_common as bl
from aec_tpu.kernels import precision as prec
from aec_tpu.linear import overlap_save as ols


def _kernel(cfg: KalmanConfig, k: int, block: int, unroll: int, dot_mode: str):
    a, a2 = cfg.a, cfg.a * cfg.a
    obs, floor = cfg.obs_smooth, cfg.psi_floor
    # "mixed": only the cancellation-critical y transform runs bf16_3x
    # (see linear/kalman.kalman_step docstring); residual/update run 1-pass.
    # not matmul-bound here: "balanced" just takes the full 3-pass tier
    dot_y = prec.dot_high if dot_mode != "bf16" else prec.dot_fast
    dot_r = (
        prec.dot_high if dot_mode in ("high", "balanced") else prec.dot_fast
    )

    def kernel(x_ref, d_ref, inv_hi, inv_lo, fwd_hi, fwd_lo, con_hi, con_lo,
               e_ref, wr, wi, p, xb, psi):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            wr[:] = jnp.zeros_like(wr)
            wi[:] = jnp.zeros_like(wi)
            p[:] = jnp.full_like(p, cfg.init_p)
            xb[:] = jnp.zeros_like(xb)
            psi[:] = jnp.full_like(psi, floor)

        # ``unroll`` sequential block updates per grid step (amortizes the
        # per-grid-step dispatch/DMA overhead; the recursion stays exact).
        for u in range(unroll):
            # push newest far-frame spectrum into the ring buffer
            x_new = jnp.concatenate([x_ref[0, u : u + 1], xb[:-1, :]], axis=0)
            xb[:] = x_new
            xr, xi = x_new[:, :k], x_new[:, k:]

            # predict
            wr_p, wi_p = a * wr[:], a * wi[:]
            p_pred = (
                a2 * p[:] + (1.0 - a2) * (wr[:] * wr[:] + wi[:] * wi[:])
                + cfg.q_min
            )

            # prior residual: y = sum_l W X (complex); time block via matmul
            yr = jnp.sum(wr_p * xr - wi_p * xi, axis=0, keepdims=True)  # (1, K)
            yi = jnp.sum(wr_p * xi + wi_p * xr, axis=0, keepdims=True)
            y_ri = jnp.concatenate([yr, yi], axis=1)  # (1, 2K)
            y_blk = dot_y(y_ri, inv_hi, inv_lo)
            e_blk = d_ref[0, u : u + 1] - y_blk  # (1, B)
            e_ref[0, u : u + 1] = e_blk
            e_ri = dot_r(e_blk, fwd_hi, fwd_lo)
            er, ei = e_ri[:, :k], e_ri[:, k:]  # (1, K)

            psi_new = jnp.maximum(
                obs * psi[:] + (1.0 - obs) * (er * er + ei * ei), floor
            )
            psi[:] = psi_new

            # gain + constrained update
            x2 = xr * xr + xi * xi  # (L, K)
            den = jnp.sum(x2 * p_pred, axis=0, keepdims=True) + 2.0 * psi_new
            er_d, ei_d = er / den, ei / den
            gr = p_pred * (xr * er_d + xi * ei_d)
            gi = p_pred * (xr * ei_d - xi * er_d)
            upd = dot_r(jnp.concatenate([gr, gi], axis=1), con_hi, con_lo)  # (L, 2K)
            wr[:] = wr_p + upd[:, :k]
            wi[:] = wi_p + upd[:, k:]
            p[:] = jnp.maximum(p_pred * (1.0 - p_pred * x2 / den), floor)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "interpret", "unroll", "dot_mode")
)
def kalman_filter_fused(
    cfg: KalmanConfig,
    x_ri: jax.Array,  # (T, 2K) far-frame spectra, [re || im]
    d_blocks: jax.Array,  # (T, B) mic blocks
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int = 1,
    dot_mode: str = "high",
) -> jax.Array:
    """Run the full Kalman recursion in one Pallas kernel -> e blocks (T, B).

    ``unroll`` blocks are processed per grid step (T is padded up to a
    multiple; the filter update per block is unchanged).
    """
    t_steps, two_k = x_ri.shape
    k = two_k // 2
    fwd, inv_tail, constrain = ols._dft_mats(block)
    l = cfg.n_blocks
    t_pad = (-t_steps) % unroll
    if t_pad:
        x_ri = jnp.pad(x_ri, [(0, t_pad), (0, 0)])
        d_blocks = jnp.pad(d_blocks, [(0, t_pad), (0, 0)])
    t_total = t_steps + t_pad

    const = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel(cfg, k, block, unroll, dot_mode),
        grid=(t_total // unroll,),
        in_specs=[
            pl.BlockSpec((1, unroll, two_k), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, unroll, block), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            const(two_k, block),
            const(two_k, block),
            const(block, two_k),
            const(block, two_k),
            const(two_k, two_k),
            const(two_k, two_k),
        ],
        out_specs=pl.BlockSpec(
            (1, unroll, block), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_total // unroll, unroll, block), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l, k), jnp.float32),  # wr
            pltpu.VMEM((l, k), jnp.float32),  # wi
            pltpu.VMEM((l, k), jnp.float32),  # p
            pltpu.VMEM((l, two_k), jnp.float32),  # x ring buffer (ri)
            pltpu.VMEM((1, k), jnp.float32),  # psi
        ],
        interpret=interpret,
    )(
        x_ri.astype(jnp.float32).reshape(t_total // unroll, unroll, two_k),
        d_blocks.astype(jnp.float32).reshape(t_total // unroll, unroll, block),
        *prec.split_hi_lo(inv_tail),
        *prec.split_hi_lo(fwd[block:, :]),
        *prec.split_hi_lo(constrain),
    )
    return out.reshape(t_total, block)[:t_steps]


def _kernel_batched(
    cfg: KalmanConfig, k: int, tile: int, l: int, unroll: int, dot_mode: str
):
    """Batched variant: ``tile`` utterances advance together per grid step.

    State layout is L-major flat — (L*tile, K) with partition l of utterance
    j at row ``l*tile + j`` — so the ring-buffer push is a ``tile``-row shift,
    per-partition reductions are a leading-dim reshape + sum, and the
    constrained update is ONE (L*tile, 2K) x (2K, 2K) MXU matmul (bigger
    operands than the single-stream kernel -> better systolic utilization).

    ``dot_mode``: "high" (default) runs every DFT matmul as an explicit
    bf16_3x decomposition — numerically equivalent to the scan path's
    ``Precision.HIGH``, which is measured ERLE-identical to full fp32
    (kernels/precision.py has the background: Mosaic would otherwise degrade
    f32 dots to single-pass bf16, costing up to 1.45 dB tail-ERLE). "bf16"
    is the single-pass variant (Precision.DEFAULT equivalent).
    """
    a, a2 = cfg.a, cfg.a * cfg.a
    obs, floor = cfg.obs_smooth, cfg.psi_floor
    # "mixed": only the cancellation-critical y transform runs bf16_3x
    # (see linear/kalman.kalman_step docstring); residual/update run 1-pass.
    # not matmul-bound here: "balanced" just takes the full 3-pass tier
    dot_y = prec.dot_high if dot_mode != "bf16" else prec.dot_fast
    dot_r = (
        prec.dot_high if dot_mode in ("high", "balanced") else prec.dot_fast
    )

    def kernel(x_ref, d_ref, inv_hi, inv_lo, fwd_hi, fwd_lo, con_hi, con_lo,
               e_ref, wr, wi, p, xb, psi):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            wr[:] = jnp.zeros_like(wr)
            wi[:] = jnp.zeros_like(wi)
            p[:] = jnp.full_like(p, cfg.init_p)
            xb[:] = jnp.zeros_like(xb)
            psi[:] = jnp.full_like(psi, floor)

        for u in range(unroll):
            # push newest far-frame spectra (tile rows) into the ring buffer
            x_new = jnp.concatenate([x_ref[0, 0, u], xb[:-tile, :]], axis=0)
            xb[:] = x_new
            xr, xi = x_new[:, :k], x_new[:, k:]  # (L*tile, K)

            # predict
            wr_p, wi_p = a * wr[:], a * wi[:]
            p_pred = (
                a2 * p[:] + (1.0 - a2) * (wr[:] * wr[:] + wi[:] * wi[:])
                + cfg.q_min
            )

            # prior residual: y = sum_l W X per utterance, time block via MXU
            yr = jnp.sum((wr_p * xr - wi_p * xi).reshape(l, tile, k), axis=0)
            yi = jnp.sum((wr_p * xi + wi_p * xr).reshape(l, tile, k), axis=0)
            y_ri = jnp.concatenate([yr, yi], axis=1)  # (tile, 2K)
            y_blk = dot_y(y_ri, inv_hi, inv_lo)
            e_blk = d_ref[0, 0, u] - y_blk  # (tile, B)
            e_ref[0, 0, u] = e_blk
            e_ri = dot_r(e_blk, fwd_hi, fwd_lo)
            er, ei = e_ri[:, :k], e_ri[:, k:]  # (tile, K)

            psi_new = jnp.maximum(
                obs * psi[:] + (1.0 - obs) * (er * er + ei * ei), floor
            )
            psi[:] = psi_new

            # gain + constrained update
            x2 = xr * xr + xi * xi  # (L*tile, K)
            den = (
                jnp.sum((x2 * p_pred).reshape(l, tile, k), axis=0) + 2.0 * psi_new
            )  # (tile, K)
            er_d = jnp.tile(er / den, (l, 1))  # L-major broadcast -> (L*tile, K)
            ei_d = jnp.tile(ei / den, (l, 1))
            gr = p_pred * (xr * er_d + xi * ei_d)
            gi = p_pred * (xr * ei_d - xi * er_d)
            upd = dot_r(jnp.concatenate([gr, gi], axis=1), con_hi, con_lo)  # (L*tile, 2K)
            wr[:] = wr_p + upd[:, :k]
            wi[:] = wi_p + upd[:, k:]
            den_l = jnp.tile(den, (l, 1))
            p[:] = jnp.maximum(p_pred * (1.0 - p_pred * x2 / den_l), floor)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block", "interpret", "unroll", "tile", "dot_mode"),
)
def kalman_filter_fused_batched(
    cfg: KalmanConfig,
    x_ri: jax.Array,  # (BATCH, T, 2K) far-frame spectra, [re || im]
    d_blocks: jax.Array,  # (BATCH, T, B) mic blocks
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int = 4,
    tile: int = 16,
    dot_mode: str = "high",
) -> jax.Array:
    """Batched fused Kalman: grid (batch_tiles, T/unroll), VMEM state.

    Each batch tile's full state (~53 KB/utterance) stays VMEM-resident
    across its whole time axis; HBM traffic per step is just the streamed
    far spectrum + mic block in and the echo-cancelled block out. Returns
    e blocks (BATCH, T, B). Numerics identical to the scan path modulo MXU
    matmul rounding (verified in tests/test_pallas_kalman.py).
    """
    batch, t_steps, two_k = x_ri.shape
    k = two_k // 2
    fwd, inv_tail, constrain = ols._dft_mats(block)
    l = cfg.n_blocks

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    t_pad = (-t_steps) % unroll
    if b_pad or t_pad:
        x_ri = jnp.pad(x_ri, [(0, b_pad), (0, t_pad), (0, 0)])
        d_blocks = jnp.pad(d_blocks, [(0, b_pad), (0, t_pad), (0, 0)])
    bt = (batch + b_pad) // tile
    t_total = t_steps + t_pad

    def tm(a, w):  # (B, T, W) -> (bt, T/unroll, unroll, tile, W) time-major
        a = a.astype(jnp.float32).reshape(bt, tile, t_total, w)
        a = jnp.swapaxes(a, 1, 2)  # (bt, T, tile, W)
        return a.reshape(bt, t_total // unroll, unroll, tile, w)

    step = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, unroll, tile, w), lambda b, t: (b, t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        _kernel_batched(cfg, k, tile, l, unroll, dot_mode),
        grid=(bt, t_total // unroll),
        in_specs=[
            step(two_k),
            step(block),
            whole(two_k, block),
            whole(two_k, block),
            whole(block, two_k),
            whole(block, two_k),
            whole(two_k, two_k),
            whole(two_k, two_k),
        ],
        out_specs=step(block),
        out_shape=jax.ShapeDtypeStruct(
            (bt, t_total // unroll, unroll, tile, block), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((l * tile, k), jnp.float32),  # wr
            pltpu.VMEM((l * tile, k), jnp.float32),  # wi
            pltpu.VMEM((l * tile, k), jnp.float32),  # p
            pltpu.VMEM((l * tile, two_k), jnp.float32),  # x ring buffer (ri)
            pltpu.VMEM((tile, k), jnp.float32),  # psi
        ],
        interpret=interpret,
    )(
        tm(x_ri, two_k),
        tm(d_blocks, block),
        *prec.split_hi_lo(inv_tail),
        *prec.split_hi_lo(fwd[block:, :]),
        *prec.split_hi_lo(constrain),
    )
    # (bt, T/unroll, unroll, tile, B) -> (BATCH, T, B)
    out = jnp.swapaxes(
        out.reshape(bt, t_total, tile, block), 1, 2
    ).reshape(bt * tile, t_total, block)
    return out[:batch, :t_steps]


def kalman_cancel_fused_batched(
    cfg: KalmanConfig,
    far: jax.Array,  # [BATCH, n]
    mic: jax.Array,
    *,
    block: int = 256,
    interpret: bool = False,
    tile: int = 16,
    unroll: int = 4,
    dot_mode: str = "high",
) -> dict[str, jax.Array]:
    """Waveform in/out batched canceller on the batched fused kernel."""
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    x_ri = ols.far_end_spectra(farp, block)
    d_blocks = micp.reshape(micp.shape[0], -1, block)
    e = kalman_filter_fused_batched(
        cfg, x_ri, d_blocks, block=block, interpret=interpret, tile=tile,
        unroll=unroll, dot_mode=dot_mode,
    )
    return {"wav": e.reshape(e.shape[0], -1)[:, :n]}


def _kernel_batched_bl(
    cfg: KalmanConfig, k: int, tile: int, l: int, unroll: int, dot_mode: str,
    t_inner: int = 1, constrain_every: int = 1, vpu_opt: bool = False,
):
    """Batch-in-LANES variant: utterances AND partitions ride the lane axis.

    The first batched kernel (:func:`_kernel_batched`) keeps the batch tile
    in sublanes and the K=257 bins in lanes, so every VPU op pads 257 -> 384
    lanes (50% waste) and every ri array 514 -> 640 (25%). Here the layout
    is flipped the TPU-first way: per-partition state is (K, L*tile) — bins
    in sublanes (257 -> 264, ~3% pad), the L x tile grid of
    (partition, utterance) columns exactly filling lanes (L*tile = 1280, a
    multiple of 128). Real/imag live in SEPARATE arrays (no 2K concatenated
    axis -> no misaligned sublane splits). Partition reductions/broadcasts
    are 128-aligned lane-group slices/concats (whole-vreg adds/moves).

    Each DFT transform is left-multiplication by its re/im block
    decomposition, contracting over the bin (sublane) axis — the standard
    MXU orientation with the constant on the left:

        y_blk = IT_r @ y_r + IT_i @ y_i        (IT_* = inv_tail[half, :].T)
        e_r = F_r @ e_blk,  e_i = F_i @ e_blk  (F_* = fwd[B:, half].T)

    and the gradient constraint uses the FACTORED projection
    ``C = inv[:, :B] @ fwd[:B, :]`` (rank B) instead of the collapsed
    (2K, 2K) matrix:

        t_blk = IH_r @ g_r + IH_i @ g_i        (IH_* = inv[half, :B].T)
        upd_r = FB_r @ t_blk, upd_i = FB_i @ t_blk  (FB_* = fwd[:B, half].T)

    — 4 WIDE (N = L*tile) matmuls per step instead of 4*L narrow ones (the
    3D-state variant spent its time in 40 latency-bound (K,K)@(K,128) ops),
    with an exactly-aligned B=256 contraction in the second pair. State
    stays VMEM-resident across the whole time grid as in the other fused
    kernels.
    """
    # per-tier (dot_x, dot_y, dot_e, dot_c, dot_fb) — pass counts and the
    # measured rationale for the "balanced" tier live in bl.stage1_dots
    dots = bl.stage1_dots(dot_mode)

    def kernel(far_ref, d_ref, *args):
        consts = args[:24]
        e_ref = args[24]
        state = args[25:32]  # wr, wi, p, xbr, xbi, psi, fprev
        # time is a 2-LEVEL grid (outer, inner): this image's TPU compile
        # helper crashes on a single grid dimension >= 512 at tile >= 96
        # (measured envelope in kalman_filter_fused_batched_bl); splitting
        # the dimension is semantically identical — the scratch state
        # persists across the whole grid and inner is the fastest axis.
        t = pl.program_id(1) + pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            for ref in (*state[:2], *state[3:]):
                ref[:] = jnp.zeros_like(ref)
            state[2][:] = jnp.full_like(state[2], cfg.init_p)
            state[5][:] = jnp.full_like(state[5], cfg.psi_floor)

        for u in range(unroll):
            if constrain_every == 1:
                project = True  # static: exact per-update projection
            else:
                step_idx = bl.step_index(t_inner, unroll, u)
                project = step_idx % constrain_every == constrain_every - 1
            e_ref[0, 0, 0, u] = bl.kalman_block_step(
                cfg, l, tile, dots, consts, state,
                far_ref[0, 0, 0, u], d_ref[0, 0, 0, u], project=project,
                vpu_opt=vpu_opt,
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block", "interpret", "unroll", "tile", "dot_mode", "max_grid",
        "vmem_limit_mb", "constrain_every", "vpu_opt"
    ),
)
def kalman_filter_fused_batched_bl(
    cfg: KalmanConfig,
    far_blocks: jax.Array,  # (BATCH, T, B) far-end time blocks
    d_blocks: jax.Array,  # (BATCH, T, B) mic blocks
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int | None = None,
    tile: int | None = None,
    dot_mode: str = "mixed",
    max_grid: int = 256,
    vmem_limit_mb: int | None = None,
    constrain_every: int = 1,
    vpu_opt: bool = False,
) -> jax.Array:
    """Batch-in-lanes fused Kalman: grid (batch_tiles, T/unroll), VMEM state.

    See :func:`_kernel_batched_bl`. Consumes RAW far/mic time blocks — the
    far-frame analysis STFT happens inside the kernel (a one-block VMEM ring
    + two MXU matmuls per step), so no spectra tensor ever exists in HBM.
    Inputs/outputs are transposed so the batch tile rides the lane axis
    inside the kernel (one relayout each way, amortized over the whole
    utterance). Returns e blocks (BATCH, T, B).
    """
    batch, t_steps, _ = far_blocks.shape
    k = block + 1
    l = cfg.n_blocks
    if tile is None:
        # ROUND-3 RESOLUTION of the round-2 "compile envelope": the
        # deterministic tile>=96 dot-high compile failure (and the
        # scoped-VMEM OOMs) were the DEFAULT 16 MB VMEM CAP, not a
        # hardware/compiler wall — raising vmem_limit_mb (default 100
        # below) unlocks every tile. Measured per 256 x 8.2 s on v5e:
        #   high : 64/u2 25.3 | 128/u2 20.5 | 128/u1 20.3 | 256/u1 18.7
        #          | 256/u2 21.6  -> default 256/u1
        #   mixed: 128/u2 12.6 | 256/u2 11.4 | 256/u1 12.3 -> 256/u2
        #   balanced: 256/u1 15.9 | 256/u2 17.9 | 128/u1 15.9(same-proc
        #   14.6 vs 15.9) | 128/u2 16.9 | 192/u1 24.7(!) -> 256/u1
        #   (NLMS mirrors: high 256/u1 17.7, mixed 256/u2 9.2)
        # "native" (Mosaic precision=HIGHEST, exact fp32): best 128/u1 =
        # 32.1 ms — slower than "high" despite one IR op per dot (HIGHEST
        # is a ~6-pass bf16 expansion), so it stays the oracle mode.
        tile = 128 if dot_mode == "native" else 256
    if unroll is None:
        unroll = 1 if dot_mode in ("high", "native", "balanced", "lean") else 2
    if vmem_limit_mb is None:
        # the cap VALUE matters beyond feasibility (64 MB cap: 22.3 ms at
        # high/128/u2 vs 20.5 at 100 MB — the scheduler uses the headroom)
        vmem_limit_mb = 100

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    # 2-level time grid: keep every grid dimension <= 256 (see _kernel
    # docstring; a single >=512-step dim crashes this image's compiler at
    # tile >= 96). Padding lives at the END of the time axis, after every
    # real block, so state evolution over the real signal is unchanged.
    t_u = -(-t_steps // unroll)
    t_outer = -(-t_u // max_grid)
    t_inner = -(-t_u // t_outer)
    t_total = t_outer * t_inner * unroll
    t_pad = t_total - t_steps
    if b_pad or t_pad:
        far_blocks = jnp.pad(far_blocks, [(0, b_pad), (0, t_pad), (0, 0)])
        d_blocks = jnp.pad(d_blocks, [(0, b_pad), (0, t_pad), (0, 0)])
    bt = (batch + b_pad) // tile

    def tm(a, w):  # (B, T, w) -> (bt, t_outer, t_inner, unroll, w, tile)
        a = a.astype(jnp.float32).reshape(bt, tile, t_total, w)
        a = jnp.transpose(a, (0, 2, 3, 1))  # (bt, T, w, tile)
        return a.reshape(bt, t_outer, t_inner, unroll, w, tile)

    step = lambda w: pl.BlockSpec(  # noqa: E731
        (1, 1, 1, unroll, w, tile), lambda b, to, ti: (b, to, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, to, ti: (0, 0), memory_space=pltpu.VMEM
    )

    const_ops = bl.stage1_consts(block, native=(dot_mode == "native"))

    out = pl.pallas_call(
        _kernel_batched_bl(cfg, k, tile, l, unroll, dot_mode,
                           t_inner=t_inner, constrain_every=constrain_every,
                           vpu_opt=vpu_opt),
        grid=(bt, t_outer, t_inner),
        in_specs=[step(block), step(block)]
        + [whole(*c.shape) for c in const_ops],
        out_specs=step(block),
        out_shape=jax.ShapeDtypeStruct(
            (bt, t_outer, t_inner, unroll, block, tile), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((k, l * tile), jnp.float32),  # wr
            pltpu.VMEM((k, l * tile), jnp.float32),  # wi
            pltpu.VMEM((k, l * tile), jnp.float32),  # p
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbr
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbi
            pltpu.VMEM((k, tile), jnp.float32),  # psi
            pltpu.VMEM((block, tile), jnp.float32),  # fprev (far ring)
        ],
        interpret=interpret,
        compiler_params=(
            None if vmem_limit_mb is None
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            )
        ),
    )(
        tm(far_blocks, block),
        tm(d_blocks, block),
        *const_ops,
    )
    # (bt, t_outer, t_inner, unroll, block, tile) -> (BATCH, T, B)
    out = out.reshape(bt, t_total, block, tile)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(bt * tile, t_total, block)
    return out[:batch, :t_steps]


def kalman_cancel_fused_batched_bl(
    cfg: KalmanConfig,
    far: jax.Array,  # [BATCH, n]
    mic: jax.Array,
    *,
    block: int = 256,
    interpret: bool = False,
    tile: int | None = None,
    unroll: int | None = None,
    dot_mode: str = "mixed",
    max_grid: int = 256,
    vmem_limit_mb: int | None = None,
    constrain_every: int = 1,
    vpu_opt: bool = False,
) -> dict[str, jax.Array]:
    """Waveform in/out batched canceller on the batch-in-lanes kernel.

    Fully fused stage-1: the far-frame analysis STFT runs inside the kernel,
    so the only HBM tensors are the wavs in and the cancelled blocks out.
    ``tile=None`` resolves per dot_mode (256 production, 128 native — see
    kalman_filter_fused_batched_bl for the measured compile/VMEM envelope)."""
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    far_blocks = farp.reshape(farp.shape[0], -1, block)
    d_blocks = micp.reshape(micp.shape[0], -1, block)
    e = kalman_filter_fused_batched_bl(
        cfg, far_blocks, d_blocks, block=block, interpret=interpret, tile=tile,
        unroll=unroll, dot_mode=dot_mode, max_grid=max_grid,
        vmem_limit_mb=vmem_limit_mb, constrain_every=constrain_every,
        vpu_opt=vpu_opt,
    )
    return {"wav": e.reshape(e.shape[0], -1)[:, :n]}


def kalman_cancel_fused(
    cfg: KalmanConfig,
    far: jax.Array,
    mic: jax.Array,
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int = 1,
    dot_mode: str = "mixed",
) -> dict[str, jax.Array]:
    """Waveform in/out single-stream canceller on the fused kernel.

    far/mic: [n]. Drop-in equivalent of linear.kalman.kalman_cancel for the
    unbatched case (batched workloads keep the scan + vmap path, which
    already saturates the chip). ``dot_mode`` defaults to "mixed" — the same
    per-op precision policy as the library's scan default
    (overlap_save._STAGE1_DEFAULT); same-process A/B on v5e (slope method,
    16 s utterance): high 1.49 ms / mixed 1.23 ms / bf16 0.98 ms, with
    quality -0.16 dB (mixed) vs -1.45 dB (bf16) worst-case tail-ERLE
    (benchmarks/validate_precision.py).
    """
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    x_ri = ols.far_end_spectra(farp[None], block)[0]
    d_blocks = micp.reshape(-1, block)
    e = kalman_filter_fused(
        cfg, x_ri, d_blocks, block=block, interpret=interpret,
        unroll=unroll, dot_mode=dot_mode,
    )
    return {"wav": e.reshape(-1)[:n]}
