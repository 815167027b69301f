"""Pallas TPU kernel: fused partitioned-block NLMS (MDF) scan.

Same design as kernels/pallas_kalman.py (which measures 8.5x faster than the
XLA scan for the single-stream case, device-true): the WHOLE adaptive-filter
recursion runs as one `pallas_call` with the filter state — taps, far-end
ring buffer, smoothed power — resident in VMEM scratch across the sequential
time grid; each grid step streams one (1, 2K) far-frame spectrum + one (1, B)
mic block in and one (1, B) echo-cancelled block out, with the three DFT
transforms as MXU matmuls against constant basis matrices.

Numerics match linear/nlms.nlms_step (same equations, fp32); verified in
tests/test_pallas_kalman.py via interpret mode. `linear.nlms.nlms_cancel`
auto-routes single-stream TPU calls here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aec_tpu.configs import NlmsConfig
from aec_tpu.kernels import bl_common as bl
from aec_tpu.kernels import precision as prec
from aec_tpu.linear import overlap_save as ols


def _kernel(cfg: NlmsConfig, k: int, block: int, unroll: int, dot_mode: str):
    ps, mu, eps = cfg.power_smooth, cfg.mu, cfg.eps
    es, eps_rel, beta = cfg.err_smooth, cfg.eps_rel, cfg.beta
    # "mixed": only the cancellation-critical y transform runs bf16_3x
    # (see linear/kalman.kalman_step docstring); residual/update run 1-pass.
    # single-stream kernels are not matmul-bound: "balanced" == "high" here
    dot_y = prec.dot_high if dot_mode != "bf16" else prec.dot_fast
    dot_r = (
        prec.dot_high if dot_mode in ("high", "balanced") else prec.dot_fast
    )

    def kernel(x_ref, d_ref, inv_hi, inv_lo, fwd_hi, fwd_lo, con_hi, con_lo,
               e_ref, wr, wi, xb, power, psi):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            wr[:] = jnp.zeros_like(wr)
            wi[:] = jnp.zeros_like(wi)
            xb[:] = jnp.zeros_like(xb)
            power[:] = jnp.zeros_like(power)
            psi[:] = jnp.zeros_like(psi)

        for u in range(unroll):
            # push newest far-frame spectrum into the ring buffer
            x_new = jnp.concatenate([x_ref[0, u : u + 1], xb[:-1, :]], axis=0)
            xb[:] = x_new
            xr, xi = x_new[:, :k], x_new[:, k:]

            # smoothed total far-end power (nlms.py:66-67)
            inst = jnp.sum(xr * xr + xi * xi, axis=0, keepdims=True)  # (1, K)
            p_new = ps * power[:] + (1.0 - ps) * inst
            power[:] = p_new

            # prior output y = sum_l W X; time block via matmul
            yr = jnp.sum(wr[:] * xr - wi[:] * xi, axis=0, keepdims=True)
            yi = jnp.sum(wr[:] * xi + wi[:] * xr, axis=0, keepdims=True)
            y_ri = jnp.concatenate([yr, yi], axis=1)  # (1, 2K)
            y_blk = dot_y(y_ri, inv_hi, inv_lo)
            e_blk = d_ref[0, u : u + 1] - y_blk
            e_ref[0, u : u + 1] = e_blk
            e_ri = dot_r(e_blk, fwd_hi, fwd_lo)
            er, ei = e_ri[:, :k], e_ri[:, k:]  # (1, K)
            psi_new = es * psi[:] + (1.0 - es) * (er * er + ei * ei)
            psi[:] = psi_new

            # conj(X) E / den with the robustness terms (nlms.nlms_step)
            inv_p = 1.0 / (
                p_new + eps + eps_rel * jnp.mean(p_new) + beta * psi_new
            )
            gr = (xr * er + xi * ei) * inv_p  # (L, K)
            gi = (xr * ei - xi * er) * inv_p
            grad = dot_r(jnp.concatenate([gr, gi], axis=1), con_hi, con_lo)  # (L, 2K)
            wr[:] = wr[:] + mu * grad[:, :k]
            wi[:] = wi[:] + mu * grad[:, k:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "block", "interpret", "unroll", "dot_mode")
)
def nlms_filter_fused(
    cfg: NlmsConfig,
    x_ri: jax.Array,  # (T, 2K) far-frame spectra, [re || im]
    d_blocks: jax.Array,  # (T, B) mic blocks
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int = 1,
    dot_mode: str = "high",
) -> jax.Array:
    """Run the full NLMS recursion in one Pallas kernel -> e blocks (T, B).

    ``dot_mode="high"`` (default) decomposes the DFT matmuls as bf16_3x —
    Precision.HIGH-equivalent numerics (see kernels/precision.py)."""
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
            pltpu.VMEM((l, two_k), jnp.float32),  # x ring buffer (ri)
            pltpu.VMEM((1, k), jnp.float32),  # smoothed power
            pltpu.VMEM((1, k), jnp.float32),  # smoothed residual psd
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


def nlms_cancel_fused(
    cfg: NlmsConfig,
    far: jax.Array,
    mic: jax.Array,
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int = 1,
    dot_mode: str = "high",
) -> dict[str, jax.Array]:
    """Waveform in/out single-stream NLMS on the fused kernel. far/mic: [n].

    ``dot_mode`` defaults to "high": NLMS has NO safe mixed tier (the
    per-op mixed policy loses 18-26 dB tail ERLE on deep-convergence
    scenes — linear/nlms.py docstring + validate_precision nlms_erle), so
    unlike the Kalman sibling the broken-for-NLMS tier must be an explicit
    opt-in, never a default. (Speed context, same-process v5e A/B: high
    1.34 ms / mixed 1.01 ms per 16 s utterance.)"""
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    x_ri = ols.far_end_spectra(farp[None], block)[0]
    d_blocks = micp.reshape(-1, block)
    e = nlms_filter_fused(
        cfg, x_ri, d_blocks, block=block, interpret=interpret,
        unroll=unroll, dot_mode=dot_mode,
    )
    return {"wav": e.reshape(-1)[:n]}


def _kernel_batched_bl(
    cfg: NlmsConfig, k: int, tile: int, l: int, unroll: int, dot_mode: str,
    t_inner: int = 1, constrain_every: int = 1,
):
    """Batch-in-lanes batched NLMS with the far-frame STFT fused in-kernel.

    Identical layout strategy to pallas_kalman._kernel_batched_bl (see its
    docstring for the design rationale): per-partition state is (K, L*tile)
    — bins in sublanes, (partition x utterance) columns exactly filling
    lanes — re/im as separate arrays, transforms as wide left-matmuls with
    the constraint factored through its rank-B form, and the far-frame
    analysis computed in-kernel from a one-block VMEM ring.
    """
    # per-tier (dot_x, dot_y, dot_e, dot_c, dot_fb) — K-contraction (k1)
    # transforms split the last (Nyquist) bin as an exact f32 rank-1 update
    # instead of MXU contraction padding 257 -> 384 (precision.py); pass
    # counts and the "balanced" tier rationale live in bl.stage1_dots
    dots = bl.stage1_dots(dot_mode)

    def kernel(far_ref, d_ref, *args):
        consts = args[:24]
        e_ref = args[24]
        # wr, wi, power, xbr, xbi, psi, fprev (nlms_block_step ordering)
        wr, wi, xbr, xbi, power, psi, fprev = args[25:32]
        state = (wr, wi, power, xbr, xbi, psi, fprev)
        # 2-level time grid (outer, inner) — see pallas_kalman._kernel_batched_bl
        t = pl.program_id(1) + pl.program_id(2)

        @pl.when(t == 0)
        def _init():
            for ref in state:
                ref[:] = jnp.zeros_like(ref)

        for u in range(unroll):
            if constrain_every == 1:
                project = True  # static: exact per-update projection
            else:
                # alternating constraint (schedule + projection shared with
                # the Kalman kernel via bl_common) — see nlms_block_step
                step_idx = bl.step_index(t_inner, unroll, u)
                project = step_idx % constrain_every == constrain_every - 1
            e_ref[0, 0, 0, u] = bl.nlms_block_step(
                cfg, l, tile, dots, consts, state,
                far_ref[0, 0, 0, u], d_ref[0, 0, 0, u], project=project,
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "block", "interpret", "unroll", "tile", "dot_mode", "max_grid",
        "vmem_limit_mb", "constrain_every"
    ),
)
def nlms_filter_fused_batched_bl(
    cfg: NlmsConfig,
    far_blocks: jax.Array,  # (BATCH, T, B) far-end time blocks
    d_blocks: jax.Array,  # (BATCH, T, B) mic blocks
    *,
    block: int = 256,
    interpret: bool = False,
    unroll: int | None = None,
    tile: int | None = None,
    dot_mode: str = "balanced",
    max_grid: int = 256,
    vmem_limit_mb: int | None = None,
    constrain_every: int = 1,
) -> jax.Array:
    """Batched fused NLMS, batch-in-lanes: grid (batch_tiles, t_outer, t_inner).

    ``dot_mode`` defaults to "balanced", NOT the Kalman sibling's "mixed":
    the mixed tier loses 18-26 dB tail ERLE on NLMS's deep-convergence
    scenes (linear/nlms.py), so it must be requested explicitly."""
    batch, t_steps, _ = far_blocks.shape
    k = block + 1
    l = cfg.n_blocks
    if tile is None:
        # same envelope as the Kalman sibling (see its comment): the old
        # tile>=96 dot-high compile failures were the default 16 MB VMEM
        # cap; with vmem_limit_mb=100 the best measured configs per
        # 256 x 8.2 s on v5e are high 256/u1 = 17.7 ms (was 64/u2 ~23),
        # mixed 256/u2 = 9.2 ms (was 128/u2 11.7). "native" stays 128/u1.
        tile = 128 if dot_mode == "native" else 256
    if unroll is None:
        # balanced: u1 9.2 ms vs u2 16.1 per 256 x 8.2 s (ab_balanced_time)
        unroll = 1 if dot_mode in ("high", "native", "balanced", "lean") else 2
    if vmem_limit_mb is None:
        vmem_limit_mb = 100

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    # 2-level time grid, every grid dim <= 256 (see pallas_kalman)
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
        a = jnp.transpose(a, (0, 2, 3, 1))
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
                           t_inner=t_inner, constrain_every=constrain_every),
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
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbr
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbi
            pltpu.VMEM((k, tile), jnp.float32),  # smoothed power
            pltpu.VMEM((k, tile), jnp.float32),  # smoothed residual psd
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
    out = out.reshape(bt, t_total, block, tile)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(bt * tile, t_total, block)
    return out[:batch, :t_steps]


def nlms_cancel_fused_batched_bl(
    cfg: NlmsConfig,
    far: jax.Array,  # [BATCH, n]
    mic: jax.Array,
    *,
    block: int = 256,
    interpret: bool = False,
    tile: int | None = None,
    unroll: int | None = None,
    dot_mode: str = "balanced",
    max_grid: int = 256,
    vmem_limit_mb: int | None = None,
    constrain_every: int = 1,
) -> dict[str, jax.Array]:
    """Waveform in/out batched NLMS on the batch-in-lanes fused kernel.
    ``tile=None`` resolves per dot_mode (256 production, 128 native).
    ``dot_mode`` defaults to "balanced" — NLMS has no safe mixed tier
    (see linear/nlms.py); "mixed" must be an explicit opt-in."""
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    far_blocks = farp.reshape(farp.shape[0], -1, block)
    d_blocks = micp.reshape(micp.shape[0], -1, block)
    e = nlms_filter_fused_batched_bl(
        cfg, far_blocks, d_blocks, block=block, interpret=interpret, tile=tile,
        unroll=unroll, dot_mode=dot_mode, max_grid=max_grid,
        vmem_limit_mb=vmem_limit_mb, constrain_every=constrain_every,
    )
    return {"wav": e.reshape(e.shape[0], -1)[:, :n]}
