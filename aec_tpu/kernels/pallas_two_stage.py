"""Pallas TPU kernel: the ENTIRE two-stage AEC pipeline in one kernel.

Composition of the two batch-in-lanes kernels (pallas_kalman._kernel_batched_bl
and pallas_stage2._kernel) into a single ``pallas_call``: each grid step
consumes one 16 ms hop of far/mic per utterance and

1. advances the partitioned-block Kalman filter (state VMEM-resident,
   far-frame STFT in-kernel, factored constraint, Nyquist rank-1 splits),
   producing the echo-cancelled block;
2. feeds that block STRAIGHT INTO the LittleNet stage-2 recurrence — the
   windowed analysis DFTs, ERB features, GRU step, mask head,
   back-projection and pinv OLA synthesis — without the linear waveform
   ever existing in HBM;
3. emits the enhanced block (and the stage-1 block + mask, preserving the
   ``two_stage_cancel`` contract).

Timing alignment: the stage-2 analysis frame t is [lin_{t-1} || lin_t], so
the grid runs T+1 steps; step T feeds the zero flush block (stage-1 is
skipped there via ``pl.when``), and output block t-1 completes at step t
exactly as in pallas_stage2.py.

Precision policy per ``dot_mode`` (matches the separate production kernels):
"mixed" (default) = stage-1 y/analysis transforms bf16_3x + everything else
single-pass bf16 (stage-2's Precision.DEFAULT tier); "high" = all bf16_3x
(interpret-mode parity tests; exceeds the scoped-VMEM budget on chip).

Only the ``normalize=False`` two-stage path can run here: the reference's
pseudo-norm on the stage-2 input would need the stage-1 output's global
mean/std BEFORE the kernel runs.

MEASURED (v5e, batch 256 x 8.2 s, 4-unit slope, same process):

- round-2, 16 MB default VMEM cap, tile=128: 16.37 ms vs 16.25 ms for the
  two-kernel composition — a dead heat (the saved lin-wav HBM round trip
  repaid by stage-2 running at the combined kernel's smaller tile).
- round-3, vmem_limit_mb=100 unlocked tile=256 (see pallas_kalman.py):
  mixed t256 = **12.83 ms vs 13.43 ms** for the retuned composition (t128
  16.02) — the single kernel now WINS fast mode by ~4.5%, so
  ``two_stage_cancel(quality="fast")`` auto-routes here. high t256 =
  23.48 ms vs 22.62 composition — parity mode keeps the composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.kernels import bl_common as bl
from aec_tpu.kernels import precision as prec


def _kernel(
    kcfg: KalmanConfig, scfg: StftConfig, e_bands: int, tile: int, l: int,
    t_blocks: int, dot_mode: str, unroll: int, gain_norm: bool,
):
    hop = scfg.hop
    high = dot_mode == "high"
    # stage-1 tiers: the shared per-mode (x, y, e, c, fb) tuple
    # (bl.stage1_dots — "balanced" = parity-grade constraint at 2-pass)
    s1_dots = bl.stage1_dots(dot_mode)
    # stage-2 tiers (pallas_stage2): Precision.DEFAULT equivalent unless
    # "high" — the production default at BOTH quality settings (graded 51 dB
    # SNR / STOI delta <= 0.005; the post-filter is not cancellation-critical)
    s2_dots = (
        prec.dot_high_lhs if high else prec.dot_fast_lhs,
        prec.dot_high_lhs_k1 if high else prec.dot_fast_lhs_k1,
    )

    def kernel(far_ref, d_ref, *args):
        s1c = args[:24]
        s2c = args[24:46]  # 22 stage-2 constant operands
        vecs = args[46:51]
        out_ref, lin_ref, mask_ref = args[51:54]
        s1_state = args[54:61]  # wr, wi, p, xbr, xbi, psi, fprev
        h, tail, prev_lin, prev_far, lin_sc = args[61:66]
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            for ref in (*s1_state[:2], *s1_state[3:], h, tail, prev_lin,
                        prev_far):
                ref[:] = jnp.zeros_like(ref)
            s1_state[2][:] = jnp.full_like(s1_state[2], kcfg.init_p)
            s1_state[5][:] = jnp.full_like(s1_state[5], kcfg.psi_floor)

        # ``unroll`` sequential hops per grid step (amortizes the grid
        # bookkeeping exactly like the separate bl kernels); outputs are
        # SLOT-ALIGNED: slot idx holds the enhanced block idx-1 (stage-2's
        # one-frame lag), sliced off on the host.
        for u in range(unroll):
            idx = t * unroll + u
            far_b = far_ref[0, u]  # (hop, tile); zeros past the input

            # stage 1: one Kalman block update (skipped on the flush step);
            # the cancelled block is handed to stage 2 through VMEM (lin_sc)
            @pl.when(idx < t_blocks)
            def _stage1(far_b=far_b, u=u, idx=idx):
                e_blk = bl.kalman_block_step(
                    kcfg, l, tile, s1_dots, s1c, s1_state, far_b, d_ref[0, u]
                )
                lin_sc[:] = e_blk
                lin_ref[0, u] = e_blk

            @pl.when(idx == t_blocks)
            def _flush_zero():
                lin_sc[:] = jnp.zeros_like(lin_sc)

            # stage 2: LittleNet frame step on the in-VMEM stage-1 block
            out_block, mask = bl.stage2_frame_step(
                e_bands, hop, s2_dots, s2c, vecs,
                (h, tail, prev_lin, prev_far), lin_sc[:], far_b,
                gain_norm=gain_norm,
            )
            mask_ref[0, u] = mask
            out_ref[0, u] = out_block

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "kcfg", "scfg", "interpret", "tile", "dot_mode", "vmem_limit_mb",
        "unroll", "gain_norm",
    ),
)
def two_stage_fused(
    params,
    far: jax.Array,  # (BATCH, n), n % hop == 0
    mic: jax.Array,
    erb: jax.Array,  # (K, E)
    *,
    kcfg: KalmanConfig = KalmanConfig(),
    scfg: StftConfig = StftConfig(),
    interpret: bool = False,
    tile: int = 256,
    dot_mode: str = "mixed",
    vmem_limit_mb: int | None = 100,
    unroll: int | None = None,
    gain_norm: bool = False,
) -> dict[str, jax.Array]:
    """Full two-stage AEC, one kernel: wavs in -> {wav, linear_wav, mask}.

    ``gain_norm``: scale-sane ERB synthesis in stage 2 (see
    bl_common.stage2_frame_step / little_net_apply)."""
    batch, n = far.shape
    assert n % scfg.hop == 0, "fused two-stage needs hop-multiple lengths"
    # stage-1 shares the stage-2 hop as its block; the DFT constant slicing
    # below assumes the default 2*hop FFT geometry -- fail fast otherwise
    assert scfg.fft_len == 2 * scfg.hop and scfg.n_freqs == scfg.hop + 1, (
        "two_stage_fused requires fft_len == 2*hop (n_freqs == hop+1); "
        f"got fft_len={scfg.fft_len}, hop={scfg.hop}"
    )
    hop = scfg.hop
    block = hop
    k = scfg.n_freqs
    e_bands = erb.shape[-1]
    l = kcfg.n_blocks
    t_blocks = n // hop
    if unroll is None:
        # balanced strongly prefers u1 (13.3 vs 17.2 ms per 256 x 8.2 s),
        # mixed prefers u2 (13.5 vs ~14) — ab_balanced_time A/Bs
        unroll = 2 if dot_mode == "mixed" else 1

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    t_total = t_blocks + 1  # one trailing flush step for stage-2's lag
    t_alloc = t_total + (-t_total) % unroll
    # trailing zero blocks: the stage-2 stft right pad / flush frame, plus
    # unroll-alignment padding (stage-1 skips them via pl.when)
    farb = jnp.pad(
        far.astype(jnp.float32).reshape(batch, t_blocks, hop),
        [(0, b_pad), (0, t_alloc - t_blocks), (0, 0)],
    )
    micb = jnp.pad(
        mic.astype(jnp.float32).reshape(batch, t_blocks, hop),
        [(0, b_pad), (0, t_alloc - t_blocks), (0, 0)],
    )
    bt = (batch + b_pad) // tile

    def tm(a):  # (B', T, hop) -> (bt, T, hop, tile)
        a = a.reshape(bt, tile, t_alloc, hop)
        return jnp.transpose(a, (0, 2, 3, 1))

    s1_consts = bl.stage1_consts(block)

    s2_consts = bl.stage2_consts(params, erb, scfg)
    vecs = bl.stage2_vecs(params, scfg)

    step = pl.BlockSpec(
        (1, unroll, hop, tile), lambda b, t: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, unroll, e_bands, tile), lambda b, t: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM
    )

    out, lin, mask = pl.pallas_call(
        _kernel(kcfg, scfg, e_bands, tile, l, t_blocks, dot_mode, unroll,
                gain_norm),
        grid=(bt, t_alloc // unroll),
        in_specs=[step, step]
        + [whole(*c.shape) for c in s1_consts]
        + [whole(*c.shape) for c in s2_consts]
        + [whole(*v.shape) for v in vecs],
        out_specs=[step, step, mask_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bt, t_alloc, hop, tile), jnp.float32),
            jax.ShapeDtypeStruct((bt, t_alloc, hop, tile), jnp.float32),
            jax.ShapeDtypeStruct((bt, t_alloc, e_bands, tile), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, l * tile), jnp.float32),  # wr
            pltpu.VMEM((k, l * tile), jnp.float32),  # wi
            pltpu.VMEM((k, l * tile), jnp.float32),  # p
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbr
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbi
            pltpu.VMEM((k, tile), jnp.float32),  # psi
            pltpu.VMEM((hop, tile), jnp.float32),  # fprev (stage-1 far ring)
            pltpu.VMEM((e_bands, tile), jnp.float32),  # gru h
            pltpu.VMEM((hop, tile), jnp.float32),  # OLA tail
            pltpu.VMEM((hop, tile), jnp.float32),  # prev lin block
            pltpu.VMEM((hop, tile), jnp.float32),  # prev far block
            pltpu.VMEM((hop, tile), jnp.float32),  # lin handoff
        ],
        interpret=interpret,
        compiler_params=(
            None if vmem_limit_mb is None
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            )
        ),
    )(
        tm(farb),
        tm(micb),
        *s1_consts,
        *s2_consts,
        *vecs,
    )

    def back(a, rows):  # (bt, T', rows, tile) -> (BATCH, T', rows)
        a = jnp.transpose(a, (0, 3, 1, 2)).reshape(bt * tile, -1, rows)
        return a[:batch]

    # slot-aligned outputs: slot idx holds the enhanced block idx-1 (the
    # stage-2 lag), so the wav is slots [1, t_blocks]; lin slot idx IS
    # block idx, valid for idx < t_blocks; trailing alignment pads dropped
    wav = back(out, hop)[:, 1 : t_blocks + 1].reshape(batch, -1)[:, :n]
    lin_wav = back(lin, hop)[:, :t_blocks].reshape(batch, -1)[:, :n]
    mask = back(mask, e_bands)[:, :t_total]
    return {"wav": wav, "linear_wav": lin_wav, "mask": mask}
