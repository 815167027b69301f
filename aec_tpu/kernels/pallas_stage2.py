"""Pallas TPU kernel: fused batched LittleNet stage-2 inference.

The offline stage-2 path (models/little_net.little_net_apply, matching the
reference forward ERB.py:252-334) is built from big XLA ops: two STFTs that
materialize 2x-overlapped frame tensors in HBM (~540 MB each at the headline
shape), a GRU scan, the ERB mask math, and an iSTFT with an OLA scatter.
Here the WHOLE per-frame recurrence runs as one ``pallas_call`` in the
batch-in-lanes layout proven out by kernels/pallas_kalman.py:

- the batch tile rides the lane axis (tile = 256 lanes by default); every
  per-frame quantity is a (rows, tile) array with rows in sublanes (K=257
  bins pad 257 -> 264, ~3%; the 32/64/96-row neural arrays are exact);
- per-utterance state — GRU hidden, OLA synthesis tail, one previous input
  block per signal for framing — lives in VMEM scratch across the whole
  time grid; no frames tensor, spectrum, or synthesis frame ever exists in
  HBM;
- each grid step streams in one hop of stage-1 output + far reference per
  utterance and streams out one hop of enhanced audio;
- all transforms are left-multiplications by constant bases contracting
  over sublanes: windowed analysis DFT (K, win), ERB projection (E, K) and
  back-projection (K, E), the GRU/linear weights, and the pinv synthesis
  basis (win, K).

Frame/OLA bookkeeping follows pipeline/streaming.py exactly (which is
verified equal to the offline path): analysis frame t = [block_{t-1} ||
block_t] with zero blocks at both edges (the stft pad), output block t =
(tail_t + head(syn_{t+1})) / env_period + 1e-9, where the trimmed interior
OLA envelope is exactly periodic. The t = 0 grid step only primes the state
(its output slot is overwritten by step 1 before the block is flushed).

The reference's global pseudo-norm (ERB.py:254-256) is a scalar subtraction
over the whole batch — the wrapper applies it as a host-side pre-pass, so
normalized inference uses the same kernel.

``dot_mode``: "default" (production) runs every matmul as single-pass bf16,
matching the throughput path's ``Precision.DEFAULT`` stage-2 policy
(benchmarks/validate_precision.py: <1e-3 relative waveform error); "high"
runs bf16_3x (Precision.HIGH-equivalent) for parity-grade runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aec_tpu.dsp.stft import StftConfig
from aec_tpu.kernels import bl_common as bl
from aec_tpu.kernels import precision as prec


def _kernel(cfg: StftConfig, e_bands: int, dot_mode: str, unroll: int,
            gain_norm: bool):
    hop = cfg.hop
    high = dot_mode == "high"
    dots = (
        prec.dot_high_lhs if high else prec.dot_fast_lhs,
        prec.dot_high_lhs_k1 if high else prec.dot_fast_lhs_k1,
    )

    def kernel(lin_ref, far_ref, *args):
        consts = args[:22]
        vecs = args[22:27]
        out_ref, mask_ref = args[27:29]
        state = args[29:33]  # h, tail, prev_lin, prev_far
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            for ref in state:
                ref[:] = jnp.zeros_like(ref)

        # OLA emit, UNSHIFTED: sub-step j of grid step t processes frame
        # t*unroll + j and emits the output block that frame COMPLETES
        # (block t*unroll + j - 1) into out slot (t, j); the wrapper drops
        # the first flat slot (frame 0 completes nothing real) instead of
        # the old clamped index_map shift.
        for j in range(unroll):
            out_block, mask = bl.stage2_frame_step(
                e_bands, hop, dots, consts, vecs, state,
                lin_ref[0, 0, j], far_ref[0, 0, j], gain_norm=gain_norm,
            )
            mask_ref[0, 0, j] = mask
            out_ref[0, 0, j] = out_block

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "interpret", "tile", "dot_mode", "vmem_limit_mb", "unroll",
        "gain_norm",
    ),
)
def little_net_apply_fused(
    params,
    lin_blocks: jax.Array,  # (BATCH, Tb, hop) stage-1 output blocks
    far_blocks: jax.Array,  # (BATCH, Tb, hop)
    erb: jax.Array,  # (K, E)
    cfg: StftConfig = StftConfig(),
    *,
    interpret: bool = False,
    tile: int = 256,
    dot_mode: str = "default",
    vmem_limit_mb: int | None = 100,
    unroll: int = 4,
    gain_norm: bool = False,
) -> jax.Array:
    """Fused stage-2: blocks in -> enhanced blocks (BATCH, Tb, hop).

    ``unroll``: frames processed per grid step (time padded with zero
    blocks past the flush frame; padded outputs are sliced off). Default 4
    — same-process slope A/B at 256 x 8.2 s: u1 5.95 / u2 5.42 / u4 5.20 /
    u8 5.67 ms (ab_balanced_time stage2_bl_*); outputs are bit-identical
    across unrolls (interpret-mode verified).

    ``gain_norm``: scale-sane ERB synthesis (bl_common.stage2_frame_step;
    one extra back-projection dot per frame — measured ~neutral,
    benchmarks/results/ab_gain_norm_r5.json)."""
    batch, t_blocks, hop = lin_blocks.shape
    assert hop == cfg.hop
    k = cfg.n_freqs
    e_bands = erb.shape[-1]

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    # one trailing zero block per signal (the stft right pad / flush
    # frame) + zero blocks up to an unroll multiple (outputs discarded)
    t_total = -(-(t_blocks + 1) // unroll) * unroll
    lin_blocks = jnp.pad(
        lin_blocks, [(0, b_pad), (0, t_total - t_blocks), (0, 0)]
    )
    far_blocks = jnp.pad(
        far_blocks, [(0, b_pad), (0, t_total - t_blocks), (0, 0)]
    )
    bt = (batch + b_pad) // tile
    t_steps = t_total // unroll

    def tm(a):  # (B, T, hop) -> (bt, t_steps, unroll, hop, tile)
        a = a.astype(jnp.float32).reshape(bt, tile, t_total, hop)
        a = jnp.transpose(a, (0, 2, 3, 1))
        return a.reshape(bt, t_steps, unroll, hop, tile)

    const_ops = bl.stage2_consts(params, erb, cfg)
    vecs = bl.stage2_vecs(params, cfg)

    step = pl.BlockSpec(
        (1, 1, unroll, hop, tile), lambda b, t: (b, t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, 1, unroll, e_bands, tile), lambda b, t: (b, t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM
    )

    out, mask = pl.pallas_call(
        _kernel(cfg, e_bands, dot_mode, unroll, gain_norm),
        grid=(bt, t_steps),
        in_specs=[step, step]
        + [whole(*c.shape) for c in const_ops]
        + [whole(*v.shape) for v in vecs],
        out_specs=[step, mask_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bt, t_steps, unroll, hop, tile), jnp.float32),
            jax.ShapeDtypeStruct(
                (bt, t_steps, unroll, e_bands, tile), jnp.float32
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((e_bands, tile), jnp.float32),  # gru h
            pltpu.VMEM((hop, tile), jnp.float32),  # OLA tail
            pltpu.VMEM((hop, tile), jnp.float32),  # prev lin block
            pltpu.VMEM((hop, tile), jnp.float32),  # prev far block
        ],
        interpret=interpret,
        compiler_params=(
            None if vmem_limit_mb is None
            else pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
            )
        ),
    )(
        tm(lin_blocks),
        tm(far_blocks),
        *const_ops,
        *vecs,
    )
    # out slot for frame f holds the block frame f COMPLETES (block f-1):
    # drop flat slot 0, keep blocks 0..t_blocks-1. mask slot f IS frame f.
    out = out.reshape(bt, t_total, hop, tile)[:, 1 : t_blocks + 1]
    mask = mask.reshape(bt, t_total, e_bands, tile)[:, : t_blocks + 1]
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(bt * tile, t_blocks, hop)
    mask = jnp.transpose(mask, (0, 3, 1, 2)).reshape(
        bt * tile, t_blocks + 1, e_bands
    )
    return out[:batch], mask[:batch]


def little_net_apply_fused_wav(
    params,
    mic: jax.Array,  # (BATCH, n) stage-1 output ("mic" input of the net)
    ref: jax.Array,  # (BATCH, n) far-end reference
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    normalize: bool = True,
    per_utt_norm: bool = False,
    interpret: bool = False,
    tile: int = 256,
    dot_mode: str = "default",
    unroll: int = 4,
    gain_norm: bool = False,
) -> dict[str, jax.Array]:
    """Waveform-level fused stage-2, drop-in for little_net_apply's ``wav``.

    The reference's scalar pseudo-norm is applied as a pre-pass (exact: it
    is a single subtraction before the STFT pad, ERB.py:254-256).
    """
    from aec_tpu.models.little_net import _pseudo_norm

    n = mic.shape[-1]
    if normalize:
        mic = _pseudo_norm(mic, per_utt_norm)
        ref = _pseudo_norm(ref, per_utt_norm)
    rem = (-n) % cfg.hop
    if rem:
        mic = jnp.pad(mic, [(0, 0), (0, rem)])
        ref = jnp.pad(ref, [(0, 0), (0, rem)])
    blocks = lambda a: a.reshape(a.shape[0], -1, cfg.hop)  # noqa: E731
    out, mask = little_net_apply_fused(
        params, blocks(mic), blocks(ref), erb, cfg,
        interpret=interpret, tile=tile, dot_mode=dot_mode, unroll=unroll,
        gain_norm=gain_norm,
    )
    return {"wav": out.reshape(out.shape[0], -1)[:, :n], "mask": mask}
