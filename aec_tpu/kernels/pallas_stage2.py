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

from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.dsp.windows import periodic_window
from aec_tpu.kernels import precision as prec


def _kernel(cfg: StftConfig, e_bands: int, tile: int, dot_mode: str):
    k = cfg.n_freqs
    hop = cfg.hop
    h_dim = e_bands
    dot = prec.dot_high_lhs if dot_mode == "high" else prec.dot_fast_lhs
    # synthesis contracts K=257 bins: Nyquist bin as an exact f32 rank-1
    # update instead of MXU contraction padding 257 -> 384 (precision.py)
    dot_k1 = prec.dot_high_lhs_k1 if dot_mode == "high" else prec.dot_fast_lhs_k1

    def kernel(lin_ref, far_ref,
               ar_hi, ar_lo, ai_hi, ai_lo,
               sr_hi, sr_lo, sr_last, si_hi, si_lo, si_last,
               ef_hi, ef_lo, eb_hi, eb_lo,
               wih_hi, wih_lo, whh_hi, whh_lo,
               w1_hi, w1_lo, w2_hi, w2_lo,
               bih, bhh, b1, b2, inv_env,
               out_ref, mask_ref, h, tail, prev_lin, prev_far):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            h[:] = jnp.zeros_like(h)
            tail[:] = jnp.zeros_like(tail)
            prev_lin[:] = jnp.zeros_like(prev_lin)
            prev_far[:] = jnp.zeros_like(prev_far)

        lin_b = lin_ref[0, 0]  # (hop, tile)
        far_b = far_ref[0, 0]
        lin_frame = jnp.concatenate([prev_lin[:], lin_b], axis=0)  # (win, tile)
        far_frame = jnp.concatenate([prev_far[:], far_b], axis=0)
        prev_lin[:] = lin_b
        prev_far[:] = far_b

        # windowed analysis DFT (window folded into the bases)
        sr = dot(ar_hi, ar_lo, lin_frame)  # (K, tile)
        si = dot(ai_hi, ai_lo, lin_frame)
        fr = dot(ar_hi, ar_lo, far_frame)
        fi = dot(ai_hi, ai_lo, far_frame)
        mag = jnp.sqrt(sr * sr + si * si + 1e-9)
        fmag = jnp.sqrt(fr * fr + fi * fi + 1e-9)

        # ERB features + GRU step + mask head (ERB.py:282-301 semantics)
        me = dot(ef_hi, ef_lo, mag)  # (E, tile)
        fe = dot(ef_hi, ef_lo, fmag)
        feats = jnp.concatenate([me, jnp.abs(me - fe)], axis=0)  # (2E, tile)
        xp = dot(wih_hi, wih_lo, feats) + bih[:]  # (3H, tile)
        hp = dot(whh_hi, whh_lo, h[:]) + bhh[:]
        r = jax.nn.sigmoid(xp[:h_dim] + hp[:h_dim])
        z = jax.nn.sigmoid(xp[h_dim : 2 * h_dim] + hp[h_dim : 2 * h_dim])
        n_ = jnp.tanh(xp[2 * h_dim :] + r * hp[2 * h_dim :])
        h_new = (1.0 - z) * n_ + z * h[:]
        h[:] = h_new
        hid = jnp.concatenate([h_new, me], axis=0)  # (2E, tile)
        l1 = jax.nn.relu(dot(w1_hi, w1_lo, hid) + b1[:])  # (E, tile)
        mask = jax.nn.sigmoid(dot(w2_hi, w2_lo, l1) + b2[:])
        mask_ref[0, 0] = mask

        # un-normalized ERB back-projection applied to re & im (ERB.py:304-310)
        gain = dot(eb_hi, eb_lo, mask * me)  # (K, tile)
        outr, outi = gain * sr, gain * si
        syn = dot_k1(sr_hi, sr_lo, sr_last, outr) + dot_k1(
            si_hi, si_lo, si_last, outi
        )  # (win, tile)

        # OLA emit: step t completes output block t-1; the t = 0 write is
        # placeholder data into the same buffered block that step 1
        # overwrites before it is flushed (out index_map clamps to 0)
        out_ref[0, 0] = (tail[:] + syn[:hop]) * inv_env[:] + 1e-9
        tail[:] = syn[hop:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret", "tile", "dot_mode"),
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
) -> jax.Array:
    """Fused stage-2: blocks in -> enhanced blocks (BATCH, Tb, hop)."""
    batch, t_blocks, hop = lin_blocks.shape
    assert hop == cfg.hop
    k = cfg.n_freqs
    e_bands = erb.shape[-1]

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    # one trailing zero block per signal: the stft right pad / flush frame
    lin_blocks = jnp.pad(lin_blocks, [(0, b_pad), (0, 1), (0, 0)])
    far_blocks = jnp.pad(far_blocks, [(0, b_pad), (0, 1), (0, 0)])
    bt = (batch + b_pad) // tile
    t_total = t_blocks + 1

    def tm(a):  # (B, T, hop) -> (bt, T, hop, tile)
        a = a.astype(jnp.float32).reshape(bt, tile, t_total, hop)
        return jnp.transpose(a, (0, 2, 3, 1))

    analysis, synthesis = stft_mod._bases(cfg)  # host numpy (win,2K)/(2K,win)
    analysis = analysis.astype(np.float32)
    synthesis = synthesis.astype(np.float32)

    def split(m):  # traceable bf16_3x split (params/erb are jit arguments)
        m = jnp.asarray(m, jnp.float32)
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    erb_f = jnp.asarray(erb, jnp.float32)
    gru = params["gru"]

    def k1(c):  # (rows, K): split first K-1 cols, last col f32 (rows, 1)
        return [*split(c[:, :-1]), jnp.asarray(c[:, -1:], jnp.float32)]

    const_ops = (
        list(split(analysis[:, :k].T))  # A_r (K, win)
        + list(split(analysis[:, k:].T))  # A_i
        + k1(synthesis[:k, :].T)  # S_r (win, K)
        + k1(synthesis[k:, :].T)  # S_i
        + list(split(erb_f.T))  # ERB_f (E, K)
        + list(split(erb_f))  # ERB_b (K, E)
        + list(split(jnp.asarray(gru["w_ih"], jnp.float32)))  # (3H, 2E)
        + list(split(jnp.asarray(gru["w_hh"], jnp.float32)))  # (3H, H)
        + list(split(jnp.asarray(params["lin1"]["w"], jnp.float32)))
        + list(split(jnp.asarray(params["lin2"]["w"], jnp.float32)))
    )
    w2 = periodic_window(cfg.win_type, cfg.win_len) ** 2
    inv_env = (1.0 / (w2[: cfg.hop] + w2[cfg.hop :] + 1e-8)).astype(np.float32)
    vecs = [
        jnp.asarray(gru["b_ih"], jnp.float32)[:, None],  # (3H, 1)
        jnp.asarray(gru["b_hh"], jnp.float32)[:, None],
        jnp.asarray(params["lin1"]["b"], jnp.float32)[:, None],  # (E, 1)
        jnp.asarray(params["lin2"]["b"], jnp.float32)[:, None],
        jnp.asarray(inv_env[:, None]),  # (hop, 1)
    ]

    step = pl.BlockSpec(
        (1, 1, hop, tile), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, hop, tile),
        lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, 1, e_bands, tile), lambda b, t: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM
    )

    out, mask = pl.pallas_call(
        _kernel(cfg, e_bands, tile, dot_mode),
        grid=(bt, t_total),
        in_specs=[step, step]
        + [whole(*c.shape) for c in const_ops]
        + [whole(*v.shape) for v in vecs],
        out_specs=[out_spec, mask_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bt, t_blocks, hop, tile), jnp.float32),
            jax.ShapeDtypeStruct((bt, t_total, e_bands, tile), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((e_bands, tile), jnp.float32),  # gru h
            pltpu.VMEM((hop, tile), jnp.float32),  # OLA tail
            pltpu.VMEM((hop, tile), jnp.float32),  # prev lin block
            pltpu.VMEM((hop, tile), jnp.float32),  # prev far block
        ],
        interpret=interpret,
    )(
        tm(lin_blocks),
        tm(far_blocks),
        *const_ops,
        *vecs,
    )
    # (bt, Tb, hop, tile) -> (BATCH, Tb, hop); mask -> (BATCH, T, E)
    out = jnp.transpose(out, (0, 3, 1, 2)).reshape(bt * tile, t_blocks, hop)
    mask = jnp.transpose(mask, (0, 3, 1, 2)).reshape(bt * tile, t_total, e_bands)
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
        interpret=interpret, tile=tile, dot_mode=dot_mode,
    )
    return {"wav": out.reshape(out.shape[0], -1)[:, :n], "mask": mask}
