"""Streaming (frame-in / frame-out) two-stage AEC runtime.

NEW subsystem mandated by the north star ("inference runs in streaming mode
(frame-in/frame-out) and offline batch mode"); nothing comparable exists in
the reference (SURVEY.md §5.7). Design:

The offline stage-2 pipeline pads the signal by ``hop`` on both sides, so
analysis frame t covers input blocks [t-1, t] and output block t needs
synthesis frames t and t+1 (the OLA envelope is exactly periodic in the
trimmed interior — see dsp/stft.py). A streaming step therefore:

1. runs stage-1 (Kalman/NLMS, causal by construction) on the new 256-sample
   block;
2. forms analysis frame t = [prev_block || cur_block] (one matmul);
3. advances the GRU one step and applies the ERB mask;
4. emits output block t-1 = (tail(s_{t-1}) + head(s_t)) / env_period;

carrying {stage-1 state, previous blocks, GRU h, synthesis tail}. Latency is
exactly one block (hop/sr = 16 ms). ``flush`` feeds the implicit trailing
zero block, emitting the final output block — making
stream == offline BIT-CLOSE for any chunking (tested).

Note: the reference model's global mean/std pseudo-norm (ERB.py:254-256) is
non-causal and has no exact streaming equivalent. Two modes are provided:

- ``normalize=False`` (default): un-normalized, bit-close to the offline path
  with ``normalize=False``;
- ``normalize=True``: CAUSAL running-stats pseudo-norm — the scalar
  ``mean/std`` is re-estimated from all samples seen so far (per stream, per
  branch) and subtracted from the current frame. As the stream lengthens the
  running scalar converges to the offline global one, so
  normalized-trained checkpoints can stream: the tail of a long stream
  matches the offline ``normalize=True`` output (tested in
  tests/test_streaming.py::test_running_norm_converges_to_offline).
"""

from __future__ import annotations

import functools
from typing import Any, Literal, TypedDict

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.stft import (
    StftConfig,
    analysis_matrix,
    synthesis_matrix,
)
from aec_tpu.dsp.windows import periodic_window
from aec_tpu.linear import overlap_save as ols
from aec_tpu.linear.kalman import kalman_init, kalman_step
from aec_tpu.linear.nlms import nlms_init, nlms_step
from aec_tpu.models.little_net import LittleNetParams
from aec_tpu.ops.gru import gru_cell


class StreamState(TypedDict):
    stage1: Any  # KalmanState | NlmsState | None-like empty dict
    prev_lin: jax.Array  # (hop,) previous stage-1 output block
    prev_far: jax.Array  # (hop,) previous far-end block
    gru_h: jax.Array  # (1, E)
    syn_tail: jax.Array  # (hop,) second half of previous synthesis frame
    # running first/second moments for the causal pseudo-norm (count, then
    # sum/sumsq per branch); carried always, consumed when normalize=True
    norm: dict[str, jax.Array]


def _env_period(cfg: StftConfig) -> np.ndarray:
    """Interior OLA envelope, periodic with period hop (win = 2*hop)."""
    w2 = periodic_window(cfg.win_type, cfg.win_len) ** 2
    return w2[: cfg.hop] + w2[cfg.hop :]


def stream_init(
    erb_bands: int = 32,
    cfg: StftConfig = StftConfig(),
    *,
    stage1: Literal["kalman", "nlms", "none"] = "kalman",
    lin_cfg=None,
) -> StreamState:
    if stage1 == "kalman":
        s1 = kalman_init(lin_cfg or KalmanConfig(), cfg.n_freqs)
    elif stage1 == "nlms":
        s1 = nlms_init(lin_cfg or NlmsConfig(), cfg.n_freqs)
    else:
        s1 = {}
    zero = jnp.zeros((), jnp.float32)
    return StreamState(
        stage1=s1,
        prev_lin=jnp.zeros((cfg.hop,), jnp.float32),
        prev_far=jnp.zeros((cfg.hop,), jnp.float32),
        gru_h=jnp.zeros((1, erb_bands), jnp.float32),
        syn_tail=jnp.zeros((cfg.hop,), jnp.float32),
        norm={
            "count": zero,
            "sum_lin": zero, "sumsq_lin": zero,
            "sum_far": zero, "sumsq_far": zero,
        },
    )


def _stage2_frame(
    params: LittleNetParams,
    lin_frame: jax.Array,  # (win,) stage-1 output samples for this frame
    far_frame: jax.Array,  # (win,)
    gru_h: jax.Array,  # (1, E)
    erb: jax.Array,
    cfg: StftConfig,
    gain_norm: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One analysis frame through LittleNet; returns (syn_frame, new_h).

    ``gain_norm``: scale-sane ERB synthesis (models/little_net.py) —
    divide the gain by the unmasked back-projection."""
    a = analysis_matrix(cfg, dtype=lin_frame.dtype)
    spec = lin_frame @ a  # (2K,)
    far_spec = far_frame @ a
    k = cfg.n_freqs
    mag = jnp.sqrt(spec[:k] ** 2 + spec[k:] ** 2 + 1e-9)
    far_mag = jnp.sqrt(far_spec[:k] ** 2 + far_spec[k:] ** 2 + 1e-9)
    mic_erb = mag @ erb  # (E,)
    ref_erb = far_mag @ erb
    feats = jnp.concatenate([mic_erb, jnp.abs(mic_erb - ref_erb)])[None, :]
    x_proj = feats @ params["gru"]["w_ih"].T + params["gru"]["b_ih"]
    h = gru_cell(params["gru"], gru_h, x_proj)  # (1, E)
    hid = jnp.concatenate([h[0], mic_erb])
    hid = jax.nn.relu(hid @ params["lin1"]["w"].T + params["lin1"]["b"])
    mask = jax.nn.sigmoid(hid @ params["lin2"]["w"].T + params["lin2"]["b"])
    gain = (mask * mic_erb) @ erb.T  # (K,)
    if gain_norm:
        gain = gain / (mic_erb @ erb.T + 1e-9)
    out_spec = jnp.concatenate([gain * spec[:k], gain * spec[k:]])
    syn = out_spec @ synthesis_matrix(cfg, dtype=spec.dtype)  # (win,)
    return syn, h


def _norm_scalar(total: jax.Array, sumsq: jax.Array, count: jax.Array) -> jax.Array:
    """Running mean/std ratio (torch-unbiased std, ERB.py:254 semantics)."""
    mean = total / count
    var = (sumsq - count * mean * mean) / jnp.maximum(count - 1.0, 1.0)
    return mean / jnp.sqrt(jnp.maximum(var, 1e-12))


def _stream_step_core(
    params: LittleNetParams,
    state: StreamState,
    far_block: jax.Array,  # (hop,)
    mic_block: jax.Array,  # (hop,)
    erb: jax.Array,
    cfg: StftConfig,
    stage1: str,
    lin_cfg,
    normalize: bool = False,
    quality: str = "parity",
    gain_norm: bool = False,
) -> tuple[StreamState, jax.Array]:
    # Stage 1 (causal, block-native). Far frame -> ri spectrum via the DFT
    # basis matmul (overlap_save). ``quality`` is the same north-star knob
    # as the offline cancellers (linear/kalman.kalman_cancel): "parity"
    # (default) runs the step matmuls at Precision.HIGH (ERLE-identical to
    # fp32), "fast" at the per-op MIXED default (-0.16 dB worst case,
    # ~1.4x serving throughput — benchmarks 'concurrent_streams').
    # EXCEPT NLMS, which has no safe mixed tier (the constraint's bf16
    # matrix rounding floors its deep-convergence null depth by 18-26 dB —
    # linear/nlms.py docstring): it stays HIGH at either quality.
    prec = (
        jax.lax.Precision.HIGH
        if quality == "parity" or stage1 == "nlms"
        else None
    )
    if stage1 == "kalman":
        x_t = ols.frame_to_spectrum(
            jnp.concatenate([state["prev_far"], far_block]), cfg.hop
        )
        s1, lin_block = kalman_step(
            lin_cfg or KalmanConfig(), state["stage1"], x_t, mic_block,
            block=cfg.hop, precision=prec,
        )
    elif stage1 == "nlms":
        x_t = ols.frame_to_spectrum(
            jnp.concatenate([state["prev_far"], far_block]), cfg.hop
        )
        s1, lin_block = nlms_step(
            lin_cfg or NlmsConfig(), state["stage1"], x_t, mic_block,
            block=cfg.hop, precision=prec,
        )
    else:
        s1, lin_block = state["stage1"], mic_block

    # Stage 2: frame t = [prev_lin || lin_block].
    lin_frame = jnp.concatenate([state["prev_lin"], lin_block])
    far_frame = jnp.concatenate([state["prev_far"], far_block])
    norm = state["norm"]
    if normalize:
        # causal pseudo-norm: fold the new block into the running moments,
        # subtract the CURRENT mean/std scalar from the whole frame
        count = norm["count"] + cfg.hop
        norm = {
            "count": count,
            "sum_lin": norm["sum_lin"] + jnp.sum(lin_block),
            "sumsq_lin": norm["sumsq_lin"] + jnp.sum(lin_block * lin_block),
            "sum_far": norm["sum_far"] + jnp.sum(far_block),
            "sumsq_far": norm["sumsq_far"] + jnp.sum(far_block * far_block),
        }
        lin_frame = lin_frame - _norm_scalar(
            norm["sum_lin"], norm["sumsq_lin"], count
        )
        far_frame = far_frame - _norm_scalar(
            norm["sum_far"], norm["sumsq_far"], count
        )
    syn, h = _stage2_frame(
        params, lin_frame, far_frame, state["gru_h"], erb, cfg, gain_norm
    )

    env = jnp.asarray(_env_period(cfg), dtype=syn.dtype)
    out_block = (state["syn_tail"] + syn[: cfg.hop]) / (env + 1e-8) + 1e-9

    new_state = StreamState(
        stage1=s1,
        prev_lin=lin_block,
        prev_far=far_block,
        gru_h=h,
        syn_tail=syn[cfg.hop :],
        norm=norm,
    )
    return new_state, out_block


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "stage1", "lin_cfg", "normalize", "quality", "gain_norm"
    ),
)
def stream_step(
    params: LittleNetParams,
    state: StreamState,
    far_block: jax.Array,  # (hop,)
    mic_block: jax.Array,  # (hop,)
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    stage1: Literal["kalman", "nlms", "none"] = "kalman",
    lin_cfg=None,
    normalize: bool = False,
    quality: str = "parity",
    gain_norm: bool = False,
) -> tuple[StreamState, jax.Array]:
    """Consume one hop of far/mic; emit one hop of enhanced audio.

    The emitted block lags the input by one hop (algorithmic latency 16 ms).
    The VERY FIRST emitted block is the offline path's trimmed left edge and
    must be discarded by the caller (see ``stream_run``).

    Implementation note: executed as a batch-of-1 vmap of the core — this
    image's TPU backend lacks several rank-1 op lowerings (1-D FFT etc.),
    and the batched form is what serving uses anyway.
    """
    state1, far1, mic1 = jax.tree.map(
        lambda a: a[None], (state, far_block, mic_block)
    )
    new_state, out = jax.vmap(
        lambda s, f, m: _stream_step_core(
            params, s, f, m, erb, cfg, stage1, lin_cfg, normalize, quality,
            gain_norm,
        )
    )(state1, far1, mic1)
    return jax.tree.map(lambda a: a[0], new_state), out[0]


@functools.partial(
    jax.jit, static_argnames=("cfg", "normalize", "gain_norm")
)
def stream_flush(
    params: LittleNetParams,
    state: StreamState,
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    normalize: bool = False,
    gain_norm: bool = False,
) -> jax.Array:
    """End of stream: process the implicit trailing zero block (the offline
    path's right pad) and emit the final output block."""

    def core(state):
        zero = jnp.zeros((cfg.hop,), jnp.float32)
        prev_lin, prev_far = state["prev_lin"], state["prev_far"]
        if normalize:
            # the offline pad is appended AFTER normalization -> subtract the
            # final running scalar from the data half only
            n = state["norm"]
            prev_lin = prev_lin - _norm_scalar(n["sum_lin"], n["sumsq_lin"], n["count"])
            prev_far = prev_far - _norm_scalar(n["sum_far"], n["sumsq_far"], n["count"])
        lin_frame = jnp.concatenate([prev_lin, zero])
        far_frame = jnp.concatenate([prev_far, zero])
        syn, _ = _stage2_frame(
            params, lin_frame, far_frame, state["gru_h"], erb, cfg, gain_norm
        )
        env = jnp.asarray(_env_period(cfg), dtype=syn.dtype)
        return (state["syn_tail"] + syn[: cfg.hop]) / (env + 1e-8) + 1e-9

    # batch-of-1 vmap: rank-1 lowering gaps on this TPU backend (see
    # stream_step)
    return jax.vmap(core)(jax.tree.map(lambda a: a[None], state))[0]


def stream_init_batched(
    n_streams: int,
    erb_bands: int = 32,
    cfg: StftConfig = StftConfig(),
    *,
    stage1: Literal["kalman", "nlms", "none"] = "kalman",
    lin_cfg=None,
) -> StreamState:
    """State for ``n_streams`` concurrent calls (leading axis = stream)."""
    one = stream_init(erb_bands, cfg, stage1=stage1, lin_cfg=lin_cfg)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_streams, *a.shape)).copy(), one
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "stage1", "lin_cfg", "normalize", "quality", "gain_norm"
    ),
)
def stream_step_batched(
    params: LittleNetParams,
    state: StreamState,  # leading stream axis on every leaf
    far_block: jax.Array,  # (S, hop)
    mic_block: jax.Array,  # (S, hop)
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    stage1: Literal["kalman", "nlms", "none"] = "kalman",
    lin_cfg=None,
    normalize: bool = False,
    quality: str = "parity",
    gain_norm: bool = False,
) -> tuple[StreamState, jax.Array]:
    """One 16 ms hop for MANY concurrent streams (the serving hot loop).

    vmap over the stream axis: every per-stream filter state, GRU state and
    OLA tail advances in parallel — one device program per audio block,
    thousands of live calls per chip (see benchmarks/baseline_configs.py
    'concurrent_streams'). ``quality`` as in stream_step: "parity"
    (default) keeps stage-1 inside the <=0.1 dB ERLE budget; "fast" trades
    -0.16 dB worst-case tail ERLE for ~1.4x serving throughput.
    """
    return jax.vmap(
        lambda s, f, m: _stream_step_core(
            params, s, f, m, erb, cfg, stage1, lin_cfg, normalize, quality,
            gain_norm,
        )
    )(state, far_block, mic_block)


def stream_run(
    params: LittleNetParams,
    far: np.ndarray,
    mic: np.ndarray,
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    stage1: Literal["kalman", "nlms", "none"] = "kalman",
    lin_cfg=None,
    erb_bands: int = 32,
    normalize: bool = False,
    quality: str = "parity",
    gain_norm: bool = False,
) -> np.ndarray:
    """Host convenience: run a whole utterance hop-by-hop (n % hop == 0)."""
    state = stream_init(erb_bands, cfg, stage1=stage1, lin_cfg=lin_cfg)
    outs = []
    for lo in range(0, len(mic), cfg.hop):
        state, out = stream_step(
            params,
            state,
            jnp.asarray(far[lo : lo + cfg.hop]),
            jnp.asarray(mic[lo : lo + cfg.hop]),
            erb,
            cfg,
            stage1=stage1,
            lin_cfg=lin_cfg,
            normalize=normalize,
            quality=quality,
            gain_norm=gain_norm,
        )
        outs.append(np.asarray(out))
    outs.append(np.asarray(stream_flush(
        params, state, erb, cfg, normalize=normalize, gain_norm=gain_norm
    )))
    # the first emitted block is the offline path's trimmed left edge — drop it
    return np.concatenate(outs)[cfg.hop :]
