"""Stage-1 linear AEC: partitioned-block frequency-domain NLMS (MDF).

NEW component — no implementation exists in the reference repo (SURVEY.md §0
item 1); mandated by BASELINE.json config #1 ("Freq-domain NLMS linear AEC,
512-pt STFT, hop 256" => block B=256, FFT N=512). Standard published
algorithm (multidelay block frequency-domain adaptive filter, Soo & Pang
1990) designed TPU-first:

- the per-frame update is a pure function of a small state pytree; the frame
  recursion is ``lax.scan`` with ALL frequency bins and ALL partitions
  updated in parallel per step (VPU elementwise + one reduction over
  partitions + three DFT-basis matmuls);
- overlap-save structure models true linear convolution (high ERLE), with
  the optional gradient constraint (exact MDF) on by default;
- spectra/state are REAL ``[re || im]`` arrays (see overlap_save.py) — no
  complex dtype anywhere;
- batching over utterances is ``jax.vmap``; multi-chip scale-out shards the
  utterance axis (embarrassingly parallel).

Per bin k:  y[t,k] = sum_l W[l,k] X[t-l,k];   e = d - last_B(ifft(y))
            den[k] = p[k] + eps + eps_rel*mean_k(p) + beta*psi[k]
            W[l,k] += mu * conj(X[t-l,k]) * E[k] / den[k]

The two extra denominator terms (vs the textbook MDF) are the round-3
robustness defaults, measured on benchmarks/scenes.py (see NlmsConfig):
``eps_rel`` regularizes near-silent bins of harmonic far-ends, ``beta``
applies error-power step control under double talk — the same psi term the
Kalman sibling carries natively. ``eps_rel=0, beta=0`` recovers the classic
update.
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp

from aec_tpu.configs import NlmsConfig
from aec_tpu.linear import overlap_save as ols


class NlmsState(TypedDict):
    w: jax.Array  # (L, 2K) float32 ri — filter partitions per bin
    x_buf: jax.Array  # (L, 2K) float32 ri — far-end history, index 0 = newest
    power: jax.Array  # (K,) float32 — smoothed total far-end power
    psi: jax.Array  # (K,) float32 — smoothed residual psd (step control)


def nlms_init(cfg: NlmsConfig, n_freqs: int = 257, dtype=jnp.float32) -> NlmsState:
    return NlmsState(
        w=jnp.zeros((cfg.n_blocks, 2 * n_freqs), dtype=dtype),
        x_buf=jnp.zeros((cfg.n_blocks, 2 * n_freqs), dtype=dtype),
        power=jnp.zeros((n_freqs,), dtype=dtype),
        psi=jnp.zeros((n_freqs,), dtype=dtype),
    )


def nlms_step(
    cfg: NlmsConfig,
    state: NlmsState,
    x_t: jax.Array,
    d_t: jax.Array,
    *,
    block: int = 256,
    constrain: bool = True,
    precision=None,
) -> tuple[NlmsState, jax.Array]:
    """One block: far frame ri spectrum ``x_t`` [2K], mic time block [B].

    Returns (new_state, e_block [B]) — the echo-cancelled time samples.
    """
    precision = precision or ols._STAGE1_DEFAULT
    if isinstance(precision, tuple):  # per-op (p_y, p_e, p_constrain) — the
        p_y, p_e, p_c = precision     # y matmul is the cancellation-critical
    else:                             # one (see kalman.kalman_step docstring)
        p_y = p_e = p_c = precision
    x_buf = jnp.concatenate([x_t[None, :], state["x_buf"][:-1]], axis=0)
    xr, xi = ols.ri_split(x_buf)  # (L, K) each
    inst_power = jnp.sum(xr * xr + xi * xi, axis=0)
    power = cfg.power_smooth * state["power"] + (1.0 - cfg.power_smooth) * inst_power

    wr, wi = ols.ri_split(state["w"])
    y_ri = ols.ri_join(
        jnp.sum(wr * xr - wi * xi, axis=0), jnp.sum(wr * xi + wi * xr, axis=0)
    )
    e_block = d_t - ols.spectrum_to_block(y_ri, block, p_y)  # (B,)
    e_ri = ols.block_to_spectrum(e_block, block, p_e)  # (2K,)
    er, ei = ols.ri_split(e_ri)
    psi = cfg.err_smooth * state["psi"] + (1.0 - cfg.err_smooth) * (
        er * er + ei * ei
    )

    # conj(X) * E / den  (complex multiply with conjugated X, per partition);
    # den carries the robustness terms — see the module docstring
    den = power + cfg.eps + cfg.eps_rel * jnp.mean(power) + cfg.beta * psi
    inv_p = 1.0 / den
    grad = ols.ri_join((xr * er + xi * ei) * inv_p, (xr * ei - xi * er) * inv_p)
    if constrain:
        grad = ols.constrain_gradient(grad, block, p_c)
    w = state["w"] + cfg.mu * grad
    return NlmsState(w=w, x_buf=x_buf, power=power, psi=psi), e_block


def nlms_filter(
    cfg: NlmsConfig,
    x_spec: jax.Array,
    d_blocks: jax.Array,
    state: NlmsState | None = None,
    *,
    block: int = 256,
    constrain: bool = True,
    precision=None,
) -> tuple[jax.Array, NlmsState]:
    """Filter sequences: far ri spectra [T, 2K], mic blocks [T, B] -> e [T, B]."""
    if state is None:
        state = nlms_init(cfg, x_spec.shape[-1] // 2, dtype=x_spec.dtype)

    def step(s, xd):
        x_t, d_t = xd
        s, e_t = nlms_step(
            cfg, s, x_t, d_t, block=block, constrain=constrain, precision=precision
        )
        return s, e_t

    state, e_blocks = jax.lax.scan(step, state, (x_spec, d_blocks))
    return e_blocks, state


def nlms_cancel(
    cfg: NlmsConfig,
    far: jax.Array,
    mic: jax.Array,
    *,
    block: int = 256,
    constrain: bool = True,
    precision=None,
    fused: bool | None = None,
    quality: str = "parity",
) -> dict[str, jax.Array]:
    """Waveform in/out single-pair canceller (BASELINE config #1).

    ``far``/``mic``: [n] or [B, n]. Returns echo-cancelled ``wav`` (same
    length as input) plus the final filter state under ``state``.

    ``quality``: the north-star <=0.1 dB ERLE budget as a named contract.
    For NLMS the two settings route IDENTICALLY — batched fused kernels at
    ``dot_mode="balanced"`` (2-pass matrix-exact constraint), single-stream
    / scan at the full bf16_3x tier (``"high"`` / ``Precision.HIGH``).
    There is no safe faster tier here: the per-op MIXED tier that gives
    Kalman its ``"fast"`` mode LOSES 18-26 dB tail ERLE on NLMS's
    deep-convergence scenes (echo_only 88 dB, long_rir, bulk_delay —
    benchmarks/validate_precision.py ``nlms_erle``; bf16 matrix rounding in
    the 1-pass constraint floors the achievable null depth, which only
    binds when the filter converges far deeper than Kalman's ~47 dB).
    Mixed would be ~1.4x faster (10.5 vs 14.5 ms per 256 x 8.2 s,
    same-process ab_balanced_time) but that is not a trade ``"fast"`` is
    allowed to make silently; callers who accept the ERLE floor can pass
    the kernel's ``dot_mode="mixed"`` explicitly. ``quality`` is kept in
    the signature for API symmetry with kalman_cancel. Measured balanced
    worst case: -0.078 dB on an 88 dB scene, inside the budget on all 8
    battery scenes. An explicit ``precision`` (single Precision
    applied end-to-end incl. the analysis STFT, or a ``(p_y, p_e,
    p_constrain)`` tuple) overrides the knob on the scan path.

    ``fused``: whole recursion as one Pallas TPU kernel, VMEM-resident state
    (kernels/pallas_nlms.py; same design that made the Kalman single-stream
    path 8.5x faster and its batched path 1.4x — batch-in-lanes with the
    far-frame STFT fused in-kernel). None = auto: fused on the TPU backend
    at default constrain/precision for any shape. Fused returns
    ``state=None`` (resumable streaming keeps the scan via nlms_filter).
    """
    if quality not in ("parity", "fast"):
        raise ValueError(f"quality must be 'parity' or 'fast', got {quality!r}")
    if fused is None:
        fused = (
            constrain and precision is None and jax.default_backend() == "tpu"
        )
    if fused:
        # NO mixed tier for NLMS at either quality — see the docstring
        # (18-26 dB tail-ERLE loss on deep-convergence scenes)
        if far.ndim == 1:
            from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused

            out = nlms_cancel_fused(cfg, far, mic, block=block, dot_mode="high")
        else:
            from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused_batched_bl

            out = nlms_cancel_fused_batched_bl(
                cfg, far, mic, block=block, dot_mode="balanced"
            )
        return {"wav": out["wav"], "state": None}
    if precision is None:
        # both qualities: the scan's per-op mixed tier is unsafe for NLMS
        # for the same constraint-rounding reason as the kernels'
        precision = jax.lax.Precision.HIGH
    batched = far.ndim == 2
    if not batched:
        far, mic = far[None], mic[None]
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    x_spec = ols.far_end_spectra(
        farp, block, ols.spectra_precision_for(precision)
    )  # [B, T, 2K]
    d_blocks = ols.mic_blocks(micp, block)  # [B, T, Bk]

    e_blocks, state = jax.vmap(
        lambda x, d: nlms_filter(
            cfg, x, d, block=block, constrain=constrain, precision=precision
        )
    )(x_spec, d_blocks)
    wav = e_blocks.reshape(e_blocks.shape[0], -1)[:, :n]
    if not batched:
        wav = wav[0]
    return {"wav": wav, "state": state}
