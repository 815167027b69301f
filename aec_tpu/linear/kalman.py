"""Stage-1 linear AEC: partitioned-block frequency-domain Kalman filter.

NEW component — no reference implementation exists (SURVEY.md §0 item 1);
mandated by BASELINE.json config #2 ("10-block partition, single utterance").
Diagonalized state-space frequency-domain adaptive filter in the spirit of
Enzner & Vary (2006) / Kuech, Mabande & Enzner (2014), on the same
overlap-save (MDF) structure as :mod:`aec_tpu.linear.nlms` so linear
convolution is modeled exactly. TPU-first: one ``lax.scan`` over blocks;
every per-frame quantity is elementwise over the (L partitions x K bins)
grid plus one reduction over L; spectra/state are REAL ``[re || im]`` arrays
(see overlap_save.py — no complex dtype); utterance batching via ``vmap``.

Per bin k, partitions l, diagonal covariance P[l,k] (real):

  predict:  W-  = a * W                       (echo-path drift model)
            P-  = a^2 * P + (1 - a^2) |W|^2   (process noise)
  observe:  e   = d_block - last_B(ifft(sum_l W-[l] X[l]))
            psi = smoothed |E|^2              (observation-noise psd)
            den = sum_l |X[l]|^2 P-[l] + 2*psi
  update:   W   = W- + constrain(P-[l] conj(X[l]) E / den)
            P   = max(P- (1 - P- |X|^2 / den), floor)

(The factor 2 on psi reflects the overlap-save zero-padded error spectrum
carrying half the energy of a full frame — standard in PBFDKF derivations.)
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig
from aec_tpu.linear import overlap_save as ols


class KalmanState(TypedDict):
    w: jax.Array  # (L, 2K) float32 ri — echo-path estimate per partition/bin
    p: jax.Array  # (L, K) float32 — diagonal state covariance
    x_buf: jax.Array  # (L, 2K) float32 ri — far-end history, 0 = newest
    psi: jax.Array  # (K,) float32 — observation-noise psd estimate


def kalman_init(
    cfg: KalmanConfig, n_freqs: int = 257, dtype=jnp.float32
) -> KalmanState:
    return KalmanState(
        w=jnp.zeros((cfg.n_blocks, 2 * n_freqs), dtype=dtype),
        p=jnp.full((cfg.n_blocks, n_freqs), cfg.init_p, dtype=dtype),
        x_buf=jnp.zeros((cfg.n_blocks, 2 * n_freqs), dtype=dtype),
        psi=jnp.full((n_freqs,), cfg.psi_floor, dtype=dtype),
    )


def kalman_step(
    cfg: KalmanConfig,
    state: KalmanState,
    x_t: jax.Array,
    d_t: jax.Array,
    *,
    block: int = 256,
    constrain: bool = True,
    precision=None,
) -> tuple[KalmanState, jax.Array]:
    """One block update; far frame ri spectrum [2K], mic block [B] -> e [B].

    ``precision`` may be a single ``jax.lax.Precision`` for all three DFT
    matmuls, or a tuple ``(p_y, p_e, p_constrain)``. The numerically
    sensitive transform is the Y one (spectrum_to_block of the echo
    estimate): e = d - y CANCELS two nearly-equal signals, so y's relative
    matmul error bounds the achievable ERLE (single-pass bf16's ~0.4%
    caps it near 48 dB — measured as a -1.4 dB tail-ERLE loss on a 46 dB
    scene, benchmarks/validate_precision.py). The E and constraint matmuls
    act on the residual/update with no cancellation and tolerate bf16.
    """
    precision = precision or ols._STAGE1_DEFAULT
    if isinstance(precision, tuple):
        p_y, p_e, p_c = precision
    else:
        p_y = p_e = p_c = precision
    x_buf = jnp.concatenate([x_t[None, :], state["x_buf"][:-1]], axis=0)
    xr, xi = ols.ri_split(x_buf)  # (L, K)
    a2 = cfg.a * cfg.a

    # Predict.
    wr, wi = ols.ri_split(state["w"])
    wr_p, wi_p = cfg.a * wr, cfg.a * wi
    p_pred = a2 * state["p"] + (1.0 - a2) * (wr * wr + wi * wi) + cfg.q_min

    # Prior residual (overlap-save time domain), then its spectrum.
    y_ri = ols.ri_join(
        jnp.sum(wr_p * xr - wi_p * xi, axis=0), jnp.sum(wr_p * xi + wi_p * xr, axis=0)
    )
    e_block = d_t - ols.spectrum_to_block(y_ri, block, p_y)
    e_ri = ols.block_to_spectrum(e_block, block, p_e)
    er, ei = ols.ri_split(e_ri)
    psi = cfg.obs_smooth * state["psi"] + (1.0 - cfg.obs_smooth) * (er * er + ei * ei)
    psi = jnp.maximum(psi, cfg.psi_floor)

    # Gain and update: upd = P- conj(X) E / den (complex mult, per partition).
    x_mag2 = xr * xr + xi * xi  # (L, K)
    den = jnp.sum(x_mag2 * p_pred, axis=0) + 2.0 * psi  # (K,)
    er_d, ei_d = er / den, ei / den
    upd = ols.ri_join(
        p_pred * (xr * er_d + xi * ei_d), p_pred * (xr * ei_d - xi * er_d)
    )
    if constrain:
        upd = ols.constrain_gradient(upd, block, p_c)
    w = ols.ri_join(wr_p, wi_p) + upd
    p = p_pred * (1.0 - p_pred * x_mag2 / den)
    p = jnp.maximum(p, cfg.psi_floor)

    return KalmanState(w=w, p=p, x_buf=x_buf, psi=psi), e_block


def kalman_filter(
    cfg: KalmanConfig,
    x_spec: jax.Array,
    d_blocks: jax.Array,
    state: KalmanState | None = None,
    *,
    block: int = 256,
    constrain: bool = True,
    precision=None,
) -> tuple[jax.Array, KalmanState]:
    """Filter sequences: far ri spectra [T, 2K], mic blocks [T, B] -> e [T, B]."""
    if state is None:
        state = kalman_init(cfg, x_spec.shape[-1] // 2, dtype=x_spec.dtype)

    def step(s, xd):
        x_t, d_t = xd
        s, e_t = kalman_step(
            cfg, s, x_t, d_t, block=block, constrain=constrain, precision=precision
        )
        return s, e_t

    state, e_blocks = jax.lax.scan(step, state, (x_spec, d_blocks))
    return e_blocks, state


def kalman_cancel(
    cfg: KalmanConfig,
    far: jax.Array,
    mic: jax.Array,
    *,
    block: int = 256,
    constrain: bool = True,
    precision=None,
    fused: bool | None = None,
    quality: str = "parity",
) -> dict[str, jax.Array]:
    """Waveform in/out canceller (BASELINE config #2). [n] or [B, n].

    ``quality`` names the north-star ERLE budget (BASELINE.md: <= 0.1 dB
    deviation vs the fp32 reference pipeline) as a first-class contract:

    - ``"parity"`` (DEFAULT): batched fused kernels run ``dot_mode=
      "balanced"`` — y/far-analysis dots full bf16_3x, the constraint pair
      as the 2-pass MATRIX-exact split, the residual dot 1-pass
      (bl_common.stage1_dots; the split follows the on-chip sensitivity
      A/Bs in benchmarks/ab_perop*.py: ALL of mixed's ERLE loss is the
      constraint's matrix rounding). Measured <= 0.006 dB tail-ERLE
      deviation vs the fp32 oracle on all 8 battery scenes
      (benchmarks/validate_precision.py, fused_balanced column) at 1.23x
      the throughput of the all-3-pass "high" tier (15.9 vs 19.5 ms per
      256 x 8.2 s). The single-stream kernel and the XLA scan keep the
      full >= bf16_3x tier ("high" / ``Precision.HIGH``, +-0.00 dB) —
      they are not matmul-bound, balanced buys nothing there.
    - ``"fast"``: per-op MIXED precision — the cancellation-critical y
      matmul stays HIGH, residual/update drop to single-pass bf16
      (overlap_save._STAGE1_DEFAULT; fused ``dot_mode="mixed"``). Measured
      -0.16 dB tail-ERLE worst case, ONLY on scenes already >40 dB ERLE,
      for ~1.2-1.4x throughput over parity — outside the strict budget, so
      it is the opt-in mode.

    An explicit ``precision`` overrides the knob on the scan path: a single
    Precision (HIGH/HIGHEST) applies end-to-end (analysis STFT included —
    overlap_save.spectra_precision_for), or pass a ``(p_y, p_e,
    p_constrain)`` tuple for custom splits.

    ``fused``: run the whole recursion as ONE Pallas TPU kernel with the
    filter state resident in VMEM (kernels/pallas_kalman.py) — measured
    8.5x faster for the single-stream case (0.95 ms vs 8.1 ms per 16 s
    utterance on v5e; round-1's opposite conclusion was an artifact of the
    ~25 ms tunnel dispatch floor, see CLAUDE.md) and 1.4-1.7x faster for
    batched inputs via the batch-in-lanes kernel with the far-frame STFT
    fused in-kernel (scan 20.2 ms -> kernel 14.2 ms for 256 x 8.2 s; also
    wins at batch 16 and 64; ERLE within 0.04 dB of the scan on chip).
    ``None`` = auto: fused on the TPU backend at default constrain/precision
    for any input shape. The fused paths return ``state=None`` (resumable
    streaming keeps the scan via kalman_filter/kalman_step).
    """
    if quality not in ("parity", "fast"):
        raise ValueError(f"quality must be 'parity' or 'fast', got {quality!r}")
    if fused is None:
        fused = (
            constrain and precision is None and jax.default_backend() == "tpu"
        )
    if fused:
        if far.ndim == 1:
            from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused

            # single-stream: "balanced" degenerates to "high" in-kernel
            # (not matmul-bound) — route "high" for clarity
            dot_mode = "high" if quality == "parity" else "mixed"
            out = kalman_cancel_fused(cfg, far, mic, block=block, dot_mode=dot_mode)
        else:
            from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl

            dot_mode = "balanced" if quality == "parity" else "mixed"
            out = kalman_cancel_fused_batched_bl(
                cfg, far, mic, block=block, dot_mode=dot_mode
            )
        return {"wav": out["wav"], "state": None}
    if precision is None and quality == "parity":
        precision = jax.lax.Precision.HIGH
    batched = far.ndim == 2
    if not batched:
        far, mic = far[None], mic[None]
    n = mic.shape[-1]
    farp = ols.pad_to_blocks(far, block)
    micp = ols.pad_to_blocks(mic, block)
    x_spec = ols.far_end_spectra(
        farp, block, ols.spectra_precision_for(precision)
    )
    d_blocks = ols.mic_blocks(micp, block)

    e_blocks, state = jax.vmap(
        lambda x, d: kalman_filter(
            cfg, x, d, block=block, constrain=constrain, precision=precision
        )
    )(x_spec, d_blocks)
    wav = e_blocks.reshape(e_blocks.shape[0], -1)[:, :n]
    if not batched:
        wav = wav[0]
    return {"wav": wav, "state": state}
