"""Two-stage AEC composition: stage-1 linear canceller -> stage-2 post-filter.

The north star's full pipeline (BASELINE.json config #5): partitioned-block
Kalman (or NLMS) removes the linear echo, then LittleNet suppresses the
residual. The reference only ships stage-2 and assumes stage-1 ran offline
(SURVEY.md §0 item 1); here the composition is one jittable device function,
batched over utterances, so 10k-utterance runs are a vmap + data-parallel
shard away.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.linear.nlms import nlms_cancel
from aec_tpu.models.little_net import LittleNetParams, little_net_apply


def _route_single_kernel(
    *, backend, stage1, lin_cfg, fast_legacy, quality, normalize, p2, scfg, n
) -> bool:
    """True when the whole pipeline can run as ONE Pallas kernel.

    v5e, batch 256 x 8.2 s, same-process A/B (kernels/pallas_two_stage.py):
    single kernel mixed tile=256 = 12.83 ms vs 13.43 ms for the two-kernel
    composition — the fast-mode win that makes this the default route. The
    parity tier stays on the composition: with the balanced stage-1 tier
    (round-3) the single kernel at balanced/u1 is a dead heat with the
    composition (17.86 vs 17.96 ms same-process; ab_balanced_time), so the
    composition keeps the route for its per-stage reusability. The legacy
    ``fast=True`` all-DEFAULT tier keeps the composition too: the single
    kernel's "mixed" runs the cancellation-critical dots at bf16_3x, which
    would silently RAISE that path's precision.
    """
    return (
        backend == "tpu"
        and quality == "fast"
        and not fast_legacy
        and stage1 == "kalman"
        and (lin_cfg is None or isinstance(lin_cfg, KalmanConfig))
        and not normalize
        and p2 == jax.lax.Precision.DEFAULT
        and n % scfg.hop == 0
        # same 2x-overlap geometry guard as the stage-2 kernel route below
        and scfg.win_len == 2 * scfg.hop
        and scfg.fft_len == scfg.win_len
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "stage1", "scfg", "lin_cfg", "normalize", "fast", "stage2_precision",
        "quality", "gain_norm",
    ),
)
def two_stage_cancel(
    params: LittleNetParams,
    far: jax.Array,
    mic: jax.Array,
    erb: jax.Array,
    *,
    stage1: Literal["kalman", "nlms", "none"] = "kalman",
    lin_cfg: KalmanConfig | NlmsConfig | None = None,
    scfg: StftConfig = StftConfig(),
    normalize: bool = False,
    fast: bool = False,
    stage2_precision=jax.lax.Precision.DEFAULT,
    quality: str = "parity",
    gain_norm: bool = False,
) -> dict[str, jax.Array]:
    """far/mic wav [n] or [B, n] -> enhanced wav (same shape).

    ``normalize`` applies LittleNet's global pseudo-norm to its inputs (the
    reference trains that way; for enhancement-only runs the default False
    keeps the pipeline causal-equivalent to the streaming runtime).

    Precision policy (production defaults; benchmarks/validate_precision.py
    has the v5e measurements):

    - ``quality`` names the north-star <=0.1 dB ERLE budget for stage-1:
      ``"parity"`` (DEFAULT) routes batched fused kernels to ``dot_mode=
      "balanced"`` (2-pass matrix-exact constraint; <=0.006 dB tail-ERLE
      deviation vs the fp32 oracle on all 8 battery scenes) and scan /
      single-stream paths to the full bf16_3x tier (``Precision.HIGH`` /
      ``dot_mode="high"``, +-0.00 dB); ``"fast"`` opts into per-op MIXED
      precision (-0.16 dB tail-ERLE worst case, only on scenes already
      >40 dB ERLE, ~1.2x faster). See linear/kalman.kalman_cancel. Batched
      ``"fast"`` calls on TPU run the WHOLE pipeline as a single Pallas
      kernel (kernels/pallas_two_stage.py; 12.8 vs 13.4 ms for the
      two-kernel composition at batch 256 x 8.2 s) — identical column ops,
      so the waveform matches the composition at the same dot tiers.
    - stage-2 STFT/iSTFT run at ``stage2_precision`` = single-pass bf16 MXU
      by default: the enhanced waveform differs from HIGHEST by -50.9 dB SNR
      while the apply runs 2.0x faster (19.9 -> 9.85 ms at batch 256) — the
      post-filter is not cancellation-critical, so this sits inside the
      budget at either ``quality``. Pass ``stage2_precision=None`` for
      parity-grade HIGHEST.
    - ``fast=True`` (legacy, overrides ``quality``) forces BOTH stages
      all-DEFAULT — for Kalman that loses up to 1.45 dB tail-ERLE on
      >40 dB-ERLE scenes (0.00 dB on double-talk and path-change). NLMS is
      EXEMPT from the stage-1 downgrade at this knob too: an all-DEFAULT
      NLMS scan sits below even the mixed tier that measures -18 to -26 dB
      on deep-convergence scenes (linear/nlms.py), a trade no named mode
      makes silently — with ``stage1="nlms"`` only stage 2 drops to
      DEFAULT.

    ``gain_norm`` opts into the scale-sane ERB synthesis (see
    little_net_apply — the reference's un-normalized back-projection makes
    the wav scale ill-defined for preservation-trained masks). Supported on
    EVERY route since round 5 (fused stage-2 + single two-stage kernels
    carry it as one extra back-projection dot per frame, measured ~neutral
    — ab_gain_norm_r5.json); recommended for the asym-trained dtalk
    checkpoint.

    Returns dict with ``wav`` (final), ``linear_wav`` (stage-1 output), and
    the stage-2 ``mask``.
    """
    # NLMS refuses every unsafe stage-1 tier (see its docstring); the
    # legacy all-DEFAULT knob only downgrades stage 2 for it
    precision = (
        jax.lax.Precision.DEFAULT if fast and stage1 != "nlms" else None
    )
    p2 = jax.lax.Precision.DEFAULT if fast else stage2_precision
    q1 = "fast" if fast else quality
    # the fused kernels bake the reference's width-1 LittleNet geometry
    # (GRU hidden == erb bands); widened checkpoints (little_net_init
    # width>1, the round-5 capacity experiment) take the XLA apply
    std_width = params["gru"]["w_hh"].shape[-1] == erb.shape[-1]
    if far.ndim == 2 and std_width and _route_single_kernel(
        backend=jax.default_backend(), stage1=stage1, lin_cfg=lin_cfg,
        fast_legacy=fast, quality=q1, normalize=normalize, p2=p2, scfg=scfg,
        n=far.shape[-1],
    ):
        # batched only: single utterances keep the dedicated single-stream
        # fused kernels (a batch tile of 1 would waste the whole lane axis)
        from aec_tpu.kernels.pallas_two_stage import two_stage_fused

        return two_stage_fused(
            params, far, mic, erb, kcfg=lin_cfg or KalmanConfig(), scfg=scfg,
            gain_norm=gain_norm,
        )
    if stage1 == "kalman":
        lin = kalman_cancel(
            lin_cfg or KalmanConfig(), far, mic, block=scfg.hop,
            precision=precision, quality=q1,
        )
        linear_wav = lin["wav"]
    elif stage1 == "nlms":
        lin = nlms_cancel(
            lin_cfg or NlmsConfig(), far, mic, block=scfg.hop,
            precision=precision, quality=q1,
        )
        linear_wav = lin["wav"]
    else:
        linear_wav = mic

    batched = linear_wav.ndim == 2
    lw = linear_wav if batched else linear_wav[None]
    fw = far if batched else far[None]
    # stage-2 fused Pallas kernel on TPU at the production DEFAULT tier:
    # 6.3 ms vs 10.1 ms XLA apply at batch 256 x 8.2 s, waveform equal to
    # 1.6e-7 relative (kernels/pallas_stage2.py). The XLA path remains for
    # parity-grade precisions and hop-fractional lengths (whose trailing
    # frame count differs).
    if (
        jax.default_backend() == "tpu"
        and std_width
        and p2 == jax.lax.Precision.DEFAULT
        and lw.shape[-1] % scfg.hop == 0
        # the fused kernel assumes the default 2x-overlap geometry; other
        # StftConfigs fall back to the XLA apply instead of shape-erroring
        # inside the Pallas trace
        and scfg.win_len == 2 * scfg.hop
        and scfg.fft_len == scfg.win_len
    ):
        from aec_tpu.kernels.pallas_stage2 import little_net_apply_fused_wav

        out = little_net_apply_fused_wav(
            params, lw, fw, erb, scfg, normalize=normalize,
            gain_norm=gain_norm,
        )
    else:
        out = little_net_apply(
            params, lw, fw, erb, scfg, normalize=normalize, precision=p2,
            gain_norm=gain_norm,
        )
    wav, mask = out["wav"], out["mask"]
    if not batched:
        wav, mask = wav[0], mask[0]
    return {"wav": wav, "linear_wav": linear_wav, "mask": mask}
