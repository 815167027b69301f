"""LittleNet — the production ERB-domain residual-echo-suppression post-filter.

TPU-native re-design of the reference's ``Little_net`` (ERB.py:203-335,
~12.5k params: GRU(64->32) + Linear(64->32) + Linear(32->32)). Pure-functional
param pytree + jittable apply; STFT/ERB/mask/iSTFT are all MXU matmuls, the
only recurrence is the GRU ``lax.scan``.

Forward contract (parity with ERB.py:252-334, quirks preserved per SURVEY §2.4):
1. global scalar pseudo-norm: ``x - mean(x)/std(x)`` — a single scalar ratio
   subtracted from the whole batch, std unbiased (ERB.py:254-256);
2. STFT of mic/ref/near (512/256 hann, both-side pad);
3. magnitudes with in-sqrt 1e-9 epsilon (ERB.py:277-279);
4. ERB projection ``mag @ erb`` (analysis-only 257x32 matrix);
5. features ``[mic_erb || |mic_erb - ref_erb|]`` (ERB.py:287-290);
6. GRU(64->32) -> concat with mic_erb -> Linear+ReLU -> Linear+Sigmoid;
7. ``est_erb = mask * mic_erb``; back-projection ``est_erb @ erb.T``; the SAME
   projected gain multiplies real and imag (ERB.py:304-310);
8. iSTFT + 1e-9 (ERB.py:314-316);
9. loss = sum |near_erb^0.5 - est_erb^0.5|^2 / (T * n_bands)  — note: summed
   over batch, normalized by T*bands only (ERB.py:318-323).
"""

from __future__ import annotations

from typing import Any, TypedDict

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig, split_complex
from aec_tpu.ops.gru import GruParams, gru_init, gru_scan


class LinearParams(TypedDict):
    w: jax.Array  # (out, in) — torch layout for checkpoint parity
    b: jax.Array  # (out,)


class LittleNetParams(TypedDict):
    gru: GruParams
    lin1: LinearParams
    lin2: LinearParams


def _kaiming_uniform(key, shape, gain: float, dtype):
    """torch ``kaiming_uniform_(mode='fan_in')``: U(-g*sqrt(3/fan_in), +)."""
    fan_in = shape[1]
    bound = gain * np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def little_net_init(
    key: jax.Array, erb_bands: int = 32, dtype=jnp.float32, width: int = 1
) -> LittleNetParams:
    """Init mirroring the reference policy (ERB.py:227-250):

    orthogonal GRU weights; linear1 kaiming-uniform with ReLU gain sqrt(2);
    linear2 kaiming-uniform with sigmoid gain 1.0; zero linear biases.

    ``width`` scales the GRU hidden/lin1 dims (hidden = width * erb_bands;
    the mask output stays erb_bands). ``width=1`` is the reference's exact
    12,544-param geometry; 2/4 are the round-5 capacity-ceiling experiment
    (33,248 / 99,232 params — VERDICT r4 item 5). ``little_net_apply`` derives
    every shape from the params, so wider checkpoints run the same forward
    (the fused Pallas kernels are width-1 only; routing guards on it).
    """
    k_gru, k1, k2 = jax.random.split(key, 3)
    hidden = width * erb_bands
    return LittleNetParams(
        gru=gru_init(k_gru, 2 * erb_bands, hidden, orthogonal=True, dtype=dtype),
        lin1=LinearParams(
            w=_kaiming_uniform(
                k1, (hidden, hidden + erb_bands), np.sqrt(2.0), dtype
            ),
            b=jnp.zeros((hidden,), dtype),
        ),
        lin2=LinearParams(
            w=_kaiming_uniform(k2, (erb_bands, hidden), 1.0, dtype),
            b=jnp.zeros((erb_bands,), dtype),
        ),
    )


def little_net_width(params: LittleNetParams, erb_bands: int = 32) -> int:
    """Width multiplier of a (possibly widened) LittleNet param tree."""
    return params["gru"]["w_hh"].shape[-1] // erb_bands


def _pseudo_norm(x: jax.Array, per_utt: bool = False) -> jax.Array:
    """Reference quirk §2.4.1: subtract the scalar mean/std ratio (ERB.py:254).

    ``per_utt=True`` computes the scalar per utterance (last axis) instead of
    over the whole batch tensor. The reference Tester runs batch=1
    (test.py:139), where the two are identical; per-utterance is the faithful
    extension when enhancing many utterances in one device batch — each comes
    out exactly as a batch=1 reference run would produce it.
    """
    # std == 0 (an all-constant tensor, e.g. an all-silent-near training
    # batch — hit by small-batch recipes, p = 0.3^batch per step) makes
    # mean/std 0/0 = NaN — the reference's torch code shares the hazard
    # (x.mean()/x.std(), ERB.py:254). DOCUMENTED DIVERGENCE: define the
    # ratio as 0 there (a constant signal needs no offset). The guard sits
    # inside the sqrt (double-where) so the backward pass is NaN-free too:
    # sqrt'(0) = inf would otherwise poison gradients even on the dead
    # branch (0 cotangent * inf = NaN).
    def _safe_ratio(mean, var):
        nz = var > 0.0
        std = jnp.sqrt(jnp.where(nz, var, 1.0))
        return jnp.where(nz, mean / std, 0.0)

    if per_utt:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        n = x.shape[-1]
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (n - 1)
        return x - _safe_ratio(mean, var)
    mean = jnp.mean(x)
    # torch.std default: unbiased (ddof=1) over all elements
    var = jnp.sum((x - mean) ** 2) / (x.size - 1)
    return x - _safe_ratio(mean, var)


def little_net_features(
    mic: jax.Array,
    ref: jax.Array,
    erb: jax.Array,
    cfg: StftConfig,
    precision=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Shared feature path: returns (gru_input [B,T,2E], mic_erb, mic_spec).

    ``precision`` controls the STFT DFT-basis matmuls (None = parity-grade
    Precision.HIGHEST; see little_net_apply).
    """
    precision = precision or stft_mod._HIGHEST
    mic_spec = stft_mod.stft(mic, cfg, precision=precision)  # [B, T, 2K]
    ref_spec = stft_mod.stft(ref, cfg, precision=precision)
    mic_erb = stft_mod.magnitude(mic_spec) @ erb  # [B, T, E]
    ref_erb = stft_mod.magnitude(ref_spec) @ erb
    feats = jnp.concatenate([mic_erb, jnp.abs(mic_erb - ref_erb)], axis=-1)
    return feats, mic_erb, mic_spec


def little_net_apply(
    params: LittleNetParams,
    mic: jax.Array,
    ref: jax.Array,
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    normalize: bool = True,
    per_utt_norm: bool = False,
    precision=None,
    gain_norm: bool = False,
) -> dict[str, jax.Array]:
    """Forward pass: mic/ref wav [B, n] -> enhanced wav + intermediates.

    Returns dict with ``wav`` [B, n], ``est_erb`` [B, T, E], ``mask``.
    ``normalize`` applies the reference's global pseudo-norm to mic/ref
    (the `near` branch of the norm lives in :func:`little_net_loss`);
    ``per_utt_norm`` switches the scalar to per-utterance (see _pseudo_norm).

    ``precision`` sets the STFT/iSTFT DFT-basis matmul precision. ``None``
    (default) is parity-grade ``Precision.HIGHEST``; pass
    ``jax.lax.Precision.DEFAULT`` for single-pass bf16 MXU — measured on the
    enhanced waveform to differ by <1e-3 relative (see
    benchmarks/validate_precision.py), used by the throughput benchmarks.
    """
    precision = precision or stft_mod._HIGHEST
    if normalize:
        mic = _pseudo_norm(mic, per_utt_norm)
        ref = _pseudo_norm(ref, per_utt_norm)
    feats, mic_erb, mic_spec = little_net_features(
        mic, ref, erb, cfg, precision=precision
    )

    out1, _ = gru_scan(params["gru"], feats)  # [B, T, E]
    hid = jnp.concatenate([out1, mic_erb], axis=-1)  # skip concat (ERB.py:295)
    hid = jax.nn.relu(hid @ params["lin1"]["w"].T + params["lin1"]["b"])
    mask = jax.nn.sigmoid(hid @ params["lin2"]["w"].T + params["lin2"]["b"])

    est_erb = mask * mic_erb  # [B, T, E]
    gain = est_erb @ erb.T  # un-normalized back-projection (ERB.py:306-307)
    if gain_norm:
        # scale-sane synthesis (DELIBERATE DIVERGENCE, opt-in): the
        # reference multiplies the spectrum by est_erb @ erb.T — a
        # MAGNITUDE-valued gain, so the waveform scale is ill-defined
        # (ERB.py:306-310). Suppression-trained masks dodge it (est -> 0);
        # preservation-trained masks (asym loss) amplify the output by the
        # mic's own ERB magnitude (+20 dB measured on speech_dtalk,
        # round 4). Dividing by the SAME back-projection of the unmasked
        # magnitudes turns the gain into a per-bin CONVEX COMBINATION of
        # the sigmoid mask (weights mic_erb*erb >= 0, so gain in [0, 1])
        # while keeping the trained mask semantics. Measured on the
        # asym-trained checkpoint: speech_dtalk STOI 0.710 -> 0.720,
        # SI-SNR 3.8 -> 5.4 dB, E_out lands exactly on the near end's
        # level; echo-only ERLE 37 -> 55 dB (the constant est-floor the
        # magnitude gain carries is removed too).
        gain = gain / (mic_erb @ erb.T + 1e-9)
    re, im = split_complex(mic_spec)
    out_spec = jnp.concatenate([gain * re, gain * im], axis=-1)
    wav = stft_mod.istft(out_spec, cfg, precision=precision) + 1e-9  # (ERB.py:314-316)
    return {"wav": wav, "est_erb": est_erb, "mask": mask, "mic_spec": mic_spec}


def little_net_loss(
    params: LittleNetParams,
    mic: jax.Array,
    ref: jax.Array,
    near: jax.Array,
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    normalize: bool = True,
    sqrt_eps: float = 0.0,
    asym_weight: float = 0.0,
    gain_norm: bool = False,
    sisnr_weight: float = 0.0,
) -> tuple[jax.Array, dict[str, Any]]:
    """Training objective: compressed ERB-magnitude MSE (ERB.py:318-323).

    Returns (loss, aux) where aux carries the enhanced waveform.

    ``sqrt_eps=0`` is exact parity. For training we pass a tiny epsilon into
    the sqrt: ``est_erb = mask * mic_erb`` can underflow to exactly 0 in
    float32 (sigmoid underflow), where d sqrt/dx = inf poisons every gradient
    — a hazard the reference's torch code shares. Documented divergence, like
    the zero_grad fix (SURVEY §2.4.4).

    ``asym_weight`` adds the reference's asymmetric speech-preservation
    term (computed-but-unused / commented out at ERB.py:184-198):
    ``loss += w * sum(relu(near_erb^0.5 - est_erb^0.5)^2) / (T*E)`` — it
    penalizes only UNDER-estimation of the near end (est below near), i.e.
    near-end speech the mask removed, and is indifferent to residual echo,
    so it counterweights over-suppression in double talk. The reference's
    commented combination is ``alpha*loss_mag + (1-alpha)*loss_asym``;
    ours is the additive form ``loss_mag + w*loss_asym`` (w=0 is exact
    parity with the live reference loss).

    ``gain_norm`` synthesizes the aux waveform (and the sisnr term below)
    through the scale-sane convex gain (see :func:`little_net_apply`) —
    use it when the deployment path runs ``gain_norm=True`` so the
    waveform the loss sees IS the deployed waveform. The ERB-magnitude MSE
    term is unaffected (it reads ``est_erb``, upstream of synthesis).

    ``sisnr_weight`` adds a waveform-domain speech-preservation term (no
    reference counterpart — their declared sisdr metric is never computed,
    SURVEY §2.4.7): ``-w/10 * mean_active(si_snr(wav, near))``, the
    per-scene SI-SNR of the synthesized output against the near end,
    averaged over scenes whose near end is active (silent-near scenes
    contribute no term — SI-SNR against silence is undefined). This
    optimizes the deployed double-talk metric directly, through the
    synthesis path, which the ERB-magnitude MSE only proxies.
    """
    # activity decided on the RAW near end: the pseudo-norm below shifts a
    # silent scene to a DC constant (the global mean/std ratio), which
    # would otherwise count as "active" for the sisnr term
    near_act = (jnp.mean(near * near, axis=-1) > 1e-8).astype(jnp.float32)
    if normalize:
        mic = _pseudo_norm(mic)
        ref = _pseudo_norm(ref)
        near = _pseudo_norm(near)
    out = little_net_apply(
        params, mic, ref, erb, cfg, normalize=False, gain_norm=gain_norm
    )
    near_erb = stft_mod.magnitude(stft_mod.stft(near, cfg)) @ erb  # [B, T, E]
    t, e = near_erb.shape[-2], near_erb.shape[-1]
    diff = jnp.sqrt(near_erb + sqrt_eps) - jnp.sqrt(out["est_erb"] + sqrt_eps)
    loss = jnp.sum(diff * diff) / (t * e)
    if asym_weight:
        under = jax.nn.relu(diff)  # near above estimate: removed near-end
        loss = loss + asym_weight * jnp.sum(under * under) / (t * e)
    if sisnr_weight:
        from aec_tpu.train.metrics import si_snr

        wav = out["wav"][..., : near.shape[-1]]
        per = jax.vmap(lambda w, n_: si_snr(w[None], n_[None]))(wav, near)
        mean_db = jnp.sum(per * near_act) / jnp.maximum(jnp.sum(near_act), 1.0)
        loss = loss - sisnr_weight * mean_db / 10.0
    return loss, {"wav": out["wav"], "est_erb": out["est_erb"]}


def param_count(params) -> int:
    """Total trainable parameters (tools.py:25-27 equivalent)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
