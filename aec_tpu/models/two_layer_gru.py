"""TwoLayerGRUNet — the alternative ERB-domain masking net.

Re-design of the reference's ``TwoLayerGRUNet`` (ERB.py:74-200): same skeleton
as LittleNet but GRU(2E -> 2E), features ``[mic_erb || ref_erb]`` (plain
concat, no diff), NO skip concat before linear1, and NO input pseudo-norm
(the reference comments it out, ERB.py:125-127). Loss is the same compressed
ERB-magnitude MSE; the asymmetric-loss term the reference retains commented
out (ERB.py:187) is exposed via ``asym_weight``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig, split_complex
from aec_tpu.ops.gru import gru_init, gru_scan
from aec_tpu.models.little_net import LinearParams, _kaiming_uniform


def two_layer_gru_init(key: jax.Array, erb_bands: int = 32, dtype=jnp.float32):
    k_gru, k1, k2 = jax.random.split(key, 3)
    return {
        "gru": gru_init(k_gru, 2 * erb_bands, 2 * erb_bands, orthogonal=True, dtype=dtype),
        "lin1": LinearParams(
            w=_kaiming_uniform(k1, (erb_bands, 2 * erb_bands), np.sqrt(2.0), dtype),
            b=jnp.zeros((erb_bands,), dtype),
        ),
        "lin2": LinearParams(
            w=_kaiming_uniform(k2, (erb_bands, erb_bands), 1.0, dtype),
            b=jnp.zeros((erb_bands,), dtype),
        ),
    }


def two_layer_gru_apply(
    params,
    mic: jax.Array,
    ref: jax.Array,
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
) -> dict[str, jax.Array]:
    """mic/ref wav [B, n] -> enhanced wav + intermediates (ERB.py:123-182)."""
    mic_spec = stft_mod.stft(mic, cfg)
    ref_spec = stft_mod.stft(ref, cfg)
    mic_erb = stft_mod.magnitude(mic_spec) @ erb
    ref_erb = stft_mod.magnitude(ref_spec) @ erb
    feats = jnp.concatenate([mic_erb, ref_erb], axis=-1)  # ERB.py:158

    out1, _ = gru_scan(params["gru"], feats)
    hid = jax.nn.relu(out1 @ params["lin1"]["w"].T + params["lin1"]["b"])
    mask = jax.nn.sigmoid(hid @ params["lin2"]["w"].T + params["lin2"]["b"])

    est_erb = mask * mic_erb
    gain = est_erb @ erb.T
    re, im = split_complex(mic_spec)
    out_spec = jnp.concatenate([gain * re, gain * im], axis=-1)
    wav = stft_mod.istft(out_spec, cfg) + 1e-9
    return {"wav": wav, "est_erb": est_erb, "mask": mask}


def two_layer_gru_loss(
    params,
    mic: jax.Array,
    ref: jax.Array,
    near: jax.Array,
    erb: jax.Array,
    cfg: StftConfig = StftConfig(),
    *,
    asym_weight: float = 0.0,
    sqrt_eps: float = 0.0,
) -> tuple[jax.Array, dict[str, Any]]:
    """Compressed ERB-mag MSE + optional asymmetric penalty (ERB.py:184-189).

    ``sqrt_eps`` as in little_net_loss (float32 sqrt-gradient guard).
    """
    out = two_layer_gru_apply(params, mic, ref, erb, cfg)
    near_erb = stft_mod.magnitude(stft_mod.stft(near, cfg)) @ erb
    t, e = near_erb.shape[-2], near_erb.shape[-1]
    diff = jnp.sqrt(near_erb + sqrt_eps) - jnp.sqrt(out["est_erb"] + sqrt_eps)
    loss = jnp.sum(diff * diff) / (t * e)
    if asym_weight:
        asym = jnp.sum(jax.nn.relu(diff) ** 2) / (t * e)
        loss = (1.0 - asym_weight) * loss + asym_weight * asym
    return loss, {"wav": out["wav"], "est_erb": out["est_erb"]}
