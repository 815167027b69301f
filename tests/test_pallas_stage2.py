"""Fused Pallas stage-2 kernel == little_net_apply (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.kernels.pallas_stage2 import little_net_apply_fused_wav
from aec_tpu.models.little_net import little_net_apply, little_net_init


def _scene(rng, b, n):
    mic = rng.standard_normal((b, n)).astype(np.float32)
    ref = rng.standard_normal((b, n)).astype(np.float32)
    return jnp.asarray(mic), jnp.asarray(ref)


def test_fused_stage2_matches_apply(rng):
    cfg = StftConfig()
    params = little_net_init(jax.random.PRNGKey(3))
    erb = jnp.asarray(erb_filterbank())
    b, n = 3, 24 * cfg.hop
    mic, ref = _scene(rng, b, n)
    want = np.asarray(
        little_net_apply(params, mic, ref, erb, cfg, normalize=False)["wav"]
    )
    out = little_net_apply_fused_wav(
        params, mic, ref, erb, cfg, normalize=False, interpret=True,
        tile=2, dot_mode="high",
    )
    got = np.asarray(out["wav"])
    assert got.shape == want.shape
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=1e-3 * scale)
    # the mask intermediate matches the XLA apply too
    want_mask = np.asarray(
        little_net_apply(params, mic, ref, erb, cfg, normalize=False)["mask"]
    )
    np.testing.assert_allclose(
        np.asarray(out["mask"]), want_mask, atol=1e-3
    )


def test_fused_stage2_normalized_matches_apply(rng):
    """The pseudo-norm pre-pass reproduces normalize=True exactly."""
    cfg = StftConfig()
    params = little_net_init(jax.random.PRNGKey(4))
    erb = jnp.asarray(erb_filterbank())
    b, n = 2, 12 * cfg.hop
    mic, ref = _scene(rng, b, n)
    want = np.asarray(
        little_net_apply(params, mic, ref, erb, cfg, normalize=True)["wav"]
    )
    got = np.asarray(
        little_net_apply_fused_wav(
            params, mic, ref, erb, cfg, normalize=True, interpret=True,
            tile=2, dot_mode="high",
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=1e-3 * scale)


def test_fused_stage2_gain_norm_matches_apply(rng):
    """gain_norm (scale-sane synthesis) in-kernel == little_net_apply
    (round-4 verdict item 3: the preservation-trained checkpoint's
    deployed semantics must run on the fused path)."""
    cfg = StftConfig()
    params = little_net_init(jax.random.PRNGKey(5))
    erb = jnp.asarray(erb_filterbank())
    b, n = 2, 16 * cfg.hop
    mic, ref = _scene(rng, b, n)
    want = np.asarray(
        little_net_apply(
            params, mic, ref, erb, cfg, normalize=False, gain_norm=True
        )["wav"]
    )
    got = np.asarray(
        little_net_apply_fused_wav(
            params, mic, ref, erb, cfg, normalize=False, interpret=True,
            tile=2, dot_mode="high", gain_norm=True,
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=1e-3 * scale)
