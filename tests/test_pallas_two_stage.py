"""Single-kernel two-stage pipeline == scan composition (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.kernels.pallas_two_stage import two_stage_fused
from aec_tpu.models.little_net import little_net_init
from aec_tpu.pipeline.two_stage import two_stage_cancel


import pytest


@pytest.mark.parametrize("unroll", [1, 2])
def test_two_stage_fused_matches_composition(rng, unroll):
    params = little_net_init(jax.random.PRNGKey(5))
    erb = jnp.asarray(erb_filterbank())
    b, n = 3, 20 * 256
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    want = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb, normalize=False
    )
    got = two_stage_fused(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        interpret=True, tile=2, dot_mode="high", unroll=unroll,
    )
    for key in ("wav", "linear_wav"):
        w, g = np.asarray(want[key]), np.asarray(got[key])
        assert g.shape == w.shape, key
        scale = max(float(np.abs(w).max()), 1e-9)
        np.testing.assert_allclose(g, w, atol=2e-3 * scale, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(got["mask"]), np.asarray(want["mask"]), atol=2e-3
    )


def test_single_kernel_route_predicate():
    """Pin when two_stage_cancel(quality='fast') takes the ONE-kernel path:
    TPU + fast + kalman + no normalize + default stage-2 precision +
    hop-multiple length + 2x-overlap geometry — and nothing else."""
    from aec_tpu.configs import NlmsConfig
    from aec_tpu.dsp.stft import StftConfig
    from aec_tpu.pipeline.two_stage import _route_single_kernel

    base = dict(
        backend="tpu", stage1="kalman", lin_cfg=None, fast_legacy=False,
        quality="fast", normalize=False, p2=jax.lax.Precision.DEFAULT,
        scfg=StftConfig(), n=16 * 256,
    )
    assert _route_single_kernel(**base)
    assert _route_single_kernel(**{**base, "lin_cfg": KalmanConfig()})
    for bad in (
        {"backend": "cpu"},
        {"quality": "parity"},
        {"fast_legacy": True},
        {"stage1": "nlms"},
        {"lin_cfg": NlmsConfig()},
        {"normalize": True},
        {"p2": None},
        {"n": 1000},
        {"scfg": StftConfig(win_len=512, hop=128, fft_len=512)},
    ):
        assert not _route_single_kernel(**{**base, **bad}), bad


def test_two_stage_cpu_keeps_xla_paths(rng):
    """On the CPU backend two_stage_cancel must NOT route to the TPU-only
    Pallas kernels (stage-1 scan carries state; stage-2 XLA apply)."""
    from aec_tpu.linear.kalman import kalman_cancel

    params = little_net_init(jax.random.PRNGKey(6))
    erb = jnp.asarray(erb_filterbank())
    far = jnp.asarray(rng.standard_normal((2, 8 * 256)).astype(np.float32))
    mic = jnp.asarray(rng.standard_normal((2, 8 * 256)).astype(np.float32))
    out = two_stage_cancel(params, far, mic, erb, normalize=False)
    assert out["wav"].shape == far.shape
    # the stage-1 auto route stays scan on CPU (kernel path returns state=None)
    assert kalman_cancel(KalmanConfig(), far, mic)["state"] is not None


def test_two_stage_fused_gain_norm_matches_composition(rng):
    """Single-kernel route with gain_norm == the XLA composition with
    gain_norm (CPU backend keeps two_stage_cancel off the kernels)."""
    params = little_net_init(jax.random.PRNGKey(9))
    erb = jnp.asarray(erb_filterbank())
    b, n = 2, 16 * 256
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    want = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb, normalize=False,
        gain_norm=True,
    )
    got = two_stage_fused(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        interpret=True, tile=2, dot_mode="high", gain_norm=True,
    )
    for key in ("wav", "linear_wav"):
        w, g = np.asarray(want[key]), np.asarray(got[key])
        scale = max(float(np.abs(w).max()), 1e-9)
        np.testing.assert_allclose(g, w, atol=2e-3 * scale, err_msg=key)
