"""Streaming == offline equivalence (SURVEY §7.3 'hard parts' item 4)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.models.little_net import little_net_apply, little_net_init
from aec_tpu.pipeline.streaming import stream_run
from aec_tpu.pipeline.two_stage import two_stage_cancel

CFG = StftConfig()


def _scene(rng, n):
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(600) / 100.0) * rng.standard_normal(600)).astype(np.float32)
    echo = np.convolve(far, 0.4 * rir)[:n].astype(np.float32)
    near = 0.3 * rng.standard_normal(n).astype(np.float32)
    return far, (echo + near).astype(np.float32)


def test_stage2_streaming_equals_offline(rng):
    params = little_net_init(jax.random.PRNGKey(7))
    erb = jnp.asarray(erb_filterbank())
    n = 16 * 256
    far, mic = _scene(rng, n)

    offline = little_net_apply(
        params, jnp.asarray(mic)[None], jnp.asarray(far)[None], erb, CFG,
        normalize=False,
    )["wav"][0]
    streamed = stream_run(params, far, mic, erb, CFG, stage1="none")
    assert streamed.shape == (n,)
    # fp32 scan-vs-step recurrence drift bounded at ~1e-3 of signal scale
    scale = float(np.max(np.abs(np.asarray(offline))))
    np.testing.assert_allclose(streamed, np.asarray(offline), atol=2e-3 * scale)


def test_two_stage_streaming_equals_offline(rng):
    params = little_net_init(jax.random.PRNGKey(8))
    erb = jnp.asarray(erb_filterbank())
    n = 24 * 256
    far, mic = _scene(rng, n)
    kcfg = KalmanConfig()

    offline = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        stage1="kalman", lin_cfg=kcfg, scfg=CFG, normalize=False,
    )["wav"]
    streamed = stream_run(params, far, mic, erb, CFG, stage1="kalman", lin_cfg=kcfg)
    scale = float(np.max(np.abs(np.asarray(offline))))
    np.testing.assert_allclose(streamed, np.asarray(offline), atol=2e-3 * scale)


def test_batched_streaming_matches_single(rng):
    from aec_tpu.pipeline.streaming import (
        stream_init,
        stream_init_batched,
        stream_step,
        stream_step_batched,
    )

    params = little_net_init(jax.random.PRNGKey(10))
    erb = jnp.asarray(erb_filterbank())
    s, hop = 3, 256
    far = rng.standard_normal((s, 4, hop)).astype(np.float32)
    mic = rng.standard_normal((s, 4, hop)).astype(np.float32)

    bstate = stream_init_batched(s, stage1="kalman")
    bouts = []
    for t in range(4):
        bstate, out = stream_step_batched(
            params, bstate, jnp.asarray(far[:, t]), jnp.asarray(mic[:, t]), erb
        )
        bouts.append(np.asarray(out))

    for i in range(s):
        st = stream_init(stage1="kalman")
        for t in range(4):
            st, out = stream_step(
                params, st, jnp.asarray(far[i, t]), jnp.asarray(mic[i, t]), erb
            )
            scale = float(np.max(np.abs(np.asarray(out)))) + 1e-9
            np.testing.assert_allclose(bouts[t][i], np.asarray(out), atol=1e-4 * scale)


def test_two_stage_fast_mode(rng):
    # fast=True (bf16-pass stage-1 matmuls) must stay close to full precision
    params = little_net_init(jax.random.PRNGKey(11))
    erb = jnp.asarray(erb_filterbank())
    n = 16 * 256
    far, mic = _scene(rng, n)
    full = two_stage_cancel(params, jnp.asarray(far), jnp.asarray(mic), erb)
    fast = two_stage_cancel(params, jnp.asarray(far), jnp.asarray(mic), erb, fast=True)
    scale = float(np.max(np.abs(np.asarray(full["wav"])))) + 1e-9
    # on CPU both run fp32; on TPU fast mode diverges at the bf16 level
    np.testing.assert_allclose(
        np.asarray(fast["wav"]), np.asarray(full["wav"]), atol=5e-2 * scale
    )


def test_profiler_trace(tmp_path):
    from aec_tpu.utils.profiling import trace

    f = jax.jit(lambda x: (x * 2).sum())
    with trace(str(tmp_path / "trc")):
        jax.block_until_ready(f(jnp.ones((128,))))
    import glob

    assert glob.glob(str(tmp_path / "trc" / "**" / "*"), recursive=True)


def test_two_stage_reduces_echo(rng):
    # echo-only scene: the full pipeline should attenuate substantially
    params = little_net_init(jax.random.PRNGKey(9))
    erb = jnp.asarray(erb_filterbank())
    n = 8 * 16384
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(600) / 100.0) * rng.standard_normal(600)).astype(np.float32)
    mic = np.convolve(far, 0.4 * rir)[:n].astype(np.float32)
    out = two_stage_cancel(params, jnp.asarray(far), jnp.asarray(mic), erb)
    lin = np.asarray(out["linear_wav"])
    tail = slice(-16384, None)
    from aec_tpu.train.metrics import erle

    lin_erle = float(erle(jnp.asarray(mic[tail]), jnp.asarray(lin[tail])))
    assert lin_erle > 25.0


def test_running_norm_converges_to_offline(rng):
    """Causal running-stats pseudo-norm (normalize=True): for a long
    stationary stream the running mean/std scalar converges to the global
    one, so the streamed tail matches the offline normalize=True output."""
    params = little_net_init(jax.random.PRNGKey(9))
    erb = jnp.asarray(erb_filterbank())
    n = 256 * 256  # ~4.2 s
    far, mic = _scene(rng, n)
    # the pseudo-norm scalar is mean/std — give the signals non-zero mean so
    # normalization is materially active (zero-mean noise makes it a no-op)
    far = far + 0.8
    mic = mic + 0.5

    offline = little_net_apply(
        params, jnp.asarray(mic)[None], jnp.asarray(far)[None], erb, CFG,
        normalize=True,
    )["wav"][0]
    streamed = stream_run(
        params, far, mic, erb, CFG, stage1="none", normalize=True
    )
    assert streamed.shape == (n,)
    off = np.asarray(offline)
    scale = float(np.max(np.abs(off)))
    tail = slice(3 * n // 4, None)
    err_tail = float(np.max(np.abs(streamed[tail] - off[tail]))) / scale
    assert err_tail < 2e-2, err_tail
    # and the normalized mode must actually differ from the unnormalized one
    streamed_raw = stream_run(
        params, far, mic, erb, CFG, stage1="none", normalize=False
    )
    assert float(np.max(np.abs(streamed - streamed_raw))) / scale > 1e-3


def test_gain_norm_streaming_equals_offline(rng):
    """gain_norm (scale-sane synthesis) streams: the hop-by-hop runtime
    matches the offline two-stage gain_norm path (verdict item 3 — the
    dtalk checkpoint's deployed semantics on the streaming runtime)."""
    params = little_net_init(jax.random.PRNGKey(11))
    erb = jnp.asarray(erb_filterbank())
    n = 20 * 256
    far, mic = _scene(rng, n)
    kcfg = KalmanConfig()

    offline = two_stage_cancel(
        params, jnp.asarray(far), jnp.asarray(mic), erb,
        stage1="kalman", lin_cfg=kcfg, scfg=CFG, normalize=False,
        gain_norm=True,
    )["wav"]
    streamed = stream_run(
        params, far, mic, erb, CFG, stage1="kalman", lin_cfg=kcfg,
        gain_norm=True,
    )
    scale = float(np.max(np.abs(np.asarray(offline))))
    np.testing.assert_allclose(streamed, np.asarray(offline), atol=2e-3 * scale)
