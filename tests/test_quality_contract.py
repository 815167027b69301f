"""The north-star quality contract (BASELINE.md: <= 0.1 dB ERLE budget) as a
named, tested knob, plus the TPU routing contract of the auto-fused cancellers.

The fused Pallas kernels cannot execute on the forced-CPU test backend, so the
TPU-side routing is pinned with monkeypatched backend + kernel stubs: what
these tests assert is the CONTRACT (which kernel is called, with which
dot_mode, and that state is None on the fused path) — kernel numerics are
covered by tests/test_pallas_{kalman,nlms}.py in interpret mode and graded
on-chip by benchmarks/validate_precision.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig, NlmsConfig
from aec_tpu.linear import overlap_save as ols
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.linear.nlms import nlms_cancel


def _pair(rng, n=4096, batch=None):
    shape = (n,) if batch is None else (batch, n)
    far = rng.standard_normal(shape).astype(np.float32)
    mic = rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(far), jnp.asarray(mic)


def test_quality_knob_validates():
    far = jnp.zeros((512,), jnp.float32)
    with pytest.raises(ValueError, match="quality"):
        kalman_cancel(KalmanConfig(), far, far, quality="bogus")
    with pytest.raises(ValueError, match="quality"):
        nlms_cancel(NlmsConfig(), far, far, quality="turbo")


def test_parity_default_equals_high_precision_scan(rng):
    """On the scan path, quality='parity' (default) == precision=HIGH."""
    far, mic = _pair(rng)
    want = kalman_cancel(
        KalmanConfig(), far, mic, precision=jax.lax.Precision.HIGH
    )["wav"]
    got = kalman_cancel(KalmanConfig(), far, mic)["wav"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fast_equals_mixed_default_scan(rng):
    """Kalman quality='fast' == the documented per-op MIXED tuple."""
    far, mic = _pair(rng)
    want = kalman_cancel(
        KalmanConfig(), far, mic, precision=ols._STAGE1_DEFAULT, fused=False
    )["wav"]
    got = kalman_cancel(
        KalmanConfig(), far, mic, quality="fast", fused=False
    )["wav"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_nlms_fast_scan_stays_high(rng):
    """NLMS has NO mixed tier at either quality (the per-op mixed scan
    loses 18-26 dB tail ERLE on deep-convergence scenes — see
    linear/nlms.py docstring + benchmarks/validate_precision.py
    nlms_erle): quality='fast' must run the scan at HIGH."""
    far, mic = _pair(rng)
    want = nlms_cancel(
        NlmsConfig(), far, mic, precision=jax.lax.Precision.HIGH, fused=False
    )["wav"]
    got = nlms_cancel(NlmsConfig(), far, mic, quality="fast", fused=False)["wav"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_spectra_precision_for_mapping():
    """A single Precision applies end-to-end (ADVICE r2: precision=HIGHEST
    must really be an all-fp32 path, analysis STFT included)."""
    P = jax.lax.Precision
    assert ols.spectra_precision_for(None) == ols._SPECTRA_DEFAULT
    assert ols.spectra_precision_for(P.HIGHEST) == P.HIGHEST
    assert ols.spectra_precision_for(P.DEFAULT) == P.DEFAULT
    assert (
        ols.spectra_precision_for((P.HIGH, P.DEFAULT, P.DEFAULT)) == P.HIGH
    )


@pytest.mark.parametrize("which", ["kalman", "nlms"])
@pytest.mark.parametrize("batched", [False, True])
def test_tpu_routing_contract(rng, monkeypatch, which, batched):
    """On the TPU backend the default call auto-routes to the fused kernel at
    dot_mode='high' (parity), returns state=None; quality='fast' routes at
    dot_mode='mixed'; explicit precision disables fusion and returns state."""
    import aec_tpu.kernels.pallas_kalman as pk
    import aec_tpu.kernels.pallas_nlms as pn

    calls = []

    def stub(name):
        def f(cfg, far, mic, *, block=256, dot_mode="?", **kw):
            calls.append((name, dot_mode))
            return {"wav": jnp.zeros_like(mic)}

        return f

    monkeypatch.setattr(pk, "kalman_cancel_fused", stub("k1"))
    monkeypatch.setattr(pk, "kalman_cancel_fused_batched_bl", stub("kB"))
    monkeypatch.setattr(pn, "nlms_cancel_fused", stub("n1"))
    monkeypatch.setattr(pn, "nlms_cancel_fused_batched_bl", stub("nB"))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    fn = kalman_cancel if which == "kalman" else nlms_cancel
    cfg = KalmanConfig() if which == "kalman" else NlmsConfig()
    far, mic = _pair(rng, n=1024, batch=2 if batched else None)

    out = fn(cfg, far, mic)
    assert out["state"] is None  # fused path carries no resumable state
    out = fn(cfg, far, mic, quality="fast")
    assert out["state"] is None
    expect = ("k" if which == "kalman" else "n") + ("B" if batched else "1")
    # parity: balanced on the batched bl kernels (2-pass matrix-exact
    # constraint, <=0.1 dB), full high tier single-stream. fast: mixed for
    # Kalman only — NLMS has no safe mixed tier (see linear/nlms.py).
    parity_mode = "balanced" if batched else "high"
    fast_mode = (
        "mixed" if which == "kalman" else ("balanced" if batched else "high")
    )
    assert calls == [(expect, parity_mode), (expect, fast_mode)]

    # explicit precision keeps the scan (resumable state contract)
    out = fn(cfg, far, mic, precision=jax.lax.Precision.HIGHEST)
    assert out["state"] is not None
    assert len(calls) == 2  # no new kernel call


def test_two_stage_quality_reaches_stage1(rng, monkeypatch):
    """two_stage_cancel plumbs its quality knob into the stage-1 routing."""
    import aec_tpu.kernels.pallas_kalman as pk
    import aec_tpu.kernels.pallas_stage2 as ps2
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_apply, little_net_init
    from aec_tpu.pipeline.two_stage import two_stage_cancel

    calls = []

    def kstub(cfg, far, mic, *, block=256, dot_mode="?", **kw):
        calls.append(dot_mode)
        return {"wav": jnp.zeros_like(mic)}

    monkeypatch.setattr(pk, "kalman_cancel_fused_batched_bl", kstub)
    # the stage-2 fused kernel cannot run on CPU; route it to the XLA apply
    monkeypatch.setattr(
        ps2, "little_net_apply_fused_wav",
        lambda params, lw, fw, erb, scfg, normalize=False, gain_norm=False:
        little_net_apply(
            params, lw, fw, erb, scfg, normalize=normalize,
            gain_norm=gain_norm,
        ),
    )
    # batched quality='fast' routes the WHOLE pipeline to the single kernel
    import aec_tpu.kernels.pallas_two_stage as pts

    def tsstub(params, far, mic, erb, *, kcfg=None, scfg=None, **kw):
        calls.append("single-kernel")
        z = jnp.zeros_like(mic)
        return {"wav": z, "linear_wav": z, "mask": z[..., :1]}

    monkeypatch.setattr(pts, "two_stage_fused", tsstub)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    params = little_net_init(jax.random.PRNGKey(0))
    erb = jnp.asarray(erb_filterbank())
    # distinctive shape: the routing decision happens at TRACE time, so the
    # jit cache must not already hold this signature from another test
    far, mic = _pair(rng, n=2560, batch=3)
    two_stage_cancel(params, far, mic, erb)
    two_stage_cancel(params, far, mic, erb, quality="fast")
    # the legacy all-DEFAULT fast=True tier keeps the composition (its
    # explicit precision routes stage-1 to the scan, not any kernel)
    two_stage_cancel(params, far, mic, erb, fast=True)
    assert calls == ["balanced", "single-kernel"]


def test_two_stage_nondefault_geometry_falls_back(rng, monkeypatch):
    """A non-2x-overlap StftConfig must NOT route to the fused stage-2 kernel
    (ADVICE r2: it would shape-error inside the Pallas trace)."""
    import aec_tpu.kernels.pallas_stage2 as ps2
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.dsp.stft import StftConfig
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.pipeline.two_stage import two_stage_cancel

    def boom(*a, **k):  # pragma: no cover - the assertion is that it's unused
        raise AssertionError("fused stage-2 kernel routed for 4x overlap")

    monkeypatch.setattr(ps2, "little_net_apply_fused_wav", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    params = little_net_init(jax.random.PRNGKey(0))
    scfg = StftConfig(win_len=512, hop=128, fft_len=512)  # 4x overlap
    erb = jnp.asarray(erb_filterbank(scfg.n_freqs))
    far, mic = _pair(rng, n=2048, batch=1)
    out = two_stage_cancel(
        params, far, mic, erb, stage1="none", scfg=scfg
    )
    assert np.isfinite(np.asarray(out["wav"])).all()


def test_gru_fused_explicit_runs_off_tpu(rng):
    """gru_scan(fused=True) on the CPU backend routes through interpret mode
    and matches the XLA scan (ADVICE r2: it used to crash)."""
    from aec_tpu.ops.gru import gru_init, gru_scan

    params = gru_init(jax.random.PRNGKey(2), 16, 8)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    ys_ref, hT_ref = gru_scan(params, x, fused=False)
    ys, hT = gru_scan(params, x, fused=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(hT_ref), atol=1e-5)


def test_streaming_quality_knob(rng):
    """stream_step accepts the quality knob; parity (default) and fast give
    the same shapes and (on CPU, where precision is a no-op) the same wav."""
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.pipeline.streaming import stream_run

    params = little_net_init(jax.random.PRNGKey(1))
    erb = jnp.asarray(erb_filterbank())
    far = rng.standard_normal(2048).astype(np.float32)
    mic = rng.standard_normal(2048).astype(np.float32)
    a = stream_run(params, far, mic, erb)
    b = stream_run(params, far, mic, erb, quality="fast")
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)
