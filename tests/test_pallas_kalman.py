"""Fused Pallas Kalman kernel == scan implementation (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.configs import KalmanConfig
from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused
from aec_tpu.linear.kalman import kalman_cancel
from aec_tpu.train.metrics import erle


def test_fused_matches_scan(rng):
    cfg = KalmanConfig()
    n = 40 * 256
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(400) / 80.0) * rng.standard_normal(400)).astype(np.float32)
    mic = np.convolve(far, 0.4 * rir)[:n].astype(np.float32)
    want = np.asarray(kalman_cancel(cfg, jnp.asarray(far), jnp.asarray(mic))["wav"])
    # dot_mode="high" is the exact-numerics tier; the production "mixed"
    # default rounds the residual dots to bf16 (quality covered by
    # test_fused_converges' ERLE bound, tier deltas by
    # benchmarks/validate_precision.py).
    got = np.asarray(
        kalman_cancel_fused(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True, dot_mode="high"
        )["wav"]
    )
    assert got.shape == want.shape
    scale = max(np.max(np.abs(want)), 1e-3)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)


def test_fused_converges(rng):
    cfg = KalmanConfig()
    n = 4 * 16384
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(512) / 100.0) * rng.standard_normal(512)).astype(np.float32)
    mic = np.convolve(far, 0.5 * rir)[:n].astype(np.float32)
    e = np.asarray(
        kalman_cancel_fused(cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True)["wav"]
    )
    tail = slice(-16384, None)
    tail_erle = float(erle(jnp.asarray(mic[tail]), jnp.asarray(e[tail])))
    assert tail_erle > 30.0, tail_erle


def test_auto_fuse_off_on_cpu(rng):
    """kalman_cancel's fused auto-routing stays OFF on the CPU backend (the
    kernel is TPU-only); explicit fused=False always uses the scan."""
    cfg = KalmanConfig()
    n = 8 * 256
    far = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mic = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    out = kalman_cancel(cfg, far, mic)  # auto: cpu backend -> scan
    assert out["state"] is not None  # scan path carries state
    out2 = kalman_cancel(cfg, far, mic, fused=False)
    np.testing.assert_array_equal(np.asarray(out["wav"]), np.asarray(out2["wav"]))


def test_fused_nlms_matches_scan(rng):
    """Pallas fused NLMS == scan formulation (interpret mode on CPU)."""
    from aec_tpu.configs import NlmsConfig
    from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused
    from aec_tpu.linear.nlms import nlms_cancel

    cfg = NlmsConfig()
    n = 120 * 256
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(400) / 80.0) * rng.standard_normal(400)).astype(np.float32)
    rir = 0.5 * rir / np.abs(rir).max()
    mic = np.convolve(far, rir)[:n].astype(np.float32)
    want = np.asarray(
        nlms_cancel(cfg, jnp.asarray(far), jnp.asarray(mic), fused=False)["wav"]
    )
    got = np.asarray(
        nlms_cancel_fused(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True, dot_mode="high"
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)
    # echo-cancelling behavior matches the scan's converged tail
    from aec_tpu.train.metrics import erle

    tail = slice(3 * n // 4, None)
    e_scan = float(erle(jnp.asarray(mic[tail]), jnp.asarray(want[tail])))
    e_fused = float(erle(jnp.asarray(mic[tail]), jnp.asarray(got[tail])))
    assert e_scan > 5.0, e_scan  # adapting on this scene
    assert abs(e_fused - e_scan) < 0.5, (e_fused, e_scan)


def test_nlms_auto_fuse_off_on_cpu(rng):
    from aec_tpu.configs import NlmsConfig
    from aec_tpu.linear.nlms import nlms_cancel

    cfg = NlmsConfig()
    far = jnp.asarray(rng.standard_normal(8 * 256).astype(np.float32))
    mic = jnp.asarray(rng.standard_normal(8 * 256).astype(np.float32))
    out = nlms_cancel(cfg, far, mic)  # cpu backend -> scan
    assert out["state"] is not None


def test_kalman_fused_batched_matches_scan(rng):
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched

    cfg = KalmanConfig()
    b, n = 5, 16 * 256  # odd batch: exercises the tile padding path
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    want = np.asarray(
        kalman_cancel(cfg, jnp.asarray(far), jnp.asarray(mic), fused=False)["wav"]
    )
    got = np.asarray(
        kalman_cancel_fused_batched(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True, tile=2
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)


def test_kalman_fused_batched_bl_matches_scan(rng):
    """Batch-in-lanes batched kernel == scan (interpret mode, dot_mode=high)."""
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl

    cfg = KalmanConfig()
    b, n = 5, 16 * 256  # odd batch: exercises tile padding; tile=2 > 1 grid row
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    want = np.asarray(
        kalman_cancel(cfg, jnp.asarray(far), jnp.asarray(mic), fused=False)["wav"]
    )
    got = np.asarray(
        kalman_cancel_fused_batched_bl(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True, tile=2,
            dot_mode="high",
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)
    # the production mixed default still cancels echo
    from aec_tpu.train.metrics import erle

    got_m = np.asarray(
        kalman_cancel_fused_batched_bl(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True, tile=2
        )["wav"]
    )
    tail = slice(3 * n // 4, None)
    for i in range(b):
        e_m = float(erle(jnp.asarray(mic[i, tail]), jnp.asarray(got_m[i, tail])))
        e_w = float(erle(jnp.asarray(mic[i, tail]), jnp.asarray(want[i, tail])))
        assert abs(e_m - e_w) < 0.5, (i, e_m, e_w)


def test_fused_unroll_padding_path(rng):
    """Odd block counts exercise the t-padding branches at unroll > 1 in
    both the single-stream and batched kernels (trim after reshape; padded
    steps must not corrupt state ordering)."""
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl

    cfg = KalmanConfig()
    n = 13 * 256  # 13 blocks: not a multiple of unroll 4 or 2
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(200) / 40.0) * rng.standard_normal(200)).astype(
        np.float32
    )
    mic = np.convolve(far, 0.4 * rir)[:n].astype(np.float32)
    want = np.asarray(
        kalman_cancel(cfg, jnp.asarray(far), jnp.asarray(mic), fused=False)["wav"]
    )
    got = np.asarray(
        kalman_cancel_fused(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True,
            unroll=4, dot_mode="high",
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)
    got_b = np.asarray(
        kalman_cancel_fused_batched_bl(
            cfg, jnp.asarray(far)[None], jnp.asarray(mic)[None],
            interpret=True, tile=1, unroll=2, dot_mode="high",
        )["wav"][0]
    )
    np.testing.assert_allclose(got_b, want, atol=2e-4 * scale)


def test_nlms_fused_batched_bl_matches_scan(rng):
    """Batch-in-lanes batched NLMS kernel == scan (interpret, dot_mode=high)."""
    from aec_tpu.configs import NlmsConfig
    from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused_batched_bl
    from aec_tpu.linear.nlms import nlms_cancel

    cfg = NlmsConfig()
    b, n = 5, 32 * 256
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)).astype(
        np.float32
    )
    rir = 0.5 * rir / np.abs(rir).max()
    mic = np.stack(
        [np.convolve(far[i], rir)[:n] for i in range(b)]
    ).astype(np.float32)
    want = np.asarray(
        nlms_cancel(cfg, jnp.asarray(far), jnp.asarray(mic), fused=False)["wav"]
    )
    got = np.asarray(
        nlms_cancel_fused_batched_bl(
            cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True, tile=2,
            dot_mode="high",
        )["wav"]
    )
    scale = max(float(np.abs(want).max()), 1e-9)
    # slightly looser than the single-stream kernel test: the factored
    # constraint + in-kernel STFT add two bf16_3x roundings per block that
    # the leakage-free NLMS integrator accumulates
    np.testing.assert_allclose(got, want, atol=5e-4 * scale)
    from aec_tpu.train.metrics import erle

    tail = slice(3 * n // 4, None)
    for i in range(b):
        e_k = float(erle(jnp.asarray(mic[i, tail]), jnp.asarray(got[i, tail])))
        e_s = float(erle(jnp.asarray(mic[i, tail]), jnp.asarray(want[i, tail])))
        assert abs(e_k - e_s) < 0.5, (i, e_k, e_s)


def test_bl_two_level_time_grid_equivalence(rng):
    """The 2-level (outer, inner) time grid must be bit-identical to the
    single-level grid (round-3: a single >=512-step grid dim crashes the
    TPU compile helper at tile >= 96, so production T=512 runs split the
    dimension; max_grid=3 here forces t_outer > 1 cheaply in interpret)."""
    from aec_tpu.configs import KalmanConfig, NlmsConfig
    from aec_tpu.kernels.pallas_kalman import kalman_filter_fused_batched_bl
    from aec_tpu.kernels.pallas_nlms import nlms_filter_fused_batched_bl

    b, t, blk = 2, 13, 256  # 13 blocks -> t_u=7 at unroll=2 -> (3, 3) grid
    far = rng.standard_normal((b, t, blk)).astype(np.float32)
    mic = rng.standard_normal((b, t, blk)).astype(np.float32)
    for cfg, fn in (
        (KalmanConfig(), kalman_filter_fused_batched_bl),
        (NlmsConfig(), nlms_filter_fused_batched_bl),
    ):
        one = np.asarray(
            fn(cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True,
               tile=1, unroll=2, dot_mode="high", max_grid=256)
        )
        split = np.asarray(
            fn(cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True,
               tile=1, unroll=2, dot_mode="high", max_grid=3)
        )
        np.testing.assert_array_equal(one, split)


def test_bl_native_dot_mode_is_exact_fp32(rng):
    """dot_mode="native" (Mosaic precision=HIGHEST, one IR op per dot) must
    track the fp32 scan TIGHTER than the bf16_3x "high" split — it is the
    on-chip exactness oracle (measured 2.6e-7 max rel on the TPU; interpret
    mode runs the same jaxpr here). Covers both bl kernels and the
    native-layout constant packing (bl_common.stage1_consts(native=True))."""
    from aec_tpu.configs import NlmsConfig
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl
    from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused_batched_bl
    from aec_tpu.linear.nlms import nlms_cancel

    b, n = 2, 12 * 256
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    for cfg, fused, scan in (
        (KalmanConfig(), kalman_cancel_fused_batched_bl, kalman_cancel),
        (NlmsConfig(), nlms_cancel_fused_batched_bl, nlms_cancel),
    ):
        want = np.asarray(
            scan(cfg, jnp.asarray(far), jnp.asarray(mic), fused=False)["wav"]
        )
        got = np.asarray(
            fused(
                cfg, jnp.asarray(far), jnp.asarray(mic), interpret=True,
                tile=1, dot_mode="native",
            )["wav"]
        )
        scale = max(float(np.abs(want).max()), 1e-9)
        np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_bl_lean_and_alternating_constraint(rng):
    """Round-3 throughput knobs on the bl kernels (interpret mode):

    - dot_mode="lean" (x/y at the 2-pass matrix-exact split) tracks the
      fp32 scan about as tightly as "balanced";
    - constrain_every=2 produces DIFFERENT bits from the default (the
      knob really engages — were it silently dropped/ignored, the
      alternating path would be byte-equal to per-step projection);
    - constrain_every=2/4 (raw accumulate + whole-W re-projection — the
      constraint pair is ~80% of the kernel's MXU work, roofline.py) stays
      within 1 dB tail ERLE of the per-step projection on a converged
      echo-only scene, for both Kalman and NLMS.
    """
    from aec_tpu.configs import NlmsConfig
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl
    from aec_tpu.kernels.pallas_nlms import nlms_cancel_fused_batched_bl
    from aec_tpu.train.metrics import erle

    b, n = 2, 20 * 256
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    farj, micj = jnp.asarray(far), jnp.asarray(mic)
    tail = slice(n // 2, None)
    for cfg, fused in (
        (KalmanConfig(), kalman_cancel_fused_batched_bl),
        (NlmsConfig(), nlms_cancel_fused_batched_bl),
    ):
        base = fused(cfg, farj, micj, interpret=True, tile=2,
                     dot_mode="balanced")["wav"]
        lean = fused(cfg, farj, micj, interpret=True, tile=2,
                     dot_mode="lean")["wav"]
        e_base = float(erle(micj[0, tail], base[0, tail]))
        e_lean = float(erle(micj[0, tail], lean[0, tail]))
        assert abs(e_lean - e_base) < 1.0, (e_lean, e_base)
        for k in (2, 4):
            ek = fused(cfg, farj, micj, interpret=True, tile=2,
                       dot_mode="balanced", constrain_every=k)["wav"]
            # the knob must actually engage (not be dropped by routing)
            assert not np.array_equal(np.asarray(ek), np.asarray(base)), k
            e_k = float(erle(micj[0, tail], ek[0, tail]))
            assert abs(e_k - e_base) < 1.0, (k, e_k, e_base)


def test_fused_route_returns_state_none(rng, monkeypatch):
    """Pin the backend-dependent return contract BOTH ways (ADVICE round-2):
    the fused TPU route returns state=None (resumable streaming must keep
    the scan via kalman_filter/kalman_step), while the scan route carries
    the final filter state (pinned in test_auto_fuse_off_on_cpu above).
    Exercised on CPU by forcing the fused kernels through interpret mode at
    dot_mode="high" (the bf16-split tiers have no CPU DotThunk)."""
    import aec_tpu.kernels.pallas_kalman as pk

    single, batched = pk.kalman_cancel_fused, pk.kalman_cancel_fused_batched_bl
    monkeypatch.setattr(
        pk, "kalman_cancel_fused",
        lambda cfg, f, m, **k: single(
            cfg, f, m, **{**k, "interpret": True, "dot_mode": "high"}
        ),
    )
    monkeypatch.setattr(
        pk, "kalman_cancel_fused_batched_bl",
        lambda cfg, f, m, **k: batched(
            cfg, f, m, **{**k, "interpret": True, "dot_mode": "high"}
        ),
    )
    cfg = KalmanConfig()
    n = 8 * 256
    far = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mic = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    out = kalman_cancel(cfg, far, mic, fused=True)
    assert out["state"] is None and out["wav"].shape == mic.shape
    outb = kalman_cancel(cfg, far[None], mic[None], fused=True)
    assert outb["state"] is None and outb["wav"].shape == (1, n)


def test_vpu_opt_matches_base(rng):
    """Round-4 VPU lever (VERDICT item 5): vpu_opt=True reuses x2*p_pred and
    replaces the three per-step divides with one reciprocal. The x2*p_pred
    reuse is identical numerics; the reciprocal adds one rounding per use on
    a smoothed well-conditioned power, so outputs track the base variant
    tightly and echo cancellation is unchanged (on-chip grade:
    validate_precision.py column fused_bal_vpu)."""
    from aec_tpu.kernels.pallas_kalman import kalman_cancel_fused_batched_bl
    from aec_tpu.train.metrics import erle

    cfg = KalmanConfig()
    b, n = 2, 20 * 256
    far = rng.standard_normal((b, n)).astype(np.float32)
    rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(
        np.float32
    )
    mic = np.stack(
        [np.convolve(far[i], 0.4 * rir)[:n] for i in range(b)]
    ).astype(np.float32)
    farj, micj = jnp.asarray(far), jnp.asarray(mic)
    base = kalman_cancel_fused_batched_bl(
        cfg, farj, micj, interpret=True, tile=2, dot_mode="balanced"
    )["wav"]
    opt = kalman_cancel_fused_batched_bl(
        cfg, farj, micj, interpret=True, tile=2, dot_mode="balanced",
        vpu_opt=True,
    )["wav"]
    # the reciprocal rounding compounds through adaptation: measured max
    # deviation 5.5e-4 of scale over 20 blocks, ERLE identical to 1e-4 dB
    scale = max(float(jnp.abs(base).max()), 1e-9)
    np.testing.assert_allclose(np.asarray(opt), np.asarray(base),
                               atol=2e-3 * scale)
    tail = slice(n // 2, None)
    e_base = float(erle(micj[0, tail], base[0, tail]))
    e_opt = float(erle(micj[0, tail], opt[0, tail]))
    assert abs(e_opt - e_base) < 0.5, (e_opt, e_base)
