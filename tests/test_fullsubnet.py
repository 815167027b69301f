"""FullSubNet family tests (dual-mask contract, mel bank, training)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.dsp.mel import mel_filterbank
from aec_tpu.models.fullsubnet import (
    FullSubNetConfig,
    fullsubnet_apply,
    fullsubnet_init,
    fullsubnet_loss,
)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank()
    assert fb.shape == (161, 21)
    assert np.all(fb >= 0) and np.all(fb <= 1)
    assert np.all((fb != 0).sum(axis=0) > 0)  # every filter has support


def test_fullsubnet_dual_mask_contract(rng):
    cfg = FullSubNetConfig(fb_hidden=32, sb_hidden=16)
    params = fullsubnet_init(jax.random.PRNGKey(0), cfg)
    n = 3200
    mic = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    out = fullsubnet_apply(params, mic, ref, cfg)
    t = n // 160 + 1
    assert out["wav"].shape == (2, n)
    assert out["mask_near"].shape == (2, t, 161)
    assert out["mask_echo"].shape == (2, t, 161)
    for key in ("mask_near", "mask_echo"):
        m = np.asarray(out[key])
        assert np.all(m >= 0) and np.all(m <= 1)
    assert bool(jnp.isfinite(out["wav"]).all())
    assert bool(jnp.isfinite(out["echo_wav"]).all())


def test_fullsubnet_with_mel_features(rng):
    cfg = FullSubNetConfig(fb_hidden=32, sb_hidden=16, use_mel=True)
    assert cfg.fb_input == 2 * 161 + 2 * 21
    params = fullsubnet_init(jax.random.PRNGKey(2), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    out = fullsubnet_apply(params, mic, ref, cfg)
    assert out["wav"].shape == (1, 3200)
    assert bool(jnp.isfinite(out["wav"]).all())


def test_fullsubnet_loss_trains(rng):
    import optax

    cfg = FullSubNetConfig(fb_hidden=32, sb_hidden=16, neighborhood=2)
    params = fullsubnet_init(jax.random.PRNGKey(1), cfg)
    n = 3200
    far = rng.standard_normal((1, n)).astype(np.float32)
    rir = (np.exp(-np.arange(120) / 40.0) * rng.standard_normal(120)).astype(np.float32)
    echo = np.stack([np.convolve(far[0], 0.4 * rir)[:n]]).astype(np.float32)
    near = (0.2 * rng.standard_normal((1, n))).astype(np.float32)
    mic, far, near, echo = map(jnp.asarray, (near + echo, far, near, echo))

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: fullsubnet_loss(p, mic, far, near, echo, cfg)[0]
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_fused_single_scan_matches_two_scan_composition(rng):
    """The fused one-scan path (default) must agree with the two-scan
    reference-shaped composition on both masks, with and without mel."""
    from aec_tpu.models.fullsubnet import fullsubnet_masks

    for cfg in (
        FullSubNetConfig(fb_hidden=32, sb_hidden=16, neighborhood=3),
        FullSubNetConfig(fb_hidden=32, sb_hidden=16, use_mel=True),
    ):
        params = fullsubnet_init(jax.random.PRNGKey(2), cfg)
        mic = jnp.asarray(
            np.abs(rng.standard_normal((2, 23, cfg.n_freqs))).astype(np.float32)
        )
        ref = jnp.asarray(
            np.abs(rng.standard_normal((2, 23, cfg.n_freqs))).astype(np.float32)
        )
        near_a, echo_a = fullsubnet_masks(params, mic, ref, cfg, fused=False)
        near_b, echo_b = fullsubnet_masks(params, mic, ref, cfg, fused=True)
        np.testing.assert_allclose(near_a, near_b, atol=2e-6)
        np.testing.assert_allclose(echo_a, echo_b, atol=2e-6)


def test_fsn_joint_kernel_parity(rng):
    """The UNROUTED Pallas port of the joint recurrence (measured slower
    than the unroll=8 scan on-chip — kernels/pallas_fullsubnet.py header)
    must still track the scan core so the recorded attempt doesn't rot:
    forward and recompute-through-scan gradients within bf16 weight
    rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import aec_tpu.models.fullsubnet as fsn
    from aec_tpu.kernels.pallas_fullsubnet import fsn_joint_fused

    cfg = fsn.FullSubNetConfig()
    params = fsn.fullsubnet_init(jax.random.PRNGKey(1), cfg)
    fbins = params["fb_out"]["w"].shape[0]
    t = 24
    xp_fb = jnp.asarray(
        rng.standard_normal((1, t, 4 * cfg.fb_hidden)).astype(np.float32)
    ) * 0.3
    xp_sb = jnp.asarray(
        rng.standard_normal((1, t, fbins, 4 * cfg.sb_hidden)).astype(np.float32)
    ) * 0.3
    want = fsn._joint_scan_hs(params, xp_fb, xp_sb)
    got = fsn_joint_fused(params, xp_fb[0], xp_sb[0], True)[None]
    scale = max(float(jnp.abs(want).max()), 1e-9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-3 * scale)

    def loss(p, fused):
        h = (fsn_joint_fused(p, xp_fb[0], xp_sb[0], True)[None]
             if fused else fsn._joint_scan_hs(p, xp_fb, xp_sb))
        return jnp.sum(h * h)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for l0, l1 in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        s = max(float(jnp.abs(l0).max()), 1e-9)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   atol=2e-2 * s)
