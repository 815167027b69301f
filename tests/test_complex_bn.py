"""Complex whitening BatchNorm tests (dccrn.py:210-383 equations)."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.ops.complex_layers import complex_batch_norm, complex_batch_norm_init
from aec_tpu.models.dccrn import DccrnConfig, dccrn_apply, dccrn_init


def test_complex_bn_whitens(rng):
    params, state = complex_batch_norm_init(jax.random.PRNGKey(0), 4)
    # identity affine to observe pure whitening
    params = dict(params, w_ri=jnp.zeros_like(params["w_ri"]))
    # correlated complex data, 2 complex channels
    zr = rng.standard_normal((64, 8, 8, 2)).astype(np.float32) * 3.0 + 1.0
    zi = 0.8 * zr + 0.5 * rng.standard_normal((64, 8, 8, 2)).astype(np.float32)
    x = jnp.asarray(np.concatenate([zr, zi], axis=-1))
    y, new_state = complex_batch_norm(params, state, x, train=True)
    yr, yi = np.asarray(y[..., :2]), np.asarray(y[..., 2:])
    for c in range(2):
        r, i = yr[..., c].ravel(), yi[..., c].ravel()
        assert abs(r.mean()) < 1e-3 and abs(i.mean()) < 1e-3
        np.testing.assert_allclose(np.var(r), 1.0, atol=2e-2)
        np.testing.assert_allclose(np.var(i), 1.0, atol=2e-2)
        assert abs(np.mean(r * i)) < 2e-2  # decorrelated
    # running stats moved toward batch stats
    assert float(jnp.abs(new_state["m_r"]).max()) > 0


def test_complex_bn_eval_uses_running_stats(rng):
    params, state = complex_batch_norm_init(jax.random.PRNGKey(1), 2)
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 2)).astype(np.float32))
    y1, s1 = complex_batch_norm(params, state, x, train=False)
    assert jax.tree.all(jax.tree.map(lambda a, b: bool((a == b).all()), s1, state))


def test_dccrn_with_complex_bn(rng):
    cfg = DccrnConfig(use_clstm=False, use_cbn=True,
                      conv_channels=(4, 8, 16), masking_mode="C")
    params, state = dccrn_init(jax.random.PRNGKey(2), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    out, new_state = dccrn_apply(params, state, mic, far, cfg, train=True)
    assert out["wav"].shape == (1, 4096)
    assert bool(jnp.isfinite(out["wav"]).all())
