"""ATT-CCRN (repaired), DCT nets, and registry tests."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from aec_tpu.models.att_ccrn import AttCcrnConfig, att_ccrn_apply, att_ccrn_init, att_ccrn_loss
from aec_tpu.models import dct_net
from aec_tpu.models.registry import get_model, list_models


def test_att_ccrn_forward(rng):
    cfg = AttCcrnConfig()
    params, state = att_ccrn_init(jax.random.PRNGKey(0), cfg)
    mic = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    out, new_state = att_ccrn_apply(params, state, mic, far, cfg)
    assert out["wav"].shape == (2, 4096)
    assert out["mask_re"].shape == (2, 257, 17)
    assert bool(jnp.isfinite(out["wav"]).all())


def test_att_ccrn_loss_grad(rng):
    cfg = AttCcrnConfig(channels=(1, 8, 16))
    params, state = att_ccrn_init(jax.random.PRNGKey(1), cfg)
    mic = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    far = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    near = jnp.asarray((0.2 * rng.standard_normal((1, 4096))).astype(np.float32))
    loss, aux = att_ccrn_loss(params, state, mic, far, near, cfg)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: att_ccrn_loss(p, state, mic, far, near, cfg)[0])(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_dct_matrix_matches_reference_equations():
    # oracle restates networks.py:301-306 with torch ops
    n = 64
    k = torch.atleast_2d(torch.arange(0, n, dtype=torch.float32))
    t = (torch.atleast_2d(torch.arange(0, n, dtype=torch.float32)) + 0.5) * torch.pi / n
    want = torch.sqrt(2 / torch.tensor(n, dtype=torch.float32)) * torch.cos(t.transpose(0, 1) @ k)
    want[:, 0] *= torch.sqrt(torch.tensor(0.5))
    got = np.asarray(dct_net.dct_matrix(n))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)
    # orthonormal: M^T M = I
    m = np.asarray(dct_net.dct_matrix(n), dtype=np.float64)
    np.testing.assert_allclose(m.T @ m, np.eye(n), atol=1e-5)


def test_dct_dnn_forward_and_loss(rng):
    params = dct_net.dnn_init(jax.random.PRNGKey(2))
    noisy = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    clean = jnp.asarray((0.5 * rng.standard_normal((2, 8192))).astype(np.float32))
    out = dct_net.dnn_apply(params, noisy)
    t = (8192 - 512) // 256 + 1
    assert out["out_dct"].shape == (2, t, 100)
    assert out["wav"].shape == (2, (t - 1) * 256 + 512)
    loss, _ = dct_net.dnn_loss(params, noisy, clean)
    assert np.isfinite(float(loss))


def test_dct_cnn_forward(rng):
    cfg = dct_net.DctCnnConfig()
    params = dct_net.cnn_init(jax.random.PRNGKey(3), cfg)
    noisy = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    out = dct_net.cnn_apply(params, noisy, cfg)
    t = (8192 - 512) // 256 + 1
    assert out["mask"].shape == (1, t, cfg.keep)
    assert bool(jnp.isfinite(out["wav"]).all())


def test_raw_overlap_add_matches_loop(rng):
    frames = rng.standard_normal((2, 5, 512)).astype(np.float32)
    got = np.asarray(dct_net.raw_overlap_add(jnp.asarray(frames), 256))
    want = np.zeros((2, 4 * 256 + 512))
    for i in range(5):
        want[:, i * 256 : i * 256 + 512] += frames[:, i]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_registry_lists_all_families():
    names = list_models()
    for expected in ("little_net", "two_layer_gru", "dccrn", "att_ccrn", "dct_dnn", "dct_cnn"):
        assert expected in names
    spec = get_model("little_net")
    params = spec.init(jax.random.PRNGKey(0))
    assert not spec.stateful and params["gru"]["w_ih"].shape == (96, 64)
