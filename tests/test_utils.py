"""Utility subsystem tests: segment loader, profiling, tools, torch compat."""

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.pipeline import h5io
from aec_tpu.pipeline.segment_loader import SegmentLoader, normalize_utt, split_segments
from aec_tpu.utils.profiling import flops, timed
from aec_tpu.utils.tools import count_frames, num_params
from aec_tpu.utils.torch_compat import (
    little_net_params_from_state_dict,
    state_dict_from_little_net_params,
)
from aec_tpu.models.little_net import little_net_init


def test_count_frames_reference_formula():
    # (n - win//hop)//hop + 1 (tools.py:30-32), win=512 hop=256
    assert count_frames(16000, 512, 256) == (16000 - 2) // 256 + 1


def test_split_segments():
    utt = {k: np.arange(10.0, dtype=np.float32) for k in ("mic", "ref", "near", "echo")}
    segs = split_segments(utt, seg_len=4, hop_len=2)
    assert len(segs) == 4  # starts 0,2,4,6
    np.testing.assert_array_equal(segs[1]["mic"], [2, 3, 4, 5])
    short = split_segments({k: np.ones(3, np.float32) for k in utt}, 8, 4)
    assert len(short) == 1 and short[0]["n_samples"] == 3
    assert short[0]["mic"].shape == (8,)


def test_normalize_utt_max_abs():
    utt = {"mic": np.array([0.5, -2.0], np.float32), "ref": np.array([4.0, 1.0], np.float32)}
    out = normalize_utt(utt)
    assert np.max(np.abs(out["mic"])) == 1.0
    assert np.max(np.abs(out["ref"])) == 1.0


def test_segment_loader_static_shapes(tmp_path, rng):
    paths = []
    for i in range(3):
        utt = {
            "nearend_speech": rng.standard_normal(40000).astype(np.float32),
            "nearend_mic": rng.standard_normal(40000).astype(np.float32),
            "farend_speech": rng.standard_normal(40000).astype(np.float32),
            "echo": rng.standard_normal(40000).astype(np.float32),
        }
        p = str(tmp_path / f"tr_{i}.ex")
        h5io.write_utterance(p, utt)
        paths.append(p)
    loader = SegmentLoader(paths, segment_size=1.0, segment_shift=0.5, batch_size=4)
    shapes = {b["mic"].shape for b in loader}
    assert shapes == {(4, 16000)}  # one static shape -> one jit compilation


def test_flops_cost_analysis():
    f = lambda a, b: a @ b
    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    cost = flops(f, a, b)
    # matmul flops = 2*M*N*K
    assert cost["flops"] >= 2 * 64 * 128 * 32 * 0.5  # allow fusion slack


def test_timed_returns_positive():
    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((1024,))
    assert timed(f, x, iters=2, warmup=1) > 0


def test_torch_state_dict_roundtrip():
    params = little_net_init(jax.random.PRNGKey(0))
    sd = state_dict_from_little_net_params(params)
    assert set(sd) == {
        "gru1.weight_ih_l0", "gru1.weight_hh_l0", "gru1.bias_ih_l0",
        "gru1.bias_hh_l0", "linear1.weight", "linear1.bias",
        "linear2.weight", "linear2.bias",
        # fixed DSP buffers for reference-strict loads (test.py:124)
        "cpx_stft.weight", "istft.weight", "istft.window", "istft.enframe",
    }
    back = little_net_params_from_state_dict(sd)
    assert num_params(back) == num_params(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_pt_checkpoint_loads(tmp_path):
    # build a .pt the way the reference does (pickled CheckPoint object,
    # tools.py:71-74) and load it through torch_compat
    import torch
    from aec_tpu.utils.torch_compat import _register_stubs, load_reference_checkpoint
    import sys

    _register_stubs()
    cp_cls = sys.modules["utils.tools"].CheckPoint
    params = little_net_init(jax.random.PRNGKey(1))
    sd = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in state_dict_from_little_net_params(params).items()
    }
    obj = cp_cls({"cur_epoch": 7}, sd, {})
    path = str(tmp_path / "best.pt")
    torch.save(obj, path)
    info, state = load_reference_checkpoint(path)
    assert info["cur_epoch"] == 7
    back = little_net_params_from_state_dict(state)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
