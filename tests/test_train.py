"""Training loop tests: end-to-end epochs, checkpoint/resume, lr schedule."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from aec_tpu.configs import TrainConfig
from aec_tpu.dsp.erb import erb_filterbank
from aec_tpu.models.little_net import little_net_init, little_net_loss
from aec_tpu.pipeline import h5io
from aec_tpu.train import checkpoints
from aec_tpu.train.loop import Trainer, make_lr_schedule, make_optimizer, make_train_step


def _make_dataset(tmp_path, rng, n_utts=4, n=4096):
    paths = []
    for i in range(n_utts):
        far = rng.standard_normal(n).astype(np.float32)
        rir = (np.exp(-np.arange(300) / 60.0) * rng.standard_normal(300)).astype(np.float32)
        echo = np.convolve(far, 0.4 * rir)[:n].astype(np.float32)
        near = (0.3 * rng.standard_normal(n)).astype(np.float32)
        utt = {
            "nearend_speech": near,
            "nearend_mic": near + echo,
            "farend_speech": far,
            "echo": echo,
        }
        p = str(tmp_path / f"tr_{i}.ex")
        h5io.write_utterance(p, utt)
        paths.append(p)
    cv = str(tmp_path / "cv.ex")
    h5io.write_grouped(cv, [h5io.read_utterance(paths[0])])
    return paths, cv


def test_lr_schedule_matches_steplr():
    cfg = TrainConfig(lr=1e-5, lr_decay_factor=0.5, lr_decay_period=5)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == 1e-5
    assert float(sched(49)) == 1e-5  # epoch 4
    assert float(sched(50)) == 5e-6  # epoch 5
    assert float(sched(100)) == 2.5e-6  # epoch 10


def test_trainer_end_to_end(tmp_path, rng):
    paths, cv = _make_dataset(tmp_path, rng)
    cfg = TrainConfig(max_n_epochs=2, batch_size=2, lr=1e-4, seed=0)
    trainer = Trainer(
        tr_list=paths,
        cv_file=cv,
        ckpt_dir=str(tmp_path / "exp"),
        cfg=cfg,
        bucket_quantum=4096,
    )
    out = trainer.train()
    assert out["ckpt_info"]["cur_epoch"] == 2
    assert out["ckpt_info"]["cv_loss"] is not None
    assert os.path.isfile(str(tmp_path / "exp/models/latest.npz"))
    assert os.path.isfile(str(tmp_path / "exp/models/best_loss.npz"))
    assert os.path.isfile(str(tmp_path / "exp/loss.txt"))


def test_training_reduces_loss(tmp_path, rng):
    # a few steps of Adam on one batch must reduce the loss
    paths, cv = _make_dataset(tmp_path, rng, n_utts=2)
    params = little_net_init(jax.random.PRNGKey(0))
    cfg = TrainConfig(lr=1e-2)
    opt = make_optimizer(cfg, steps_per_epoch=1000)
    opt_state = opt.init(params)
    step = make_train_step(little_net_loss, opt)
    erb = jnp.asarray(erb_filterbank())
    utt = h5io.read_utterance(paths[0])
    mic = jnp.asarray(utt["nearend_mic"])[None]
    ref = jnp.asarray(utt["farend_speech"])[None]
    near = jnp.asarray(utt["nearend_speech"])[None]
    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state, mic, ref, near, erb)
        losses.append(float(loss))
    assert min(losses) < losses[0] * 0.97, losses


def test_checkpoint_roundtrip(tmp_path):
    params = little_net_init(jax.random.PRNGKey(1))
    path = str(tmp_path / "ck.npz")
    checkpoints.save(path, params, {"cur_epoch": 3})
    blank = little_net_init(jax.random.PRNGKey(2))
    restored = checkpoints.restore(path, blank)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert checkpoints.load_info(path)["cur_epoch"] == 3


def test_trainer_resume(tmp_path, rng):
    paths, cv = _make_dataset(tmp_path, rng)
    cfg = TrainConfig(max_n_epochs=1, batch_size=2, seed=0)
    t1 = Trainer(paths, cv, str(tmp_path / "exp"), cfg=cfg)
    t1.train()
    cfg2 = TrainConfig(max_n_epochs=2, batch_size=2, seed=0)
    t2 = Trainer(
        paths, cv, str(tmp_path / "exp2"), cfg=cfg2,
        resume_model=str(tmp_path / "exp/models/latest.npz"),
    )
    out = t2.train()
    assert out["ckpt_info"]["cur_epoch"] == 2


def test_trainer_validate_metrics(tmp_path, rng):
    """validate_metrics=("stoi","sisdr") fills cv_/best_ slots and writes
    best_<metric>.npz — the working ckpt_conf (configs.py:54-57)."""
    import pytest

    paths, cv = _make_dataset(tmp_path, rng, n_utts=2, n=16384)
    cfg = TrainConfig(max_n_epochs=1, batch_size=2, lr=1e-4, seed=0)
    trainer = Trainer(
        tr_list=paths,
        cv_file=cv,
        ckpt_dir=str(tmp_path / "expm"),
        cfg=cfg,
        bucket_quantum=4096,
        validate_metrics=("stoi", "sisdr"),
    )
    out = trainer.train()
    info = out["ckpt_info"]
    for m in ("stoi", "sisdr"):
        assert np.isfinite(info[f"cv_{m}"]), info
        assert info[f"best_{m}"] == info[f"cv_{m}"]  # single period -> best
        assert os.path.isfile(str(tmp_path / f"expm/models/best_{m}.npz"))
    assert -40.0 < info["cv_sisdr"] < 60.0
    assert -1.0 <= info["cv_stoi"] <= 1.0

    with pytest.raises(ValueError, match="unknown validate_metrics"):
        Trainer(
            tr_list=paths, cv_file=cv, ckpt_dir=str(tmp_path / "bad"),
            validate_metrics=("pesq",),
        )
