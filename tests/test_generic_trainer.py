"""GenericTrainer: every model family trains end-to-end through one loop."""

import os

import numpy as np
import pytest

from aec_tpu.configs import TrainConfig
from aec_tpu.pipeline import h5io
from aec_tpu.train.generic import GenericTrainer, make_adapter


def _make_dataset(tmp_path, rng, n_utts=2, n=4096):
    paths = []
    for i in range(n_utts):
        far = rng.standard_normal(n).astype(np.float32)
        rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(np.float32)
        echo = np.convolve(far, 0.3 * rir)[:n].astype(np.float32)
        near = (0.2 * rng.standard_normal(n)).astype(np.float32)
        p = str(tmp_path / f"tr_{i}.ex")
        h5io.write_utterance(p, {
            "nearend_speech": near, "nearend_mic": near + echo,
            "farend_speech": far, "echo": echo,
        })
        paths.append(p)
    cv = str(tmp_path / "cv.ex")
    h5io.write_grouped(cv, [h5io.read_utterance(paths[0])])
    return paths, cv


@pytest.mark.parametrize("model", ["fullsubnet", "att_ccrn", "little_net"])
def test_generic_trainer_all_families(tmp_path, rng, model):
    paths, cv = _make_dataset(tmp_path, rng)
    out = GenericTrainer(
        model=model,
        tr_list=paths,
        cv_file=cv,
        ckpt_dir=str(tmp_path / f"exp_{model}"),
        cfg=TrainConfig(max_n_epochs=1, batch_size=2, lr=1e-4),
    ).train()
    assert out["ckpt_info"]["cur_epoch"] == 1
    assert np.isfinite(out["ckpt_info"]["cv_loss"])
    assert os.path.isfile(str(tmp_path / f"exp_{model}/models/latest.npz"))


def test_adapter_unknown_model():
    with pytest.raises(KeyError):
        make_adapter("nope")


def test_generic_trainer_validate_metrics(tmp_path, rng):
    """--validate_metrics works for a stateful family: best_<m>.npz written,
    cv_/best_ slots finite (GenericTrainer counterpart of the Trainer test)."""
    import numpy as np
    import os

    paths, cv = _make_dataset(tmp_path, rng)
    from aec_tpu.configs import TrainConfig
    from aec_tpu.train.generic import GenericTrainer

    out = GenericTrainer(
        model="fullsubnet",
        tr_list=paths,
        cv_file=cv,
        ckpt_dir=str(tmp_path / "expm"),
        cfg=TrainConfig(max_n_epochs=1, batch_size=2, lr=1e-4, seed=0),
        validate_metrics=("sisdr",),
    ).train()
    info = out["ckpt_info"]
    assert np.isfinite(info["cv_sisdr"])
    assert info["best_sisdr"] == info["cv_sisdr"]
    assert os.path.isfile(str(tmp_path / "expm/models/best_sisdr.npz"))
