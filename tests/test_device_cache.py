"""Device-resident corpus cache (pipeline/device_cache.py) + cached Trainer.

The float32 cache must reproduce the host-loader Trainer EXACTLY (same
shuffle stream, same update math — the scan-over-epoch formulation is a
mechanical change only); int16 is the recorded-corpus precision and must
land within quantization distance. Runs on the forced-CPU backend.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aec_tpu.configs import TrainConfig
from aec_tpu.pipeline import device_cache as dc
from aec_tpu.pipeline import h5io
from aec_tpu.train.loop import Trainer

N_UTTS, N_CV, LEN = 12, 3, 8192


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("dcache")
    rng = np.random.default_rng(0)
    files = []
    for i in range(N_UTTS):
        u = {
            k: rng.standard_normal(LEN).astype(np.float32) * 0.1
            for k in h5io.TRAIN_KEYS
        }
        p = str(root / f"tr_{i}.ex")
        h5io.write_utterance(p, u)
        files.append(p)
    cv = [
        {
            k: rng.standard_normal(LEN).astype(np.float32) * 0.1
            for k in h5io.TRAIN_KEYS
        }
        for _ in range(N_CV)
    ]
    cv_path = str(root / "cv.ex")
    h5io.write_grouped(cv_path, cv)
    return files, cv_path, str(root)


def test_from_files_roundtrip(corpus):
    files, _, _ = corpus
    c = dc.from_files(files, dtype="float32", bucket_quantum=4096)
    assert c.n_utts == N_UTTS and c.n_samples == LEN
    want = h5io.read_utterance(files[3])["nearend_mic"]
    got = np.asarray(c.take("nearend_mic", jnp.asarray([3])))[0, :LEN]
    np.testing.assert_array_equal(got, want)


def test_int16_quantization_distance(corpus):
    files, _, _ = corpus
    c = dc.from_files(files, dtype="int16", bucket_quantum=4096)
    want = h5io.read_utterance(files[5])["farend_speech"]
    got = np.asarray(c.take("farend_speech", jnp.asarray([5])))[0, :LEN]
    # one int16 step at the corpus max-abs scale (+ f32 arithmetic slack)
    step = c.scales["farend_speech"] / 32767.0
    assert np.abs(got - want).max() <= 0.55 * step


def test_chunked_assembly_matches_single(corpus):
    files, _, _ = corpus
    # chunk_bytes small enough to force many update-slice chunks
    a = dc._build(
        (h5io.read_utterance(p) for p in files), len(files),
        dtype="float32", bucket_quantum=4096, chunk_bytes=LEN * 4 * 2,
    )
    b = dc.from_files(files, dtype="float32", bucket_quantum=4096)
    for k in dc.CACHE_KEYS:
        np.testing.assert_array_equal(
            np.asarray(a.arrays[k]), np.asarray(b.arrays[k])
        )


def _run(files, cv_path, root, tag, **kw):
    ckpt = os.path.join(root, f"exp_{tag}")
    Trainer(
        tr_list=files,
        cv_file=cv_path,
        ckpt_dir=ckpt,
        cfg=TrainConfig(lr=1e-4, batch_size=4, max_n_epochs=2),
        **kw,
    ).train()
    rows = [
        json.loads(l)
        for l in open(os.path.join(ckpt, "metrics.jsonl"))
    ]
    return ckpt, rows


def test_cached_trainer_matches_host_loader(corpus):
    files, cv_path, root = corpus
    _, host_rows = _run(files, cv_path, root, "host")
    ckpt, cached_rows = _run(
        files, cv_path, root, "cached", device_cache="float32"
    )
    assert len(host_rows) == len(cached_rows) == 2
    for h, c in zip(host_rows, cached_rows):
        # identical shuffle stream + update math -> near-identical losses
        # (scan vs per-step dispatch reassociates nothing; tolerance covers
        # gather vs asarray layout differences)
        assert abs(h["tr_loss"] - c["tr_loss"]) < 1e-4 * max(
            1.0, abs(h["tr_loss"])
        )
        assert abs(h["cv_loss"] - c["cv_loss"]) < 1e-4 * max(
            1.0, abs(h["cv_loss"])
        )
    # checkpoints written with the reference cadence
    assert os.path.isfile(os.path.join(ckpt, "models", "latest.npz"))
    assert os.path.isfile(os.path.join(ckpt, "models", "best_loss.npz"))


def test_cached_trainer_int16_close(corpus):
    files, cv_path, root = corpus
    _, host_rows = _run(files, cv_path, root, "host2")
    _, q_rows = _run(files, cv_path, root, "q", device_cache="int16")
    for h, c in zip(host_rows, q_rows):
        assert abs(h["tr_loss"] - c["tr_loss"]) < 5e-2 * max(
            1.0, abs(h["tr_loss"])
        )


def test_cached_trainer_guards(corpus):
    files, cv_path, root = corpus
    with pytest.raises(ValueError, match="single-host"):
        Trainer(
            tr_list=files, cv_file=cv_path,
            ckpt_dir=os.path.join(root, "g1"),
            use_mesh=True, device_cache="int16",
        ).train()
    with pytest.raises(ValueError, match="validate_metrics"):
        Trainer(
            tr_list=files, cv_file=cv_path,
            ckpt_dir=os.path.join(root, "g2"),
            validate_metrics=("stoi",), device_cache="int16",
        ).train()
