"""Data pipeline tests: h5 schema compatibility, collate parity, features."""

import numpy as np
import h5py
import jax.numpy as jnp

from aec_tpu.pipeline import audio_io, datasets, features, h5io


def _utt(rng, n):
    return {
        "nearend_speech": rng.standard_normal(n).astype(np.float32),
        "nearend_mic": rng.standard_normal(n).astype(np.float32),
        "farend_speech": rng.standard_normal(n).astype(np.float32),
        "echo": rng.standard_normal(n).astype(np.float32),
    }


def test_train_h5_schema_roundtrip(tmp_path, rng):
    utt = _utt(rng, 5000)
    p = str(tmp_path / "tr_0.ex")
    h5io.write_utterance(p, utt)
    # schema check with raw h5py: four float32 root datasets, chunked
    with h5py.File(p, "r") as f:
        assert set(f.keys()) == set(h5io.TRAIN_KEYS)
        for k in h5io.TRAIN_KEYS:
            assert f[k].dtype == np.float32
            assert f[k].chunks is not None
    back = h5io.read_utterance(p)
    for k in h5io.TRAIN_KEYS:
        np.testing.assert_array_equal(back[k], utt[k])


def test_grouped_h5_schema(tmp_path, rng):
    utts = [_utt(rng, 3000), _utt(rng, 4000)]
    p = str(tmp_path / "test.ex")
    assert h5io.write_grouped(p, utts) == 2
    with h5py.File(p, "r") as f:
        assert set(f.keys()) == {"0", "1"}
        assert set(f["1"].keys()) == set(h5io.TRAIN_KEYS)
    got = h5io.read_group(p, 1)
    np.testing.assert_array_equal(got["echo"], utts[1]["echo"])
    assert h5io.group_count(p) == 2


def test_collate_pads_like_reference(rng):
    utts = [_utt(rng, 3000), _utt(rng, 5000)]
    batch = datasets.collate(utts, bucket_quantum=0)
    assert batch["n_samples"] == 5000
    assert batch["nearend_mic"].shape == (2, 5000)
    # zero-pad at the tail (train1.py:58-61)
    np.testing.assert_array_equal(batch["nearend_mic"][0, 3000:], 0.0)
    np.testing.assert_array_equal(batch["nearend_mic"][0, :3000], utts[0]["nearend_mic"])
    # bucketed variant only appends zeros
    b2 = datasets.collate(utts, bucket_quantum=4096)
    assert b2["nearend_mic"].shape == (2, 8192)
    np.testing.assert_array_equal(b2["nearend_mic"][:, :5000], batch["nearend_mic"])
    assert b2["n_samples"] == 5000


def test_train_loader_epoch(tmp_path, rng):
    paths = []
    for i in range(5):
        p = str(tmp_path / f"tr_{i}.ex")
        h5io.write_utterance(p, _utt(rng, 2000 + 100 * i))
        paths.append(p)
    loader = datasets.TrainLoader(paths, batch_size=2, bucket_quantum=1024, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    for b in batches:
        assert b["nearend_mic"].shape[0] == 2
        assert b["nearend_mic"].shape[1] % 1024 == 0


def test_eval_loader_val_keys(tmp_path, rng):
    utt = _utt(rng, 2500)
    val_utt = {"mic": utt["nearend_mic"], "ref": utt["farend_speech"],
               "near": utt["nearend_speech"], "echo": utt["echo"]}
    p = str(tmp_path / "test2.ex")
    h5io.write_grouped(p, [val_utt], keys=h5io.VAL_KEYS)
    loader = datasets.EvalLoader(p, keys=h5io.VAL_KEYS)
    (batch,) = list(loader)
    np.testing.assert_array_equal(batch["nearend_mic"][0], utt["nearend_mic"])
    np.testing.assert_array_equal(batch["farend_speech"][0], utt["farend_speech"])
    np.testing.assert_array_equal(batch["nearend_speech"][0], utt["nearend_speech"])


def test_wav_roundtrip(tmp_path, rng):
    x = (0.5 * rng.standard_normal(16000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, x, 16000)
    back, sr = audio_io.read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, x, atol=1e-7)


def test_wav_pack_train_dir(tmp_path, rng):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for fid in ("000", "001"):
        for stem in ("nearend_speech", "nearend_mic", "farend_speech", "echo"):
            audio_io.write_wav(
                str(wav_dir / f"{stem}_fileid_{fid}.wav"),
                rng.standard_normal(4000).astype(np.float32),
                16000,
            )
    entries = h5io.pack_train_dir(
        str(wav_dir), str(tmp_path / "h5"), str(tmp_path / "lists/tr_list.txt")
    )
    assert len(entries) == 2
    assert h5io.read_filelist(str(tmp_path / "lists/tr_list.txt")) == entries
    utt = h5io.read_utterance(entries[0])
    assert utt["echo"].shape == (4000,)


def test_wav_resample(tmp_path, rng):
    # 8 kHz sine read back at 16 kHz keeps duration and pitch
    sr_in, sr_out = 8000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    p = str(tmp_path / "a8k.wav")
    audio_io.write_wav(p, x, sr_in)
    y, sr = audio_io.read_wav(p, sr_out)
    assert sr == sr_out and y.shape == (sr_out,)
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y))
    peak_hz = np.argmax(spec) * sr_out / len(y)
    assert abs(peak_hz - 440) < 5


def test_measure_pesq_gated(rng, tmp_path):
    import pytest
    from aec_tpu.cli.measure import score_pair

    x = rng.standard_normal(4000).astype(np.float32)
    with pytest.raises(SystemExit):
        score_pair(x, x, metrics=("pesq",))


def test_features_batch_shapes(rng):
    mic = rng.standard_normal((3, 4096)).astype(np.float32)
    ref = rng.standard_normal((3, 4096)).astype(np.float32)
    near = rng.standard_normal((3, 4096)).astype(np.float32)
    out = features.extract_features_chunked(mic, ref, near, chunk=2)
    t = 4096 // 256 + 1
    assert out["mic_spec"].shape == (3, t, 514)
    assert out["gru_input"].shape == (3, t, 64)
    assert out["near_erb"].shape == (3, t, 32)
    # features equal the model's internal path (ERB.py:287-290) on the
    # un-normalized inputs
    from aec_tpu.dsp.erb import erb_filterbank
    from aec_tpu.models.little_net import little_net_features
    from aec_tpu.dsp.stft import StftConfig

    erb = jnp.asarray(erb_filterbank())
    feats, _, _ = little_net_features(jnp.asarray(mic), jnp.asarray(ref), erb, StftConfig())
    np.testing.assert_allclose(out["gru_input"], np.asarray(feats), atol=1e-3, rtol=1e-4)
