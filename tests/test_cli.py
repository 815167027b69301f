"""End-to-end CLI tests: prepare_data -> train -> infer -> measure."""

import os

import numpy as np

from aec_tpu.cli import infer, measure, prepare_data, train as train_cli
from aec_tpu.pipeline import h5io
from aec_tpu.pipeline.audio_io import read_wav, write_wav
from aec_tpu.train.stoi import stoi


def _make_wavs(wav_dir, rng, n_utts=2, n=8192):
    os.makedirs(wav_dir, exist_ok=True)
    for i in range(n_utts):
        fid = f"{i:03d}"
        far = rng.standard_normal(n).astype(np.float32)
        rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(np.float32)
        echo = np.convolve(far, 0.3 * rir)[:n].astype(np.float32)
        near = (0.2 * rng.standard_normal(n)).astype(np.float32)
        write_wav(os.path.join(wav_dir, f"nearend_speech_fileid_{fid}.wav"), near, 16000)
        write_wav(os.path.join(wav_dir, f"nearend_mic_fileid_{fid}.wav"), near + echo, 16000)
        write_wav(os.path.join(wav_dir, f"farend_speech_fileid_{fid}.wav"), far, 16000)
        write_wav(os.path.join(wav_dir, f"echo_fileid_{fid}.wav"), echo, 16000)


def test_full_cli_flow(tmp_path, rng, capsys):
    wav_dir = str(tmp_path / "wavs")
    h5_dir = str(tmp_path / "h5")
    lists = str(tmp_path / "lists")
    _make_wavs(wav_dir, rng)

    # pack all three splits
    prepare_data.main(["train", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    prepare_data.main(["test", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    prepare_data.main(["val", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    assert len(h5io.read_filelist(os.path.join(lists, "tr_list.txt"))) == 2
    assert h5io.group_count(os.path.join(h5_dir, "test.ex")) == 2
    assert h5io.group_count(os.path.join(h5_dir, "test2.ex")) == 2
    assert h5io.read_filelist(os.path.join(lists, "filename.txt")) == ["000", "001"]

    # one-epoch training
    ckpt_dir = str(tmp_path / "exp")
    train_cli.main([
        "--tr_list", os.path.join(lists, "tr_list.txt"),
        "--cv_file", os.path.join(h5_dir, "test.ex"),
        "--ckpt_dir", ckpt_dir,
        "--batch_size", "2", "--max_n_epochs", "1",
    ])
    model = os.path.join(ckpt_dir, "models", "best_loss.npz")
    assert os.path.isfile(model)

    # inference writes the 5-wav contract
    est = str(tmp_path / "est")
    infer.main([
        "--tt_list", os.path.join(lists, "tt_list.txt"),
        "--ckpt_dir", ckpt_dir, "--model_file", model,
        "--est_path", est, "--stage1", "kalman",
    ])
    sub = os.path.join(est, "test")
    for k in range(2):
        for stem in ("near_est", "near", "far", "mic", "echo"):
            assert os.path.isfile(os.path.join(sub, f"{k}_{stem}.wav"))
    est_wav, sr = read_wav(os.path.join(sub, "0_near_est.wav"))
    assert sr == 16000 and est_wav.shape == (8192,)

    # metric CLI runs and reports means
    measure.main(["--est_dir", sub, "--metrics", "sisnr,erle,snr"])
    out = capsys.readouterr().out
    assert '"mean"' in out and '"erle"' in out


def test_train_cli_two_layer_gru(tmp_path, rng):
    wav_dir = str(tmp_path / "wavs")
    h5_dir = str(tmp_path / "h5")
    lists = str(tmp_path / "lists")
    _make_wavs(wav_dir, rng)
    prepare_data.main(["train", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    prepare_data.main(["test", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    ckpt_dir = str(tmp_path / "exp2l")
    train_cli.main([
        "--tr_list", os.path.join(lists, "tr_list.txt"),
        "--cv_file", os.path.join(h5_dir, "test.ex"),
        "--ckpt_dir", ckpt_dir,
        "--batch_size", "2", "--max_n_epochs", "1",
        "--model", "two_layer_gru",
    ])
    assert os.path.isfile(os.path.join(ckpt_dir, "models", "latest.npz"))


def test_infer_cli_other_models(tmp_path, rng):
    # train fullsubnet briefly via the CLI, then infer with it
    wav_dir = str(tmp_path / "wavs")
    h5_dir = str(tmp_path / "h5")
    lists = str(tmp_path / "lists")
    _make_wavs(wav_dir, rng, n=4096)
    prepare_data.main(["train", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    prepare_data.main(["test", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    ckpt_dir = str(tmp_path / "exp_fs")
    train_cli.main([
        "--tr_list", os.path.join(lists, "tr_list.txt"),
        "--cv_file", os.path.join(h5_dir, "test.ex"),
        "--ckpt_dir", ckpt_dir,
        "--batch_size", "2", "--max_n_epochs", "1",
        "--model", "fullsubnet",
    ])
    model = os.path.join(ckpt_dir, "models", "latest.npz")
    assert os.path.isfile(model)
    est = str(tmp_path / "est_fs")
    infer.main([
        "--tt_list", os.path.join(lists, "tt_list.txt"),
        "--ckpt_dir", ckpt_dir, "--model_file", model,
        "--est_path", est, "--model", "fullsubnet", "--stage1", "nlms",
    ])
    wav, sr = read_wav(os.path.join(est, "test", "0_near_est.wav"))
    assert sr == 16000 and wav.shape == (4096,)
    assert np.isfinite(wav).all()


def test_batch_enhance_cli(tmp_path, rng):
    from aec_tpu.cli import batch_enhance

    wav_dir = str(tmp_path / "wavs")
    h5_dir = str(tmp_path / "h5")
    lists = str(tmp_path / "lists")
    _make_wavs(wav_dir, rng)
    prepare_data.main(["test", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    # save a fresh-init checkpoint to load
    import jax
    from aec_tpu.models.little_net import little_net_init
    from aec_tpu.train import checkpoints

    model = str(tmp_path / "m.npz")
    checkpoints.save(model, {"params": little_net_init(jax.random.PRNGKey(0))})
    out_dir = str(tmp_path / "bulk")
    batch_enhance.main([
        "--tt_list", os.path.join(lists, "tt_list.txt"),
        "--model_file", model, "--out_dir", out_dir,
        "--batch", "2", "--bucket", "8192", "--mesh",
    ])
    for k in range(2):
        wav, sr = read_wav(os.path.join(out_dir, f"{k}_enhanced.wav"))
        assert sr == 16000 and wav.shape == (8192,)
        # zero-filled batch-padding rows go NaN under the per-utt pseudo-norm;
        # they are discarded and must not leak into real utterances
        assert np.isfinite(wav).all()


def test_stream_cli(tmp_path, rng, capsys):
    from aec_tpu.cli import stream

    n = 12 * 256
    far = (0.5 * rng.standard_normal(n)).astype(np.float32)
    mic = (0.5 * rng.standard_normal(n)).astype(np.float32)
    write_wav(str(tmp_path / "far.wav"), far, 16000)
    write_wav(str(tmp_path / "mic.wav"), mic, 16000)
    out = str(tmp_path / "enh.wav")
    stream.main(["--far", str(tmp_path / "far.wav"), "--mic", str(tmp_path / "mic.wav"),
                 "--out", out, "--stage1", "nlms"])
    wav, sr = read_wav(out)
    assert sr == 16000 and wav.shape == (n,)
    report = capsys.readouterr().out
    assert '"latency_ms_p50"' in report


def test_stoi_properties(rng):
    t = np.arange(32000) / 16000.0
    # modulated tone stack ~ speech-ish envelope
    clean = (np.sin(2 * np.pi * 400 * t) + 0.5 * np.sin(2 * np.pi * 1200 * t)) * (
        0.6 + 0.4 * np.sin(2 * np.pi * 4 * t)
    )
    clean = clean.astype(np.float32)
    s_self = stoi(clean, clean)
    assert s_self > 0.99
    noisy_light = clean + 0.1 * rng.standard_normal(len(clean)).astype(np.float32)
    noisy_heavy = clean + 2.0 * rng.standard_normal(len(clean)).astype(np.float32)
    s_light, s_heavy = stoi(clean, noisy_light), stoi(clean, noisy_heavy)
    assert s_self >= s_light >= s_heavy
    assert s_heavy < 0.8


def test_bench_check_skips_off_tpu(capsys):
    """bench.py --check on the CPU backend: documented skip, rc 0 (the
    routing + perf-bar guards only mean something on the TPU backend)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    rc = bench.check()
    out = capsys.readouterr().out
    assert rc == 0
    assert "skipped" in out


def test_infer_align_far_flag(tmp_path, rng):
    """--align-far-ms runs end-to-end (both a small and a wide window — the
    small value used to crash on an empty argmax window before the search
    range was decoupled from block quantization) and feeds the ALIGNED far
    to both stages."""
    import numpy as np

    from aec_tpu.pipeline.audio_io import write_wav

    wav_dir = str(tmp_path / "wavs")
    os.makedirs(wav_dir)
    n, d = 8192, 37 * 16  # 37 ms bulk delay
    far = rng.standard_normal(n).astype(np.float32)
    rir = (np.exp(-np.arange(128) / 32.0) * rng.standard_normal(128)).astype(
        np.float32
    )
    echo = np.convolve(np.pad(far, (d, 0))[:n], 0.3 * rir)[:n].astype(np.float32)
    near = (0.1 * rng.standard_normal(n)).astype(np.float32)
    write_wav(os.path.join(wav_dir, "nearend_speech_fileid_000.wav"), near, 16000)
    write_wav(os.path.join(wav_dir, "nearend_mic_fileid_000.wav"), near + echo, 16000)
    write_wav(os.path.join(wav_dir, "farend_speech_fileid_000.wav"), far, 16000)
    write_wav(os.path.join(wav_dir, "echo_fileid_000.wav"), echo, 16000)
    h5_dir, lists = str(tmp_path / "h5"), str(tmp_path / "lists")
    prepare_data.main(["test", "--wav_path", wav_dir, "--h5_path", h5_dir,
                       "--list_path", lists])
    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "checkpoints", "little_net_general.npz"
    )
    for ms in ("10", "120"):
        est = str(tmp_path / f"est{ms}")
        infer.main([
            "--tt_list", os.path.join(lists, "tt_list.txt"),
            "--ckpt_dir", str(tmp_path / "exp"), "--model_file", ckpt,
            "--est_path", est, "--stage1", "kalman", "--no-normalize",
            "--align-far-ms", ms,
        ])
        wav, sr = read_wav(os.path.join(est, "test", "0_near_est.wav"))
        assert sr == 16000 and np.isfinite(wav).all()
