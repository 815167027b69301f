"""h5 schema parity: run the ACTUAL reference packers against our packers.

The reference packers (generate_h5files/{train,test,val}_wav2h5.py) are
importable except for `librosa`, which this image lacks — the ONLY gap. We
close it explicitly with a shim whose ``load`` delegates to our scipy-based
``read_wav`` (both return mono float32 in [-1, 1)); everything downstream —
glob order, id parsing, h5py dataset creation (train_wav2h5.py:38-44,
test_wav2h5.py:45-48, val_wav2h5.py:44-48), filelist writing — is the
reference's own code. We then compare our ``cli/prepare_data`` output
dataset-by-dataset: names, dtype, shape, chunking flag, and raw bytes.

(Whole-FILE bytes can't match: HDF5 embeds modification timestamps.)
"""

import importlib.util
import os
import sys
import types

import h5py
import numpy as np
import pytest

from aec_tpu.cli import prepare_data
from aec_tpu.pipeline.audio_io import read_wav, write_wav

REF_GEN = "/root/reference/Stage2_lhm/generate_h5files"


@pytest.fixture()
def librosa_shim(monkeypatch):
    """Minimal librosa.load stand-in backed by our decoder (documented gap:
    librosa is absent from this image; for 16 kHz float wavs the two decoders
    agree exactly)."""
    shim = types.ModuleType("librosa")

    def load(path, sr=None):
        x, got_sr = read_wav(path, sr=sr)
        return x, got_sr

    shim.load = load
    monkeypatch.setitem(sys.modules, "librosa", shim)
    return shim


def _load_ref_module(name):
    spec = importlib.util.spec_from_file_location(
        f"_ref_{name}", os.path.join(REF_GEN, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_wavs(wav_dir, rng, n_utts=2, n=8000):
    os.makedirs(wav_dir, exist_ok=True)
    for i in range(n_utts):
        fid = f"{i:03d}"
        for stem in ("nearend_speech", "nearend_mic", "farend_speech", "echo"):
            write_wav(
                os.path.join(wav_dir, f"{stem}_fileid_{fid}.wav"),
                (0.3 * rng.standard_normal(n)).astype(np.float32),
                16000,
            )


def _compare_datasets(ours: h5py.Dataset, ref: h5py.Dataset, ctx: str):
    assert ours.dtype == ref.dtype == np.float32, ctx
    assert ours.shape == ref.shape, ctx
    # reference uses chunks=True (auto-chunked); layout class must match
    assert (ours.chunks is not None) == (ref.chunks is not None), ctx
    assert np.asarray(ours).tobytes() == np.asarray(ref).tobytes(), ctx


def test_train_packer_schema_byte_parity(tmp_path, rng, librosa_shim):
    wav_dir = str(tmp_path / "wavs")
    _make_wavs(wav_dir, rng)

    # reference packer, its own code end-to-end
    ref_h5 = str(tmp_path / "ref_h5")
    ref_lists = str(tmp_path / "ref_lists")
    os.makedirs(ref_h5)
    os.makedirs(ref_lists)
    mod = _load_ref_module("train_wav2h5")
    mod.create_h5(
        types.SimpleNamespace(
            train_path=wav_dir, h5_path=ref_h5, list_path=ref_lists, sr=16000
        )
    )

    ours_h5 = str(tmp_path / "our_h5")
    ours_lists = str(tmp_path / "our_lists")
    prepare_data.main(
        ["train", "--wav_path", wav_dir, "--h5_path", ours_h5,
         "--list_path", ours_lists]
    )

    ref_files = sorted(
        os.path.join(ref_h5, "tr", f) for f in os.listdir(os.path.join(ref_h5, "tr"))
    )
    assert len(ref_files) == 2
    for rf in ref_files:
        of = os.path.join(ours_h5, "tr", os.path.basename(rf))
        assert os.path.isfile(of), f"missing our counterpart for {rf}"
        with h5py.File(rf) as fr, h5py.File(of) as fo:
            assert sorted(fr.keys()) == sorted(fo.keys()) == [
                "echo", "farend_speech", "nearend_mic", "nearend_speech"
            ]
            for k in fr.keys():
                _compare_datasets(fo[k], fr[k], f"{of}:{k}")

    # filelist: same basenames (the reference emits filesystem-glob order,
    # which is arbitrary; we emit sorted order — training shuffles anyway)
    ref_list = open(os.path.join(ref_lists, "tr_list.txt")).read().splitlines()
    our_list = open(os.path.join(ours_lists, "tr_list.txt")).read().splitlines()
    assert sorted(os.path.basename(p) for p in ref_list) == sorted(
        os.path.basename(p) for p in our_list
    )


def test_test_packer_schema_byte_parity(tmp_path, rng, librosa_shim):
    wav_dir = str(tmp_path / "wavs")
    _make_wavs(wav_dir, rng)

    ref_h5 = str(tmp_path / "ref_h5")
    ref_lists = str(tmp_path / "ref_lists")
    os.makedirs(ref_h5)
    os.makedirs(ref_lists)
    mod = _load_ref_module("test_wav2h5")
    # NOTE: the reference test packer's flag is (confusingly) --val_path
    # (test_wav2h5.py:71) and it writes h5_path/tt/test.ex
    mod.create_h5(
        types.SimpleNamespace(
            val_path=wav_dir, h5_path=ref_h5, list_path=ref_lists, sr=16000
        )
    )

    ours_h5 = str(tmp_path / "our_h5")
    ours_lists = str(tmp_path / "our_lists")
    prepare_data.main(
        ["test", "--wav_path", wav_dir, "--h5_path", ours_h5,
         "--list_path", ours_lists]
    )

    ref_names = open(os.path.join(ref_lists, "filename.txt")).read().split()
    our_names = open(os.path.join(ours_lists, "filename.txt")).read().split()
    assert sorted(ref_names) == sorted(our_names)

    # group index follows filelist position; align via the id lists (the
    # reference's glob order is arbitrary, ours sorted)
    with h5py.File(os.path.join(ref_h5, "tt", "test.ex")) as fr, h5py.File(
        os.path.join(ours_h5, "test.ex")
    ) as fo:
        assert sorted(fr.keys(), key=int) == sorted(fo.keys(), key=int)
        for gi, name in enumerate(ref_names):
            our_gi = our_names.index(name)
            assert sorted(fr[str(gi)].keys()) == sorted(fo[str(our_gi)].keys())
            for k in fr[str(gi)].keys():
                _compare_datasets(
                    fo[str(our_gi)][k], fr[str(gi)][k], f"{name}/{k}"
                )


def test_val_packer_schema_byte_parity(tmp_path, rng, librosa_shim):
    # the reference val packer reads from per-channel SUBDIRECTORIES
    # (val_wav2h5.py:11-14); our flat layout holds the same files
    wav_dir = str(tmp_path / "wavs")
    _make_wavs(wav_dir, rng)
    ref_wavs = str(tmp_path / "ref_wavs")
    for stem in ("nearend_speech", "nearend_mic", "farend_speech", "echo"):
        sub = os.path.join(ref_wavs, stem)
        os.makedirs(sub)
        for f in os.listdir(wav_dir):
            if f.startswith(stem + "_"):
                os.link(os.path.join(wav_dir, f), os.path.join(sub, f))

    ref_h5 = str(tmp_path / "ref_h5")
    ref_lists = str(tmp_path / "ref_lists")
    os.makedirs(ref_h5)
    os.makedirs(ref_lists)
    mod = _load_ref_module("val_wav2h5")
    mod.create_h5(
        types.SimpleNamespace(
            val_path=ref_wavs, h5_path=ref_h5, list_path=ref_lists, sr=16000
        )
    )

    ours_h5 = str(tmp_path / "our_h5")
    ours_lists = str(tmp_path / "our_lists")
    prepare_data.main(
        ["val", "--wav_path", wav_dir, "--h5_path", ours_h5,
         "--list_path", ours_lists]
    )

    # group numbering follows (arbitrary) glob order; compare as multisets of
    # per-group content signatures
    def signatures(path):
        sigs = []
        with h5py.File(path) as f:
            for g in sorted(f.keys(), key=int):
                assert sorted(f[g].keys()) == ["echo", "mic", "near", "ref"]
                for k in f[g].keys():
                    assert f[g][k].dtype == np.float32
                    assert f[g][k].chunks is not None
                sigs.append(
                    tuple(
                        (k, np.asarray(f[g][k]).tobytes())
                        for k in sorted(f[g].keys())
                    )
                )
        return sorted(sigs)

    assert signatures(os.path.join(ref_h5, "tt", "test2.ex")) == signatures(
        os.path.join(ours_h5, "test2.ex")
    )
