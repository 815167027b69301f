"""HDF5 ``.ex`` dataset I/O — byte-compatible with the reference schemas.

Three layouts exist in the reference's packers (all float32):

- TRAIN: one ``.ex`` file per utterance holding four root datasets
  ``nearend_speech / nearend_mic / farend_speech / echo``
  (generate_h5files/train_wav2h5.py:38-44), listed in ``tr_list.txt``;
- TEST: one ``.ex`` file with numbered groups "0".."N-1", each holding the
  same four dataset names (generate_h5files/test_wav2h5.py:45-48), listed in
  ``tt_list.txt`` + a ``filename.txt`` id list;
- VAL: grouped like TEST but datasets named ``mic / ref / near / echo``
  (generate_h5files/val_wav2h5.py:44-48).

Writers emit identical structure (chunked float32) so reference tooling can
read our files and vice versa.
"""

from __future__ import annotations

import os
from typing import Iterable, Mapping

import h5py
import numpy as np

TRAIN_KEYS = ("nearend_speech", "nearend_mic", "farend_speech", "echo")
VAL_KEYS = ("mic", "ref", "near", "echo")


def write_utterance(path: str, utt: Mapping[str, np.ndarray]) -> None:
    """TRAIN layout: four root datasets in one file (train_wav2h5.py:38-44)."""
    with h5py.File(path, "w") as f:
        for key in TRAIN_KEYS:
            data = np.asarray(utt[key], dtype=np.float32)
            f.create_dataset(key, data=data, shape=data.shape, chunks=True)


def read_utterance(path: str) -> dict[str, np.ndarray]:
    with h5py.File(path, "r") as f:
        return {k: np.asarray(f[k], dtype=np.float32) for k in TRAIN_KEYS}


def utterance_length(path: str) -> int:
    """Sample count of a TRAIN-layout file, from h5 metadata (no data read)."""
    with h5py.File(path, "r") as f:
        return int(f[TRAIN_KEYS[0]].shape[0])


def write_grouped(
    path: str, utts: Iterable[Mapping[str, np.ndarray]], keys=TRAIN_KEYS
) -> int:
    """TEST/VAL layout: numbered groups "0".."N-1" (test_wav2h5.py:43-48).

    Pass ``keys=VAL_KEYS`` for the val packer's naming (val_wav2h5.py:44-48).
    Returns the number of groups written.
    """
    n = 0
    with h5py.File(path, "w") as f:
        for i, utt in enumerate(utts):
            grp = f.create_group(str(i))
            for key in keys:
                data = np.asarray(utt[key], dtype=np.float32)
                grp.create_dataset(key, data=data, shape=data.shape, chunks=True)
            n += 1
    return n


def read_group(path: str, index: int, keys=TRAIN_KEYS) -> dict[str, np.ndarray]:
    with h5py.File(path, "r") as f:
        grp = f[str(index)]
        return {k: np.asarray(grp[k], dtype=np.float32) for k in keys}


def group_count(path: str) -> int:
    with h5py.File(path, "r") as f:
        return len(f)


def write_filelist(path: str, entries: list[str]) -> None:
    """Newline-joined list file (train_wav2h5.py:48-51 format)."""
    with open(path, "w") as f:
        f.write("\n".join(entries))


def read_filelist(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def pack_train_dir(
    wav_dir: str, h5_dir: str, list_path: str, sr: int = 16000
) -> list[str]:
    """Reference train packer behavior (train_wav2h5.py:10-52): glob
    ``nearend_speech_fileid_*.wav``, load the aligned quadruple at ``sr``,
    write one ``tr_<id>.ex`` per utterance under ``h5_dir/tr``, emit
    ``tr_list.txt`` at ``list_path``.
    """
    import glob

    from aec_tpu.pipeline.audio_io import read_wav

    out_dir = os.path.join(h5_dir, "tr")
    os.makedirs(out_dir, exist_ok=True)
    entries = []
    for near_path in sorted(glob.glob(os.path.join(wav_dir, "nearend_speech_fileid_*.wav"))):
        fid = os.path.basename(near_path).rsplit(".wav", 1)[0].rsplit("_", 1)[-1]
        utt = {
            "nearend_speech": read_wav(near_path, sr)[0],
            "nearend_mic": read_wav(os.path.join(wav_dir, f"nearend_mic_fileid_{fid}.wav"), sr)[0],
            "farend_speech": read_wav(os.path.join(wav_dir, f"farend_speech_fileid_{fid}.wav"), sr)[0],
            "echo": read_wav(os.path.join(wav_dir, f"echo_fileid_{fid}.wav"), sr)[0],
        }
        ex_path = os.path.join(out_dir, f"tr_{fid}.ex")
        write_utterance(ex_path, utt)
        entries.append(ex_path)
    os.makedirs(os.path.dirname(list_path) or ".", exist_ok=True)
    write_filelist(list_path, entries)
    return entries
