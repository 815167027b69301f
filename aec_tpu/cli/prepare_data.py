"""Data preparation CLI — wav quadruples -> h5 ``.ex`` files + filelists.

Covers all three reference packers with one tool (reference:
generate_h5files/{train,test,val}_wav2h5.py):

  python -m aec_tpu.cli.prepare_data train --wav_path ... --h5_path ... --list_path ...
  python -m aec_tpu.cli.prepare_data test  --wav_path ... --h5_path ... --list_path ...
  python -m aec_tpu.cli.prepare_data val   --wav_path ... --h5_path ... --list_path ...

train: one ``tr_<id>.ex`` per utterance + ``tr_list.txt`` (train_wav2h5.py:10-52)
test:  grouped ``test.ex`` (+ ``tt_list.txt`` + ``filename.txt``) (test_wav2h5.py)
val:   grouped ``test2.ex`` with mic/ref/near/echo names (+ ``tt_list2.txt``)
"""

from __future__ import annotations

import argparse
import glob
import os

from aec_tpu.pipeline.audio_io import read_wav
from aec_tpu.pipeline import h5io


def _iter_quads(wav_path: str, sr: int):
    for near_path in sorted(
        glob.glob(os.path.join(wav_path, "nearend_speech_fileid_*.wav"))
    ):
        fid = os.path.basename(near_path).rsplit(".wav", 1)[0].rsplit("_", 1)[-1]
        yield fid, {
            "nearend_speech": read_wav(near_path, sr)[0],
            "nearend_mic": read_wav(
                os.path.join(wav_path, f"nearend_mic_fileid_{fid}.wav"), sr
            )[0],
            "farend_speech": read_wav(
                os.path.join(wav_path, f"farend_speech_fileid_{fid}.wav"), sr
            )[0],
            "echo": read_wav(os.path.join(wav_path, f"echo_fileid_{fid}.wav"), sr)[0],
        }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="wav -> h5 .ex packer")
    p.add_argument("split", choices=("train", "test", "val"))
    p.add_argument("--wav_path", required=True)
    p.add_argument("--h5_path", required=True)
    p.add_argument("--list_path", required=True)
    p.add_argument("--sr", type=int, default=16000)
    args = p.parse_args(argv)

    os.makedirs(args.h5_path, exist_ok=True)
    os.makedirs(args.list_path, exist_ok=True)

    if args.split == "train":
        entries = h5io.pack_train_dir(
            args.wav_path, args.h5_path, os.path.join(args.list_path, "tr_list.txt"), args.sr
        )
        print(f"wrote {len(entries)} train .ex files")
        return

    quads = list(_iter_quads(args.wav_path, args.sr))
    if args.split == "test":
        out = os.path.join(args.h5_path, "test.ex")
        h5io.write_grouped(out, (u for _, u in quads), keys=h5io.TRAIN_KEYS)
        h5io.write_filelist(os.path.join(args.list_path, "tt_list.txt"), [out])
        h5io.write_filelist(
            os.path.join(args.list_path, "filename.txt"), [fid for fid, _ in quads]
        )
    else:  # val: mic/ref/near/echo naming (val_wav2h5.py:44-48)
        out = os.path.join(args.h5_path, "test2.ex")
        h5io.write_grouped(
            out,
            (
                {
                    "mic": u["nearend_mic"],
                    "ref": u["farend_speech"],
                    "near": u["nearend_speech"],
                    "echo": u["echo"],
                }
                for _, u in quads
            ),
            keys=h5io.VAL_KEYS,
        )
        h5io.write_filelist(os.path.join(args.list_path, "tt_list2.txt"), [out])
    print(f"wrote {len(quads)} utterances to {out}")


if __name__ == "__main__":
    main()
