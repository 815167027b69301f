"""Logging / accounting utilities (reference: scripts/utils/tools.py)."""

from __future__ import annotations

import json
import logging
import os

import numpy as np


def get_logger(
    name: str,
    *,
    log_file: bool = False,
    fmt: str = "%(asctime)s [%(pathname)s:%(lineno)s - %(levelname)s ] %(message)s",
    datefmt: str = "%Y-%m-%d %H:%M:%S",
) -> logging.Logger:
    """Console or file logger at INFO (tools.py:11-22 behavior)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        handler = logging.FileHandler(name) if log_file else logging.StreamHandler()
        handler.setFormatter(logging.Formatter(fmt=fmt, datefmt=datefmt))
        logger.addHandler(handler)
    return logger


def num_params(params) -> int:
    """Total parameter count over a pytree (tools.py:25-27)."""
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def count_frames(n_samples: int, win_size: int, hop_size: int) -> int:
    """Frame-count formula used for loss weighting (tools.py:30-32).

    NOTE (SURVEY §2.4.5): this reference formula, (n - win//hop)//hop + 1,
    does NOT equal the actual STFT frame count (n//hop + 1); it is kept
    verbatim because it only weights loss averaging and we match logs.
    """
    n_overlap = win_size // hop_size
    return int((n_samples - n_overlap) // hop_size) + 1


def loss_mask(shape, n_frames) -> np.ndarray:
    """Per-sequence frame validity mask (tools.py:35-39; unused on the
    reference's live path but part of its utility surface): 1.0 for frames
    < seq_len, else 0. ``shape`` = (B, T, F)."""
    mask = np.zeros(shape, dtype=np.float32)
    for i, seq_len in enumerate(n_frames):
        mask[i, : int(seq_len), :] = 1.0
    return mask


def loss_log(path: str, ckpt_info: dict, metrics: dict) -> None:
    """Append an epoch/iter metrics record (tools.py:42-48 format)."""
    with open(path, "a") as f:
        f.write(
            "cur_epoch={}, cur_iter={} [\n\t".format(
                ckpt_info["cur_epoch"] + 1, ckpt_info["cur_iter"] + 1
            )
        )
        for k, v in metrics.items():
            f.write(f"{k} = {v:.4f}, ")
        f.write("\n]\n")


def dump_json(path: str, obj) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=4, sort_keys=True)


def load_json(path: str):
    if not os.path.isfile(path):
        raise FileNotFoundError(f"no json file at {path}")
    with open(path) as f:
        return json.load(f)
