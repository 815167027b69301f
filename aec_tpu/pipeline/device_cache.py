"""Device-resident corpus cache: the whole training set lives in HBM.

Round-5 finding: at reference scale (9,499 x 10 s utterances,
train_wav2h5.py's corpus contract) the L4 loop is HOST-UPLOAD-BOUND on
this image — the tunnel moves ~15 MB/s, so the 30 MB batch upload costs
~2 s/step (measured; the TPU step itself is ~3 ms). The TPU-idiomatic
fix for a corpus that fits device memory is to upload it ONCE and let
every train step gather its batch on-device:

- wavs are quantized to int16 for residency (the native precision of
  recorded corpora — the reference's librosa.load reads 16-bit PCM and
  converts to float32, train_wav2h5.py:20-23; a per-role max-abs scale
  makes the mapping exact for any float corpus). 9,499 x 10 s x 3 roles
  = 9.1 GB of the v5e's 16 GB HBM. ``float32`` / ``bfloat16`` caches are
  available where memory allows (float32 is bit-identical to the
  host-loader path and is what the parity test pins).
- assembly streams ~64 MB chunks through ``dynamic_update_slice`` with a
  DONATED destination (no 2x transient; a plain concatenate would peak
  at twice the role size).
- batches are gathered inside the jitted step: ``take`` + dequantize
  fuse into the step program — zero extra dispatches, ~30 MB of HBM
  reads per step (vs ~2 s of tunnel).

Used by train.loop.Trainer(device_cache=...) which scans a WHOLE EPOCH
of steps in one dispatch on top of this cache (the tunnel's ~25 ms
per-dispatch round trip would otherwise still bound the loop).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from aec_tpu.pipeline import h5io

# the roles the reference-cadence loss consumes (train1.py:196-202)
CACHE_KEYS = ("nearend_mic", "farend_speech", "nearend_speech")
_INT16_MAX = 32767.0


def _np_dtype(dtype: str) -> np.dtype:
    if dtype == "int16":
        return np.dtype(np.int16)
    if dtype == "bfloat16":
        import ml_dtypes  # registered by jax's dependency set

        return np.dtype(ml_dtypes.bfloat16)
    if dtype == "float32":
        return np.dtype(np.float32)
    raise ValueError(
        f"device_cache dtype {dtype!r}: use int16, bfloat16 or float32"
    )


def _quantize(x: np.ndarray, dtype: str, scale: float) -> np.ndarray:
    if dtype == "int16":
        return np.round(np.clip(x / scale, -1.0, 1.0) * _INT16_MAX).astype(
            np.int16
        )
    return x.astype(_np_dtype(dtype))


def dequant(rows: jax.Array, dtype: str, scale: float) -> jax.Array:
    """Inside-jit: cached rows -> float32 at the original scale."""
    if dtype == "int16":
        return rows.astype(jnp.float32) * (scale / _INT16_MAX)
    return rows.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class DeviceCorpus:
    """Equal-shape corpus resident on device: {role: (N, n) array}."""

    arrays: dict[str, jax.Array]
    scales: dict[str, float]
    dtype: str
    n_utts: int
    n_samples: int  # true (pre-pad) max sample count, for count_frames

    def take(self, key: str, idx: jax.Array) -> jax.Array:
        """Inside-jit batch gather + dequantize -> float32 (B, n)."""
        rows = jnp.take(self.arrays[key], idx, axis=0)
        if self.dtype == "int16":
            return rows.astype(jnp.float32) * (
                self.scales[key] / _INT16_MAX
            )
        return rows.astype(jnp.float32)

    def batch(self, idx: jax.Array) -> tuple[jax.Array, ...]:
        """(mic, ref, near) float32 batches for the train/eval step."""
        return tuple(self.take(k, idx) for k in CACHE_KEYS)


def _build(
    utts: Iterable[Mapping[str, np.ndarray]],
    n_utts: int,
    *,
    dtype: str,
    bucket_quantum: int = 4096,
    chunk_bytes: int = 64 << 20,
) -> DeviceCorpus:
    utts = iter(utts)
    first = next(utts)
    true_len = max(len(first[k]) for k in CACHE_KEYS)
    # all utterances padded to ONE bucket length (the cache is a dense
    # (N, n) array per role; mixed-length corpora get trailing zeros
    # exactly like datasets.collate)
    n = -(-true_len // bucket_quantum) * bucket_quantum

    # pass 1 material is streamed; scales must be known before quantizing,
    # so the int16 path batches utterances into host chunks and tracks the
    # running max-abs per role, quantizing with a FIXED scale of 1.0 unless
    # a loud corpus (>1.0 peak) forces a global rescan. Recorded corpora
    # are <=1.0 by construction (16-bit PCM); synthetic ones may exceed.
    np_dtype = _np_dtype(dtype)
    rows_per_chunk = max(1, chunk_bytes // (n * np_dtype.itemsize))

    host_chunks: dict[str, list[np.ndarray]] = {k: [] for k in CACHE_KEYS}
    maxabs = {k: 0.0 for k in CACHE_KEYS}
    buf = {k: np.zeros((rows_per_chunk, n), np.float32) for k in CACHE_KEYS}
    fill = 0
    true_max = 0

    def flush():
        nonlocal fill
        if fill:
            for k in CACHE_KEYS:
                host_chunks[k].append(buf[k][:fill].copy())
            fill = 0

    def add(u):
        nonlocal fill, true_max
        for k in CACHE_KEYS:
            x = np.asarray(u[k], np.float32)
            if len(x) > n:
                raise ValueError(
                    f"utterance length {len(x)} exceeds cache length {n}"
                )
            true_max = max(true_max, len(x))
            buf[k][fill, : len(x)] = x
            buf[k][fill, len(x):] = 0.0
            maxabs[k] = max(maxabs[k], float(np.abs(x).max(initial=0.0)))
        fill += 1
        if fill == rows_per_chunk:
            flush()

    add(first)
    for u in utts:
        add(u)
    flush()

    scales = {
        k: max(maxabs[k], 1e-9) if dtype == "int16" else 1.0
        for k in CACHE_KEYS
    }

    # device assembly: donated dynamic_update_slice per chunk (no 2x peak)
    upd = jax.jit(
        lambda dst, chunk, lo: jax.lax.dynamic_update_slice(
            dst, chunk, (lo, jnp.int32(0))
        ),
        donate_argnums=0,
    )
    arrays = {}
    for k in CACHE_KEYS:
        dst = jnp.zeros((n_utts, n), np_dtype)
        lo = 0
        for chunk in host_chunks[k]:
            q = _quantize(chunk, dtype, scales[k])
            dst = upd(dst, jax.device_put(q), jnp.int32(lo))
            lo += len(chunk)
        if lo != n_utts:
            raise ValueError(f"corpus produced {lo} utts, expected {n_utts}")
        arrays[k] = jax.block_until_ready(dst)
        host_chunks[k].clear()

    return DeviceCorpus(
        arrays=arrays,
        scales=scales,
        dtype=dtype,
        n_utts=n_utts,
        n_samples=true_max,
    )


def from_files(
    file_list: list[str],
    *,
    dtype: str = "int16",
    bucket_quantum: int = 4096,
    progress: Callable[[int, int], None] | None = None,
) -> DeviceCorpus:
    """Cache a TRAIN-layout corpus (one .ex per utterance, tr_list.txt)."""

    def gen():
        for i, p in enumerate(file_list):
            if progress and i % 512 == 0:
                progress(i, len(file_list))
            yield h5io.read_utterance(p)

    return _build(
        gen(), len(file_list), dtype=dtype, bucket_quantum=bucket_quantum
    )


def from_grouped(
    path: str, *, dtype: str = "int16", bucket_quantum: int = 4096
) -> DeviceCorpus:
    """Cache a grouped TEST-layout .ex file (the cv set)."""
    count = h5io.group_count(path)

    def gen():
        for i in range(count):
            yield h5io.read_group(path, i)

    return _build(gen(), count, dtype=dtype, bucket_quantum=bucket_quantum)
