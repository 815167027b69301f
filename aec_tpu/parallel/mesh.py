"""Device mesh construction and shardings.

TPU-native replacement for the reference's single-process
``torch.nn.DataParallel`` (train1.py:14,141-142 — replicate + scatter/gather
per forward). Here parallelism is SPMD: one ``jax.sharding.Mesh`` with a
``data`` axis; batches are sharded over it (``NamedSharding``), params are
replicated, and XLA inserts the gradient all-reduce (rides ICI in-slice,
DCN across slices). The AEC workload is small-model/large-batch, so pure DP
is the optimal layout (SURVEY §2.5); a ``model`` axis is reserved in the
mesh API for completeness.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init_if_needed() -> None:
    """Multi-host bring-up (jax.distributed). Safe no-op single-host."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    # single-process: nothing to do; multi-process launchers call
    # jax.distributed.initialize() before importing this module.


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Mesh with axes ("data", "model"); default uses all visible devices
    on the data axis."""
    devs = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devs) // n_model
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding: leading dim split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded."""
    sh = data_sharding(mesh)
    return {
        k: (jax.device_put(v, sh) if getattr(v, "ndim", 0) >= 1 else v)
        for k, v in batch.items()
    }
