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

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init_if_needed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host bring-up: call ``jax.distributed.initialize`` when a
    coordinator is configured. Returns True iff initialization ran here.

    This is the TPU-native replacement for the reference's (implicit,
    single-process) DataParallel scale-out (train1.py:141-142): after init,
    ``jax.devices()`` spans every host and the same ``make_mesh`` +
    ``NamedSharding`` SPMD step runs globally — in-slice gradient reductions
    ride ICI, cross-slice/host segments ride DCN.

    Resolution order per field: explicit argument, then environment
    (``AEC_COORDINATOR`` / ``JAX_COORDINATOR_ADDRESS``, ``AEC_NUM_PROCESSES``
    / ``JAX_NUM_PROCESSES``, ``AEC_PROCESS_ID`` / ``JAX_PROCESS_ID``). With no
    coordinator configured anywhere this is a safe single-host no-op. TPU-pod
    launchers that pre-initialize (or auto-init) are detected and respected.
    """
    # NOTE: must not touch jax.devices()/process_count() before deciding —
    # those initialize the XLA backend, after which initialize() is illegal.
    coordinator_address = (
        coordinator_address
        or os.environ.get("AEC_COORDINATOR")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if not coordinator_address:
        return False  # single-host run
    if jax.distributed.is_initialized():
        return False  # launcher already brought the cluster up
    env_int = lambda *names: next(
        (int(os.environ[n]) for n in names if n in os.environ), None
    )
    if num_processes is None:
        num_processes = env_int("AEC_NUM_PROCESSES", "JAX_NUM_PROCESSES")
    if process_id is None:
        process_id = env_int("AEC_PROCESS_ID", "JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


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


def is_primary() -> bool:
    """True on the process that owns checkpoint/log writes."""
    return jax.process_index() == 0


def process_local_files(items: list) -> list:
    """Disjoint per-process slice of a global file list (data parallelism
    across hosts: each host reads only its shard)."""
    return list(items[jax.process_index() :: jax.process_count()])


def globalize_batch(mesh: Mesh, arrays: list) -> list:
    """Turn per-process host batch arrays into GLOBAL data-sharded jax.Arrays.

    Single-process: a plain device_put with the data sharding. Multi-process:
    each process contributes its local rows via
    ``jax.make_array_from_process_local_data`` — the global batch dimension is
    local_batch * process_count, so every process must supply local arrays of
    identical shape (fixed-length padding; see TrainLoader ``pad_to``).
    """
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return [jax.device_put(np.asarray(a), sh) for a in arrays]
    return [
        jax.make_array_from_process_local_data(sh, np.asarray(a)) for a in arrays
    ]
