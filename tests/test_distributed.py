"""Multi-process bring-up: distributed_init_if_needed on a real 2-process
local CPU cluster (subprocesses, Gloo collectives), replacing the round-1
no-op stub. The reference's only scale-out is single-process DataParallel
(train1.py:141-142); this is its multi-host TPU-native counterpart.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from aec_tpu.parallel.mesh import (
        data_sharding, distributed_init_if_needed, make_mesh,
    )
    import numpy as np, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    did = distributed_init_if_needed()
    assert did, "expected to initialize from AEC_* env"
    assert jax.process_count() == 2
    assert not distributed_init_if_needed(), "second call must be a no-op"

    pid = jax.process_index()
    mesh = make_mesh()
    assert mesh.shape["data"] == jax.device_count()

    # a real cross-process reduction: each process contributes (pid+1) per
    # element; the global sum must see both contributions
    x = np.full((jax.local_device_count(), 4), pid + 1, np.float32)
    arr = jax.make_array_from_process_local_data(data_sharding(mesh), x)
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(arr)
    # process 0 rows are all 1, process 1 rows all 2 -> 4*L*(1+2)
    expected = 4.0 * jax.local_device_count() * 3
    assert float(total) == expected, float(total)
    print("OK", pid, "sum=", float(total))
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_cluster(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.replace("{repo!r}", repr(repo)))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            AEC_COORDINATOR=f"127.0.0.1:{port}",
            AEC_NUM_PROCESSES="2",
            AEC_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        # workers must see exactly one local CPU device each; strip the
        # conftest's 8-device forcing
        env["XLA_FLAGS"] = ""
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK {pid} " in out, out


def test_single_host_noop(monkeypatch):
    """No coordinator configured -> no-op, and no backend poke."""
    from aec_tpu.parallel import mesh as mesh_mod

    for var in ("AEC_COORDINATOR", "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert mesh_mod.distributed_init_if_needed() is False


def test_two_process_training_end_to_end(tmp_path, rng):
    """Full cli/train run across 2 OS processes: global batch sharded over
    both, gradients all-reduced over Gloo, only process 0 writing the shared
    checkpoint dir."""
    import numpy as np

    from aec_tpu.cli import prepare_data
    from aec_tpu.pipeline.audio_io import write_wav

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wav_dir, h5_dir, lists = (str(tmp_path / d) for d in ("wavs", "h5", "lists"))
    os.makedirs(wav_dir)
    for i in range(4):
        fid, n = f"{i:03d}", 8192
        far = rng.standard_normal(n).astype(np.float32)
        rir = (np.exp(-np.arange(200) / 50.0) * rng.standard_normal(200)).astype(np.float32)
        echo = np.convolve(far, 0.3 * rir)[:n].astype(np.float32)
        near = (0.2 * rng.standard_normal(n)).astype(np.float32)
        write_wav(os.path.join(wav_dir, f"nearend_speech_fileid_{fid}.wav"), near, 16000)
        write_wav(os.path.join(wav_dir, f"nearend_mic_fileid_{fid}.wav"), near + echo, 16000)
        write_wav(os.path.join(wav_dir, f"farend_speech_fileid_{fid}.wav"), far, 16000)
        write_wav(os.path.join(wav_dir, f"echo_fileid_{fid}.wav"), echo, 16000)
    prepare_data.main(["train", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])
    prepare_data.main(["test", "--wav_path", wav_dir, "--h5_path", h5_dir, "--list_path", lists])

    port = _free_port()
    ckpt = str(tmp_path / "exp")
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            AEC_COORDINATOR=f"127.0.0.1:{port}",
            AEC_NUM_PROCESSES="2",
            AEC_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="",
            PYTHONPATH=repo,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "aec_tpu.cli.train",
                 "--tr_list", os.path.join(lists, "tr_list.txt"),
                 "--cv_file", os.path.join(h5_dir, "test.ex"),
                 "--ckpt_dir", ckpt, "--batch_size", "2",
                 "--max_n_epochs", "1", "--mesh"],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    assert os.path.isfile(os.path.join(ckpt, "models", "latest.npz"))
    info_out = outs[0] + outs[1]
    assert "jax.distributed up" in info_out
