"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated the standard JAX way — host platform
with ``xla_force_host_platform_device_count`` — so no TPU pod is needed
(SURVEY.md §4(d)).

Note: this image's sitecustomize imports jax at interpreter startup (axon TPU
tunnel) with JAX_PLATFORMS already latched, so plain env-var overrides are too
late; use ``jax.config.update`` before any backend is initialized instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Full fp32 matmuls on CPU for parity tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
