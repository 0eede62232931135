"""Test configuration: route tests to a virtual 8-device CPU mesh.

Environment subtlety: this image's sitecustomize registers the `axon` TPU
plugin and eagerly initializes the TPU backend at interpreter startup —
*before* conftest runs — so ``JAX_PLATFORMS=cpu`` cannot exclude it. The CPU
backend, however, initializes lazily, so setting
``--xla_force_host_platform_device_count=8`` here (before anything touches
CPU) still yields 8 virtual CPU devices, and pinning ``jax_default_device``
to cpu:0 routes all test computation off the real chip.

Pallas kernels detect the non-TPU default device and run in interpreter mode
(zenith_tpu.ops gates on platform).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Honored when no axon sitecustomize pre-initialized the TPU backend.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Validation default-ON under pytest — the reference ships its Vulkan
# validation layers on by default (zenith-rhi/Cargo.toml:23); tests are
# where bugs are made. Individual tests may override via monkeypatch.
os.environ.setdefault("ZENITH_VALIDATE", "1")

import jax  # noqa: E402

_cpu0 = jax.devices("cpu")[0]
jax.config.update("jax_default_device", _cpu0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(seed=1234)


@pytest.fixture
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("virtual 8-device CPU platform unavailable")
    return devs
