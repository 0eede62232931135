"""Platform gating for the rasterizer kernels.

Pallas TPU kernels run compiled on a TPU default device and in interpreter
mode elsewhere (CPU tests / the 8-device virtual host platform). The default
device is what conftest/engine control; everything in ops consults this one
switch.
"""

from __future__ import annotations

import jax


def default_platform() -> str:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def on_tpu() -> bool:
    return default_platform() in ("tpu", "axon")


def pallas_interpret() -> bool:
    """Whether pl.pallas_call should run in interpreter mode."""
    return not on_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
