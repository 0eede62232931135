"""zenith_tpu — a TPU-native real-time rendering framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of RustyFan/zenith
(a Rust + Vulkan renderer; reference mounted at /root/reference).

Layer map (mirrors the reference's crate layering, SURVEY.md §1):

    sandbox apps                 — user code
    zenith_tpu (facade)          — launch / App / Engine / EngineLoop
    zenith_tpu.renderer          — feature renderers (triangle, mesh, …)
    zenith_tpu.asset             — asset registry, glTF loader, bake cache
    zenith_tpu.rendergraph       — per-frame declarative pass DAG → one jitted fn
    zenith_tpu.rhi               — TPU "hardware interface": device, resources,
                                   shaders-as-functions, pipeline state
    zenith_tpu.ops               — the rasterizer: Pallas/XLA compute kernels
    zenith_tpu.core              — foundation: log, cli, math, camera, input
    jax / XLA / Pallas           — platform

Where the reference speaks Vulkan (buffers, barriers, layouts, fences), this
framework speaks XLA: resources are `jax.Array`s, pass ordering is dataflow,
frame pacing is JAX async dispatch, and the GPU fixed-function rasterizer is
a set of Pallas TPU kernels.
"""

import importlib
from typing import Any

__version__ = "0.1.0"

# Lazy facade: sub-layers import heavyweight deps (jax) only when touched,
# mirroring the reference's module_facade! re-exports (zenith/src/lib.rs:14-28).
_FACADE = {
    "App": "zenith_tpu.app",
    "Args": "zenith_tpu.app",
    "RenderableApp": "zenith_tpu.app",
    "RenderContext": "zenith_tpu.app",
    "Engine": "zenith_tpu.engine",
    "EngineLoop": "zenith_tpu.main_loop",
    "launch": "zenith_tpu.launch",
}
_SUBMODULES = (
    "core",
    "rhi",
    "ops",
    "rendergraph",
    "renderer",
    "asset",
    "parallel",
    "app",
    "engine",
    "launch",
    "main_loop",
    "window",
)

__all__ = sorted(set(_FACADE) | set(_SUBMODULES))


def __getattr__(name: str) -> Any:
    if name in _FACADE:
        module = importlib.import_module(_FACADE[name])
        return getattr(module, name)
    if name in _SUBMODULES:
        return importlib.import_module(f"zenith_tpu.{name}")
    raise AttributeError(f"module 'zenith_tpu' has no attribute {name!r}")
