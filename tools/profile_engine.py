"""Host-dispatch cost of the engine loop (VERDICT weak #2 / item 3).

Measures (a) the pure-host cost of the per-frame graph rebuild + structure
key + compile() on a cache hit, and (b) sustained engine-path FPS for the
triangle demo at 1080p. Targets: structure-key path well under the jit
dispatch floor; engine triangle ≥ 2,000 FPS.

Run with an idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
from zenith_tpu.renderer import TriangleRenderer
from zenith_tpu.rhi import Format, PipelineCache, RhiCore, Texture, TextureDesc
from zenith_tpu.rhi.formats import encode_present


def main() -> None:
    w, h = 1920, 1080
    core = RhiCore()
    device = core.create_render_device()
    pcache = PipelineCache()
    options = CompileOptions()
    renderer = TriangleRenderer(device)
    swap_tex = Texture(TextureDesc.color("swapchain.0", w, h, Format.RGBA32F))
    enc = jax.jit(lambda img: encode_present(img, Format.BGRA8_SRGB))

    def build(t):
        builder = RenderGraphBuilder()
        out = builder.import_resource(swap_tex)
        builder.export(out)
        renderer.render_to(builder, out, w, h)
        return builder.build()

    from zenith_tpu.rendergraph.resource import RenderGraphResource

    # Warm-up / compile.
    g = build(0.0)
    compiled = g.compile(device, pcache, options)
    compiled.execute(device)
    img = enc(compiled.value(RenderGraphResource(g.exports[0], "texture")))
    jax.block_until_ready(img)

    results = {}

    # (a) host-only: rebuild + structure key + compile (cache hit), no execute
    n = 300
    t0 = time.perf_counter()
    for i in range(n):
        build(i * 0.016).compile(device, pcache, options)
    results["rebuild_compile_ms"] = (time.perf_counter() - t0) / n * 1e3

    # (a2) structure key alone on the built graph
    t0 = time.perf_counter()
    for i in range(n):
        g._structure_key(options)
    results["structure_key_ms"] = (time.perf_counter() - t0) / n * 1e3

    # (b) full engine-path frame: rebuild + compile + execute + encode
    def frame(t):
        c = build(t).compile(device, pcache, options)
        c.execute(device)
        from zenith_tpu.rendergraph.resource import RenderGraphResource

        return enc(c.value(RenderGraphResource(c._graph.exports[0], "texture")))

    out = frame(0.0)
    jax.block_until_ready(out)
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = frame(0.3 + rep + i * 0.016)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    results["engine_frame_ms"] = best * 1e3
    results["engine_fps"] = 1.0 / best

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
