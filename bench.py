"""Headline benchmark — the BASELINE.md north star:
"the sandbox demo scene at 1080p ≥60 FPS on one v5e chip".

Measures the full sandbox scene (BASELINE.md config #5: cerberus + ground,
sun with PCF shadows, 100 point lights, deferred GGX PBR, bloom + ACES
tonemap, sRGB present encode) through the real engine path — per-frame
render-graph rebuild + structure-cache hit + one async dispatch — for N
frames with a single final fence, excluding compilation. Prints ONE JSON
line. vs_baseline is FPS / 60 (the reference publishes no numbers; 60 FPS
at 1080p is the agreed target, BASELINE.md).

Falls back to the triangle demo (config #1) if the cerberus content is
unavailable.
"""

from __future__ import annotations

import json
import math
import os
import time


def bench_scene() -> "tuple[str, float] | None":
    import numpy as np

    from zenith_tpu import asset
    from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
    from zenith_tpu.renderer import DeferredRenderer, PostProcess
    from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
    from zenith_tpu.core.camera import Camera
    from zenith_tpu.core.mathtypes import Degree, Radians

    asset.initialize()
    from zenith_tpu.sandbox.mesh import default_content_root
    from zenith_tpu.sandbox.scene import build_scene

    root = default_content_root()
    if not os.path.isdir(os.path.join(root, "content", "mesh", "cerberus")):
        return None

    from zenith_tpu.renderer import PresentEncode

    core = RhiCore()
    device = core.create_render_device()
    scene = build_scene(device, 100, np.random.default_rng(42))
    renderer = DeferredRenderer(scene)
    post = PostProcess()
    present = PresentEncode(Format.BGRA8_SRGB)
    pipeline_cache = PipelineCache()
    options = CompileOptions()
    w, h = 1920, 1080

    camera = Camera(fov_y=Degree(35.0), aspect_ratio=w / h)

    import jax

    def frame(orbit: float):
        x = math.sin(orbit) * 170.0
        y = -math.cos(orbit) * 170.0
        camera.set_position(np.array([x, y, 25.0], np.float32))
        camera.set_yaw_pitch(Radians(orbit), Radians(-math.atan2(20.0, 170.0)))
        builder = RenderGraphBuilder()
        hdr = builder.create(TextureDesc.color("scene.hdr", w, h, Format.RGBA32F))
        out = builder.create(TextureDesc.color("scene.out", w, h, Format.RGBA32F))
        enc = builder.create(TextureDesc.color("scene.enc", w, h, Format.BGRA8_SRGB))
        builder.export(enc)
        renderer.render_to(builder, hdr, camera, w, h)
        post.render_to(builder, hdr, out)
        # Present encode folded into the frame program: ONE dispatch/frame.
        present.render_to(builder, out, enc)
        compiled = builder.build().compile(device, pipeline_cache, options)
        compiled.execute(device)
        return compiled.value(enc)

    # Compile + warm up (excluded).
    img = frame(0.0)
    jax.block_until_ready(img)

    # min over reps: host steal on this shared VM is strictly ADDITIVE
    # noise (it can only make a rep slower, never faster), so the fastest
    # rep is the least-biased estimator of the true frame cost. PERF.md
    # documents the observed band across runs.
    n = 120
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        for i in range(n):
            img = frame(0.3 + rep + i * 0.004)
        jax.block_until_ready(img)
        times.append((time.perf_counter() - t0) / n)
    return "sandbox_scene_fps_1080p", 1.0 / min(times)


def bench_triangle() -> "tuple[str, float]":
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _triangle_pipeline
    from zenith_tpu.ops import TileGrid, clear_color, clear_depth, draw_indexed
    from zenith_tpu.rhi import Format, encode_present

    w, h = 1920, 1080
    grid = TileGrid(width=w, height=h)
    pipeline = _triangle_pipeline()

    @jax.jit
    def frame(vb, t):
        colors = [clear_color(h, w, (0.1, 0.1, 0.1, 1.0))]
        depth = clear_depth(h, w, 0.0)
        ib = jnp.asarray([[0, 1, 2]], jnp.int32)
        colors, depth, _ = draw_indexed(
            colors, depth, pipeline, vb, ib, {"Time": t}, grid
        )
        return encode_present(colors[0], Format.BGRA8_SRGB)

    vb = jnp.asarray(
        [
            [0.0, 0.5, 0.5, 1.0, 0.0, 0.0],
            [-0.5, -0.5, 0.5, 0.0, 1.0, 0.0],
            [0.5, -0.5, 0.5, 0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    out = frame(vb, jnp.float32(0.0))
    jax.block_until_ready(out)
    n = 300
    times = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = frame(vb, jnp.float32(i * 0.016))
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n)
    return "triangle_demo_fps_1080p", 1.0 / min(times)


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    result = None
    try:
        result = bench_scene()
    except Exception as e:  # content missing / compile issue → fall back
        import sys

        print(f"scene bench unavailable ({type(e).__name__}: {e})", file=sys.stderr)
    if result is None:
        result = bench_triangle()

    metric, fps = result
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 60.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
