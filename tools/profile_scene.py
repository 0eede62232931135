"""Per-pass cost decomposition of the full sandbox scene (bench.py headline).

Measures the engine-path frame time for the full scene and for variants
with one subsystem removed each (lights, shadows, skybox, post, textures),
plus a G-buffer-only floor. Differences attribute cost per subsystem —
the only decision-grade methodology on this backend (PERF.md rules).

Usage: python tools/profile_scene.py [--frames 120]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(device, scene, use_post, w, h, frames, reps=3):
    from zenith_tpu.core.camera import Camera
    from zenith_tpu.core.mathtypes import Degree, Radians
    from zenith_tpu.renderer import DeferredRenderer, PostProcess
    from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
    from zenith_tpu.rhi import Format, PipelineCache, TextureDesc
    from zenith_tpu.rhi.formats import encode_present

    renderer = DeferredRenderer(scene)
    post = PostProcess() if use_post else None
    pipeline_cache = PipelineCache()
    options = CompileOptions()
    camera = Camera(fov_y=Degree(35.0), aspect_ratio=w / h)
    enc = jax.jit(lambda img: encode_present(img, Format.BGRA8_SRGB))

    def frame(orbit: float):
        x = math.sin(orbit) * 170.0
        y = -math.cos(orbit) * 170.0
        camera.set_position(np.array([x, y, 25.0], np.float32))
        camera.set_yaw_pitch(Radians(orbit), Radians(-math.atan2(20.0, 170.0)))
        builder = RenderGraphBuilder()
        hdr = builder.create(TextureDesc.color("scene.hdr", w, h, Format.RGBA32F))
        out = builder.create(TextureDesc.color("scene.out", w, h, Format.RGBA32F))
        builder.export(out)
        if post is not None:
            renderer.render_to(builder, hdr, camera, w, h)
            post.render_to(builder, hdr, out)
        else:
            renderer.render_to(builder, out, camera, w, h)
        compiled = builder.build().compile(device, pipeline_cache, options)
        compiled.execute(device)
        return enc(compiled.value(out))

    img = frame(0.0)
    jax.block_until_ready(img)
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        for i in range(frames):
            img = frame(0.3 + rep + i * 0.004)
        jax.block_until_ready(img)
        best = min(best, (time.perf_counter() - t0) / frames)

    # Host-only: rebuild + structure-key + compile (cache hit), no execute.
    def host_frame(orbit: float):
        camera.set_position(
            np.array([math.sin(orbit) * 170.0, -math.cos(orbit) * 170.0, 25.0],
                     np.float32)
        )
        camera.set_yaw_pitch(Radians(orbit), Radians(-math.atan2(20.0, 170.0)))
        builder = RenderGraphBuilder()
        hdr = builder.create(TextureDesc.color("scene.hdr", w, h, Format.RGBA32F))
        out = builder.create(TextureDesc.color("scene.out", w, h, Format.RGBA32F))
        builder.export(out)
        if post is not None:
            renderer.render_to(builder, hdr, camera, w, h)
            post.render_to(builder, hdr, out)
        else:
            renderer.render_to(builder, out, camera, w, h)
        return builder.build().compile(device, pipeline_cache, options)

    t0 = time.perf_counter()
    for i in range(frames):
        host_frame(0.3 + i * 0.004)
    host_ms = (time.perf_counter() - t0) / frames * 1e3
    return best * 1e3, host_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of variant names to run")
    args = ap.parse_args()
    w, h = args.width, args.height

    from zenith_tpu import asset
    from zenith_tpu.rhi import RhiCore
    from zenith_tpu.sandbox.scene import build_scene

    asset.initialize()
    core = RhiCore()
    device = core.create_render_device()

    import dataclasses

    rng = lambda: np.random.default_rng(42)  # noqa: E731
    full = build_scene(device, 100, rng())

    variants = {
        "full": (full, True),
        "no_post": (full, False),
        "no_lights": (dataclasses.replace(full, point_lights=[]), True),
        "no_shadow": (
            dataclasses.replace(
                full, sun=dataclasses.replace(full.sun, cast_shadows=False)
            ),
            True,
        ),
        "no_skybox": (dataclasses.replace(full, skybox=None), True),
        "gbuffer_floor": (
            dataclasses.replace(
                full,
                point_lights=[],
                skybox=None,
                sun=dataclasses.replace(full.sun, cast_shadows=False),
            ),
            False,
        ),
    }
    if args.only:
        names = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    results = {}
    for name, (scene, use_post) in variants.items():
        ms, host_ms = measure(device, scene, use_post, w, h, args.frames)
        results[f"{name}_ms"] = ms
        results[f"{name}_host_ms"] = host_ms
        print(f"{name}: {ms:.2f} ms ({1000.0 / ms:.0f} FPS), host {host_ms:.2f} ms",
              file=sys.stderr)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
