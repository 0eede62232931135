"""cProfile attribution of the host-only frame path (rebuild + structure
key + compile cache hit, NO execute) for the full sandbox scene.

Host wall-clock on this box fluctuates ±25% (VM steal); per PERF.md only
cProfile call counts + same-process A/B comparisons are decision-grade.

Usage: python tools/profile_hostpath.py [--frames 300] [--sort cumtime]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import math
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--sort", type=str, default="cumtime")
    ap.add_argument("--limit", type=int, default=40)
    args = ap.parse_args()
    w, h = 1920, 1080

    from zenith_tpu import asset
    from zenith_tpu.core.camera import Camera
    from zenith_tpu.core.mathtypes import Degree, Radians
    from zenith_tpu.renderer import DeferredRenderer, PostProcess
    from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
    from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
    from zenith_tpu.sandbox.scene import build_scene

    asset.initialize()
    core = RhiCore()
    device = core.create_render_device()
    scene = build_scene(device, 100, np.random.default_rng(42))
    renderer = DeferredRenderer(scene)
    post = PostProcess()
    pipeline_cache = PipelineCache()
    options = CompileOptions()
    camera = Camera(fov_y=Degree(35.0), aspect_ratio=w / h)

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
        renderer.render_to(builder, hdr, camera, w, h)
        post.render_to(builder, hdr, out)
        return builder.build().compile(device, pipeline_cache, options)

    host_frame(0.0)  # warm: trace + compile once
    host_frame(0.002)

    t0 = time.perf_counter()
    for i in range(args.frames):
        host_frame(0.3 + i * 0.004)
    plain_ms = (time.perf_counter() - t0) / args.frames * 1e3

    pr = cProfile.Profile()
    pr.enable()
    for i in range(args.frames):
        host_frame(0.3 + i * 0.004)
    pr.disable()

    buf = io.StringIO()
    st = pstats.Stats(pr, stream=buf)
    st.sort_stats(args.sort).print_stats(args.limit)
    print(buf.getvalue())
    print(f"plain (unprofiled) host frame: {plain_ms:.3f} ms over "
          f"{args.frames} frames", file=sys.stderr)


if __name__ == "__main__":
    main()
