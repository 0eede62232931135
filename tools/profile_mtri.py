"""Geometry-scaling proof: the FULL engine path (shadow + deferred G-buffer
+ tiled lighting + bloom + present encode, 1080p) at 1x/3x/10x/30x cerberus
instances — 33.5k → ~1M submitted triangles (VERDICT r2 #10: run the real
10x-geometry scene through the full engine, not just the reduced chain).

Methodology: sustained async throughput (N frames dispatched, one final
fence), excluding compile; idle host required. EACH COUNT RUNS IN ITS OWN
SUBPROCESS: fetching the bin-overflow scalar (reported so dropped triangles
cannot masquerade as speed) permanently poisons async dispatch on this
backend — one D2H copy degrades every later dispatch in the process to a
per-call sync handshake (~0.03 → 1.6+ ms) — so the overflow read happens
strictly AFTER the timed frames, and never in a process that will time
again.

Usage: python tools/profile_mtri.py [--frames 60] [--counts 1,3,10,30]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_single(gun_instances: int, frames: int, w: int, h: int) -> None:
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zenith_tpu import asset
    from zenith_tpu.core.camera import Camera
    from zenith_tpu.core.mathtypes import Degree, Radians
    from zenith_tpu.renderer import DeferredRenderer, PostProcess, PresentEncode
    from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
    from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
    from zenith_tpu.sandbox.scene import build_scene

    asset.initialize()
    device = RhiCore().create_render_device()
    scene = build_scene(device, 100, np.random.default_rng(42),
                        gun_instances=gun_instances)
    renderer = DeferredRenderer(scene)
    post = PostProcess()
    present = PresentEncode(Format.BGRA8_SRGB)
    pipeline_cache = PipelineCache()
    options = CompileOptions()
    camera = Camera(fov_y=Degree(35.0), aspect_ratio=w / h)
    # Pull the camera back with instance count so the ring stays in frame.
    dist = 170.0 * (1.0 + 0.35 * math.sqrt(max(gun_instances, 1)))

    def frame(orbit: float):
        x = math.sin(orbit) * dist
        y = -math.cos(orbit) * dist
        camera.set_position(np.array([x, y, 25.0 + dist * 0.1], np.float32))
        camera.set_yaw_pitch(
            Radians(orbit), Radians(-math.atan2(20.0 + dist * 0.1, dist))
        )
        builder = RenderGraphBuilder()
        hdr = builder.create(TextureDesc.color("scene.hdr", w, h, Format.RGBA32F))
        ldr = builder.create(TextureDesc.color("scene.ldr", w, h, Format.RGBA32F))
        out = builder.create(TextureDesc("scene.out", w, h, Format.BGRA8_SRGB))
        builder.export(out)
        renderer.render_to(builder, hdr, camera, w, h)
        post.render_to(builder, hdr, ldr)
        present.render_to(builder, ldr, out)
        compiled = builder.build().compile(device, pipeline_cache, options)
        compiled.execute(device)
        return compiled

    c = frame(0.0)  # compile
    jax.block_until_ready(c._outputs)  # fence only — no host copy

    t0 = time.perf_counter()
    for i in range(frames):
        c = frame(0.3 + i * 0.004)
    jax.block_until_ready(c._outputs)
    ms = (time.perf_counter() - t0) / frames * 1e3

    # Overflow fetch LAST (poisons dispatch; this process times no more).
    overflow = int(np.asarray(c._stats.bin_overflow))
    n_tris = 33552 * max(gun_instances, 1) + 2 + 12
    print(json.dumps({
        "tris": n_tris, "ms": round(ms, 3),
        "fps": round(1000.0 / ms, 1),
        "mtri_per_s": round(n_tris * 1000.0 / ms / 1e6, 1),
        "bin_overflow": overflow,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--counts", type=str, default="1,3,10,30")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--single", type=int, default=None)
    args = ap.parse_args()

    if args.single is not None:
        run_single(args.single, args.frames, args.width, args.height)
        return

    results = {}
    for n in [int(x) for x in args.counts.split(",")]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--single", str(0 if n == 1 else n),
             "--frames", str(args.frames),
             "--width", str(args.width), "--height", str(args.height)],
            capture_output=True, text=True, timeout=3000,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            results[f"x{n}"] = json.loads(line)
        except json.JSONDecodeError:
            results[f"x{n}"] = {"error": out.stderr[-500:]}
        print(f"x{n}: {results[f'x{n}']}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
