"""Feature-cost matrix: the full 1080p sandbox scene with each late-round
feature toggled (IBL, SSAO, FXAA), one SUBPROCESS per configuration.

Subprocess-per-config is load-bearing on this backend: any device readback
permanently degrades async dispatch in the process (PERF.md traps), and a
fresh process also guarantees each variant compiles + times cold-cache-
equivalent. Methodology matches bench.py: N async frames per rep, one
final fence, min over reps (host steal is additive noise).

Usage: python tools/profile_features.py            # all configs
       python tools/profile_features.py --one base # single config (JSON)
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

CONFIGS = {
    "base": {},
    "ibl": {"ibl": True},
    "ssao": {"ssao": True},
    "fxaa": {"fxaa": True},
    "all": {"ibl": True, "ssao": True, "fxaa": True},
}


def measure(cfg: dict, frames: int = 120, reps: int = 4) -> dict:
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zenith_tpu import asset
    from zenith_tpu.core.camera import Camera
    from zenith_tpu.core.mathtypes import Degree, Radians
    from zenith_tpu.renderer import (
        DeferredRenderer,
        PostProcess,
        PresentEncode,
        SSAOOptions,
    )
    from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
    from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
    from zenith_tpu.sandbox.scene import build_scene

    asset.initialize()
    core = RhiCore()
    device = core.create_render_device()
    scene = build_scene(device, 100, np.random.default_rng(42),
                        ibl=cfg.get("ibl", False))
    renderer = DeferredRenderer(
        scene, ssao=SSAOOptions(radius=6.0) if cfg.get("ssao") else False
    )
    post = PostProcess(fxaa=cfg.get("fxaa", False))
    present = PresentEncode(Format.BGRA8_SRGB)
    pipeline_cache = PipelineCache()
    options = CompileOptions()
    w, h = 1920, 1080
    camera = Camera(fov_y=Degree(35.0), aspect_ratio=w / h)

    def frame(orbit: float):
        camera.set_position(np.array(
            [math.sin(orbit) * 170.0, -math.cos(orbit) * 170.0, 25.0],
            np.float32,
        ))
        camera.set_yaw_pitch(Radians(orbit), Radians(-math.atan2(20.0, 170.0)))
        builder = RenderGraphBuilder()
        hdr = builder.create(TextureDesc.color("scene.hdr", w, h, Format.RGBA32F))
        out = builder.create(TextureDesc.color("scene.out", w, h, Format.RGBA32F))
        enc = builder.create(TextureDesc.color("scene.enc", w, h, Format.BGRA8_SRGB))
        builder.export(enc)
        renderer.render_to(builder, hdr, camera, w, h)
        post.render_to(builder, hdr, out)
        present.render_to(builder, out, enc)
        compiled = builder.build().compile(device, pipeline_cache, options)
        compiled.execute(device)
        return compiled.value(enc)

    img = frame(0.0)
    jax.block_until_ready(img)
    times = []
    for rep in range(reps):
        t0 = time.perf_counter()
        for i in range(frames):
            img = frame(0.3 + rep + i * 0.004)
        jax.block_until_ready(img)
        times.append((time.perf_counter() - t0) / frames)
    ms = min(times) * 1e3
    return {"config": cfg, "ms_per_frame": round(ms, 3),
            "fps": round(1e3 / ms, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=str, default=None)
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(measure(CONFIGS[args.one], frames=args.frames)))
        return
    results = {}
    for name in CONFIGS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--frames", str(args.frames)],
            capture_output=True, text=True, timeout=900,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": out.stderr.strip()[-400:]}
        print(name, "->", results[name], flush=True)
    base = results.get("base", {}).get("ms_per_frame")
    if base:
        for name, r in results.items():
            if "ms_per_frame" in r:
                print(f"{name:>6}: {r['ms_per_frame']:7.3f} ms "
                      f"({r['fps']:7.1f} FPS)  +{r['ms_per_frame'] - base:.3f} ms")


if __name__ == "__main__":
    main()
