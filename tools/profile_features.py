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
    "taa": {"taa": True},
    "ae": {"auto_exposure": True},
    "csm3": {"cascades": 3},
    "skinned": {"skinned": True},
    "morph": {"morph": True},
    "spots": {"spots": 4},
    "grade": {"grade": True},
    "ssr": {"ssr": True},
    "fog": {"fog": True},
    "dof": {"dof": True},
    "mblur": {"motion_blur": True},
    "soft": {"soft_shadows": True},
    "contact": {"contact_shadows": True},
    "flare": {"flare": True},
    "sky": {"sky": True},
    "film": {"film": True},
    "all": {"ibl": True, "ssao": True, "fxaa": True},
    "all_taa": {"ibl": True, "ssao": True, "taa": True,
                "auto_exposure": True, "cascades": 3},
    # Round-4 additions: per-draw velocity (the animated-content TAA/blur
    # path), picking, HUD, decals, translucency (kernel blend path).
    "velocity": {"taa": True, "motion_blur": True, "velocity": True},
    "pick": {"pick": True},
    "hud": {"hud": True},
    "decals": {"decals": 4},
    "glass": {"glass": True},
    # Round-5: depth-peeled fragment-rate textured glass (exact per-pixel
    # sampling) vs the vertex-rate kernel path on the same textured scene.
    "glass_tex_peel": {"glass": True, "glass_textured": True},
    "glass_tex_kernel": {"glass": True, "glass_textured": True,
                         "glass_mode": "kernel"},
}


def measure(cfg: dict, frames: int = 120, reps: int = 4,
            size: str = "1920x1080") -> dict:
    import numpy as np

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dataclasses import replace as dc_replace

    from zenith_tpu import asset
    from zenith_tpu.core.camera import Camera
    from zenith_tpu.core.mathtypes import Degree, Radians
    from zenith_tpu.renderer import (
        DeferredRenderer,
        PostProcess,
        PresentEncode,
        SpotLight,
        SSAOOptions,
        TemporalAA,
    )
    from zenith_tpu.rendergraph import CompileOptions, RenderGraphBuilder
    from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
    from zenith_tpu.sandbox.scene import build_scene

    asset.initialize()
    core = RhiCore()
    device = core.create_render_device()
    scene = build_scene(device, 100, np.random.default_rng(42),
                        ibl=cfg.get("ibl", False),
                        skinned=cfg.get("skinned", False),
                        morph=cfg.get("morph", False),
                        glass=cfg.get("glass", False),
                        glass_textured=cfg.get("glass_textured", False))
    if cfg.get("decals"):
        from zenith_tpu.renderer.decal import Decal

        nd = cfg["decals"]
        for k in range(nd):
            a = 2.0 * math.pi * k / nd
            scene.decals.append(Decal(
                name=f"decal{k}",
                position=(55 * math.cos(a), 55 * math.sin(a), 0.1),
                size=(26.0, 26.0, 4.0),
                color=(0.9, 0.25 + 0.1 * k, 0.2, 0.85),
            ))
    if cfg.get("cascades", 1) > 1:
        scene.sun = dc_replace(scene.sun, cascades=cfg["cascades"])
    if cfg.get("soft_shadows"):
        scene.sun = dc_replace(scene.sun, soft_shadows=True, vsm_blur=4)
    if cfg.get("contact_shadows"):
        scene.sun = dc_replace(scene.sun, contact_shadows=True)
    for i in range(cfg.get("spots", 0)):
        a = 2 * math.pi * i / cfg["spots"] + 0.8
        scene.spot_lights.append(SpotLight(
            position=(60 * math.cos(a), 60 * math.sin(a), 45.0),
            direction=(0.25 * math.cos(a + 2), 0.25 * math.sin(a + 2), -1.0),
            color=(3.0, 0.6, 0.5), intensity=1800.0, radius=130.0,
        ))
    renderer = DeferredRenderer(
        scene, ssao=SSAOOptions(radius=6.0) if cfg.get("ssao") else False,
        velocity=cfg.get("velocity", None),  # None = the auto default
        id_buffer=cfg.get("pick", False),
        glass_mode=cfg.get("glass_mode", "auto"),
    )
    hud = None
    if cfg.get("hud"):
        from zenith_tpu.renderer.hud import HudOverlay

        hud = HudOverlay(max_chars=24, scale=2, overflow_indicator=True)
        hud.set_text("FPS 0000.0")
    from zenith_tpu.renderer import ColorGrade, DepthOfField

    from zenith_tpu.renderer import FilmEffects

    post = PostProcess(
        fxaa=cfg.get("fxaa", False),
        auto_exposure=cfg.get("auto_exposure", False),
        grade=(ColorGrade(exposure_ev=0.15, contrast=1.08, saturation=1.12,
                          temperature=0.35, vignette=0.45)
               if cfg.get("grade") else None),
        film=(FilmEffects(chromatic_aberration=2.5, sharpen=0.4, grain=0.035)
              if cfg.get("film") else None),
    )
    taa = TemporalAA() if cfg.get("taa") else None
    from zenith_tpu.renderer import ScreenSpaceReflections

    ssr = ScreenSpaceReflections() if cfg.get("ssr") else None
    from zenith_tpu.renderer import VolumetricFog

    fog = VolumetricFog() if cfg.get("fog") else None
    dof = (DepthOfField(focus_distance=170.0, focal_range=30.0,
                        strength=1.4) if cfg.get("dof") else None)
    from zenith_tpu.renderer import MotionBlur

    mblur = MotionBlur() if cfg.get("motion_blur") else None
    flare = None
    if cfg.get("flare"):
        from zenith_tpu.renderer import LensFlare

        # Sun low on the horizon so the flare is actually in frame.
        scene.sun = dc_replace(scene.sun, direction=(0.8, -0.55, 0.1))
        flare = LensFlare()
    if cfg.get("sky"):
        from zenith_tpu.renderer import Atmosphere

        scene.sun = dc_replace(scene.sun, direction=(0.8, -0.55, 0.1))
        scene.skybox = None
        scene.atmosphere = Atmosphere()
    present = PresentEncode(Format.BGRA8_SRGB)
    pipeline_cache = PipelineCache()
    options = CompileOptions()
    w, h = (int(x) for x in size.split("x"))
    camera = Camera(fov_y=Degree(35.0), aspect_ratio=w / h)

    # Animation players for the skinned/morph configs (host-side sampling
    # is part of the per-frame cost being measured).
    players = []
    morphers = []
    if cfg.get("skinned") or cfg.get("morph"):
        from zenith_tpu.renderer.animation import (
            AnimationPlayer,
            sample_morph_weights,
        )

        for obj in scene.objects:
            if obj.skin is not None and obj.clips:
                players.append((AnimationPlayer(obj.skin, obj.clips[0]), obj))
            if obj.morph_deltas is not None and obj.clips:
                morphers.append((obj.clips[0], obj))

    def frame(orbit: float):
        camera.set_position(np.array(
            [math.sin(orbit) * 170.0, -math.cos(orbit) * 170.0, 25.0],
            np.float32,
        ))
        camera.set_yaw_pitch(Radians(orbit), Radians(-math.atan2(20.0, 170.0)))
        if taa is not None:
            taa.jitter_camera(camera, w, h)
        for player, obj in players:
            obj.joint_matrices = player.joint_matrices(orbit)
        for clip, obj in morphers:
            from zenith_tpu.renderer.animation import sample_morph_weights

            obj.morph_weights = sample_morph_weights(
                clip, orbit, obj.morph_deltas.shape[0]
            )
        builder = RenderGraphBuilder()
        hdr = builder.create(TextureDesc.color("scene.hdr", w, h, Format.RGBA32F))
        out = builder.create(TextureDesc.color("scene.out", w, h, Format.RGBA32F))
        enc = builder.create(TextureDesc.color("scene.enc", w, h, Format.BGRA8_SRGB))
        builder.export(enc)
        renderer.render_to(builder, hdr, camera, w, h)
        post_in = hdr
        if ssr is not None:
            ssr_out = builder.create(
                TextureDesc.color("scene.ssr", w, h, Format.RGBA32F)
            )
            ssr.render_to(builder, post_in, ssr_out, camera,
                          renderer.gbuffer_handles)
            post_in = ssr_out
        if fog is not None:
            fog_out = builder.create(
                TextureDesc.color("scene.fog", w, h, Format.RGBA32F)
            )
            fog.render_to(builder, post_in, fog_out, camera,
                          renderer.gbuffer_handles, sun=scene.sun)
            post_in = fog_out
        if flare is not None:
            for k, v in flare.sun_dynamics(camera, scene.sun.direction).items():
                builder.set_dynamic(k, v)
            flare.render_to(builder, post_in, sun_color=(1.0, 0.92, 0.8))
        if taa is not None:
            taa_out = builder.create(
                TextureDesc.color("scene.taa", w, h, Format.RGBA32F)
            )
            taa.render_to(builder, post_in, taa_out, camera, w, h,
                          renderer.gbuffer_handles)
            post_in = taa_handle = taa_out
        if mblur is not None:
            mb_out = builder.create(
                TextureDesc.color("scene.mblur", w, h, Format.RGBA32F)
            )
            mblur.render_to(builder, post_in, mb_out, camera,
                            renderer.gbuffer_handles)
            post_in = mb_out
        if dof is not None:
            dof_out = builder.create(
                TextureDesc.color("scene.dof", w, h, Format.RGBA32F)
            )
            dof.render_to(builder, post_in, dof_out,
                          renderer.gbuffer_handles)
            post_in = dof_out
        post.render_to(builder, post_in, out)
        if hud is not None:
            hud.render_to(builder, out)
        present.render_to(builder, out, enc)
        compiled = builder.build().compile(device, pipeline_cache, options)
        compiled.execute(device)
        # Cross-frame feedback (device-resident, async — part of the path).
        if taa is not None:
            # History is TAA's own output — NOT post_in, which later
            # stages (motion blur / DoF) may have re-pointed.
            taa.feedback(compiled.value(taa_handle))
        if post.auto_exposure and post.exposure_out is not None:
            post.feedback(compiled.value(post.exposure_out))
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--size", type=str, default="1920x1080")
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(measure(CONFIGS[args.one], frames=args.frames,
                                 reps=args.reps, size=args.size)))
        return
    results = {}
    for name in CONFIGS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--frames", str(args.frames), "--reps", str(args.reps),
             "--size", args.size],
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
