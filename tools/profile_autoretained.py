"""Auto-retained vs rebuild engine-path FPS (VERDICT r3 #4 done-criteria).

Drives the REAL engine loop (EngineLoop.run → Engine.render) for the
triangle and full-scene sandbox apps, with the auto-retained path (the
default when the app implements update_dynamics) A/B'd against the forced
rebuild path (update_dynamics stripped off the app instance). One
SUBPROCESS per configuration (dispatch-poison hygiene + cold-cache-equal
compiles, PERF.md traps), ZENITH_READBACK_INTERVAL=0 so the swapchain only
fences — zero device→host copies inside the timed region.

Usage: python tools/profile_autoretained.py            # all configs
       python tools/profile_autoretained.py --one scene_auto
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "tri_auto": {"app": "triangle", "retained": True},
    "tri_rebuild": {"app": "triangle", "retained": False},
    "scene_auto": {"app": "scene", "retained": True},
    "scene_rebuild": {"app": "scene", "retained": False},
}


def measure(cfg: dict, frames: int = 300, reps: int = 4) -> dict:
    # Benchmark mode: fence-only swapchain (readback_interval=0) — a single
    # device→host copy would permanently degrade async dispatch (PERF.md).
    os.environ["ZENITH_READBACK_INTERVAL"] = "0"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zenith_tpu import asset
    from zenith_tpu.core.cli import EngineArgs
    from zenith_tpu.main_loop import EngineLoop
    from zenith_tpu.window import Window

    asset.initialize()
    args = EngineArgs()
    if cfg["app"] == "triangle":
        from zenith_tpu.sandbox.triangle import TriangleApp

        app = TriangleApp(args)
    else:
        from zenith_tpu.sandbox.scene import SceneApp

        app = SceneApp(args)
    if not cfg["retained"]:
        # Engine checks getattr(app, "update_dynamics", None): a None
        # instance attribute forces the per-frame rebuild path.
        app.update_dynamics = None

    window = Window()
    loop = EngineLoop(app, window=window)

    def fence() -> None:
        compiled = loop.engine.last_retired._compiled
        jax.block_until_ready(list((compiled._outputs or {}).values()))

    # Warm-up: compile + fill the async queue (excluded from timing).
    # final=False: the end-of-run tail does a device→host overflow fetch
    # that would permanently poison async dispatch for the timed frames.
    loop.run(max_frames=40, final=False)
    fence()

    times = []
    for _rep in range(reps):
        target = loop.frames_rendered + frames
        t0 = time.perf_counter()
        loop.run(max_frames=target, final=False)
        fence()
        times.append((time.perf_counter() - t0) / frames)
    ms = min(times) * 1e3
    return {
        "config": cfg,
        "ms_per_frame": round(ms, 3),
        "fps": round(1e3 / ms, 1),
        "retained_hits": cfg["retained"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=str, default=None)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(measure(CONFIGS[args.one], frames=args.frames,
                                 reps=args.reps)))
        return
    results = {}
    for name in CONFIGS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--frames", str(args.frames), "--reps", str(args.reps)],
            capture_output=True, text=True, timeout=900,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": out.stderr.strip()[-400:]}
        print(name, "->", results[name], flush=True)


if __name__ == "__main__":
    main()
