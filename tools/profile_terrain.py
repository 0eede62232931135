"""Terrain flyover Mtri/s (VERDICT r3 #6: the single-huge-mesh complement
to tools/profile_mtri.py's instanced 1M-triangle proof).

Drives TerrainApp through the REAL engine loop (shadow pass + deferred
G-buffer + tiled lights + atmosphere sky + bloom/tonemap at 1080p) with
the heightmap grid swept so one contiguous draw submits 0.5M..2.9M
triangles. One SUBPROCESS per grid (dispatch-poison hygiene, PERF.md);
ZENITH_READBACK_INTERVAL=0 keeps the timed region copy-free, and the
bin-overflow counter is fetched once AFTER timing (zero dropped triangles
is part of the claim).

Usage: python tools/profile_terrain.py              # all grids
       python tools/profile_terrain.py --one 768
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRIDS = [512, 768, 1200, 2048]  # 0.52M / 1.18M / 2.88M / 8.38M triangles


def measure(grid: int, frames: int = 120, reps: int = 4) -> dict:
    os.environ["ZENITH_READBACK_INTERVAL"] = "0"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zenith_tpu import asset
    from zenith_tpu.core.cli import EngineArgs
    from zenith_tpu.main_loop import EngineLoop
    from zenith_tpu.sandbox.terrain import TerrainApp
    from zenith_tpu.window import Window

    asset.initialize()
    app = TerrainApp(EngineArgs(app_args=["--grid", str(grid)]))
    loop = EngineLoop(app, window=Window())

    def fence() -> None:
        compiled = loop.engine.last_retired._compiled
        jax.block_until_ready(list((compiled._outputs or {}).values()))

    # final=False: the end-of-run tail does a device→host overflow fetch
    # that would permanently poison async dispatch for the timed frames.
    loop.run(max_frames=20, final=False)  # compile + queue fill (excluded)
    fence()

    times = []
    for _rep in range(reps):
        target = loop.frames_rendered + frames
        t0 = time.perf_counter()
        loop.run(max_frames=target, final=False)
        fence()
        times.append((time.perf_counter() - t0) / frames)
    ms = min(times) * 1e3
    fps = 1e3 / ms
    # Post-timing overflow fetch (sync copy — safe only because nothing is
    # timed after this point in the subprocess).
    try:
        overflow = int(loop.engine.last_retired.bin_overflow)
    except Exception:
        overflow = -1
    return {
        "grid": grid,
        "triangles": app.tri_count,
        "ms_per_frame": round(ms, 3),
        "fps": round(fps, 1),
        "mtri_per_s_submitted": round(app.tri_count * fps / 1e6, 1),
        "overflow": overflow,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=int, default=None)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(measure(args.one, frames=args.frames,
                                 reps=args.reps)))
        return
    for grid in GRIDS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(grid),
             "--frames", str(args.frames), "--reps", str(args.reps)],
            capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            print(grid, "->", json.loads(line), flush=True)
        except json.JSONDecodeError:
            print(grid, "-> ERROR", out.stderr.strip()[-400:], flush=True)


if __name__ == "__main__":
    main()
