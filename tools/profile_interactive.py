"""Interactive viewer end-to-end FPS (VERDICT r4 #6 done-criteria).

Runs the fly sandbox's REAL serve path (EngineLoop + ViewerServer +
AdaptiveStream) on the chip and measures what a browser would actually
receive: a client thread consumes the MJPEG /stream, counts delivered
frames over a timed window, and reads /stats for the rung/resolution the
adaptive controller settled on. This is the number that belongs next to
the headless rows in PERF.md — the full input→TPU→tunnel→JPEG→HTTP loop,
not a transport microbenchmark (tools/profile_viewer.py is that).

Configs:
  adaptive   720p view, AdaptiveStream targeting 30 FPS (the --serve
             default) — reports the rung it settles on and the FPS there.
  fixed720   720p view, no adaptation (the r4 baseline mode at 720p).
  fixed480   480x270 fixed — comparable to the r4 measured 39 FPS row.

One SUBPROCESS per config. Dispatch-poison does not apply (interactive
sessions read back every frame by design), but each config still gets a
fresh process so the swapchain/adaptive state is cold.

Usage: python tools/profile_interactive.py [--one adaptive] [--seconds 12]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "adaptive": {"width": 1280, "height": 720, "adaptive": True},
    "fixed720": {"width": 1280, "height": 720, "adaptive": False},
    "fixed480": {"width": 480, "height": 270, "adaptive": False},
}


def measure(cfg: dict, seconds: float = 12.0, target_fps: float = 30.0) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zenith_tpu import asset
    from zenith_tpu.core import log
    from zenith_tpu.core.cli import EngineArgs
    from zenith_tpu.main_loop import EngineLoop
    from zenith_tpu.sandbox.fly import FlyApp
    from zenith_tpu.viewer import serve_loop
    from zenith_tpu.window import Window

    log.initialize()
    asset.initialize()
    window = Window(width=cfg["width"], height=cfg["height"], title="fly")
    app = FlyApp(EngineArgs())
    loop = EngineLoop(app, window=window)
    result: dict = {}

    def client() -> None:
        import re

        base = None
        # Wait for the server + first presented frame.
        for _ in range(1200):
            time.sleep(0.5)
            v = state.get("viewer")
            if v is None:
                continue
            base = v.url
            try:
                with urllib.request.urlopen(base + "stats", timeout=5) as r:
                    s = json.loads(r.read())
                if s.get("presented_frames", 0) >= 3:
                    break
            except Exception:
                continue
        else:
            result["error"] = "no frames presented"
            window.request_close()
            return
        # Hold LMB + W through the wire protocol: a *moving* camera, so
        # every frame differs (adaptive must hold FPS under real motion).
        batch = [
            {"type": "button", "button": 0, "state": "down"},
            {"type": "key", "code": "KeyW", "state": "down"},
        ]
        req = urllib.request.Request(
            base + "events", data=json.dumps(batch).encode(), method="POST"
        )
        urllib.request.urlopen(req, timeout=5)
        # Let the adaptive controller settle (it holds 2.5 s after any
        # change and evaluates at 1 Hz), then time the delivered stream.
        settle = 8.0 if cfg["adaptive"] else 2.0
        time.sleep(settle)
        stream = urllib.request.urlopen(base + "stream", timeout=30)
        boundary = b"--zenithframe"
        count = 0
        first_t = last_t = None
        end_by = time.perf_counter() + seconds
        buf = b""
        while time.perf_counter() < end_by:
            chunk = stream.read(65536)
            if not chunk:
                break
            now = time.perf_counter()
            buf += chunk
            while True:
                i = buf.find(boundary)
                if i < 0:
                    # keep the tail in case a boundary straddles chunks
                    buf = buf[-len(boundary):]
                    break
                if first_t is None:
                    first_t = now
                else:
                    count += 1
                    last_t = now
                buf = buf[i + len(boundary):]
        dt = (last_t - first_t) if (first_t and last_t) else 0.0
        with urllib.request.urlopen(base + "stats", timeout=5) as r:
            s = json.loads(r.read())
        result.update(
            delivered_fps=round(count / dt, 1) if dt > 0 else 0.0,
            frames=count,
            stream_w=s["width"],
            stream_h=s["height"],
            quality=s["quality"],
            rung=s.get("rung"),
            controller_fps=s.get("fps"),
        )
        req = urllib.request.Request(
            base + "events",
            data=json.dumps([{"type": "close"}]).encode(),
            method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=5)
        except Exception:
            window.request_close()

    state: dict = {}
    from zenith_tpu import viewer as vmod

    orig_start = vmod.ViewerServer.start

    def start_and_record(self):
        r = orig_start(self)
        state["viewer"] = self
        return r

    vmod.ViewerServer.start = start_and_record
    threading.Thread(target=client, daemon=True).start()
    serve_loop(
        loop, port=0, adaptive=cfg["adaptive"], target_fps=target_fps
    )
    result.update(view=f"{cfg['width']}x{cfg['height']}",
                  adaptive=cfg["adaptive"])
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=str, default=None)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--target-fps", type=float, default=30.0)
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(measure(CONFIGS[args.one], seconds=args.seconds,
                                 target_fps=args.target_fps)))
        return
    for name in CONFIGS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--seconds", str(args.seconds),
             "--target-fps", str(args.target_fps)],
            capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            print(name, "->", json.loads(line), flush=True)
        except json.JSONDecodeError:
            print(name, "-> ERROR", out.stderr.strip()[-400:], flush=True)


if __name__ == "__main__":
    main()
