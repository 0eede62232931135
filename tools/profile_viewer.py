"""Interactive-viewer transport profile: what the axon tunnel actually
delivers for device→host frame readback, per resolution — the numbers the
adaptive stream ladder (viewer.AdaptiveStream) is built from.

Measures, per frame size:
  1. PIPELINED readback throughput: N async device→host copies of distinct
     uint8 RGBA frames with the ring discipline the swapchain uses
     (copy_to_host_async + np.asarray of the frame presented
     NUM_BACK_BUFFERS ago) — this is the viewer's steady-state FPS ceiling.
  2. One-shot latency: a single blocking readback (the RTT floor).
  3. Host JPEG encode cost at that size (PIL, quality 85) — the other
     serial consumer of the single host core.

Run on the real chip, idle host, one process (readback is the POINT here,
so dispatch-poison does not apply — this tool never times device compute).

Usage: python tools/profile_viewer.py [--sizes 480x270,1280x720,...]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time

import numpy as np

DEFAULT_SIZES = "480x270,640x360,960x540,1280x720,1920x1080"


def measure_size(w: int, h: int, frames: int = 60) -> dict:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]

    # Distinct device frames (varied content, like real rendering; reusing
    # one buffer can measure impossibly fast through the tunnel).
    @jax.jit
    def make(i):
        r = (jnp.arange(h, dtype=jnp.uint32)[:, None]
             + jnp.arange(w, dtype=jnp.uint32)[None, :] * 3 + i)
        v = (r % 251).astype(jnp.uint8)
        return jnp.stack([v, v ^ 85, v ^ 170, jnp.full_like(v, 255)], -1)

    ring = 3  # NUM_BACK_BUFFERS
    pool = [jax.device_put(np.asarray(make(i)), dev) for i in range(8)]
    jax.block_until_ready(pool)

    # 2. one-shot latency (min of 5: the RTT + size/bandwidth floor)
    lat = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(pool[i % len(pool)])
        lat.append(time.perf_counter() - t0)
    latency_ms = min(lat) * 1e3

    # 1. pipelined throughput with the swapchain's ring discipline
    pending = []
    t0 = time.perf_counter()
    for i in range(frames):
        f = pool[i % len(pool)]
        try:
            f.copy_to_host_async()
        except Exception:
            pass
        pending.append(f)
        if len(pending) >= ring:
            np.asarray(pending.pop(0))
    while pending:
        np.asarray(pending.pop(0))
    dt = time.perf_counter() - t0
    ms_frame = dt / frames * 1e3
    nbytes = w * h * 4

    # 3. host JPEG encode (PIL), BGRA→RGB slice included like the viewer's
    out = {}
    try:
        from PIL import Image

        host = np.asarray(pool[0])
        enc = []
        for _ in range(5):
            t0 = time.perf_counter()
            buf = io.BytesIO()
            Image.fromarray(
                np.ascontiguousarray(host[..., [2, 1, 0]])
            ).save(buf, "JPEG", quality=85)
            enc.append(time.perf_counter() - t0)
        out["jpeg_ms"] = round(min(enc) * 1e3, 2)
        out["jpeg_kb"] = round(len(buf.getvalue()) / 1024, 1)
    except ImportError:
        pass

    out.update(
        size=f"{w}x{h}",
        frame_kb=round(nbytes / 1024, 1),
        readback_ms=round(ms_frame, 2),
        readback_fps=round(1e3 / ms_frame, 1),
        mb_per_s=round(nbytes / (ms_frame / 1e3) / 1e6, 1),
        latency_ms=round(latency_ms, 2),
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=DEFAULT_SIZES)
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()
    for spec in args.sizes.split(","):
        w, h = (int(v) for v in spec.split("x"))
        print(json.dumps(measure_size(w, h, args.frames)), flush=True)


if __name__ == "__main__":
    main()
