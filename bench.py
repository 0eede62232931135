"""Headline benchmark: frames/sec at 1080p on one chip.

Renders the flagship scene (currently the zenith triangle demo — the
reference's examples/triangle.rs config, BASELINE.md config #1) for N frames
with async dispatch and one final fence, excluding compilation, and prints
ONE JSON line.

Baseline: the reference publishes no numbers (BASELINE.md); the north star
is ≥60 FPS at 1080p on one v5e chip, so vs_baseline = fps / 60.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

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
            colors, depth, pipeline, vb, ib, {"Time": t}, grid, bin_capacity=8
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

    # Compile + warm up (excluded from timing).
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
    dt = min(times)  # best-of-3 sustained throughput
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "triangle_demo_fps_1080p",
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 60.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
