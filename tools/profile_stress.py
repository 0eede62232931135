"""Geometry scaling headroom: the cerberus draw chain at 1x/4x/10x
instancing (33.5k → 335k submitted triangles), 1080p, full pipeline
(VS → setup → bin → raster). Documents where device-side costs start to
matter (at 1x the frame is host-bound; see PERF.md).

Usage: python tools/profile_stress.py [--iters 20]
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
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.profile_stages import load_cerberus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    w, h = args.width, args.height

    from zenith_tpu.ops import TileGrid
    from zenith_tpu.ops.binning import bin_segmented
    from zenith_tpu.ops.geometry import setup_with_attrs
    from zenith_tpu.ops.raster import raster_segmented
    from zenith_tpu.rhi.state import CullMode, FrontFace

    grid = TileGrid(width=w, height=h, tile_h=32, tile_w=128)
    mesh, bmin, bmax, frame_camera = load_cerberus()
    camera, model = frame_camera(bmin, bmax, w / h)
    vb0 = np.asarray(mesh.vertices, np.float32)
    ib0 = np.asarray(mesh.indices.reshape(-1, 3), np.int32)

    def mvp_at(i):
        ang = 0.3 + i * 0.004
        r = float(np.linalg.norm(camera.location)) * 1.25
        camera.set_position(
            np.array([math.sin(ang) * r, -math.cos(ang) * r,
                      camera.location[2]], np.float32)
        )
        from zenith_tpu.core.mathtypes import Radians

        camera.set_yaw_pitch(Radians(ang), Radians(0.0))
        return jnp.asarray(
            np.asarray(camera.render_view_projection) @ np.asarray(model),
            jnp.float32,
        )

    def bench(fn, make_args):
        out = fn(*make_args(0))
        jax.block_until_ready(out)
        best = float("inf")
        for rep in range(args.reps):
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(*make_args(rep * args.iters + i + 1))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    results = {}
    for copies in (1, 4, 10):
        # Replicate the mesh with world-space x offsets (a gun rack) by
        # tiling vertices; one big draw, the instancing-at-setup pattern.
        nv = vb0.shape[0]
        # Compact cluster (x/z jitter ~1 gun apart) so every copy stays in
        # frame — measuring rasterized scale, not frustum culling.
        vbs = []
        for k in range(copies):
            v = vb0.copy()
            v[:, 0] += (k % 4 - 1.5) * 18.0
            v[:, 1] += (k // 4 - 1.0) * 14.0
            vbs.append(v)
        vb = jnp.asarray(np.concatenate(vbs))
        ib = jnp.asarray(
            np.concatenate([ib0 + k * nv for k in range(copies)])
        )
        n_tris = ib.shape[0]
        total_v = vb.shape[0]

        @jax.jit
        def chain(vbuf, ibuf, mvp):
            pos = vbuf[:, :3]
            hom = jnp.concatenate(
                [pos, jnp.ones((total_v, 1), jnp.float32)], axis=1
            )
            clip = hom @ mvp.T
            records, corner = setup_with_attrs(
                clip, ibuf, vbuf[:, 3:], w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            bins = bin_segmented(records, corner, grid)
            z, acc = raster_segmented(
                bins, grid, jnp.zeros((h, w), jnp.float32), interpret=False
            )
            return jnp.sum(z), jnp.sum(acc[-1]), bins.overflow

        ms = bench(chain, lambda i: (vb, ib, mvp_at(i)))
        results[f"x{copies}_tris"] = int(n_tris)
        results[f"x{copies}_ms"] = ms
        mtris = n_tris / ms / 1e3
        print(f"x{copies}: {n_tris} tris, {ms:.2f} ms "
              f"({mtris:.0f} Mtri/s submitted)", file=sys.stderr)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
