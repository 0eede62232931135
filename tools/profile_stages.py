"""Stage-level timing of the cerberus rasterizer pipeline on the real chip.

Times jitted PREFIXES of the pipeline (setup | +bin | +raster | full draw)
end-to-end — per the perf ledger, traced per-op numbers through this backend
are not decision-grade; only untraced wall-clock diffs are. Inputs vary per
iteration and every stage returns a dependent reduction so nothing is
optimized away.

Also micro-times the integer-div/mod entry expansion vs an f32-division
variant (TPU integer division over large arrays is known-slow; the binner
does 2 × R × span_cap of them).

Usage: python tools/profile_stages.py [--width 1920 --height 1080 --iters 30]
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


def load_cerberus():
    from zenith_tpu import asset
    from zenith_tpu.asset import AssetManager, AssetUrl, registry
    from zenith_tpu.asset.render_types import Mesh
    from zenith_tpu.sandbox.mesh import default_content_root, frame_camera

    asset.initialize()
    mgr = AssetManager(root=default_content_root(), cache_dir="cache")
    handle = mgr.request_load("mesh/cerberus/scene.gltf")
    collection = handle.get()
    mesh = registry().get(AssetUrl(collection.mesh_urls[0]), Mesh)
    bounds_min = mesh.vertices[:, :3].min(axis=0)
    bounds_max = mesh.vertices[:, :3].max(axis=0)
    return mesh, bounds_min, bounds_max, frame_camera


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--micro-only", action="store_true")
    args = ap.parse_args()

    w, h = args.width, args.height

    from zenith_tpu.ops import TileGrid
    from zenith_tpu.ops.binning import bin_segmented
    from zenith_tpu.ops.geometry import setup_with_attrs
    from zenith_tpu.ops.raster import raster_segmented
    from zenith_tpu.rhi.state import CullMode, FrontFace

    grid = TileGrid(width=w, height=h, tile_h=32, tile_w=128)

    def bench(fn, make_args, iters=args.iters, reps=args.reps):
        out = fn(*make_args(0))
        jax.block_until_ready(out)
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(*make_args(rep * iters + i + 1))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3  # ms

    results = {}

    if not args.micro_only:
        mesh, bmin, bmax, frame_camera = load_cerberus()
        camera, model = frame_camera(bmin, bmax, w / h)
        vb = jnp.asarray(mesh.vertices, jnp.float32)  # (Nv, 8) pos/normal/uv
        ib = jnp.asarray(mesh.indices.reshape(-1, 3), jnp.int32)
        nv, t = vb.shape[0], ib.shape[0]
        print(f"cerberus: {nv} verts, {t} tris, {w}x{h}", file=sys.stderr)

        def mvp_at(i):
            ang = 0.3 + i * 0.004
            x = math.sin(ang) * float(np.linalg.norm(camera.location))
            y = -math.cos(ang) * float(np.linalg.norm(camera.location))
            camera.set_position(np.array([x, y, camera.location[2]], np.float32))
            from zenith_tpu.core.mathtypes import Radians

            camera.set_yaw_pitch(Radians(ang), Radians(0.0))
            return jnp.asarray(
                np.asarray(camera.render_view_projection) @ np.asarray(model),
                jnp.float32,
            )

        # CRITICAL harness rule (learned the hard way): every large array
        # must be a jit ARGUMENT. Closed-over device arrays become program
        # constants, which this backend re-ships per execution — a closed-
        # over index buffer inflated this chain 10x (9.4 ms vs 0.9 ms).
        def vs(vbuf, mvp):
            pos = vbuf[:, :3]
            hom = jnp.concatenate([pos, jnp.ones((nv, 1), jnp.float32)], axis=1)
            clip = hom @ mvp.T
            vary = vbuf[:, 3:]  # normal+uv (5 channels)
            return clip, vary

        @jax.jit
        def stage_setup(vbuf, ibuf, mvp):
            clip, vary = vs(vbuf, mvp)
            records, corner = setup_with_attrs(
                clip, ibuf, vary, w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            return (jnp.sum(records.rast16), jnp.sum(corner),
                    jnp.sum(records.aabb), records.valid.sum())

        @jax.jit
        def stage_bin(vbuf, ibuf, mvp):
            clip, vary = vs(vbuf, mvp)
            records, corner = setup_with_attrs(
                clip, ibuf, vary, w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            bins = bin_segmented(records, corner, grid)
            return (jnp.sum(bins.rast_pad), jnp.sum(bins.blk_count),
                    bins.overflow)

        @jax.jit
        def stage_raster(vbuf, ibuf, mvp):
            clip, vary = vs(vbuf, mvp)
            records, corner = setup_with_attrs(
                clip, ibuf, vary, w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            bins = bin_segmented(records, corner, grid)
            z, acc = raster_segmented(
                bins, grid, jnp.zeros((h, w), jnp.float32), interpret=False
            )
            return jnp.sum(z), jnp.sum(acc[-1]), bins.overflow

        results["setup_ms"] = bench(stage_setup, lambda i: (vb, ib, mvp_at(i)))
        print(f"setup: {results['setup_ms']:.2f} ms", file=sys.stderr)
        results["setup_bin_ms"] = bench(stage_bin, lambda i: (vb, ib, mvp_at(i)))
        print(f"setup+bin: {results['setup_bin_ms']:.2f} ms", file=sys.stderr)
        results["setup_bin_raster_ms"] = bench(
            stage_raster, lambda i: (vb, ib, mvp_at(i)))
        print(f"setup+bin+raster: {results['setup_bin_raster_ms']:.2f} ms",
              file=sys.stderr)
        results["bin_only_ms"] = results["setup_bin_ms"] - results["setup_ms"]
        results["raster_only_ms"] = (
            results["setup_bin_raster_ms"] - results["setup_bin_ms"]
        )

    # -- micro: the entry-expansion div/mod hypothesis ------------------------
    r_records = 67_072  # 2 × cerberus tris, the real record count
    span_cap = 32
    rng = np.random.default_rng(7)
    sx_np = rng.integers(1, 9, size=(r_records,)).astype(np.int32)
    j = jnp.arange(span_cap, dtype=jnp.int32)[None, :]

    @jax.jit
    def expand_intdiv(sx):
        dy = j // sx[:, None]
        dx = j % sx[:, None]
        return jnp.sum(dy) + jnp.sum(dx)

    @jax.jit
    def expand_f32div(sx):
        sxf = sx[:, None].astype(jnp.float32)
        dy = jnp.floor(j.astype(jnp.float32) / sxf).astype(jnp.int32)
        dx = j - dy * sx[:, None]
        return jnp.sum(dy) + jnp.sum(dx)

    # Pre-stage a few device-resident variants so iterations don't measure
    # the host→device transfer.
    sx_dev = [jax.device_put(jnp.asarray(np.roll(sx_np, k))) for k in range(4)]
    jax.block_until_ready(sx_dev)

    def sx_at(i):
        return sx_dev[i % 4]

    results["expand_intdiv_ms"] = bench(expand_intdiv, lambda i: (sx_at(i),))
    results["expand_f32div_ms"] = bench(expand_f32div, lambda i: (sx_at(i),))
    print(
        f"expand int-div: {results['expand_intdiv_ms']:.3f} ms | "
        f"f32-div: {results['expand_f32div_ms']:.3f} ms",
        file=sys.stderr,
    )

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
