"""Decompose segmented-raster cost: grid-step overhead vs per-record work.

Hypotheses to separate (cerberus draw ≈ 0.9 ms fused):
  H1 per-BLOCK fixed cost dominates — each Pallas grid step (SMEM block DMA
     + routing) costs ~µs; b_max = budget/128 + num_tiles ≈ 1000 blocks.
     Test: same live entries, growing dead-block tail (budget_scale 1/2/4).
  H2 per-RECORD VPU work dominates — each record pays edge/plane math over
     the whole (tile_h, tile_w) tile. Test: tile shapes (8..32, 128/256);
     smaller tiles = less VPU work per record but more entries + blocks.

Harness rules per PERF.md: all large arrays as jit args, camera varies per
iteration, one fence per batch, reductions returned.

Usage: python tools/profile_raster.py [--iters 30]
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
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    w, h = args.width, args.height

    from zenith_tpu.ops import TileGrid
    from zenith_tpu.ops.binning import bin_segmented
    from zenith_tpu.ops.geometry import setup_with_attrs
    from zenith_tpu.ops.raster import raster_segmented
    from zenith_tpu.rhi.state import CullMode, FrontFace

    mesh, bmin, bmax, frame_camera = load_cerberus()
    camera, model = frame_camera(bmin, bmax, w / h)
    vb = jnp.asarray(mesh.vertices, jnp.float32)
    ib = jnp.asarray(mesh.indices.reshape(-1, 3), jnp.int32)
    nv, t = vb.shape[0], ib.shape[0]
    print(f"cerberus: {nv} verts, {t} tris, {w}x{h}", file=sys.stderr)

    def mvp_at(i):
        ang = 0.3 + i * 0.004
        r = float(np.linalg.norm(camera.location))
        x = math.sin(ang) * r
        y = -math.cos(ang) * r
        camera.set_position(np.array([x, y, camera.location[2]], np.float32))
        from zenith_tpu.core.mathtypes import Radians

        camera.set_yaw_pitch(Radians(ang), Radians(0.0))
        return jnp.asarray(
            np.asarray(camera.render_view_projection) @ np.asarray(model),
            jnp.float32,
        )

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
        return best * 1e3

    def vs(vbuf, mvp):
        pos = vbuf[:, :3]
        hom = jnp.concatenate([pos, jnp.ones((nv, 1), jnp.float32)], axis=1)
        clip = hom @ mvp.T
        return clip, vbuf[:, 3:]

    results = {}

    def full_chain(grid, budget_scale):
        @jax.jit
        def f(vbuf, ibuf, mvp):
            clip, vary = vs(vbuf, mvp)
            records, corner = setup_with_attrs(
                clip, ibuf, vary, w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            bins = bin_segmented(records, corner, grid,
                                 budget_scale=budget_scale)
            z, acc = raster_segmented(
                bins, grid, jnp.zeros((h, w), jnp.float32), interpret=False
            )
            return jnp.sum(z), jnp.sum(acc[-1]), bins.overflow

        return f

    def bin_chain(grid, budget_scale):
        @jax.jit
        def f(vbuf, ibuf, mvp):
            clip, vary = vs(vbuf, mvp)
            records, corner = setup_with_attrs(
                clip, ibuf, vary, w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            bins = bin_segmented(records, corner, grid,
                                 budget_scale=budget_scale)
            return (jnp.sum(bins.rast_pad), jnp.sum(bins.blk_count),
                    bins.overflow)

        return f

    def b_max_for(grid, budget_scale):
        # Derive the block count from the bins' actual static shapes —
        # bin_segmented grows the entry chunk past ENTRY_CHUNK for large
        # budgets, so recomputing from ENTRY_CHUNK here would be wrong.
        def f(vbuf, ibuf, mvp):
            clip, vary = vs(vbuf, mvp)
            records, corner = setup_with_attrs(
                clip, ibuf, vary, w, h,
                cull_mode=CullMode.BACK,
                front_face=FrontFace.COUNTER_CLOCKWISE,
            )
            return bin_segmented(records, corner, grid,
                                 budget_scale=budget_scale)

        return jax.eval_shape(f, vb, ib, mvp_at(0)).blk_count.shape[0]

    # H1: dead-block tail. Same grid, same entries; budget_scale grows b_max.
    grid32 = TileGrid(width=w, height=h, tile_h=32, tile_w=128)
    for scale in (1, 2, 4):
        r = t * 2  # records after instancing=1... actually R = tris
        full = bench(full_chain(grid32, scale), lambda i: (vb, ib, mvp_at(i)))
        bo = bench(bin_chain(grid32, scale), lambda i: (vb, ib, mvp_at(i)))
        b_max = b_max_for(grid32, scale)
        results[f"scale{scale}_blocks"] = b_max
        results[f"scale{scale}_full_ms"] = full
        results[f"scale{scale}_raster_ms"] = full - bo
        print(f"scale={scale} b_max={b_max}: full={full:.2f} ms "
              f"raster-only={full - bo:.2f} ms", file=sys.stderr)

    # A/B: packed single-key (tile, record) sort vs two-key variadic sort,
    # interleaved in ONE process (the only decision-grade comparison here).
    import zenith_tpu.ops.binning as _binning

    def chain_with_sort(packed):
        saved = _binning._PACKED_SORT
        _binning._PACKED_SORT = packed
        try:
            f = full_chain(grid32, 1)
            f(vb, ib, mvp_at(0))  # trace now, under the flag
        finally:
            _binning._PACKED_SORT = saved
        return f

    f_packed = chain_with_sort(True)
    f_twokey = chain_with_sort(False)
    for name, f in (("sort_packed", f_packed), ("sort_twokey", f_twokey),
                    ("sort_packed2", f_packed), ("sort_twokey2", f_twokey)):
        ms = bench(f, lambda i: (vb, ib, mvp_at(i)))
        results[f"{name}_ms"] = ms
        print(f"{name}: {ms:.3f} ms", file=sys.stderr)

    # H2: tile shapes.
    for th, tw in ((8, 128), (16, 128), (32, 256), (16, 256)):
        g = TileGrid(width=w, height=h, tile_h=th, tile_w=tw)
        full = bench(full_chain(g, 1), lambda i: (vb, ib, mvp_at(i)))
        bo = bench(bin_chain(g, 1), lambda i: (vb, ib, mvp_at(i)))
        b_max = b_max_for(g, 1)
        results[f"tile{th}x{tw}_blocks"] = b_max
        results[f"tile{th}x{tw}_full_ms"] = full
        results[f"tile{th}x{tw}_raster_ms"] = full - bo
        print(f"tile {th}x{tw} b_max={b_max}: full={full:.2f} ms "
              f"raster-only={full - bo:.2f} ms", file=sys.stderr)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
