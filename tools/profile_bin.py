"""Sub-stage timing of bin_segmented on the real chip.

Inlines the binner's code and jits successive PREFIXES, so stage cost =
adjacent-prefix diff (end-to-end untraced; traced per-op numbers through
this backend are not decision-grade). Run with an idle host.

Stages:
  B1 expansion     — AABB→tile ranges, small-path entry expansion, huge mask
  B2 + sort        — two-key (tile, record) lexicographic sort
  B3 + block table — seg offsets, per-block routing (searchsorted etc.)
  B4 + rec_idx     — padded-row source indices
  B5 + gather      — the (B·CHUNK, 16+D) merged row gather  == full binner

Variants: gather at half width (rast16 only), entry_budget 1.2R vs 2R,
tile 16×128 vs 32×128.
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

from zenith_tpu.ops import TileGrid
from zenith_tpu.ops.binning import ENTRY_CHUNK
from zenith_tpu.ops.geometry import setup_with_attrs
from zenith_tpu.ops.runtime import cdiv
from zenith_tpu.rhi.state import CullMode, FrontFace
from tools.profile_stages import load_cerberus


def bin_prefix(records, corner_data, grid, stage, span_cap=32, huge_cap=256,
               entry_budget=None, gather_cols=None):
    """bin_segmented's body, cut after `stage` (1-5)."""
    r = records.rast16.shape[0]
    t = grid.num_tiles
    tiles_x = grid.tiles_x
    chunk = ENTRY_CHUNK
    rast16 = records.rast16
    valid = records.valid
    corner_flat = corner_data.reshape(r, -1)
    if entry_budget is None:
        entry_budget = max(2 * r, 8192)
    b_max = cdiv(entry_budget, chunk) + t

    xmin, ymin, xmax, ymax = (records.aabb[:, i] for i in range(4))
    tx0 = jnp.clip(jnp.floor(xmin / grid.tile_w), 0, grid.tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / grid.tile_w), 0, grid.tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / grid.tile_h), 0, grid.tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / grid.tile_h), 0, grid.tiles_y - 1).astype(jnp.int32)
    sx = tx1 - tx0 + 1
    sy = ty1 - ty0 + 1
    span = sx * sy

    small = valid & (span <= span_cap)
    huge = valid & (span > span_cap)

    j = jnp.arange(span_cap, dtype=jnp.int32)[None, :]
    jf = jnp.arange(span_cap, dtype=jnp.float32)[None, :]
    dy = jnp.floor(jf / sx[:, None].astype(jnp.float32)).astype(jnp.int32)
    ty_e = ty0[:, None] + dy
    tx_e = tx0[:, None] + (j - dy * sx[:, None])
    tile_small = ty_e * tiles_x + tx_e
    ev_small = small[:, None] & (j < span[:, None])
    rec_small = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[:, None], (r, span_cap))

    huge_score = jnp.where(huge, span, 0)
    _, hidx = jax.lax.top_k(huge_score, min(huge_cap, r))
    hvalid = jnp.take(huge, hidx)
    huge_dropped = huge.sum() - hvalid.sum()
    t_ids = jnp.arange(t, dtype=jnp.int32)
    t_ty = t_ids // tiles_x
    t_tx = t_ids % tiles_x
    hmask = (
        hvalid[:, None]
        & (t_tx[None, :] >= jnp.take(tx0, hidx)[:, None])
        & (t_tx[None, :] <= jnp.take(tx1, hidx)[:, None])
        & (t_ty[None, :] >= jnp.take(ty0, hidx)[:, None])
        & (t_ty[None, :] <= jnp.take(ty1, hidx)[:, None])
    )
    tile_huge = jnp.broadcast_to(t_ids[None, :], hmask.shape)
    rec_huge = jnp.broadcast_to(hidx[:, None].astype(jnp.int32), hmask.shape)

    tiles_all = jnp.concatenate([
        jnp.where(ev_small, tile_small, t).reshape(-1),
        jnp.where(hmask, tile_huge, t).reshape(-1),
    ])
    recs_all = jnp.concatenate([rec_small.reshape(-1), rec_huge.reshape(-1)])
    if stage == 1:
        return jnp.sum(tiles_all), jnp.sum(recs_all), huge_dropped

    tiles_sorted, recs_sorted = jax.lax.sort((tiles_all, recs_all), num_keys=2)
    if stage == 2:
        return jnp.sum(tiles_sorted), jnp.sum(recs_sorted * 2)

    seg_off = jnp.searchsorted(tiles_sorted, jnp.arange(t + 1, dtype=jnp.int32))
    counts = jnp.diff(seg_off)
    n_blocks = -(-counts // chunk)
    blk_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_blocks).astype(jnp.int32)]
    )
    total_blocks = blk_off[-1]
    b = jnp.arange(b_max, dtype=jnp.int32)
    tile_of_b = jnp.clip(
        jnp.searchsorted(blk_off, b, side="right") - 1, 0, t - 1
    ).astype(jnp.int32)
    live_b = b < total_blocks
    last_live_tile = jnp.max(jnp.where(counts > 0, jnp.arange(t, dtype=jnp.int32), 0))
    tile_of_b = jnp.where(live_b, tile_of_b, last_live_tile)
    j_b = b - jnp.take(blk_off, tile_of_b)
    cnt_tile = jnp.take(counts, tile_of_b)
    blk_count = jnp.where(live_b, jnp.clip(cnt_tile - j_b * chunk, 0, chunk), 0)
    if stage == 3:
        return jnp.sum(blk_count), jnp.sum(tile_of_b)

    row = jnp.arange(b_max * chunk, dtype=jnp.int32)
    bb = row // chunk
    k_in_tile = jnp.take(j_b, bb) * chunk + row % chunk
    src = jnp.take(seg_off, jnp.take(tile_of_b, bb)) + k_in_tile
    src_ok = (row % chunk) < jnp.take(blk_count, bb)
    n_sorted = recs_sorted.shape[0]
    rec_idx = jnp.where(src_ok, jnp.take(recs_sorted, jnp.clip(src, 0, n_sorted - 1)), 0)
    if stage == 4:
        return jnp.sum(rec_idx), jnp.sum(src_ok)

    if gather_cols == "rast16":
        merged = rast16
    else:
        merged = jnp.concatenate([rast16, corner_flat], axis=1)
    rows = jnp.take(merged, rec_idx, axis=0)
    rows = jnp.where(src_ok[:, None], rows, 0.0)
    return jnp.sum(rows), jnp.sum(rec_idx)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--tile-h", type=int, default=32)
    args = ap.parse_args()
    w, h = args.width, args.height
    grid = TileGrid(width=w, height=h, tile_h=args.tile_h, tile_w=128)

    mesh, bmin, bmax, frame_camera = load_cerberus()
    camera, model = frame_camera(bmin, bmax, w / h)
    vb = jnp.asarray(mesh.vertices, jnp.float32)
    ib = jnp.asarray(mesh.indices.reshape(-1, 3), jnp.int32)
    nv = vb.shape[0]

    def mvp_at(i):
        ang = 0.3 + i * 0.004
        rad = float(np.linalg.norm(camera.location))
        camera.set_position(
            np.array([math.sin(ang) * rad, -math.cos(ang) * rad,
                      camera.location[2]], np.float32)
        )
        from zenith_tpu.core.mathtypes import Radians

        camera.set_yaw_pitch(Radians(ang), Radians(0.0))
        return jnp.asarray(
            np.asarray(camera.render_view_projection) @ np.asarray(model),
            jnp.float32,
        )

    def make_records(mvp):
        pos = vb[:, :3]
        hom = jnp.concatenate([pos, jnp.ones((nv, 1), jnp.float32)], axis=1)
        clip = hom @ mvp.T
        return setup_with_attrs(
            clip, ib, vb[:, 3:], w, h,
            cull_mode=CullMode.BACK, front_face=FrontFace.COUNTER_CLOCKWISE,
        )

    def bench(fn, iters=args.iters, reps=3):
        out = fn(mvp_at(0))
        jax.block_until_ready(out)
        best = float("inf")
        for rep in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                out = fn(mvp_at(rep * iters + i + 1))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best * 1e3

    results = {}

    def run(label, **kw):
        @jax.jit
        def fn(mvp):
            records, corner = make_records(mvp)
            return bin_prefix(records, corner, grid, **kw)

        results[label] = bench(fn)
        print(f"{label}: {results[label]:.2f} ms", file=sys.stderr)

    run("b1_expand", stage=1)
    run("b2_sort", stage=2)
    run("b3_blocktable", stage=3)
    run("b4_recidx", stage=4)
    run("b5_gather_full", stage=5)
    run("b5_gather_rast16only", stage=5, gather_cols="rast16")
    run("b5_budget_1_2r", stage=5,
        entry_budget=max(int(1.25 * 2 * ib.shape[0]), 8192))

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
