"""Tile binning: triangle records → per-tile candidate lists.

The TPU analog of a GPU's coarse rasterizer. Framebuffer tiles are sized to
the VPU register shape (rows × 128 lanes); each tile gets a static-capacity
list of candidate records, which the visibility kernel (ops.raster) streams
and tests exactly.

Strategy (v1, mask + sort compaction): build the (tiles × records) AABB
overlap matrix, then compact each tile's set bits into the first K slots *in
record order* via a sort of masked indices — order preservation matters for
Vulkan-exact depth-EQUAL / blending semantics. Overflow beyond K is counted
and reported so callers can warn (the renderer sizes K from scene stats; the
reference's analog is its ALL_COMMANDS-barrier perf warning, graph.rs:383).

The mask is O(tiles × records); fine into the tens of thousands of records.
A sort-based expansion binner (no per-tile cap) is the planned v2 for large
scenes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp

from zenith_tpu.ops.geometry import TriangleRecords
from zenith_tpu.ops.runtime import cdiv


@dataclass(frozen=True)
class TileGrid:
    """Static tiling configuration (part of the jit cache key)."""

    width: int
    height: int
    tile_h: int = 32
    tile_w: int = 128

    @property
    def tiles_x(self) -> int:
        return cdiv(self.width, self.tile_w)

    @property
    def tiles_y(self) -> int:
        return cdiv(self.height, self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


class TileBins(NamedTuple):
    binned_rast: jnp.ndarray  # (T, K, 16) f32 — gathered raster records
    binned_slot: jnp.ndarray  # (T, K) i32 — global record indices (pad -1)
    counts: jnp.ndarray  # (T,) i32
    overflow: jnp.ndarray  # () i32 — records dropped by the K cap

    def gather_corner_data(self, corner_data: jnp.ndarray) -> jnp.ndarray:
        """Gather per-record corner data (R, 3, D) into per-tile order
        (T, K, 3*D) for streaming into the interp kernel (pad slots → 0,
        so their iw is 0 and they can never win a pixel)."""
        r = corner_data.shape[0]
        d = corner_data.shape[1] * corner_data.shape[2]
        flat = corner_data.reshape(r, d)
        safe = jnp.clip(self.binned_slot, 0, r - 1)
        g = jnp.take(flat, safe.reshape(-1), axis=0)
        g = g.reshape(self.binned_slot.shape + (d,))
        return jnp.where(self.binned_slot[..., None] < 0, 0.0, g)


def bin_triangles(records: TriangleRecords, grid: TileGrid, k: int) -> TileBins:
    """Bin valid records into per-tile candidate lists of capacity ``k``."""
    r = records.rast16.shape[0]
    t = grid.num_tiles

    xmin, ymin, xmax, ymax = (records.aabb[:, i] for i in range(4))
    # Tile index ranges per record (conservative; the kernel tests exactly).
    tx0 = jnp.clip(jnp.floor(xmin / grid.tile_w), 0, grid.tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(xmax / grid.tile_w), 0, grid.tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(ymin / grid.tile_h), 0, grid.tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(ymax / grid.tile_h), 0, grid.tiles_y - 1).astype(jnp.int32)

    tile_tx = (jnp.arange(t, dtype=jnp.int32) % grid.tiles_x)[:, None]  # (T, 1)
    tile_ty = (jnp.arange(t, dtype=jnp.int32) // grid.tiles_x)[:, None]

    mask = (
        records.valid[None, :]
        & (tile_tx >= tx0[None, :])
        & (tile_tx <= tx1[None, :])
        & (tile_ty >= ty0[None, :])
        & (tile_ty <= ty1[None, :])
    )  # (T, R)

    counts = mask.sum(axis=1).astype(jnp.int32)
    overflow = jnp.maximum(counts - k, 0).sum()

    # Order-preserving compaction: masked indices sort before the R sentinel.
    order = jnp.arange(r, dtype=jnp.int32)[None, :]
    keys = jnp.where(mask, order, jnp.int32(r))
    packed = jnp.sort(keys, axis=1)[:, :k]  # (T, min(K, R))
    if packed.shape[1] < k:  # fewer records than capacity: pad with sentinel
        pad_cols = jnp.full((t, k - packed.shape[1]), r, jnp.int32)
        packed = jnp.concatenate([packed, pad_cols], axis=1)
    pad = packed >= r
    slot = jnp.where(pad, jnp.int32(-1), packed)

    gathered = jnp.take(records.rast16, jnp.clip(packed, 0, r - 1), axis=0)
    binned_rast = jnp.where(pad[..., None], 0.0, gathered)

    counts = jnp.minimum(counts, k)
    return TileBins(binned_rast, slot, counts, overflow)
