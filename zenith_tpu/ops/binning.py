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

import jax
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
        """Gather per-record corner data — flat (R, 3·D) from the
        geometry stage (or legacy rank-3 (R, 3, D)) — into per-tile order
        (T, K, 3*D) for streaming into the interp kernel (pad slots → 0,
        so their iw is 0 and they can never win a pixel)."""
        r = corner_data.shape[0]
        flat = corner_data.reshape(r, -1)
        d = flat.shape[1]
        safe = jnp.clip(self.binned_slot, 0, r - 1)
        g = jnp.take(flat, safe.reshape(-1), axis=0)
        g = g.reshape(self.binned_slot.shape + (d,))
        return jnp.where(self.binned_slot[..., None] < 0, 0.0, g)


class SegmentedBins(NamedTuple):
    """Per-tile variable-length candidate segments, block-aligned for the
    segmented raster kernel (no per-tile capacity cap).

    Produced by ``bin_segmented``: entries (tile, record) are sorted once
    globally by (tile, record-order) — lexicographic two-key sort, the GPU
    coarse-raster equivalent — then gathered into CHUNK-aligned blocks. Each
    block carries scalar routing (tile coords, live count, init flag) that
    the kernel consumes via scalar prefetch.
    """

    blk_tile_y: jnp.ndarray  # (B,) i32
    blk_tile_x: jnp.ndarray  # (B,) i32
    blk_count: jnp.ndarray  # (B,) i32 — live entries in this block
    blk_init: jnp.ndarray  # (B,) i32 — 1 on a tile's first block
    rast_pad: jnp.ndarray  # (B*CHUNK, 16) f32 — record data in entry order
    attr_pad: jnp.ndarray  # (B*CHUNK, D) f32 — corner data in entry order
    overflow: jnp.ndarray  # () i32 — entries dropped (budget/span caps)


ENTRY_CHUNK = 128  # baseline entries per kernel block (grows for huge budgets)
# The segmented raster kernels keep BOTH their per-block routing tables
# (4 s32 arrays of B entries, scalar prefetch) AND the double-buffered
# (chunk, lanes) entry-stream window in SMEM — 1 MB total on v5e, shared
# with ~50 KB of fixed windows + spill. Growing the chunk halves the table
# term per doubling but doubles the window term, so bin_segmented picks the
# SMALLEST chunk whose pair fits this budget (multi-M-triangle draws:
# terrain at 2.88M tris measured fatal at chunk 128 — 4 × 355 KB tables).
RASTER_SMEM_BUDGET = 896 * 1024
MAX_ENTRY_CHUNK = 1024


def entry_chunk_for(entry_budget: int, num_tiles: int, d_total: int) -> int:
    """Entries per kernel block for a draw: the smallest power-of-2 chunk
    (≥ ENTRY_CHUNK) whose SMEM footprint — 4 s32 routing tables of
    cdiv(budget, chunk) + num_tiles blocks plus the double-buffered
    (chunk, d_total→128-lane-padded) f32 entry window — fits
    RASTER_SMEM_BUDGET. Larger chunks only cost DMA width (the kernel
    loops over each block's LIVE count), but every tile pays at least one
    block's stream, so the smallest fitting chunk wins."""
    lanes = -(-d_total // 128) * 128

    def smem_bytes(c: int) -> int:
        blocks = -(-entry_budget // c) + num_tiles
        return 4 * 4 * blocks + 4 * 2 * c * lanes

    candidates = []
    c = ENTRY_CHUNK
    while c <= MAX_ENTRY_CHUNK:
        candidates.append(c)
        c *= 2
    for c in candidates:  # smallest fitting chunk wins
        if smem_bytes(c) <= RASTER_SMEM_BUDGET:
            return c
    # Nothing fits (enormous budget): minimize the overshoot and let the
    # compiler's SMEM report name the draw.
    return min(candidates, key=smem_bytes)


def max_budget_for(num_tiles: int, d_total: int) -> int:
    """The largest entry budget whose kernel SMEM footprint (routing
    tables + double-buffered entry window, see entry_chunk_for) fits
    RASTER_SMEM_BUDGET at SOME chunk size. bin_segmented clamps requested
    budgets here (with a warning): a budget past this cap cannot compile
    at all (v5e SMEM is 1 MB), so the honest behavior is the smaller
    budget plus the overflow counter — dropped work is COUNTED, a
    too-big budget would be a compile error. Multi-M-triangle draws: an
    8.4M-triangle terrain requested 2x = 16.8M entries and measured
    'Ran out of memory in memory space smem (1.52M of 1.00M)'; the cap
    (~12M entries at 1080p) rasterized it with zero overflow."""
    lanes = -(-d_total // 128) * 128
    best = 0
    c = ENTRY_CHUNK
    while c <= MAX_ENTRY_CHUNK:
        avail = RASTER_SMEM_BUDGET - 4 * 2 * c * lanes - 4 * 4 * num_tiles
        if avail > 0:
            best = max(best, (avail // 16) * c)
        c *= 2
    return best

# Single-key packed (tile, record) sort when the key fits 31 bits (vs the
# two-key variadic sort). Measured equal-or-slower on v5e (see sort comment
# below) — default OFF; tools/profile_raster.py A/Bs it.
_PACKED_SORT = False


def bin_segmented(
    records: TriangleRecords,
    corner_data: jnp.ndarray,  # (R, 3·(A+1)) flat, from the geometry stage
    grid: TileGrid,
    span_cap: int = 4,
    mid_cap: int = 4096,
    mid_span: int = 32,
    huge_cap: int = 256,
    entry_budget: "int | None" = None,
    budget_scale: int = 1,
) -> SegmentedBins:
    """Exact, uncapped-per-tile binning, in three span tiers.

    - records spanning ≤ span_cap tiles (the overwhelming majority: a
      typical mesh triangle covers 1-2 tiles) emit static per-record
      entries at width span_cap;
    - up to mid_cap records spanning ≤ mid_span tiles are COMPACTED
      (top_k) before a width-mid_span expansion — paying wide expansion
      only for records that need it. A flat width-32 expansion for every
      record made the (tile, record) sort input 96% padding at cerberus
      scale: 2.1M slots for ~80k live entries;
    - up to huge_cap larger records (full-screen floors, skyboxes) take a
      dense per-tile mask path;
    - all tiers merge in one lexicographic (tile, record) sort, preserving
      submission order within every tile (Vulkan primitive-order semantics).

    ``entry_budget`` bounds total (tile, record) pairs per draw (default
    2×R, min 8192); overflow — including mid/huge tier drops — is counted,
    never silently ignored.
    """
    r = records.rast16.shape[0]
    t = grid.num_tiles
    tiles_x = grid.tiles_x
    rast16 = records.rast16
    valid = records.valid
    corner_flat = corner_data.reshape(r, -1)
    # (A stable-argsort record-compaction pass was tried here and measured
    # net-slower on TPU than binning the sparse valid mask directly.)
    compact_overflow = jnp.int32(0)

    if entry_budget is None:
        # Real tri-tile pair counts hug 1.2×R for typical meshes; kernel grid
        # steps cost ~µs each, so the budget should hug reality. Overflow is
        # counted — callers raise the budget when it fires (the engine grows
        # budget_scale adaptively on overflow, like a pipeline-cache miss).
        entry_budget = max(2 * r, 8192)
    entry_budget = int(entry_budget) * max(int(budget_scale), 1)
    # Budgets past what SMEM can route cannot compile at any chunk size:
    # clamp to the cap (dropped work is COUNTED via overflow; a compile
    # error would count nothing). See max_budget_for.
    cap = max_budget_for(t, 16 + corner_flat.shape[1])
    if 0 < cap < entry_budget:
        from zenith_tpu.core import log as _log

        _log.get(__name__).warning(
            "entry budget %d exceeds the SMEM routing cap %d for this "
            "draw (%d tiles, %d data columns) — clamped; watch the bin "
            "overflow counter",
            entry_budget, cap, t, 16 + corner_flat.shape[1],
        )
        entry_budget = cap
    # Huge budgets grow the chunk so the kernels' SMEM footprint stays
    # within RASTER_SMEM_BUDGET (see entry_chunk_for).
    chunk = entry_chunk_for(entry_budget, t, 16 + corner_flat.shape[1])
    # +T: every tile rounds its segment up to a whole block, so sparse
    # coverage (a screen-filling quad: 1-2 entries in hundreds of tiles) can
    # need up to one block per tile beyond the entry budget.
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
    mid = valid & (span > span_cap) & (span <= mid_span)
    huge = valid & (span > mid_span)

    def expand(tx0_, ty0_, sx_, span_, live, width):
        """(K, width) tile/valid expansion of per-record tile rectangles.
        dy = j // sx via f32 division: TPU integer division by a vector is
        very slow; f32 divide-then-floor is exact for j < 1024, sx ≤ 256
        (exhaustively verified — correctly-rounded division of small ints
        cannot cross an integer boundary). NOT valid for reciprocal-multiply
        (1/41 rounds low: 41·rcp(41) floors to 0)."""
        jj = jnp.arange(width, dtype=jnp.int32)[None, :]
        jf = jnp.arange(width, dtype=jnp.float32)[None, :]
        dy = jnp.floor(jf / sx_[:, None].astype(jnp.float32)).astype(jnp.int32)
        ty_e = ty0_[:, None] + dy
        tx_e = tx0_[:, None] + (jj - dy * sx_[:, None])
        tile_e = ty_e * tiles_x + tx_e
        ev = live[:, None] & (jj < span_[:, None])
        return tile_e, ev

    # Tier 1: every record, narrow width.
    tile_small, ev_small = expand(tx0, ty0, sx, span, small, span_cap)
    rec_small = jnp.broadcast_to(
        jnp.arange(r, dtype=jnp.int32)[:, None], (r, span_cap)
    )

    # Tier 2: compact mid-span records (top_k keeps any mid_cap of them;
    # order restored by the global sort), then expand wide.
    k_mid = min(mid_cap, r)
    _, midx = jax.lax.top_k(jnp.where(mid, span, 0), k_mid)
    mvalid = jnp.take(mid, midx)
    mid_dropped = mid.sum() - mvalid.sum()
    tile_mid, ev_mid = expand(
        jnp.take(tx0, midx), jnp.take(ty0, midx), jnp.take(sx, midx),
        jnp.take(span, midx), mvalid, mid_span,
    )
    rec_mid = jnp.broadcast_to(
        midx.astype(jnp.int32)[:, None], (k_mid, mid_span)
    )

    # Tier 3: huge records → dense per-tile mask over the top-huge_cap.
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
    )  # (H, T)
    tile_huge = jnp.broadcast_to(t_ids[None, :], hmask.shape)
    rec_huge = jnp.broadcast_to(hidx[:, None].astype(jnp.int32), hmask.shape)

    # Merge + lexicographic (tile, record) sort. Invalid entries get tile = t
    # (sorts to the end; two-key int32 sort avoids 64-bit keys). A packed
    # single-key variant ((tile << rec_bits) + rec) was re-tested under the
    # honest r2 harness via tools/profile_raster.py and measured equal-to-
    # slightly-slower (0.37/0.39 vs 0.32/0.37 ms full-chain) — the two-key
    # comparator is not the bottleneck; the r1 revert stands.
    tiles_all = jnp.concatenate(
        [
            jnp.where(ev_small, tile_small, t).reshape(-1),
            jnp.where(ev_mid, tile_mid, t).reshape(-1),
            jnp.where(hmask, tile_huge, t).reshape(-1),
        ]
    )
    recs_all = jnp.concatenate(
        [rec_small.reshape(-1), rec_mid.reshape(-1), rec_huge.reshape(-1)]
    )
    rec_bits = max((r - 1).bit_length(), 1)
    if _PACKED_SORT and (t << rec_bits) + (r - 1) < 2**31:
        # Retained behind a default-off flag purely for re-measurement.
        packed_keys = (tiles_all << rec_bits) + recs_all
        packed_sorted = jax.lax.sort(packed_keys)
        tiles_sorted = packed_sorted >> rec_bits
        recs_sorted = packed_sorted & ((1 << rec_bits) - 1)
    else:
        tiles_sorted, recs_sorted = jax.lax.sort(
            (tiles_all, recs_all), num_keys=2
        )
    total_entries = (tiles_sorted < t).sum()

    # Per-tile segments + block table. Tiles with no candidates get NO
    # blocks — the raster kernel writes outputs in place over pre-initialized
    # (aliased) buffers, so untouched tiles keep their cleared/loaded content.
    seg_off = jnp.searchsorted(tiles_sorted, jnp.arange(t + 1, dtype=jnp.int32))
    counts = jnp.diff(seg_off)
    n_blocks = -(-counts // chunk)
    blk_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_blocks).astype(jnp.int32)]
    )
    total_blocks = blk_off[-1]
    block_overflow = jnp.maximum(total_blocks - b_max, 0)

    b = jnp.arange(b_max, dtype=jnp.int32)
    tile_of_b = jnp.clip(
        jnp.searchsorted(blk_off, b, side="right") - 1, 0, t - 1
    ).astype(jnp.int32)
    # Dead blocks (past the real total) must route to the LAST LIVE tile:
    # the pipeline flushes the output block at every index change, so a dead
    # block routed elsewhere would flush the previous tile's VMEM contents
    # over an unrelated tile. Re-flushing the same tile is a harmless rewrite.
    live_b = b < total_blocks
    last_live_tile = jnp.max(
        jnp.where(counts > 0, jnp.arange(t, dtype=jnp.int32), 0)
    )
    tile_of_b = jnp.where(live_b, tile_of_b, last_live_tile)
    j_b = b - jnp.take(blk_off, tile_of_b)
    cnt_tile = jnp.take(counts, tile_of_b)
    blk_count = jnp.where(
        live_b, jnp.clip(cnt_tile - j_b * chunk, 0, chunk), 0
    ).astype(jnp.int32)
    # First live block of each tile initializes the tile's VMEM state; when
    # the whole draw is empty, block 0 still initializes (so its mandatory
    # final flush writes init content, not garbage).
    blk_init = (((j_b == 0) & live_b) | ((b == 0) & (total_blocks == 0))).astype(
        jnp.int32
    )

    # Block-aligned entry gather: record index per padded row. Per-BLOCK
    # values broadcast against the in-block lane index — the row-major
    # equivalents (take(x, row // chunk) over B·CHUNK rows) are gathers with
    # 128× repeated indices, pure waste on this backend.
    lane = jnp.arange(chunk, dtype=jnp.int32)[None, :]  # (1, CHUNK)
    src_b = (jnp.take(seg_off, tile_of_b) + j_b * chunk)[:, None] + lane
    src_ok = (lane < blk_count[:, None]).reshape(-1)
    src = src_b.reshape(-1)
    n_sorted = recs_sorted.shape[0]
    rec_idx = jnp.where(
        src_ok, jnp.take(recs_sorted, jnp.clip(src, 0, n_sorted - 1)), 0
    )

    # One merged (rast16 | corner-data) row per entry: a single SMEM stream
    # per kernel block (two separate streams doubled the unhidden DMA latency
    # that dominates per-block cost).
    merged = jnp.concatenate([rast16, corner_flat], axis=1)
    rows = jnp.take(merged, rec_idx, axis=0)
    rows = jnp.where(src_ok[:, None], rows, 0.0)
    rast_rows = rows  # (B*CHUNK, 16+D)
    attr_rows = jnp.zeros((0,), jnp.float32)  # folded into rast_rows

    overflow = (
        huge_dropped + mid_dropped + block_overflow * chunk + compact_overflow
    )
    return SegmentedBins(
        jnp.take(t_ty, tile_of_b),
        jnp.take(t_tx, tile_of_b),
        blk_count,
        blk_init,
        rast_rows,
        attr_rows,
        overflow.astype(jnp.int32),
    )


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
