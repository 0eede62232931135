"""Rasterizer kernels (Pallas TPU).

PRODUCTION PATH: ``raster_segmented`` (+ ``_segmented_stencil_kernel``) over
``binning.bin_segmented`` — uncapped per-tile candidate lists, used by every
draw. The older capped-bin kernels below (``visibility_pass``,
``raster_interp_pass`` over ``binning.bin_triangles``) are retained
DELIBERATELY as a second, independently-structured implementation: the test
suite proves the segmented path equivalent to them (test_raster.py), which
— together with the NumPy oracle — triangulates correctness from three
directions. They are not maintained for performance.


Pass A below = the hardware rasterizer + early-Z of the Vulkan pipeline, as
a tile-parallel Pallas kernel. For each framebuffer tile it streams that tile's binned
triangle records (SMEM) and updates a per-pixel (depth, record-slot) pair in
VMEM — a *visibility buffer*. Triangles are processed strictly in submission
order, so depth-compare ties and depth-write-off overdraw resolve exactly as
a GPU would.

Fragment shading does NOT happen here: it runs afterwards as a dense
per-pixel pass over the resolved visibility buffer (ops.shade), which keeps
this kernel purely fixed-function, keeps shading perfectly vectorized, and
shades each pixel exactly once (better than GPU early-Z for overdraw).

Grid: (tiles_y, tiles_x, k_blocks) with the k dimension innermost — the
output tile block is revisited across k_blocks (standard Pallas reduction
pattern), while Pallas double-buffers the streaming record blocks.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zenith_tpu.ops.binning import TileBins, TileGrid
from zenith_tpu.ops.runtime import cdiv, pallas_interpret
from zenith_tpu.rhi.state import CompareOp

# Records processed per k-block (statically unrolled inside the kernel).
K_BLOCK = 8


def _compare_fn(op: CompareOp) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    return {
        CompareOp.NEVER: lambda new, cur: jnp.zeros_like(new, dtype=bool),
        CompareOp.LESS: lambda new, cur: new < cur,
        CompareOp.EQUAL: lambda new, cur: new == cur,
        CompareOp.LESS_OR_EQUAL: lambda new, cur: new <= cur,
        CompareOp.GREATER: lambda new, cur: new > cur,
        CompareOp.NOT_EQUAL: lambda new, cur: new != cur,
        CompareOp.GREATER_OR_EQUAL: lambda new, cur: new >= cur,
        CompareOp.ALWAYS: lambda new, cur: jnp.ones_like(new, dtype=bool),
    }[op]


def _visibility_kernel(
    # refs: SMEM record blocks, VMEM tile blocks
    count_ref,  # SMEM (1, 1, 1)
    rast_ref,  # SMEM (1, K_BLOCK, 17) — rast16 columns + slot id as f32
    initz_ref,  # VMEM (TH, TW)
    inits_ref,  # VMEM (TH, TW) i32
    z_ref,  # out VMEM (TH, TW)
    s_ref,  # out VMEM (TH, TW) i32
    *,
    tile_h: int,
    tile_w: int,
    compare: Callable,
    depth_write: bool,
    depth_clamp: bool = False,
):
    tx = pl.program_id(1)
    ty = pl.program_id(0)
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        z_ref[:] = initz_ref[:]
        s_ref[:] = inits_ref[:]

    count = count_ref[0, 0, 0]
    base = kb * K_BLOCK

    @pl.when(base < count)
    def _process():
        # Pixel-center coordinates of this tile (framebuffer space, y down).
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + 0.5
        y = (ty * tile_h + row).astype(jnp.float32) + 0.5

        z = z_ref[:]
        s = s_ref[:]
        for j in range(K_BLOCK):
            a01 = rast_ref[0, j, 0]
            b01 = rast_ref[0, j, 1]
            c01 = rast_ref[0, j, 2]
            a12 = rast_ref[0, j, 3]
            b12 = rast_ref[0, j, 4]
            c12 = rast_ref[0, j, 5]
            a20 = rast_ref[0, j, 6]
            b20 = rast_ref[0, j, 7]
            c20 = rast_ref[0, j, 8]
            tl01 = rast_ref[0, j, 9]
            tl12 = rast_ref[0, j, 10]
            tl20 = rast_ref[0, j, 11]
            inv_det = rast_ref[0, j, 12]
            z0 = rast_ref[0, j, 13]
            z1 = rast_ref[0, j, 14]
            z2 = rast_ref[0, j, 15]

            e01 = a01 * x + b01 * y + c01
            e12 = a12 * x + b12 * y + c12
            e20 = a20 * x + b20 * y + c20

            # Top-left fill rule: boundary pixels belong to top/left edges.
            cov = (
                ((e01 > 0.0) | ((e01 == 0.0) & (tl01 > 0.0)))
                & ((e12 > 0.0) | ((e12 == 0.0) & (tl12 > 0.0)))
                & ((e20 > 0.0) | ((e20 == 0.0) & (tl20 > 0.0)))
            )

            # Screen-linear depth from sub-triangle barycentrics.
            w0 = e12 * inv_det
            w1 = e20 * inv_det
            w2 = e01 * inv_det
            zpx = w0 * z0 + w1 * z1 + w2 * z2

            cov &= base + j < count
            # Per-pixel near/far clip (z outside [0,1] discarded — the
            # geometric near clip guarantees finite coords, this finishes
            # it); with depth_clamp the fragment z clamps instead (27.7.3).
            if depth_clamp:
                zpx = jnp.clip(zpx, 0.0, 1.0)
            else:
                cov &= (zpx >= 0.0) & (zpx <= 1.0)

            passed = cov & compare(zpx, z)
            if depth_write:
                z = jnp.where(passed, zpx, z)
            # Slot id rides column 16 as an exact small-integer float.
            sid = rast_ref[0, j, 16].astype(jnp.int32)
            s = jnp.where(passed, sid, s)

        z_ref[:] = z
        s_ref[:] = s


def _interp_kernel(
    count_ref,  # SMEM (1, 1, 1)
    rast_ref,  # SMEM (1, K_BLOCK, 16)
    attr_ref,  # SMEM (1, K_BLOCK, 3*(A+1)) — per corner [attr·iw ..., iw]
    initz_ref,  # VMEM (TH, TW)
    z_ref,  # out VMEM (TH, TW)
    acc_ref,  # out VMEM (A+1, TH, TW) — attr/w accumulators + 1/w plane
    *,
    tile_h: int,
    tile_w: int,
    num_attrs: int,  # A
    compare: Callable,
    depth_write: bool,
    depth_clamp: bool = False,
):
    """Forward-interpolating rasterizer: resolves visibility AND accumulates
    perspective-correct attribute/w planes in one pass, so the shading pass
    is purely elementwise (per-pixel gathers measure ~100× slower than
    streaming on this hardware — see ops.shade docstring)."""
    tx = pl.program_id(1)
    ty = pl.program_id(0)
    kb = pl.program_id(2)
    a_n = num_attrs + 1  # +1 for the 1/w channel

    @pl.when(kb == 0)
    def _init():
        z_ref[:] = initz_ref[:]
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    count = count_ref[0, 0, 0]
    base = kb * K_BLOCK

    @pl.when(base < count)
    def _process():
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + 0.5
        y = (ty * tile_h + row).astype(jnp.float32) + 0.5

        z = z_ref[:]
        acc = [acc_ref[a] for a in range(a_n)]
        for j in range(K_BLOCK):
            e01 = rast_ref[0, j, 0] * x + rast_ref[0, j, 1] * y + rast_ref[0, j, 2]
            e12 = rast_ref[0, j, 3] * x + rast_ref[0, j, 4] * y + rast_ref[0, j, 5]
            e20 = rast_ref[0, j, 6] * x + rast_ref[0, j, 7] * y + rast_ref[0, j, 8]
            cov = (
                ((e01 > 0.0) | ((e01 == 0.0) & (rast_ref[0, j, 9] > 0.0)))
                & ((e12 > 0.0) | ((e12 == 0.0) & (rast_ref[0, j, 10] > 0.0)))
                & ((e20 > 0.0) | ((e20 == 0.0) & (rast_ref[0, j, 11] > 0.0)))
            )
            inv_det = rast_ref[0, j, 12]
            w0 = e12 * inv_det
            w1 = e20 * inv_det
            w2 = e01 * inv_det
            zpx = (
                w0 * rast_ref[0, j, 13]
                + w1 * rast_ref[0, j, 14]
                + w2 * rast_ref[0, j, 15]
            )
            cov &= base + j < count
            if depth_clamp:
                zpx = jnp.clip(zpx, 0.0, 1.0)
            else:
                cov &= (zpx >= 0.0) & (zpx <= 1.0)
            passed = cov & compare(zpx, z)
            if depth_write:
                z = jnp.where(passed, zpx, z)
            for a in range(a_n):
                plane = (
                    w0 * attr_ref[0, j, a]
                    + w1 * attr_ref[0, j, a_n + a]
                    + w2 * attr_ref[0, j, 2 * a_n + a]
                )
                acc[a] = jnp.where(passed, plane, acc[a])

        z_ref[:] = z
        for a in range(a_n):
            acc_ref[a] = acc[a]


def raster_interp_pass(
    bins: TileBins,
    binned_attr: jnp.ndarray,  # (T, K, 3*(A+1))
    grid: TileGrid,
    init_z: jnp.ndarray,
    depth_test: bool = True,
    depth_write: bool = True,
    compare_op: CompareOp = CompareOp.GREATER,
    interpret: Optional[bool] = None,
) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """Rasterize with in-kernel attribute interpolation.

    Returns (z (H, W), acc (A+1, H, W)) where acc[:A] are attr·(1/w) planes
    and acc[A] is the interpolated 1/w — divide in the shading pass for
    perspective-correct varyings; acc[A] > 0 is the coverage mask.
    """
    if interpret is None:
        interpret = pallas_interpret()
    h, w = grid.height, grid.width
    th, tw = grid.tile_h, grid.tile_w
    k = bins.binned_rast.shape[1]
    assert k % K_BLOCK == 0
    k_blocks = k // K_BLOCK
    d3 = binned_attr.shape[-1]
    assert d3 % 3 == 0
    a_n = d3 // 3
    num_attrs = a_n - 1

    effective_compare = compare_op if depth_test else CompareOp.ALWAYS
    effective_write = depth_write and depth_test

    kernel = functools.partial(
        _interp_kernel,
        tile_h=th,
        tile_w=tw,
        num_attrs=num_attrs,
        compare=_compare_fn(effective_compare),
        depth_write=effective_write,
    )

    tiles_x = grid.tiles_x
    grid_dims = (grid.tiles_y, grid.tiles_x, k_blocks)

    # Corner-major → attr-major packing for contiguous SMEM scalar reads:
    # [c0: a0..aA, c1: a0..aA, c2: a0..aA] matches attr_ref indexing above.
    out_z, out_acc = pl.pallas_call(
        kernel,
        grid=grid_dims,
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda ty, tx, kb: (ty * tiles_x + tx, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K_BLOCK, 16), lambda ty, tx, kb: (ty * tiles_x + tx, kb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K_BLOCK, d3), lambda ty, tx, kb: (ty * tiles_x + tx, kb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda ty, tx, kb: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda ty, tx, kb: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_n, th, tw), lambda ty, tx, kb: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((a_n, h, w), jnp.float32),
        ],
        interpret=interpret,
    )(
        bins.counts.reshape(-1, 1, 1),
        bins.binned_rast,
        binned_attr,
        init_z.astype(jnp.float32),
    )
    return out_z, out_acc


def _segmented_kernel(
    # scalar prefetch
    ty_ref,  # SMEM (B,)
    tx_ref,  # SMEM (B,)
    cnt_ref,  # SMEM (B,)
    init_ref,  # SMEM (B,)
    # streamed blocks
    rast_ref,  # SMEM (CHUNK, 16 + D) — merged rast16 | corner data rows
    initz_ref,  # VMEM (TH, TW)
    z_alias_ref,  # ANY — aliased init buffer, untouched by the kernel
    acc_alias_ref,  # ANY — aliased init buffer, untouched by the kernel
    # outputs (revisited across a tile's consecutive blocks; aliased over the
    # init buffers so tiles with no candidate blocks keep init content)
    z_ref,  # VMEM (TH, TW)
    acc_ref,  # VMEM (A+1, TH, TW)
    *,
    tile_h: int,
    tile_w: int,
    num_attrs: int,
    compare: Callable,
    depth_write: bool,
    depth_clamp: bool = False,
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
):
    """Segmented forward-interpolating rasterizer: 1-D grid over entry
    blocks; each block's tile routing (output block index, init flag, live
    count) comes from scalar prefetch, so per-tile work is variable with no
    capacity cap (see binning.bin_segmented)."""
    del z_alias_ref, acc_alias_ref
    b = pl.program_id(0)
    a_n = num_attrs + 1

    @pl.when(init_ref[b] == 1)
    def _init():
        z_ref[:] = initz_ref[:]
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    count = cnt_ref[b]

    @pl.when(count > 0)
    def _process():
        tx = tx_ref[b]
        ty = ty_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + sample_offset[0]
        y = (ty * tile_h + row).astype(jnp.float32) + sample_offset[1]

        sub = 8  # unrolled records per loop iteration

        def body(s, carry):
            z, *acc = carry
            base = s * sub
            for jj in range(sub):
                i = base + jj
                e01 = rast_ref[i, 0] * x + rast_ref[i, 1] * y + rast_ref[i, 2]
                e12 = rast_ref[i, 3] * x + rast_ref[i, 4] * y + rast_ref[i, 5]
                e20 = rast_ref[i, 6] * x + rast_ref[i, 7] * y + rast_ref[i, 8]
                cov = (
                    ((e01 > 0.0) | ((e01 == 0.0) & (rast_ref[i, 9] > 0.0)))
                    & ((e12 > 0.0) | ((e12 == 0.0) & (rast_ref[i, 10] > 0.0)))
                    & ((e20 > 0.0) | ((e20 == 0.0) & (rast_ref[i, 11] > 0.0)))
                )
                inv_det = rast_ref[i, 12]
                w0 = e12 * inv_det
                w1 = e20 * inv_det
                w2 = e01 * inv_det
                zpx = (
                    w0 * rast_ref[i, 13]
                    + w1 * rast_ref[i, 14]
                    + w2 * rast_ref[i, 15]
                )
                cov &= i < count
                if depth_clamp:
                    zpx = jnp.clip(zpx, 0.0, 1.0)
                else:
                    cov &= (zpx >= 0.0) & (zpx <= 1.0)
                passed = cov & compare(zpx, z)
                if depth_write:
                    z = jnp.where(passed, zpx, z)
                new_acc = []
                for a in range(a_n):
                    plane = (
                        w0 * rast_ref[i, 16 + a]
                        + w1 * rast_ref[i, 16 + a_n + a]
                        + w2 * rast_ref[i, 16 + 2 * a_n + a]
                    )
                    new_acc.append(jnp.where(passed, plane, acc[a]))
                acc = new_acc
            return (z, *acc)

        n_sub = pl.cdiv(count, sub)
        init_carry = (z_ref[:], *[acc_ref[a] for a in range(a_n)])
        out = jax.lax.fori_loop(0, n_sub, body, init_carry)
        z_ref[:] = out[0]
        for a in range(a_n):
            acc_ref[a] = out[1 + a]


def _segmented_peel_kernel(
    # scalar prefetch
    ty_ref,  # SMEM (B,)
    tx_ref,  # SMEM (B,)
    cnt_ref,  # SMEM (B,)
    init_ref,  # SMEM (B,)
    # streamed blocks
    rast_ref,  # SMEM (CHUNK, 16 + D)
    initz_ref,  # VMEM (TH, TW)
    bound_ref,  # VMEM (TH, TW) — previous peel's resolved depth
    z_alias_ref,  # ANY — aliased init buffer
    acc_alias_ref,  # ANY — aliased init buffer
    # outputs
    z_ref,  # VMEM (TH, TW)
    acc_ref,  # VMEM (A+1, TH, TW)
    *,
    tile_h: int,
    tile_w: int,
    num_attrs: int,
    compare: Callable,
    bound_compare: Callable,
    depth_write: bool,
    depth_clamp: bool = False,
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
):
    """The segmented kernel with a DEPTH-PEEL bound plane: fragments at or
    beyond the previous layer's depth (per ``bound_compare``, the strict
    opposite of the depth compare) are rejected before the depth test, so
    each pass resolves the NEXT-nearest fragment per pixel — classic depth
    peeling (Everitt 2001), the exact-for-≤K-layers transparency path.
    Structure mirrors _segmented_kernel; the only addition is the bound
    plane test."""
    del z_alias_ref, acc_alias_ref
    b = pl.program_id(0)
    a_n = num_attrs + 1

    @pl.when(init_ref[b] == 1)
    def _init():
        z_ref[:] = initz_ref[:]
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    count = cnt_ref[b]

    @pl.when(count > 0)
    def _process():
        tx = tx_ref[b]
        ty = ty_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + sample_offset[0]
        y = (ty * tile_h + row).astype(jnp.float32) + sample_offset[1]
        bound = bound_ref[:]

        sub = 8  # unrolled records per loop iteration

        def body(s, carry):
            z, *acc = carry
            base = s * sub
            for jj in range(sub):
                i = base + jj
                e01 = rast_ref[i, 0] * x + rast_ref[i, 1] * y + rast_ref[i, 2]
                e12 = rast_ref[i, 3] * x + rast_ref[i, 4] * y + rast_ref[i, 5]
                e20 = rast_ref[i, 6] * x + rast_ref[i, 7] * y + rast_ref[i, 8]
                cov = (
                    ((e01 > 0.0) | ((e01 == 0.0) & (rast_ref[i, 9] > 0.0)))
                    & ((e12 > 0.0) | ((e12 == 0.0) & (rast_ref[i, 10] > 0.0)))
                    & ((e20 > 0.0) | ((e20 == 0.0) & (rast_ref[i, 11] > 0.0)))
                )
                inv_det = rast_ref[i, 12]
                w0 = e12 * inv_det
                w1 = e20 * inv_det
                w2 = e01 * inv_det
                zpx = (
                    w0 * rast_ref[i, 13]
                    + w1 * rast_ref[i, 14]
                    + w2 * rast_ref[i, 15]
                )
                cov &= i < count
                if depth_clamp:
                    zpx = jnp.clip(zpx, 0.0, 1.0)
                else:
                    cov &= (zpx >= 0.0) & (zpx <= 1.0)
                cov &= bound_compare(zpx, bound)  # strictly behind prev peel
                passed = cov & compare(zpx, z)
                if depth_write:
                    z = jnp.where(passed, zpx, z)
                new_acc = []
                for a in range(a_n):
                    plane = (
                        w0 * rast_ref[i, 16 + a]
                        + w1 * rast_ref[i, 16 + a_n + a]
                        + w2 * rast_ref[i, 16 + 2 * a_n + a]
                    )
                    new_acc.append(jnp.where(passed, plane, acc[a]))
                acc = new_acc
            return (z, *acc)

        n_sub = pl.cdiv(count, sub)
        init_carry = (z_ref[:], *[acc_ref[a] for a in range(a_n)])
        out = jax.lax.fori_loop(0, n_sub, body, init_carry)
        z_ref[:] = out[0]
        for a in range(a_n):
            acc_ref[a] = out[1 + a]


def _segmented_blend_kernel(
    # scalar prefetch
    ty_ref,  # SMEM (B,)
    tx_ref,  # SMEM (B,)
    cnt_ref,  # SMEM (B,)
    init_ref,  # SMEM (B,)
    # streamed blocks
    rast_ref,  # SMEM (CHUNK, 16 + D)
    initz_ref,  # VMEM (TH, TW)
    initc_ref,  # VMEM (4, TH, TW)
    z_alias_ref,  # ANY — aliased init buffer
    c_alias_ref,  # ANY — aliased init buffer
    # outputs
    z_ref,  # VMEM (TH, TW)
    c_ref,  # VMEM (4, TH, TW)
    *,
    tile_h: int,
    tile_w: int,
    num_attrs: int,
    compare: Callable,
    depth_write: bool,
    depth_clamp: bool = False,
    shade_blend: Callable = None,
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
):
    """ORDER-CORRECT per-tile blending: streams this tile's records in
    submission order (binning's (tile, record) sort guarantees it) and, for
    every covered+depth-passing fragment, runs the inlined fragment shader
    + blend equation against a carried color accumulator — the Vulkan
    output merger executed in-kernel, per fragment, in order. This is what
    lifts the batched-draw blending restriction: the winner-resolve kernel
    keeps one fragment per pixel, which cannot reproduce order-dependent
    blends across overlapping draws.

    ``shade_blend(attr_planes, passed, x, y, zpx, c_planes)`` is provided
    by ops.draw: it finalizes varyings (divide by the interpolated 1/w),
    evaluates the fragment shader (KERNEL-SAFE contract: pure elementwise
    jnp — no texture sampling/gathers), applies the blend equation, and
    returns the new 4 color planes. The unroll factor is small (4) because
    the shader body is inlined per record.
    """
    del z_alias_ref, c_alias_ref
    b = pl.program_id(0)
    a_n = num_attrs + 1

    @pl.when(init_ref[b] == 1)
    def _init():
        z_ref[:] = initz_ref[:]
        c_ref[:] = initc_ref[:]

    count = cnt_ref[b]

    @pl.when(count > 0)
    def _process():
        tx = tx_ref[b]
        ty = ty_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + sample_offset[0]
        y = (ty * tile_h + row).astype(jnp.float32) + sample_offset[1]

        sub = 4  # fragment shader is inlined per record: keep unroll small

        def body(s, carry):
            z, c0, c1, c2, c3 = carry
            base = s * sub
            for jj in range(sub):
                i = base + jj
                e01 = rast_ref[i, 0] * x + rast_ref[i, 1] * y + rast_ref[i, 2]
                e12 = rast_ref[i, 3] * x + rast_ref[i, 4] * y + rast_ref[i, 5]
                e20 = rast_ref[i, 6] * x + rast_ref[i, 7] * y + rast_ref[i, 8]
                cov = (
                    ((e01 > 0.0) | ((e01 == 0.0) & (rast_ref[i, 9] > 0.0)))
                    & ((e12 > 0.0) | ((e12 == 0.0) & (rast_ref[i, 10] > 0.0)))
                    & ((e20 > 0.0) | ((e20 == 0.0) & (rast_ref[i, 11] > 0.0)))
                )
                inv_det = rast_ref[i, 12]
                w0 = e12 * inv_det
                w1 = e20 * inv_det
                w2 = e01 * inv_det
                zpx = (
                    w0 * rast_ref[i, 13]
                    + w1 * rast_ref[i, 14]
                    + w2 * rast_ref[i, 15]
                )
                cov &= i < count
                if depth_clamp:
                    zpx = jnp.clip(zpx, 0.0, 1.0)
                else:
                    cov &= (zpx >= 0.0) & (zpx <= 1.0)
                passed = cov & compare(zpx, z)
                if depth_write:
                    z = jnp.where(passed, zpx, z)
                planes = [
                    w0 * rast_ref[i, 16 + a]
                    + w1 * rast_ref[i, 16 + a_n + a]
                    + w2 * rast_ref[i, 16 + 2 * a_n + a]
                    for a in range(a_n)
                ]
                c0, c1, c2, c3 = shade_blend(
                    planes, passed, x, y, zpx, (c0, c1, c2, c3)
                )
            return (z, c0, c1, c2, c3)

        n_sub = pl.cdiv(count, sub)
        init_carry = (z_ref[:], c_ref[0], c_ref[1], c_ref[2], c_ref[3])
        out = jax.lax.fori_loop(0, n_sub, body, init_carry)
        z_ref[:] = out[0]
        for a in range(4):
            c_ref[a] = out[1 + a]


def _segmented_blend_stencil_kernel(
    # scalar prefetch
    ty_ref,  # SMEM (B,)
    tx_ref,  # SMEM (B,)
    cnt_ref,  # SMEM (B,)
    init_ref,  # SMEM (B,)
    # streamed blocks
    rast_ref,  # SMEM (CHUNK, 16 + D)
    initz_ref,  # VMEM (TH, TW)
    initc_ref,  # VMEM (4, TH, TW)
    inits_ref,  # VMEM (TH, TW) i32 — stencil init
    z_alias_ref,  # ANY — aliased init buffers
    c_alias_ref,
    s_alias_ref,
    # outputs
    z_ref,  # VMEM (TH, TW)
    c_ref,  # VMEM (4, TH, TW)
    s_ref,  # VMEM (TH, TW) i32
    *,
    tile_h: int,
    tile_w: int,
    num_attrs: int,
    compare: Callable,
    depth_write: bool,
    depth_clamp: bool = False,
    shade_blend: Callable = None,
    front_face_state=None,  # StencilOpState
    back_face_state=None,  # StencilOpState
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
):
    """The in-order blend kernel with a STENCIL plane in the carry — the
    full Vulkan output merger for blended pipelines (pipeline.rs:337-480:
    blend and stencil state compose freely). Per-fragment order (27.18-19):
    coverage → stencil test → depth test; stencil ops fire on their
    outcomes; only fragments passing BOTH tests shade + blend. Facing
    selects front/back state via the record's front·iw channel (the
    second-to-last attr column; iw > 0 always)."""
    del z_alias_ref, c_alias_ref, s_alias_ref
    b = pl.program_id(0)
    a_n = num_attrs + 1
    same_faces = front_face_state == back_face_state

    @pl.when(init_ref[b] == 1)
    def _init():
        z_ref[:] = initz_ref[:]
        c_ref[:] = initc_ref[:]
        s_ref[:] = inits_ref[:]

    count = cnt_ref[b]

    @pl.when(count > 0)
    def _process():
        tx = tx_ref[b]
        ty = ty_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + sample_offset[0]
        y = (ty * tile_h + row).astype(jnp.float32) + sample_offset[1]

        sub = 4  # fragment shader is inlined per record: keep unroll small

        def face_test(face, cov, sten):
            ref_m = (face.reference & face.compare_mask) & 0xFF
            s_m = sten & (face.compare_mask & 0xFF)
            return cov & _compare_fn(face.compare_op)(
                jnp.full_like(s_m, ref_m), s_m
            )

        def body(s, carry):
            z, sten, c0, c1, c2, c3 = carry
            base = s * sub
            for jj in range(sub):
                i = base + jj
                e01 = rast_ref[i, 0] * x + rast_ref[i, 1] * y + rast_ref[i, 2]
                e12 = rast_ref[i, 3] * x + rast_ref[i, 4] * y + rast_ref[i, 5]
                e20 = rast_ref[i, 6] * x + rast_ref[i, 7] * y + rast_ref[i, 8]
                cov = (
                    ((e01 > 0.0) | ((e01 == 0.0) & (rast_ref[i, 9] > 0.0)))
                    & ((e12 > 0.0) | ((e12 == 0.0) & (rast_ref[i, 10] > 0.0)))
                    & ((e20 > 0.0) | ((e20 == 0.0) & (rast_ref[i, 11] > 0.0)))
                )
                inv_det = rast_ref[i, 12]
                w0 = e12 * inv_det
                w1 = e20 * inv_det
                w2 = e01 * inv_det
                zpx = (
                    w0 * rast_ref[i, 13]
                    + w1 * rast_ref[i, 14]
                    + w2 * rast_ref[i, 15]
                )
                cov &= i < count
                if depth_clamp:
                    zpx = jnp.clip(zpx, 0.0, 1.0)
                else:
                    cov &= (zpx >= 0.0) & (zpx <= 1.0)

                if same_faces:
                    spass = face_test(front_face_state, cov, sten)
                    dpass = spass & compare(zpx, z)
                    sten = _stencil_face_update(
                        front_face_state, cov, spass, dpass, sten
                    )
                else:
                    is_front = rast_ref[i, 16 + a_n - 2] > 0.0
                    spass_f = face_test(front_face_state, cov, sten)
                    spass_b = face_test(back_face_state, cov, sten)
                    spass = jnp.where(is_front, spass_f, spass_b)
                    dpass = spass & compare(zpx, z)
                    snew_f = _stencil_face_update(
                        front_face_state, cov, spass_f, dpass, sten
                    )
                    snew_b = _stencil_face_update(
                        back_face_state, cov, spass_b, dpass, sten
                    )
                    sten = jnp.where(is_front, snew_f, snew_b)
                if depth_write:
                    z = jnp.where(dpass, zpx, z)
                planes = [
                    w0 * rast_ref[i, 16 + a]
                    + w1 * rast_ref[i, 16 + a_n + a]
                    + w2 * rast_ref[i, 16 + 2 * a_n + a]
                    for a in range(a_n)
                ]
                c0, c1, c2, c3 = shade_blend(
                    planes, dpass, x, y, zpx, (c0, c1, c2, c3)
                )
            return (z, sten, c0, c1, c2, c3)

        n_sub = pl.cdiv(count, sub)
        init_carry = (
            z_ref[:], s_ref[:], c_ref[0], c_ref[1], c_ref[2], c_ref[3]
        )
        out = jax.lax.fori_loop(0, n_sub, body, init_carry)
        z_ref[:] = out[0]
        s_ref[:] = out[1]
        for a in range(4):
            c_ref[a] = out[2 + a]


def raster_segmented_blend(
    bins,  # SegmentedBins
    grid: TileGrid,
    init_z: jnp.ndarray,  # (H, W)
    init_color: jnp.ndarray,  # (H, W, 4)
    shade_blend: Callable,
    depth_test: bool = True,
    depth_write: bool = False,
    compare_op: CompareOp = CompareOp.GREATER,
    depth_clamp: bool = False,
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
    interpret: Optional[bool] = None,
    init_stencil: Optional[jnp.ndarray] = None,  # (H, W) i32
    stencil_front=None,  # StencilOpState when stencil test enabled
    stencil_back=None,
) -> "tuple[jnp.ndarray, jnp.ndarray] | tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]":
    """Order-correct blending raster pass → (z (H, W), color (H, W, 4)),
    plus the updated stencil plane when ``stencil_front`` is given.
    See _segmented_blend_kernel / _segmented_blend_stencil_kernel."""
    if interpret is None:
        interpret = pallas_interpret()
    h, w = grid.height, grid.width
    th, tw = grid.tile_h, grid.tile_w
    b_max = bins.blk_count.shape[0]
    # The actual chunk rides the bins' static shapes (bin_segmented grows it
    # past ENTRY_CHUNK for huge entry budgets — MAX_ENTRY_CHUNK).
    chunk = bins.rast_pad.shape[0] // b_max
    d_total = bins.rast_pad.shape[-1]
    d = d_total - 16
    assert d % 3 == 0
    a_n = d // 3
    num_attrs = a_n - 1

    effective_compare = compare_op if depth_test else CompareOp.ALWAYS
    effective_write = depth_write and depth_test
    with_stencil = stencil_front is not None

    init_z = init_z.astype(jnp.float32)
    hp = grid.tiles_y * th
    wp = grid.tiles_x * tw
    z_seed = init_z
    c_seed = jnp.moveaxis(init_color.astype(jnp.float32), -1, 0)  # (4, H, W)
    if (hp, wp) != (h, w):
        z_seed = jnp.pad(init_z, ((0, hp - h), (0, wp - w)))
        c_seed = jnp.pad(c_seed, ((0, 0), (0, hp - h), (0, wp - w)))

    if with_stencil:
        return _raster_segmented_blend_stencil(
            bins, grid, z_seed, c_seed, shade_blend,
            effective_compare, effective_write, depth_clamp, sample_offset,
            interpret, init_stencil, stencil_front, stencil_back,
            h, w, hp, wp, th, tw, b_max, chunk, d_total, num_attrs,
        )

    kernel = functools.partial(
        _segmented_blend_kernel,
        tile_h=th,
        tile_w=tw,
        num_attrs=num_attrs,
        compare=_compare_fn(effective_compare),
        depth_write=effective_write,
        depth_clamp=depth_clamp,
        shade_blend=shade_blend,
        sample_offset=sample_offset,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b_max,),
        in_specs=[
            pl.BlockSpec((chunk, d_total), lambda i, ty, tx, cnt, ini: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tw),
                         lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # z seed (aliased → out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # c seed (aliased → out 1)
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tw),
                         lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
        ],
    )

    # At mid resolutions the aliased (4, H, W) color output "fits"
    # per-buffer in VMEM, so the compiler staged the aliased outputs on
    # the kernel's scoped-vmem stack and blew its default 16 MB limit
    # (observed at 960x540; 1080p escaped because nothing fit). Raise the
    # kernel's vmem budget to cover staging up to ~4K surfaces; beyond
    # that the buffers exceed VMEM entirely and stay in HBM.
    vmem_budget = min(
        100 * 1024 * 1024,
        max(32 * 1024 * 1024, 3 * (5 * hp * wp * 4)),
    )
    out_z, out_c = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        ],
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(
        bins.blk_tile_y,
        bins.blk_tile_x,
        bins.blk_count,
        bins.blk_init,
        bins.rast_pad,
        z_seed,
        c_seed,
        z_seed,
        c_seed,
    )
    if (hp, wp) != (h, w):
        out_z = out_z[:h, :w]
        out_c = out_c[:, :h, :w]
    return out_z, jnp.moveaxis(out_c, 0, -1)


def _raster_segmented_blend_stencil(
    bins, grid, z_seed, c_seed, shade_blend,
    effective_compare, effective_write, depth_clamp, sample_offset,
    interpret, init_stencil, stencil_front, stencil_back,
    h, w, hp, wp, th, tw, b_max, chunk, d_total, num_attrs,
):
    """Stencil variant of raster_segmented_blend → (z, color, stencil)."""
    if stencil_back is None:
        stencil_back = stencil_front
    if init_stencil is None:
        init_stencil = jnp.zeros((h, w), jnp.int32)
    s_seed = init_stencil.astype(jnp.int32)
    if (hp, wp) != (h, w):
        s_seed = jnp.pad(s_seed, ((0, hp - h), (0, wp - w)))

    kernel = functools.partial(
        _segmented_blend_stencil_kernel,
        tile_h=th,
        tile_w=tw,
        num_attrs=num_attrs,
        compare=_compare_fn(effective_compare),
        depth_write=effective_write,
        depth_clamp=depth_clamp,
        shade_blend=shade_blend,
        front_face_state=stencil_front,
        back_face_state=stencil_back,
        sample_offset=sample_offset,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b_max,),
        in_specs=[
            pl.BlockSpec((chunk, d_total), lambda i, ty, tx, cnt, ini: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tw),
                         lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # z seed (aliased → out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # c seed (aliased → out 1)
            pl.BlockSpec(memory_space=pl.ANY),  # s seed (aliased → out 2)
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tw),
                         lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
        ],
    )

    vmem_budget = min(
        100 * 1024 * 1024,
        max(32 * 1024 * 1024, 3 * (6 * hp * wp * 4)),
    )
    out_z, out_c, out_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        # args: 4 prefetch + [rows, initz, initc, inits, z_seed, c_seed,
        # s_seed].
        input_output_aliases={8: 0, 9: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_budget),
        interpret=interpret,
    )(
        bins.blk_tile_y,
        bins.blk_tile_x,
        bins.blk_count,
        bins.blk_init,
        bins.rast_pad,
        z_seed,
        c_seed,
        s_seed,
        z_seed,
        c_seed,
        s_seed,
    )
    if (hp, wp) != (h, w):
        out_z = out_z[:h, :w]
        out_c = out_c[:, :h, :w]
        out_s = out_s[:h, :w]
    return out_z, jnp.moveaxis(out_c, 0, -1), out_s


def _stencil_apply(op, s: jnp.ndarray, reference: int) -> jnp.ndarray:
    """One VkStencilOp over an int32 stencil plane (8-bit semantics)."""
    from zenith_tpu.rhi.state import StencilOp

    if op == StencilOp.KEEP:
        return s
    if op == StencilOp.ZERO:
        return jnp.zeros_like(s)
    if op == StencilOp.REPLACE:
        return jnp.full_like(s, reference & 0xFF)
    if op == StencilOp.INCREMENT_AND_CLAMP:
        return jnp.minimum(s + 1, 255)
    if op == StencilOp.DECREMENT_AND_CLAMP:
        return jnp.maximum(s - 1, 0)
    if op == StencilOp.INVERT:
        return ~s & 0xFF
    if op == StencilOp.INCREMENT_AND_WRAP:
        return (s + 1) & 0xFF
    if op == StencilOp.DECREMENT_AND_WRAP:
        return (s - 1) & 0xFF
    raise ValueError(op)


def _stencil_face_update(face, cov, spass, dpass, s):
    """Post-test stencil write for one face state (Vulkan 27.19):
    sfail → fail_op, depth-fail → depth_fail_op, pass → pass_op, each
    masked by write_mask."""
    ref = face.reference
    out = s
    out = jnp.where(cov & ~spass, _stencil_apply(face.fail_op, s, ref), out)
    out = jnp.where(spass & ~dpass,
                    _stencil_apply(face.depth_fail_op, s, ref), out)
    out = jnp.where(dpass, _stencil_apply(face.pass_op, s, ref), out)
    wmask = face.write_mask & 0xFF
    if wmask == 0xFF:
        return out
    return (s & ~wmask) | (out & wmask)


def _segmented_stencil_kernel(
    # scalar prefetch
    ty_ref, tx_ref, cnt_ref, init_ref,
    # streamed blocks
    rast_ref,  # SMEM (CHUNK, 16 + D)
    initz_ref,  # VMEM (TH, TW)
    inits_ref,  # VMEM (TH, TW) i32 — stencil init
    z_alias_ref, acc_alias_ref, s_alias_ref,  # ANY (aliased seeds)
    # outputs
    z_ref, acc_ref, s_ref,
    *,
    tile_h: int,
    tile_w: int,
    num_attrs: int,
    compare: Callable,
    depth_write: bool,
    depth_clamp: bool,
    front_face_state,  # StencilOpState
    back_face_state,  # StencilOpState
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
):
    """The segmented kernel with a stencil plane in the carry.

    Per-fragment order (Vulkan 27.18-27.19): coverage → stencil test →
    depth test; stencil ops fire on their respective outcomes even for
    fragments that never write color/depth. Per-record facing selects the
    front/back face state via the record's front·iw channel (a per-record
    scalar; both faces are computed and scalar-selected only when the two
    states differ).
    """
    del z_alias_ref, acc_alias_ref, s_alias_ref
    b = pl.program_id(0)
    a_n = num_attrs + 1
    same_faces = front_face_state == back_face_state

    @pl.when(init_ref[b] == 1)
    def _init():
        z_ref[:] = initz_ref[:]
        acc_ref[:] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        s_ref[:] = inits_ref[:]

    count = cnt_ref[b]

    @pl.when(count > 0)
    def _process():
        tx = tx_ref[b]
        ty = ty_ref[b]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        x = (tx * tile_w + col).astype(jnp.float32) + sample_offset[0]
        y = (ty * tile_h + row).astype(jnp.float32) + sample_offset[1]

        sub = 8

        def face_test(face, cov, sten):
            ref_m = (face.reference & face.compare_mask) & 0xFF
            s_m = sten & (face.compare_mask & 0xFF)
            return cov & _compare_fn(face.compare_op)(
                jnp.full_like(s_m, ref_m), s_m
            )

        def body(i_s, carry):
            z, sten, *acc = carry
            base = i_s * sub
            for jj in range(sub):
                i = base + jj
                e01 = rast_ref[i, 0] * x + rast_ref[i, 1] * y + rast_ref[i, 2]
                e12 = rast_ref[i, 3] * x + rast_ref[i, 4] * y + rast_ref[i, 5]
                e20 = rast_ref[i, 6] * x + rast_ref[i, 7] * y + rast_ref[i, 8]
                cov = (
                    ((e01 > 0.0) | ((e01 == 0.0) & (rast_ref[i, 9] > 0.0)))
                    & ((e12 > 0.0) | ((e12 == 0.0) & (rast_ref[i, 10] > 0.0)))
                    & ((e20 > 0.0) | ((e20 == 0.0) & (rast_ref[i, 11] > 0.0)))
                )
                inv_det = rast_ref[i, 12]
                w0 = e12 * inv_det
                w1 = e20 * inv_det
                w2 = e01 * inv_det
                zpx = (
                    w0 * rast_ref[i, 13]
                    + w1 * rast_ref[i, 14]
                    + w2 * rast_ref[i, 15]
                )
                cov &= i < count
                if depth_clamp:
                    zpx = jnp.clip(zpx, 0.0, 1.0)
                else:
                    cov &= (zpx >= 0.0) & (zpx <= 1.0)

                if same_faces:
                    spass = face_test(front_face_state, cov, sten)
                    dpass = spass & compare(zpx, z)
                    snew = _stencil_face_update(
                        front_face_state, cov, spass, dpass, sten
                    )
                else:
                    # front flag rides the second-to-last attr channel
                    # (front·iw at corner 0; iw > 0 always).
                    is_front = rast_ref[i, 16 + a_n - 2] > 0.0
                    spass_f = face_test(front_face_state, cov, sten)
                    spass_b = face_test(back_face_state, cov, sten)
                    spass = jnp.where(is_front, spass_f, spass_b)
                    dpass = spass & compare(zpx, z)
                    snew_f = _stencil_face_update(
                        front_face_state, cov, spass_f, dpass, sten
                    )
                    snew_b = _stencil_face_update(
                        back_face_state, cov, spass_b, dpass, sten
                    )
                    snew = jnp.where(is_front, snew_f, snew_b)
                sten = snew
                if depth_write:
                    z = jnp.where(dpass, zpx, z)
                new_acc = []
                for a in range(a_n):
                    plane = (
                        w0 * rast_ref[i, 16 + a]
                        + w1 * rast_ref[i, 16 + a_n + a]
                        + w2 * rast_ref[i, 16 + 2 * a_n + a]
                    )
                    new_acc.append(jnp.where(dpass, plane, acc[a]))
                acc = new_acc
            return (z, sten, *acc)

        n_sub = pl.cdiv(count, sub)
        init_carry = (z_ref[:], s_ref[:], *[acc_ref[a] for a in range(a_n)])
        out = jax.lax.fori_loop(0, n_sub, body, init_carry)
        z_ref[:] = out[0]
        s_ref[:] = out[1]
        for a in range(a_n):
            acc_ref[a] = out[2 + a]


def raster_segmented(
    bins,  # SegmentedBins
    grid: TileGrid,
    init_z: jnp.ndarray,
    depth_test: bool = True,
    depth_write: bool = True,
    compare_op: CompareOp = CompareOp.GREATER,
    depth_clamp: bool = False,
    init_stencil: Optional[jnp.ndarray] = None,  # (H, W) i32
    stencil_front=None,  # StencilOpState when stencil test enabled
    stencil_back=None,
    sample_offset: "tuple[float, float]" = (0.5, 0.5),
    interpret: Optional[bool] = None,
    z_bound: Optional[jnp.ndarray] = None,  # (H, W) depth-peel bound plane
) -> "tuple[jnp.ndarray, jnp.ndarray] | tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]":
    """Segmented-binning raster pass → (z (H, W), acc (A+1, H, W)).

    ``z_bound`` switches on DEPTH PEELING: fragments not strictly behind
    the bound plane (the previous peel's resolved depth) are rejected, so
    the pass resolves the next-nearest layer. Requires an ordering depth
    compare (GREATER/GEQ or LESS/LEQ) with the depth test enabled; cannot
    combine with stencil. Fragments exactly AT the bound are rejected —
    coplanar equal-depth fragments collapse into one peel (the classic
    depth-peeling tie limitation)."""
    if interpret is None:
        interpret = pallas_interpret()
    h, w = grid.height, grid.width
    th, tw = grid.tile_h, grid.tile_w
    b_max = bins.blk_count.shape[0]
    # The actual chunk rides the bins' static shapes (bin_segmented grows it
    # past ENTRY_CHUNK for huge entry budgets — MAX_ENTRY_CHUNK).
    chunk = bins.rast_pad.shape[0] // b_max
    d_total = bins.rast_pad.shape[-1]
    d = d_total - 16
    assert d % 3 == 0
    a_n = d // 3
    num_attrs = a_n - 1

    effective_compare = compare_op if depth_test else CompareOp.ALWAYS
    effective_write = depth_write and depth_test
    with_stencil = stencil_front is not None

    init_z = init_z.astype(jnp.float32)
    # Pad the logical surface to tile multiples: aliased buffers ARE the
    # output buffers, whose padded regions the kernel may flush.
    hp = grid.tiles_y * th
    wp = grid.tiles_x * tw
    z_seed = init_z
    if (hp, wp) != (h, w):
        z_seed = jnp.pad(init_z, ((0, hp - h), (0, wp - w)))
    acc_seed = jnp.zeros((a_n, hp, wp), jnp.float32)

    if z_bound is not None:
        assert not with_stencil, "depth peeling cannot combine with stencil"
        assert depth_test, "depth peeling requires the depth test"
        if compare_op in (CompareOp.GREATER, CompareOp.GREATER_OR_EQUAL):
            bound_op = CompareOp.LESS
        elif compare_op in (CompareOp.LESS, CompareOp.LESS_OR_EQUAL):
            bound_op = CompareOp.GREATER
        else:
            raise ValueError(
                f"depth peeling needs an ordering depth compare "
                f"(GREATER/GEQ/LESS/LEQ), got {compare_op}"
            )
        bound_seed = z_bound.astype(jnp.float32)
        if (hp, wp) != (h, w):
            bound_seed = jnp.pad(bound_seed, ((0, hp - h), (0, wp - w)))

        kernel = functools.partial(
            _segmented_peel_kernel,
            tile_h=th,
            tile_w=tw,
            num_attrs=num_attrs,
            compare=_compare_fn(effective_compare),
            bound_compare=_compare_fn(bound_op),
            depth_write=effective_write,
            depth_clamp=depth_clamp,
            sample_offset=sample_offset,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b_max,),
            in_specs=[
                pl.BlockSpec((chunk, d_total),
                             lambda i, ty, tx, cnt, ini: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((th, tw),
                             lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((th, tw),
                             lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # z seed (aliased → out 0)
                pl.BlockSpec(memory_space=pl.ANY),  # acc seed (→ out 1)
            ],
            out_specs=[
                pl.BlockSpec((th, tw),
                             lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a_n, th, tw),
                             lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
            ],
        )
        out_z, out_acc = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((a_n, hp, wp), jnp.float32),
            ],
            # args: 4 prefetch + [rows, initz, bound, z_seed, acc_seed].
            input_output_aliases={7: 0, 8: 1},
            interpret=interpret,
        )(
            bins.blk_tile_y,
            bins.blk_tile_x,
            bins.blk_count,
            bins.blk_init,
            bins.rast_pad,
            z_seed,
            bound_seed,
            z_seed,
            acc_seed,
        )
        if (hp, wp) != (h, w):
            out_z = out_z[:h, :w]
            out_acc = out_acc[:, :h, :w]
        return out_z, out_acc

    if not with_stencil:
        kernel = functools.partial(
            _segmented_kernel,
            tile_h=th,
            tile_w=tw,
            num_attrs=num_attrs,
            compare=_compare_fn(effective_compare),
            depth_write=effective_write,
            depth_clamp=depth_clamp,
            sample_offset=sample_offset,
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b_max,),
            in_specs=[
                pl.BlockSpec((chunk, d_total), lambda i, ty, tx, cnt, ini: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # z init (aliased → out 0)
                pl.BlockSpec(memory_space=pl.ANY),  # acc init (aliased → out 1)
            ],
            out_specs=[
                pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((a_n, th, tw),
                             lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                             memory_space=pltpu.VMEM),
            ],
        )

        out_z, out_acc = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((a_n, hp, wp), jnp.float32),
            ],
            # args: 4 scalar-prefetch + [rows, initz, z_seed, acc_seed]; alias
            # the seeds over the outputs so tiles with no candidates keep
            # their init contents without dedicated init blocks.
            input_output_aliases={6: 0, 7: 1},
            interpret=interpret,
        )(
            bins.blk_tile_y,
            bins.blk_tile_x,
            bins.blk_count,
            bins.blk_init,
            bins.rast_pad,
            z_seed,
            z_seed,
            acc_seed,
        )
        if (hp, wp) != (h, w):
            out_z = out_z[:h, :w]
            out_acc = out_acc[:, :h, :w]
        return out_z, out_acc

    # -- stencil variant -------------------------------------------------------
    if stencil_back is None:
        stencil_back = stencil_front
    if init_stencil is None:
        init_stencil = jnp.zeros((h, w), jnp.int32)
    init_stencil = init_stencil.astype(jnp.int32)
    s_seed = init_stencil
    if (hp, wp) != (h, w):
        s_seed = jnp.pad(init_stencil, ((0, hp - h), (0, wp - w)))

    kernel = functools.partial(
        _segmented_stencil_kernel,
        tile_h=th,
        tile_w=tw,
        num_attrs=num_attrs,
        compare=_compare_fn(effective_compare),
        depth_write=effective_write,
        depth_clamp=depth_clamp,
        front_face_state=stencil_front,
        back_face_state=stencil_back,
        sample_offset=sample_offset,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b_max,),
        in_specs=[
            pl.BlockSpec((chunk, d_total), lambda i, ty, tx, cnt, ini: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # z seed (aliased → out 0)
            pl.BlockSpec(memory_space=pl.ANY),  # acc seed (aliased → out 1)
            pl.BlockSpec(memory_space=pl.ANY),  # stencil seed (→ out 2)
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_n, th, tw),
                         lambda i, ty, tx, cnt, ini: (0, ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, ty, tx, cnt, ini: (ty[i], tx[i]),
                         memory_space=pltpu.VMEM),
        ],
    )

    out_z, out_acc, out_s = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((a_n, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        # args: 4 prefetch + [rows, initz, inits, z_seed, acc_seed, s_seed].
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=interpret,
    )(
        bins.blk_tile_y,
        bins.blk_tile_x,
        bins.blk_count,
        bins.blk_init,
        bins.rast_pad,
        z_seed,
        s_seed,
        z_seed,
        acc_seed,
        s_seed,
    )
    if (hp, wp) != (h, w):
        out_z = out_z[:h, :w]
        out_acc = out_acc[:, :h, :w]
        out_s = out_s[:h, :w]
    return out_z, out_acc, out_s


def visibility_pass(
    bins: TileBins,
    grid: TileGrid,
    init_z: jnp.ndarray,
    init_slot: jnp.ndarray,
    depth_test: bool = True,
    depth_write: bool = True,
    compare_op: CompareOp = CompareOp.GREATER,
    interpret: Optional[bool] = None,
) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """Rasterize binned records over (init_z, init_slot) → (z, slot).

    Vulkan semantics: with depth_test off the test always passes and depth is
    never written; depth writes require test enabled (spec 27.18).
    """
    if interpret is None:
        interpret = pallas_interpret()
    h, w = grid.height, grid.width
    th, tw = grid.tile_h, grid.tile_w
    k = bins.binned_rast.shape[1]
    assert k % K_BLOCK == 0, f"bin capacity {k} must be a multiple of {K_BLOCK}"
    k_blocks = k // K_BLOCK

    effective_compare = compare_op if depth_test else CompareOp.ALWAYS
    effective_write = depth_write and depth_test

    kernel = functools.partial(
        _visibility_kernel,
        tile_h=th,
        tile_w=tw,
        compare=_compare_fn(effective_compare),
        depth_write=effective_write,
    )

    tiles_x = grid.tiles_x
    grid_dims = (grid.tiles_y, grid.tiles_x, k_blocks)

    # Mosaic constrains the last two block dims to be (multiples of the
    # tiling) OR equal to the array dims — SMEM blocks included. Hence:
    # counts as (T, 1, 1) with (1, 1, 1) blocks, and the slot id packed as a
    # 17th f32 column so the record block's trailing dim equals the array's.
    packed = jnp.concatenate(
        [bins.binned_rast, bins.binned_slot.astype(jnp.float32)[..., None]],
        axis=-1,
    )

    out_z, out_s = pl.pallas_call(
        kernel,
        grid=grid_dims,
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda ty, tx, kb: (ty * tiles_x + tx, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K_BLOCK, 17), lambda ty, tx, kb: (ty * tiles_x + tx, kb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((th, tw), lambda ty, tx, kb: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda ty, tx, kb: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((th, tw), lambda ty, tx, kb: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda ty, tx, kb: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ],
        interpret=interpret,
    )(
        bins.counts.reshape(-1, 1, 1),
        packed,
        init_z.astype(jnp.float32),
        init_slot.astype(jnp.int32),
    )
    return out_z, out_s
