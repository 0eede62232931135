"""Sort-first SPMD rendering: framebuffer row bands over a device mesh.

Each device in a 1-D mesh axis ("rows") owns an H/n-row band of the
framebuffer. Inside shard_map, the device derives its band origin from
``jax.lax.axis_index`` and rasterizes with a shifted viewport
(ops.geometry.setup_triangles(viewport=...)); vertex transform + triangle
setup are replicated — they are a tiny fraction of frame cost — and binning
naturally drops triangles outside the band. No collectives are needed during
rendering; the sharded framebuffer can stay sharded (sharded host readback)
or be gathered for presentation.

This is the renderer analog of data parallelism over the spatial dimension
(the "sp" of an ML stack); a future sort-last path (triangles sharded,
z-buffers merged with pmax-style depth compositing) would be the "tp" analog.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zenith_tpu.ops.binning import TileGrid
from zenith_tpu.ops.draw import draw_indexed
from zenith_tpu.ops import blend as blend_ops
from zenith_tpu.rhi.pipeline import GraphicPipeline


def default_mesh(n_devices: Optional[int] = None, axis: str = "rows",
                 backend: Optional[str] = None) -> Mesh:
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def row_sharding(mesh: Mesh, axis: str = "rows") -> NamedSharding:
    """Sharding for (H, W, C) framebuffers: rows split across the mesh."""
    return NamedSharding(mesh, P(axis))


def make_row_sharded_frame(
    mesh: Mesh,
    pipeline: GraphicPipeline,
    width: int,
    height: int,
    clear_color: "tuple" = (0.0, 0.0, 0.0, 1.0),
    depth_clear: float = 0.0,
    use_depth: bool = True,
    tile_h: int = 8,
    tile_w: int = 128,
    bin_capacity: int = 64,
    axis: str = "rows",
    interpret: "Optional[bool]" = None,
) -> Callable[..., Any]:
    """Build a jitted multi-chip frame step.

    Returns ``step(vertex_buffer, index_buffer, resources) -> (color, depth)``
    where color is (H, W, 4) sharded in row bands over ``mesh[axis]`` and
    depth is (H, W) likewise (or None). H must divide by the mesh size ×
    tile_h.
    """
    n = mesh.shape[axis]
    assert height % n == 0, f"height {height} must divide across {n} devices"
    shard_h = height // n
    assert shard_h % tile_h == 0, (
        f"shard height {shard_h} must be a multiple of tile_h {tile_h}"
    )
    grid = TileGrid(width=width, height=shard_h, tile_h=tile_h, tile_w=tile_w)

    def shard_body(vb, ib, resources):
        row = jax.lax.axis_index(axis)
        y0 = row * shard_h
        colors = [blend_ops.clear_color(shard_h, width, clear_color)]
        depth = blend_ops.clear_depth(shard_h, width, depth_clear) if use_depth else None
        colors, depth, _stats = draw_indexed(
            colors,
            depth,
            pipeline,
            vb,
            ib,
            resources,
            grid,
            bin_capacity=bin_capacity,
            interpret=interpret,
            viewport=(0, y0, width, height),
        )
        if use_depth:
            return colors[0], depth
        return colors[0], jnp.zeros((shard_h, width), jnp.float32)

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P()),  # geometry + resources replicated
        out_specs=(P(axis), P(axis)),  # framebuffer row bands
        check_vma=False,
    )
    return jax.jit(sharded)
