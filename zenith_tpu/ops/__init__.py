"""The rasterizer — Pallas/XLA compute kernels.

This package is the replacement for the entire GPU fixed-function pipeline
the reference reaches through Vulkan (SURVEY.md §2.10): vertex transform and
triangle setup (geometry), the coarse rasterizer (binning), the fine
rasterizer + early-Z as a Pallas visibility kernel (raster), attribute
interpolation (shade), the texture sampler (sampling), and the output merger
(blend) — composed per draw call by ``draw``.
"""

from zenith_tpu.ops import binning, blend, draw, geometry, raster, runtime, sampling, shade
from zenith_tpu.ops.binning import (
    ENTRY_CHUNK,
    SegmentedBins,
    TileBins,
    TileGrid,
    bin_segmented,
    bin_triangles,
)
from zenith_tpu.ops.blend import apply_color_output, clear_color, clear_depth
from zenith_tpu.ops.draw import DEFAULT_BIN_CAPACITY, DrawStats, draw_indexed
from zenith_tpu.ops.geometry import (
    TriangleRecords,
    clip_near_w,
    corner_attributes,
    setup_triangles,
    setup_with_attrs,
    transform_vertices,
)
from zenith_tpu.ops.raster import (
    K_BLOCK,
    raster_interp_pass,
    raster_segmented,
    visibility_pass,
)
from zenith_tpu.ops.sampling import (
    PackedMips,
    pack_mips,
    sample_2d,
    sample_2d_lod,
    sample_shadow_pcf,
    screen_space_lod,
)
from zenith_tpu.ops.shade import finalize_attrs, resolve_varyings

__all__ = [name for name in dir() if not name.startswith("_")]
