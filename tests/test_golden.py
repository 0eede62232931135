"""Golden-image regression: the triangle demo frame must stay byte-stable.

The golden was produced by the oracle-verified implementation (rasterizer
semantics validated against the independent NumPy reference in
test_raster.py); this test pins the END-TO-END byte output — graph, raster,
shading, blending, sRGB encode — against drift.
"""

from pathlib import Path

import numpy as np

from zenith_tpu.rhi import (
    Buffer,
    Format,
    PipelineCache,
    RhiCore,
    Texture,
    TextureDesc,
    encode_present,
)

GOLDEN = Path(__file__).parent / "golden" / "triangle_128x32_t1_25.npy"


def test_triangle_frame_matches_golden():
    from test_rendergraph import OPTS, TRI_IB, TRI_VB, H, W, build_triangle_graph

    device = RhiCore().create_render_device()
    vb = Buffer.from_numpy("tri.vb", TRI_VB)
    ib = Buffer.from_numpy("tri.ib", TRI_IB)
    tex = Texture(TextureDesc.color("swap", W, H))
    graph, out = build_triangle_graph(vb, ib, tex, 1.25)
    compiled = graph.compile(device, PipelineCache(), OPTS)
    compiled.execute(device)
    img = np.asarray(encode_present(compiled.value(out), Format.RGBA8_SRGB))

    golden = np.load(GOLDEN)
    # Allow ±1 LSB for cross-backend float rounding; byte-exact on CPU.
    diff = np.abs(img.astype(np.int16) - golden.astype(np.int16))
    assert diff.max() <= 1, f"golden drift: max LSB diff {diff.max()}"
    assert (diff > 0).mean() < 0.01
