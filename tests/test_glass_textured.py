"""Textured + instanced translucency (VERDICT r3 weak #3): texture content
reaches the kernel-safe blend kernel via VERTEX-rate sampling (the tint
varying), and instanced translucent draws ride the blend batch's
per-draw instancing — both previously rejected outright."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from zenith_tpu.core.camera import Camera
from zenith_tpu.core.mathtypes import Degree
from zenith_tpu.renderer import DeferredRenderer
from zenith_tpu.renderer.scene import DirectionalLight, Scene, SceneObject
from zenith_tpu.rendergraph import RenderGraphBuilder
from zenith_tpu.rendergraph.graph import CompileOptions
from zenith_tpu.rhi import Format, PipelineCache, RhiCore, TextureDesc
from zenith_tpu.rhi.resource import Texture

W, H = 128, 96


def _camera():
    cam = Camera(fov_y=Degree(45.0), aspect_ratio=W / H)
    cam.set_position(np.array([0.0, -30.0, 5.0], np.float32))
    return cam


def _render(device, scene):
    r = DeferredRenderer(scene, shadows=False)
    builder = RenderGraphBuilder()
    out = builder.create(TextureDesc.color("hdr", W, H))
    r.render_to(builder, out, _camera(), W, H)
    builder.export(out)
    compiled = builder.build().compile(
        device, PipelineCache(), CompileOptions(tile_h=16, tile_w=64)
    )
    compiled.execute(device)
    return np.asarray(compiled.value(out))


def _const_tex(name, rgba):
    px = np.broadcast_to(
        np.asarray(rgba, np.float32), (4, 4, 4)
    ).copy()
    return Texture.from_numpy(name, px, Format.RGBA32F)


class TestTexturedGlass:
    def test_constant_texture_equals_scaled_base_color(self):
        """A constant-color glass texture must blend exactly like an
        untextured pane whose base color is the componentwise product —
        vertex-rate sampling of a constant is exact."""
        device = RhiCore().create_render_device()
        base = (0.5, 0.6, 0.7, 0.5)
        texc = (0.8, 0.4, 0.2, 1.0)

        def scene(textured: bool):
            floor = SceneObject.cube(device, "floor", size=6.0)
            pane = SceneObject.cube(device, "pane", size=8.0)
            m = np.eye(4, dtype=np.float32)
            m[1, 3] = -8.0  # pane sits between camera and floor
            pane.model_matrix = m
            pane.translucent = True
            if textured:
                pane.base_color = base
                pane.base_color_texture = _const_tex("glass.const", texc)
            else:
                pane.base_color = tuple(
                    b * t for b, t in zip(base, texc)
                )
            return Scene(objects=[floor, pane],
                         sun=DirectionalLight(cast_shadows=False))

        a = _render(device, scene(True))
        b = _render(device, scene(False))
        assert np.isfinite(a).all()
        assert np.abs(a - b).max() < 1e-4
        # The glass actually covers pixels (scene differs from no-pane).
        floor_only = _render(device, Scene(
            objects=[SceneObject.cube(device, "floor", size=6.0)],
            sun=DirectionalLight(cast_shadows=False),
        ))
        assert np.abs(a - floor_only).max() > 0.01

    def test_gradient_texture_varies_across_pane(self):
        """A horizontal gradient texture shows up across the glass: the
        tint varying interpolates the per-vertex samples."""
        device = RhiCore().create_render_device()
        grad = np.ones((4, 64, 4), np.float32)
        grad[..., 0] = np.linspace(0.0, 1.0, 64)[None, :]
        grad[..., 1] = 0.0
        grad[..., 2] = 0.0
        floor = SceneObject.cube(device, "floor", size=6.0)
        pane = SceneObject.cube(device, "pane", size=8.0)
        m = np.eye(4, dtype=np.float32)
        m[1, 3] = -8.0
        pane.model_matrix = m
        pane.translucent = True
        pane.base_color = (1.0, 1.0, 1.0, 0.9)
        pane.base_color_texture = Texture.from_numpy(
            "glass.grad", grad, Format.RGBA32F
        )
        scene = Scene(objects=[floor, pane],
                      sun=DirectionalLight(cast_shadows=False))
        img = _render(device, scene)
        assert np.isfinite(img).all()
        # Red increases left→right somewhere on the pane's rows.
        mid = img[H // 2]
        reds = mid[:, 0]
        assert reds.max() - reds.min() > 0.05

    def test_two_textured_panes_blend_in_submission_order(self):
        """Two overlapping textured panes through ONE batched blend draw
        still composite in submission order (the kernel contract), with
        per-draw textures bound per draw."""
        device = RhiCore().create_render_device()

        def scene(swap: bool):
            floor = SceneObject.cube(device, "floor", size=6.0)
            p1 = SceneObject.cube(device, "p1", size=8.0)
            p2 = SceneObject.cube(device, "p2", size=8.0)
            for p, dy, col in ((p1, -6.0, (1.0, 0.2, 0.2, 0.6)),
                               (p2, -10.0, (0.2, 0.2, 1.0, 0.6))):
                m = np.eye(4, dtype=np.float32)
                m[1, 3] = dy
                p.model_matrix = m
                p.translucent = True
                p.base_color = (1.0, 1.0, 1.0, 0.6)
                p.base_color_texture = _const_tex(f"t.{p.name}", col)
            objs = [floor, p2, p1] if swap else [floor, p1, p2]
            return Scene(objects=objs,
                         sun=DirectionalLight(cast_shadows=False))

        a = _render(device, scene(False))
        b = _render(device, scene(True))
        # Depth test (GREATER, reverse-Z) kills the farther pane behind
        # the nearer one only when depth-write is off for glass — both
        # render; order changes the composite where they overlap.
        assert np.abs(a - b).max() > 1e-3


class TestInstancedGlass:
    def test_instanced_pane_matches_separate_objects(self):
        device = RhiCore().create_render_device()

        def scene_instanced():
            floor = SceneObject.cube(device, "floor", size=6.0)
            pane = SceneObject.cube(device, "pane", size=4.0)
            mi = np.eye(4, dtype=np.float32)
            mi[1, 3] = -8.0
            pane.model_matrix = mi
            pane.translucent = True
            pane.base_color = (0.3, 0.9, 0.4, 0.55)
            pane.instance_offsets = np.array(
                [[-4.0, 0.0, 0.0], [4.0, 0.0, 0.0]], np.float32
            )
            return Scene(objects=[floor, pane],
                         sun=DirectionalLight(cast_shadows=False))

        def scene_separate():
            floor = SceneObject.cube(device, "floor", size=6.0)
            objs = [floor]
            for k, dx in enumerate((-4.0, 4.0)):
                p = SceneObject.cube(device, f"pane{k}", size=4.0)
                p.translucent = True
                p.base_color = (0.3, 0.9, 0.4, 0.55)
                m = np.eye(4, dtype=np.float32)
                m[0, 3] = dx
                m[1, 3] = -8.0
                p.model_matrix = m
                objs.append(p)
            return Scene(objects=objs,
                         sun=DirectionalLight(cast_shadows=False))

        a = _render(device, scene_instanced())
        b = _render(device, scene_separate())
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_instanced_textured_glass(self):
        """Instancing + texturing compose: both panes show the texture."""
        device = RhiCore().create_render_device()
        floor = SceneObject.cube(device, "floor", size=6.0)
        pane = SceneObject.cube(device, "pane", size=4.0)
        mi = np.eye(4, dtype=np.float32)
        mi[1, 3] = -8.0
        pane.model_matrix = mi
        pane.translucent = True
        pane.base_color = (1.0, 1.0, 1.0, 0.6)
        pane.base_color_texture = _const_tex("t.inst", (1.0, 0.1, 0.1, 1.0))
        pane.instance_offsets = np.array(
            [[-4.0, 0.0, 0.0], [4.0, 0.0, 0.0]], np.float32
        )
        scene = Scene(objects=[floor, pane],
                      sun=DirectionalLight(cast_shadows=False))
        img = _render(device, scene)
        assert np.isfinite(img).all()
        # Reddened glass visible on BOTH sides of center.
        left = img[:, : W // 2, 0].max()
        right = img[:, W // 2:, 0].max()
        assert left > 0.1 and right > 0.1


class TestOpsInstancedBlend:
    def test_instanced_blend_equals_expanded_draws(self):
        """ops-level: one instanced blended draw == the same geometry
        submitted as per-instance draws (records concatenate in instance
        order)."""
        from zenith_tpu.ops.binning import TileGrid
        from zenith_tpu.ops.draw import draw_indexed_batch
        from zenith_tpu.rhi import (
            ColorAttachmentDesc,
            GraphicPipelineAttachments,
            GraphicShaderInput,
            Shader,
            attr,
            uniform,
        )
        from zenith_tpu.rhi.pipeline import (
            GraphicPipeline,
            GraphicPipelineDesc,
        )
        from zenith_tpu.rhi.state import (
            CompareOp,
            CullMode,
            DepthStencilDesc,
            GraphicPipelineState,
            RasterizationState,
            VertexLayout,
        )

        w, h = 128, 32
        grid = TileGrid(width=w, height=h, tile_h=8, tile_w=128)
        layout = VertexLayout.from_fields(("position", 3), ("rgba", 4))

        def vs(attrs, res):
            p = attrs["position"]
            n = p.shape[0]
            moved = p + attrs["inst_offset"]
            return {
                "position": jnp.concatenate(
                    [moved, jnp.ones((n, 1), jnp.float32)], 1
                ),
                "rgba": attrs["rgba"],
            }

        def vs_plain(attrs, res):
            p = attrs["position"]
            n = p.shape[0]
            return {
                "position": jnp.concatenate(
                    [p, jnp.ones((n, 1), jnp.float32)], 1
                ),
                "rgba": attrs["rgba"],
            }

        def fs(varyings, res, builtins):
            return varyings["rgba"]

        vsd = Shader.vertex(
            "ti.vs", vs,
            inputs=[attr("position", 3), attr("rgba", 4),
                    attr("inst_offset", 3, per_instance=True)],
        )
        vsd_plain = Shader.vertex(
            "ti.plain.vs", vs_plain,
            inputs=[attr("position", 3), attr("rgba", 4)],
        )
        fsd = Shader.fragment("ti.fs", fs, kernel_safe=True)

        def pipe(v):
            ds = DepthStencilDesc(
                depth_test_enable=True,
                depth_write_enable=False,
                depth_compare_op=CompareOp.GREATER,
            )
            return GraphicPipeline(GraphicPipelineDesc(
                shader_input=GraphicShaderInput(v, fsd, layout),
                state=GraphicPipelineState(
                    rasterization=RasterizationState(
                        cull_mode=CullMode.NONE
                    ),
                    depth_stencil=ds,
                ),
                attachments=GraphicPipelineAttachments(
                    color_formats=(Format.RGBA32F,), depth_format=Format.D32F
                ),
                color_attachment_descs=(
                    ColorAttachmentDesc().translucent(),
                ),
                depth_attachment_desc=ds,
            ))

        tri = jnp.asarray(
            [[0.0, -0.5, 0.5, 1, 0, 0, 0.6],
             [0.5, 0.5, 0.5, 1, 0, 0, 0.6],
             [-0.5, 0.5, 0.5, 1, 0, 0, 0.6]], jnp.float32
        )
        ib = jnp.asarray([0, 1, 2], jnp.int32)
        offs = np.array(
            [[-0.2, 0.0, 0.0], [0.2, 0.1, 0.0]], np.float32
        )

        def run_instanced():
            colors = [jnp.zeros((h, w, 4), jnp.float32)]
            depth = jnp.zeros((h, w), jnp.float32)
            colors, _d, _s = draw_indexed_batch(
                colors, depth, pipe(vsd),
                [(tri, ib, {}, {"instance_count": 2,
                                "instance_data": {"inst_offset": offs}})],
                grid,
            )
            return np.asarray(colors[0])

        def run_expanded():
            colors = [jnp.zeros((h, w, 4), jnp.float32)]
            depth = jnp.zeros((h, w), jnp.float32)
            draws = []
            for k in range(2):
                moved = tri.at[:, :3].add(jnp.asarray(offs[k]))
                draws.append((moved, ib, {}))
            colors, _d, _s = draw_indexed_batch(
                colors, depth, pipe(vsd_plain), draws, grid
            )
            return np.asarray(colors[0])

        np.testing.assert_allclose(
            run_instanced(), run_expanded(), atol=1e-5
        )

    def test_instanced_non_blend_batch_supported(self):
        from zenith_tpu.ops.binning import TileGrid
        from zenith_tpu.ops.draw import draw_indexed_batch
        from zenith_tpu.rhi import (
            ColorAttachmentDesc,
            GraphicPipelineAttachments,
            GraphicShaderInput,
            Shader,
            attr,
        )
        from zenith_tpu.rhi.pipeline import (
            GraphicPipeline,
            GraphicPipelineDesc,
        )
        from zenith_tpu.rhi.state import (
            GraphicPipelineState,
            VertexLayout,
        )

        w, h = 128, 32
        grid = TileGrid(width=w, height=h, tile_h=8, tile_w=128)
        layout = VertexLayout.from_fields(("position", 3))

        def vs(attrs, res):
            p = attrs["position"]
            return {"position": jnp.concatenate(
                [p, jnp.ones((p.shape[0], 1), jnp.float32)], 1
            )}

        def fs(varyings, res, builtins):
            hh, ww = builtins.depth.shape
            return jnp.full((hh, ww, 4), 0.5, jnp.float32)

        pipe = GraphicPipeline(GraphicPipelineDesc(
            shader_input=GraphicShaderInput(
                Shader.vertex("nb.vs", vs, inputs=[attr("position", 3)]),
                Shader.fragment("nb.fs", fs),
                layout,
            ),
            state=GraphicPipelineState(),
            attachments=GraphicPipelineAttachments(
                color_formats=(Format.RGBA32F,)
            ),
            color_attachment_descs=(ColorAttachmentDesc(),),
        ))
        tri = jnp.asarray(
            [[0.0, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5]],
            jnp.float32,
        )
        ib = jnp.asarray([0, 1, 2], jnp.int32)
        # Instanced draws now ride EVERY batch path (round 5 lifted the
        # blend-kernel-only restriction): an instanced opaque batch draw
        # must equal the same triangle drawn once (both instances
        # coincide — no instance_data offsets here).
        colors = [jnp.zeros((h, w, 4), jnp.float32)]
        out_inst, _d, _s = draw_indexed_batch(
            colors, None, pipe,
            [(tri, ib, {}, {"instance_count": 2, "instance_data": {}})],
            grid,
        )
        colors = [jnp.zeros((h, w, 4), jnp.float32)]
        out_one, _d, _s = draw_indexed_batch(
            colors, None, pipe, [(tri, ib, {})], grid,
        )
        np.testing.assert_allclose(
            np.asarray(out_inst[0]), np.asarray(out_one[0]), atol=1e-6
        )
