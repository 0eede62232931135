"""Per-draw velocity (DeferredRenderer(velocity=True)): the g.prev
G-buffer plane, its prev-transform observation protocol, and the temporal
consumers (TAA reprojection, motion-blur dilation) under animated
content."""

import numpy as np
import pytest

import jax.numpy as jnp

from zenith_tpu.core.camera import Camera
from zenith_tpu.core.mathtypes import Degree, Radians
from zenith_tpu.renderer import DeferredRenderer
from zenith_tpu.renderer.scene import DirectionalLight, Scene, SceneObject
from zenith_tpu.rendergraph import RenderGraphBuilder
from zenith_tpu.rendergraph.graph import CompileOptions
from zenith_tpu.rhi import PipelineCache, RhiCore, TextureDesc

W, H = 128, 96


def _camera():
    cam = Camera(fov_y=Degree(45.0), aspect_ratio=W / H)
    cam.set_position(np.array([0.0, -30.0, 5.0], np.float32))
    return cam


def _render_planes(device, renderer, cam, options=None):
    """One deferred frame; returns (pos, prev) G-buffer planes."""
    builder = RenderGraphBuilder()
    out = builder.create(TextureDesc.color("hdr", W, H))
    renderer.render_to(builder, out, cam, W, H)
    builder.export(out)
    builder.export(renderer.gbuffer_handles["pos"])
    builder.export(renderer.gbuffer_handles["prev_pos"])
    compiled = builder.build().compile(
        device, PipelineCache(),
        options or CompileOptions(tile_h=16, tile_w=64),
    )
    compiled.execute(device)
    return (
        np.asarray(compiled.value(renderer.gbuffer_handles["pos"])),
        np.asarray(compiled.value(renderer.gbuffer_handles["prev_pos"])),
    )


class TestPrevPosPlane:
    def test_static_object_prev_equals_pos(self):
        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "c", size=6.0)
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        pos, prev = _render_planes(device, r, _camera())
        cov = pos[..., 2] != 0
        assert cov.sum() > 100
        np.testing.assert_allclose(
            prev[..., :3][cov], pos[..., :3][cov], atol=1e-5
        )

    def test_translated_object_prev_is_old_position(self):
        """Move the object between frames: every covered pixel's prev
        world position is exactly the current one minus the translation."""
        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "c", size=6.0)
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        cam = _camera()
        _render_planes(device, r, cam)  # frame 1 establishes history
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 4.0
        cube.model_matrix = m
        pos, prev = _render_planes(device, r, cam)
        cov = pos[..., 2] != 0
        delta = pos[..., :3][cov] - prev[..., :3][cov]
        np.testing.assert_allclose(
            delta, np.tile([4.0, 0.0, 0.0], (delta.shape[0], 1)), atol=1e-4
        )

    def test_observe_motion_idempotent_within_frame(self):
        """render_to twice without moving anything must not roll prev a
        second time (the update_dynamics-then-rebuild path)."""
        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "c", size=6.0)
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        cam = _camera()
        _render_planes(device, r, cam)
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 4.0
        cube.model_matrix = m
        # Two observations in the same frame (same values): one roll.
        d1 = r._motion_dynamics()
        d2 = r._motion_dynamics()
        np.testing.assert_array_equal(
            d1["def.prev_models"], d2["def.prev_models"]
        )
        assert d1["def.prev_models"][0][0, 3] == 0.0  # prev = old position

    def test_frame_dynamics_includes_prev_models(self):
        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "c", size=6.0)
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        d = r.frame_dynamics(_camera())
        assert "def.prev_models" in d

    def test_reset_motion_zeroes_velocity(self):
        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "c", size=6.0)
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        cam = _camera()
        _render_planes(device, r, cam)
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 4.0
        cube.model_matrix = m
        r.reset_motion()  # scene cut: next frame has zero velocity
        pos, prev = _render_planes(device, r, cam)
        cov = pos[..., 2] != 0
        np.testing.assert_allclose(
            prev[..., :3][cov], pos[..., :3][cov], atol=1e-5
        )


class TestSkinnedVelocity:
    def test_skinned_prev_tracks_palette(self):
        """Animate the joint palette between frames: the prev plane holds
        the PREVIOUS palette's skinned positions."""
        from zenith_tpu.sandbox.scene import skinned_tube

        device = RhiCore().create_render_device()
        tube = skinned_tube(bones=3, rings=8, sides=8)
        obj = SceneObject.from_mesh(device, tube, "tube")
        scene = Scene(objects=[obj],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        cam = Camera(fov_y=Degree(35.0), aspect_ratio=W / H)
        cam.set_position(np.array([0.0, -120.0, 25.0], np.float32))
        cam.set_yaw_pitch(Radians(0.0), Radians(-0.1))
        _render_planes(device, r, cam)
        j = obj.skin.num_joints
        pal = np.broadcast_to(np.eye(4, dtype=np.float32), (j, 4, 4)).copy()
        pal[:, 2, 3] = 3.0  # every joint translates +3 z (weights sum = 1)
        obj.joint_matrices = pal
        pos, prev = _render_planes(device, r, cam)
        cov = pos[..., 2] != 0
        assert cov.sum() > 50
        delta = pos[..., :3][cov] - prev[..., :3][cov]
        np.testing.assert_allclose(
            delta, np.tile([0.0, 0.0, 3.0], (delta.shape[0], 1)), atol=1e-3
        )


class TestMorphVelocity:
    def test_morph_prev_tracks_weights(self):
        from zenith_tpu.sandbox.scene import morphing_blob

        device = RhiCore().create_render_device()
        blob = morphing_blob(rings=8, sides=10)
        # Replace the targets with ONE constant-direction delta so the
        # per-pixel prev delta is exactly w·(2,0,0).
        nv = blob.vertices.shape[0]
        blob.morph_deltas = np.tile(
            np.array([2.0, 0.0, 0.0], np.float32), (1, nv, 1)
        )
        obj = SceneObject.from_mesh(device, blob, "blob")
        obj.morph_weights = np.zeros((1,), np.float32)
        scene = Scene(objects=[obj],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        cam = _camera()
        _render_planes(device, r, cam)
        obj.morph_weights = np.ones((1,), np.float32)
        pos, prev = _render_planes(device, r, cam)
        cov = pos[..., 2] != 0
        assert cov.sum() > 50
        delta = pos[..., :3][cov] - prev[..., :3][cov]
        np.testing.assert_allclose(
            delta, np.tile([2.0, 0.0, 0.0], (delta.shape[0], 1)), atol=1e-3
        )


class TestInstancedVelocity:
    def test_instance_offsets_prev_roll(self):
        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "i", size=3.0)
        cube.instance_offsets = np.array(
            [[-6, 0, 0], [6, 0, 0]], np.float32
        )
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=True)
        cam = _camera()
        _render_planes(device, r, cam)
        cube.instance_offsets = np.array(
            [[-6, 0, 2], [6, 0, 2]], np.float32
        )
        pos, prev = _render_planes(device, r, cam)
        cov = pos[..., 2] != 0
        assert cov.sum() > 50
        delta = pos[..., :3][cov] - prev[..., :3][cov]
        np.testing.assert_allclose(
            delta, np.tile([0.0, 0.0, 2.0], (delta.shape[0], 1)), atol=1e-4
        )


class TestDilateVelocity:
    def test_dominant_velocity_spreads_to_neighbors(self):
        from zenith_tpu.renderer.motion_blur import dilate_velocity

        vx = jnp.zeros((9, 9), jnp.float32).at[4, 4].set(10.0)
        vy = jnp.zeros((9, 9), jnp.float32)
        dx, dy = dilate_velocity(vx, vy, radius=1)
        dx = np.asarray(dx)
        # The fast pixel's velocity spread to its 3x3 neighborhood...
        assert (dx[3:6, 3:6] == 10.0).all()
        # ...and nowhere else.
        assert dx[0, 0] == 0.0 and dx[4, 7] == 0.0

    def test_zero_field_unchanged(self):
        from zenith_tpu.renderer.motion_blur import dilate_velocity

        vx = jnp.full((6, 6), 2.0)
        vy = jnp.full((6, 6), -1.0)
        dx, dy = dilate_velocity(vx, vy, radius=1)
        np.testing.assert_allclose(np.asarray(dx), 2.0)
        np.testing.assert_allclose(np.asarray(dy), -1.0)


class TestTemporalConsumers:
    def _run_taa_frame(self, velocity: bool):
        """Two frames with a translating cube + TAA; history is a flag
        color so the resolve reveals WHERE history was sampled from."""
        import jax

        from zenith_tpu.renderer import TemporalAA

        device = RhiCore().create_render_device()
        cube = SceneObject.cube(device, "c", size=6.0)
        scene = Scene(objects=[cube],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=velocity)
        cam = _camera()
        taa = TemporalAA(alpha=0.1)

        def frame():
            builder = RenderGraphBuilder()
            hdr = builder.create(TextureDesc.color("hdr", W, H))
            out = builder.create(TextureDesc.color("taa.out", W, H))
            r.render_to(builder, hdr, cam, W, H)
            taa.render_to(builder, hdr, out, cam, W, H,
                          r.gbuffer_handles)
            compiled = builder.build().compile(
                device, PipelineCache(), CompileOptions(tile_h=16, tile_w=64)
            )
            compiled.execute(device)
            taa.feedback(compiled.value(out))
            return np.asarray(compiled.value(out))

        frame()
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = 2.0
        cube.model_matrix = m
        return frame()

    def test_taa_moving_object_finite_and_differs_by_mode(self):
        a = self._run_taa_frame(velocity=True)
        b = self._run_taa_frame(velocity=False)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # The reprojection source differs (prev plane vs static-world), so
        # the resolved images must differ on the moving object.
        assert np.abs(a - b).max() > 1e-4

    def test_motion_blur_streaks_moving_object(self):
        """Static camera + translating object: with per-draw velocity the
        object's screen region blurs along x; without it the resolve is
        a no-op (camera never moved)."""
        from zenith_tpu.renderer import MotionBlur

        def run(velocity: bool):
            device = RhiCore().create_render_device()
            cube = SceneObject.cube(device, "c", size=6.0)
            scene = Scene(objects=[cube],
                          sun=DirectionalLight(cast_shadows=False))
            r = DeferredRenderer(scene, shadows=False, velocity=velocity)
            cam = _camera()
            mb = MotionBlur(samples=8, jitter=False, dilate=1)

            def frame():
                builder = RenderGraphBuilder()
                hdr = builder.create(TextureDesc.color("hdr", W, H))
                out = builder.create(TextureDesc.color("mb.out", W, H))
                r.render_to(builder, hdr, cam, W, H)
                mb.render_to(builder, hdr, out, cam, r.gbuffer_handles)
                builder.export(out)
                builder.export(hdr)
                compiled = builder.build().compile(
                    device, PipelineCache(),
                    CompileOptions(tile_h=16, tile_w=64),
                )
                compiled.execute(device)
                return (np.asarray(compiled.value(hdr)),
                        np.asarray(compiled.value(out)))

            frame()
            m = np.eye(4, dtype=np.float32)
            m[0, 3] = 3.0
            cube.model_matrix = m
            return frame()

        hdr_v, out_v = run(velocity=True)
        assert np.isfinite(out_v).all()
        # Blur changed the image (streaks) — compare against the unblurred
        # scene color.
        diff_v = np.abs(out_v[..., :3] - hdr_v[..., :3]).max()
        assert diff_v > 0.01
        hdr_s, out_s = run(velocity=False)
        # Static-world path: camera didn't move → zero velocity → no blur.
        diff_s = np.abs(out_s[..., :3] - hdr_s[..., :3]).max()
        assert diff_s < 1e-5


class TestSPMD:
    def test_velocity_gbuffer_sharded_matches_single(self, cpu_devices):
        """The velocity G-buffer under a row-band mesh: prev plane matches
        the single-device render exactly."""
        from zenith_tpu.parallel.sharding import default_mesh

        h8 = 128  # must divide mesh size (8) x tile_h (8)

        def run(options):
            device = RhiCore().create_render_device()
            cube = SceneObject.cube(device, "c", size=6.0)
            scene = Scene(objects=[cube],
                          sun=DirectionalLight(cast_shadows=False))
            r = DeferredRenderer(scene, shadows=False, velocity=True)
            cam = Camera(fov_y=Degree(45.0), aspect_ratio=W / h8)
            cam.set_position(np.array([0.0, -30.0, 5.0], np.float32))

            def frame():
                builder = RenderGraphBuilder()
                out = builder.create(TextureDesc.color("hdr", W, h8))
                r.render_to(builder, out, cam, W, h8)
                builder.export(out)
                builder.export(r.gbuffer_handles["pos"])
                builder.export(r.gbuffer_handles["prev_pos"])
                compiled = builder.build().compile(
                    device, PipelineCache(), options
                )
                compiled.execute(device)
                return (
                    np.asarray(compiled.value(r.gbuffer_handles["pos"])),
                    np.asarray(
                        compiled.value(r.gbuffer_handles["prev_pos"])
                    ),
                )

            frame()
            m = np.eye(4, dtype=np.float32)
            m[0, 3] = 4.0
            cube.model_matrix = m
            return frame()

        pos1, prev1 = run(CompileOptions(tile_h=8, tile_w=64))
        mesh = default_mesh(8, backend="cpu")
        pos8, prev8 = run(CompileOptions(tile_h=8, tile_w=64, mesh=mesh))
        # atol: interpolated world positions are O(10); band evaluation
        # reassociates the attribute math at fp32.
        np.testing.assert_allclose(pos8, pos1, atol=1e-4)
        np.testing.assert_allclose(prev8, prev1, atol=1e-4)


class TestAutoVelocity:
    """velocity=None (the default) is AUTO (VERDICT r4 weak #5): on for
    scenes with skins/morphs/device-resident instance offsets, off for
    static scenes — an animated-scene TAA app needs NO explicit flag."""

    def test_static_scene_auto_off(self):
        device = RhiCore().create_render_device()
        quad = SceneObject.quad(device, "g", size=40.0, z=0.0,
                                base_color=(1, 1, 1, 1))
        scene = Scene(objects=[quad],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False)
        assert r.velocity is False and r.scene_animated is False

    def test_skinned_scene_auto_on(self):
        from zenith_tpu.sandbox.scene import skinned_tube

        device = RhiCore().create_render_device()
        tube = skinned_tube(bones=3, rings=8, sides=8)
        obj = SceneObject.from_mesh(device, tube, "tube")
        scene = Scene(objects=[obj],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False)
        assert r.velocity is True

    def test_auto_on_publishes_prev_plane_no_flag(self):
        """The done-criterion: an animated scene rendered with NO explicit
        velocity flag publishes the prev_pos plane (TAA/motion blur pick
        it up automatically)."""
        from zenith_tpu.sandbox.scene import skinned_tube

        device = RhiCore().create_render_device()
        tube = skinned_tube(bones=3, rings=8, sides=8)
        obj = SceneObject.from_mesh(device, tube, "tube")
        scene = Scene(objects=[obj],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False)  # no velocity flag
        cam = Camera(fov_y=Degree(35.0), aspect_ratio=W / H)
        cam.set_position(np.array([0.0, -120.0, 25.0], np.float32))
        pos, prev = _render_planes(device, r, cam)
        assert "prev_pos" in r.gbuffer_handles
        assert not r.gbuffer_handles.animated_without_velocity
        # first frame: prev == current world positions (4th channels
        # differ by design: emissive vs the prev plane's w=1)
        np.testing.assert_allclose(pos[..., :3], prev[..., :3], atol=1e-5)

    def test_explicit_off_sets_advisory_flag(self):
        from zenith_tpu.sandbox.scene import skinned_tube

        device = RhiCore().create_render_device()
        tube = skinned_tube(bones=3, rings=8, sides=8)
        obj = SceneObject.from_mesh(device, tube, "tube")
        scene = Scene(objects=[obj],
                      sun=DirectionalLight(cast_shadows=False))
        r = DeferredRenderer(scene, shadows=False, velocity=False)
        assert r.velocity is False and r.scene_animated is True
        builder = RenderGraphBuilder()
        out = builder.create(TextureDesc.color("hdr", W, H))
        cam = Camera(fov_y=Degree(35.0), aspect_ratio=W / H)
        cam.set_position(np.array([0.0, -120.0, 25.0], np.float32))
        r.render_to(builder, out, cam, W, H)
        assert r.gbuffer_handles.animated_without_velocity
        assert "prev_pos" not in r.gbuffer_handles
