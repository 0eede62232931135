"""Asset pipeline tests: registry, serialization roundtrips, bake-cache
mtime invalidation, glTF loading (synthetic data-URI document + the real
cerberus when the reference content is mounted)."""

import base64
import json
import os
import time
from pathlib import Path

import numpy as np
import pytest

from zenith_tpu import asset as asset_mod
from zenith_tpu.asset import (
    AssetManager,
    AssetUrl,
    Material,
    Mesh,
    MeshCollection,
    TextureAsset,
    TextureFormat,
    registry,
)


@pytest.fixture(autouse=True)
def fresh_registry():
    asset_mod.initialize()
    registry().clear()
    yield
    registry().clear()


class TestRegistry:
    def test_register_get_handle(self):
        mesh = Mesh(
            AssetUrl("m/a.mesh"),
            np.zeros((3, 8), np.float32),
            np.array([0, 1, 2], np.int32),
        )
        handle = registry().register(mesh)
        assert handle.get().num_vertices == 3
        assert registry().get(AssetUrl("m/a.mesh"), Mesh) is mesh
        registry().unregister(AssetUrl("m/a.mesh"), Mesh)
        assert registry().get(AssetUrl("m/a.mesh"), Mesh) is None
        with pytest.raises(KeyError):
            handle.get()

    def test_url_semantics(self):
        url = AssetUrl("mesh/cerberus/scene.gltf")
        assert url.with_extension("mscl").path == "mesh/cerberus/scene.mscl"
        assert url.sibling("tex.png").path == "mesh/cerberus/tex.png"
        with pytest.raises(AssertionError):
            AssetUrl("/absolute/banned")


class TestSerialization:
    def test_mesh_roundtrip(self, tmp_path):
        verts = np.random.default_rng(0).uniform(size=(10, 8)).astype(np.float32)
        idx = np.arange(9, dtype=np.int32)
        mesh = Mesh(AssetUrl("m.mesh"), verts, idx, material_index=2)
        mesh.save(tmp_path / "m.mesh")
        back = Mesh.load(AssetUrl("m.mesh"), tmp_path / "m.mesh")
        np.testing.assert_array_equal(back.vertices, verts)
        np.testing.assert_array_equal(back.indices, idx)
        assert back.material_index == 2

    def test_material_with_inline_texture_roundtrip(self, tmp_path):
        px = np.random.default_rng(1).integers(0, 255, (4, 4, 4)).astype(np.uint8)
        mat = Material(
            AssetUrl("m.mat"),
            base_color_factor=(0.5, 0.25, 1.0, 1.0),
            metallic_factor=0.7,
            roughness_factor=0.3,
            base_color_texture=TextureAsset(AssetUrl("t.tex"), px),
        )
        mat.save(tmp_path / "m.mat")
        back = Material.load(AssetUrl("m.mat"), tmp_path / "m.mat")
        assert back.base_color_factor == (0.5, 0.25, 1.0, 1.0)
        assert back.metallic_factor == pytest.approx(0.7)
        np.testing.assert_array_equal(back.base_color_texture.pixels, px)
        assert back.normal_texture is None

    def test_collection_pairing_enforced(self):
        with pytest.raises(AssertionError):
            MeshCollection(AssetUrl("c.mscl"), ["a"], ["x", "y"])


def make_synthetic_gltf(path: Path):
    """A one-triangle glTF with a data-URI buffer (positions + indices)."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)
    blob = positions.tobytes() + indices.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.1, 0.2, 1.0],
            "metallicFactor": 0.4, "roughnessFactor": 0.6,
        }}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    path.write_text(json.dumps(doc))


class TestGltfAndManager:
    def test_synthetic_gltf_bake_and_cache(self, tmp_path):
        content = tmp_path / "content" / "tri"
        content.mkdir(parents=True)
        make_synthetic_gltf(content / "tri.gltf")
        mgr = AssetManager(root=tmp_path)

        handle = mgr.request_load("tri/tri.gltf")
        col = handle.get()
        assert len(col.mesh_urls) == 1
        mesh = registry().get(AssetUrl(col.mesh_urls[0]), Mesh)
        # Node translation (1,2,3) applied (improvement over the reference).
        np.testing.assert_allclose(mesh.vertices[0, :3], [1, 2, 3], atol=1e-6)
        # Flat normals generated (+Z for this CCW triangle in the XY plane).
        np.testing.assert_allclose(mesh.vertices[:, 3:6], [[0, 0, 1]] * 3, atol=1e-6)
        mat = registry().get(AssetUrl(col.material_urls[0]), Material)
        assert mat.base_color_factor == (0.9, 0.1, 0.2, 1.0)

        # Cache hit: loading again must NOT rebake (cache mtimes unchanged).
        manifest = tmp_path / "cache" / "tri" / "tri.mscl"
        mtime = manifest.stat().st_mtime_ns
        registry().clear()
        mgr.request_load("tri/tri.gltf")
        assert manifest.stat().st_mtime_ns == mtime
        assert registry().get(AssetUrl(col.mesh_urls[0]), Mesh) is not None

        # Touch the source → stale cache → rebake (manager.rs:80-115).
        time.sleep(0.01)
        os.utime(content / "tri.gltf")
        registry().clear()
        mgr.request_load("tri/tri.gltf")
        assert manifest.stat().st_mtime_ns > mtime

    @pytest.mark.skipif(
        not Path("/root/reference/content/mesh/cerberus/scene.gltf").exists(),
        reason="reference content not mounted",
    )
    def test_cerberus_bake(self, tmp_path):
        mgr = AssetManager(root="/root/reference", cache_dir=tmp_path / "cache")
        col = mgr.request_load("mesh/cerberus/scene.gltf").get()
        mesh = registry().get(AssetUrl(col.mesh_urls[0]), Mesh)
        # SURVEY.md/BASELINE.md: 27,420 vertices, indexed.
        assert mesh.num_vertices == 27420
        assert mesh.num_triangles == 33543
        assert np.isfinite(mesh.vertices).all()
        # Normals are unit length.
        n = np.linalg.norm(mesh.vertices[:, 3:6], axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-3)


class TestHotReload:
    def test_watch_and_poll_rebakes_on_touch(self, tmp_path):
        """watch() + poll_hot_reload(): touching the source triggers a
        rebake and fires the callback with the fresh handle."""
        import os
        import shutil
        import time

        from zenith_tpu.asset.manager import AssetManager
        from zenith_tpu.sandbox.mesh import default_content_root

        src_root = default_content_root()
        gltf_dir = os.path.join(src_root, "content", "mesh", "cerberus")
        if not os.path.isdir(gltf_dir):
            import pytest

            pytest.skip("cerberus content unavailable")
        root = tmp_path / "ws"
        dst = root / "content" / "mesh" / "cerberus"
        dst.parent.mkdir(parents=True)
        shutil.copytree(gltf_dir, dst)

        mgr = AssetManager(root=root, cache_dir=root / "cache")
        url = "mesh/cerberus/scene.gltf"
        mgr.request_load(url)

        seen = []
        mgr.watch(url, on_reload=seen.append)
        assert mgr.poll_hot_reload() == []  # unchanged → no work

        src = dst / "scene.gltf"
        os.utime(src, (time.time() + 5, time.time() + 5))
        reloaded = mgr.poll_hot_reload()
        assert [str(u) for u in reloaded] == [url]
        assert len(seen) == 1 and seen[0].get() is not None
        assert mgr.poll_hot_reload() == []  # settles


class TestGlbRejection:
    def test_glb_container_rejected_with_named_error(self, tmp_path):
        """Reference parity: GLB binary containers are rejected (the
        reference's buffer resolver rejects GLB bin chunks too,
        gltf_loader.rs:372-396) — with a clear error, not a parse crash."""
        import pytest

        from zenith_tpu.asset.gltf_loader import GltfLoader

        glb = tmp_path / "model.glb"
        glb.write_bytes(b"glTF" + b"\x02\x00\x00\x00" + b"\x00" * 32)
        with pytest.raises(ValueError, match="GLB"):
            GltfLoader.load(str(glb))
