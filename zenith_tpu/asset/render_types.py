"""Render-facing asset data types (reference zenith-asset/src/render.rs).

- ``Vertex`` (render.rs:10-26): position + normal + tex_coord, 8 f32 —
  matching the reference's #[repr(C)] layout, as a (N, 8) float32 array
  (TPU-friendly dense layout; VertexLayout slices named fields).
- ``Mesh`` (render.rs:28-70), ``TextureAsset`` (render.rs:110-133),
  ``Material`` (render.rs:135-176, PBR factors + textures embedded inline),
  ``MeshCollection`` (render.rs:178-223, parallel mesh/material url lists).
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Optional

import numpy as np

from zenith_tpu.asset import Asset, AssetType, AssetUrl
from zenith_tpu.rhi.formats import Format
from zenith_tpu.rhi.state import VertexLayout

# The engine-wide static vertex layout (render.rs:10-26).
Vertex = VertexLayout.from_fields(("position", 3), ("normal", 3), ("tex_coord", 2))
VERTEX_FLOATS = Vertex.stride_floats  # 8


class TextureFormat(enum.Enum):
    """(render.rs:72-108) — R8G8B8A8 maps to sRGB like the reference."""

    R8 = "r8"
    RG8 = "rg8"
    RGBA8 = "rgba8"  # sRGB content

    @property
    def bytes_per_pixel(self) -> int:
        return {"r8": 1, "rg8": 2, "rgba8": 4}[self.value]

    @property
    def channels(self) -> int:
        return self.bytes_per_pixel

    @property
    def device_format(self) -> Format:
        return {
            TextureFormat.R8: Format.R8_UNORM,
            TextureFormat.RG8: Format.RG8_UNORM,
            TextureFormat.RGBA8: Format.RGBA8_SRGB,  # render.rs:95-99
        }[self]


class Mesh(Asset):
    """(render.rs:28-70)"""

    asset_type = AssetType.MESH

    def __init__(self, url: AssetUrl, vertices: np.ndarray, indices: np.ndarray,
                 material_index: int = 0):
        super().__init__(url)
        assert vertices.ndim == 2 and vertices.shape[1] == VERTEX_FLOATS
        self.vertices = np.ascontiguousarray(vertices, dtype=np.float32)
        self.indices = np.ascontiguousarray(indices, dtype=np.int32).reshape(-1)
        self.material_index = int(material_index)

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0] // 3

    def arrays(self) -> "Dict[str, np.ndarray]":
        return {"vertices": self.vertices, "indices": self.indices}

    def metadata(self) -> "Dict[str, Any]":
        return {"material_index": self.material_index}

    @classmethod
    def from_parts(cls, url, arrays, metadata):
        return cls(url, arrays["vertices"], arrays["indices"],
                   metadata.get("material_index", 0))


class TextureAsset(Asset):
    """CPU-side pixels at rest (render.rs:110-133)."""

    asset_type = AssetType.TEXTURE

    def __init__(self, url: AssetUrl, pixels: np.ndarray,
                 format: TextureFormat = TextureFormat.RGBA8):
        super().__init__(url)
        if pixels.ndim == 2:
            pixels = pixels[..., None]
        self.pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
        self.format = format

    @property
    def width(self) -> int:
        return self.pixels.shape[1]

    @property
    def height(self) -> int:
        return self.pixels.shape[0]

    def arrays(self):
        return {"pixels": self.pixels}

    def metadata(self):
        return {"format": self.format.value}

    @classmethod
    def from_parts(cls, url, arrays, metadata):
        return cls(url, arrays["pixels"], TextureFormat(metadata["format"]))


class Material(Asset):
    """PBR material with factors + textures embedded inline
    (render.rs:135-176 embeds texture payloads in the material)."""

    asset_type = AssetType.MATERIAL

    def __init__(
        self,
        url: AssetUrl,
        base_color_factor=(1.0, 1.0, 1.0, 1.0),
        metallic_factor: float = 1.0,
        roughness_factor: float = 1.0,
        emissive_factor=(0.0, 0.0, 0.0),
        base_color_texture: "Optional[TextureAsset]" = None,
        metallic_roughness_texture: "Optional[TextureAsset]" = None,
        normal_texture: "Optional[TextureAsset]" = None,
        emissive_texture: "Optional[TextureAsset]" = None,
    ):
        super().__init__(url)
        self.base_color_factor = tuple(float(c) for c in base_color_factor)
        self.metallic_factor = float(metallic_factor)
        self.roughness_factor = float(roughness_factor)
        self.emissive_factor = tuple(float(c) for c in emissive_factor)
        self.base_color_texture = base_color_texture
        self.metallic_roughness_texture = metallic_roughness_texture
        self.normal_texture = normal_texture
        self.emissive_texture = emissive_texture

    _TEX_SLOTS = (
        "base_color_texture",
        "metallic_roughness_texture",
        "normal_texture",
        "emissive_texture",
    )

    def arrays(self):
        out = {}
        for slot in self._TEX_SLOTS:
            tex = getattr(self, slot)
            if tex is not None:
                out[f"{slot}.pixels"] = tex.pixels
        return out

    def metadata(self):
        meta: Dict[str, Any] = {
            "base_color_factor": list(self.base_color_factor),
            "metallic_factor": self.metallic_factor,
            "roughness_factor": self.roughness_factor,
            "emissive_factor": list(self.emissive_factor),
        }
        for slot in self._TEX_SLOTS:
            tex = getattr(self, slot)
            if tex is not None:
                meta[f"{slot}.format"] = tex.format.value
        return meta

    @classmethod
    def from_parts(cls, url, arrays, metadata):
        kwargs: Dict[str, Any] = {}
        for slot in cls._TEX_SLOTS:
            key = f"{slot}.pixels"
            if key in arrays:
                kwargs[slot] = TextureAsset(
                    url.sibling(f"{url.path}.{slot}"),
                    arrays[key],
                    TextureFormat(metadata[f"{slot}.format"]),
                )
        return cls(
            url,
            base_color_factor=metadata["base_color_factor"],
            metallic_factor=metadata["metallic_factor"],
            roughness_factor=metadata["roughness_factor"],
            emissive_factor=metadata["emissive_factor"],
            **kwargs,
        )


class MeshCollection(Asset):
    """Parallel mesh/material url lists (render.rs:178-223)."""

    asset_type = AssetType.MESH_COLLECTION

    def __init__(self, url: AssetUrl, mesh_urls: "list[str]",
                 material_urls: "list[str]"):
        super().__init__(url)
        assert len(mesh_urls) == len(material_urls), (
            "mesh/material lists must pair 1:1 (gltf_loader.rs:343)"
        )
        self.mesh_urls = list(mesh_urls)
        self.material_urls = list(material_urls)

    def arrays(self):
        return {}

    def metadata(self):
        return {"mesh_urls": self.mesh_urls, "material_urls": self.material_urls}

    @classmethod
    def from_parts(cls, url, arrays, metadata):
        return cls(url, metadata["mesh_urls"], metadata["material_urls"])
