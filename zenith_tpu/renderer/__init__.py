"""Feature renderers (reference zenith-renderer/src/lib.rs:1-3)."""

from zenith_tpu.renderer.triangle import TriangleRenderer

__all__ = ["TriangleRenderer"]
