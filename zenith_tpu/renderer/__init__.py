"""Feature renderers (reference zenith-renderer/src/lib.rs:1-3, widened to
the BASELINE.md config ladder: triangle → mesh → shadow+forward → deferred
PBR → post)."""

from zenith_tpu.ops.atmosphere import Atmosphere
from zenith_tpu.renderer.decal import Decal
from zenith_tpu.renderer.deferred import DeferredRenderer, SSAOOptions
from zenith_tpu.renderer.dof import DepthOfField
from zenith_tpu.renderer.environment import EnvironmentLight
from zenith_tpu.renderer.flare import LensFlare
from zenith_tpu.renderer.forward import ForwardShadowRenderer
from zenith_tpu.renderer.mesh import MeshRenderer
from zenith_tpu.renderer.motion_blur import MotionBlur
from zenith_tpu.renderer.particles import ParticleSystem
from zenith_tpu.renderer.probe import capture_reflection_probe
from zenith_tpu.renderer.post import (
    ColorGrade,
    FilmEffects,
    PostProcess,
    PresentEncode,
)
from zenith_tpu.renderer.ssr import ScreenSpaceReflections
from zenith_tpu.renderer.volumetric import VolumetricFog
from zenith_tpu.renderer.taa import TemporalAA
from zenith_tpu.renderer.scene import (
    DirectionalLight,
    PointLight,
    Scene,
    SceneObject,
    SpotLight,
)
from zenith_tpu.renderer.triangle import TriangleRenderer

__all__ = [
    "Atmosphere",
    "DeferredRenderer",
    "DepthOfField",
    "ColorGrade",
    "DirectionalLight",
    "EnvironmentLight",
    "FilmEffects",
    "ForwardShadowRenderer",
    "LensFlare",
    "MeshRenderer",
    "MotionBlur",
    "ParticleSystem",
    "PointLight",
    "PostProcess",
    "Decal",
    "PresentEncode",
    "capture_reflection_probe",
    "SSAOOptions",
    "Scene",
    "ScreenSpaceReflections",
    "SceneObject",
    "SpotLight",
    "TemporalAA",
    "TriangleRenderer",
    "VolumetricFog",
]
