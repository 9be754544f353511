from .material import MaterialBank, default_material_bank, NO_TEXTURE
from .settings import (
    RenderSettings,
    WorldSettings,
    RenderOptions,
    LightSamplingStrategy,
    EnvmapSamplingStrategy,
    BSDFOverride,
    AmbientLightType,
    RISSettings,
    ReSTIRDISettings,
)
from .camera import Camera, camera_from_lookat
from .state import RenderState, init_render_state
from . import rng

__all__ = [
    "MaterialBank",
    "default_material_bank",
    "NO_TEXTURE",
    "RenderSettings",
    "WorldSettings",
    "RenderOptions",
    "LightSamplingStrategy",
    "EnvmapSamplingStrategy",
    "BSDFOverride",
    "AmbientLightType",
    "RISSettings",
    "ReSTIRDISettings",
    "Camera",
    "camera_from_lookat",
    "RenderState",
    "init_render_state",
    "rng",
]
