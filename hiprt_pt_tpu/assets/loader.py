"""Scene file loading front-end — the analog of SceneParser::parse_scene_file
(src/Scene/SceneParser.cpp:22-220): parse, build the texture atlas, flatten to
SceneData, extract the camera (with bbox-default fallback)."""

from __future__ import annotations

from typing import Optional, Tuple

from ..core.camera import Camera
from ..core.material import MaterialBank
from .gltf import load_gltf
from .scene import SceneData, build_scene
from .textures import build_texture_atlas, srgb_texture_indices


def load_scene_file(
    path: str,
    aspect: Optional[float] = None,
    envmap=None,
    with_textures: bool = True,
    texture_size: int = 2048,
) -> Tuple[SceneData, Camera]:
    """Load a GLTF scene file → (SceneData on device, Camera)."""
    parsed = load_gltf(path, aspect_override=aspect)
    atlas = None
    if with_textures and parsed.images:
        atlas = build_texture_atlas(
            parsed.images,
            srgb_texture_indices(parsed.material_rows),
            layer_size=texture_size,
        )
    scene = build_scene(
        parsed.vertices,
        parsed.triangles,
        parsed.material_ids,
        MaterialBank.from_rows(parsed.material_rows),
        normals=parsed.normals,
        uvs=parsed.uvs,
        envmap=envmap,
        textures=atlas,
    )
    return scene, parsed.camera
