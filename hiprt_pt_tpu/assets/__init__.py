from .scene import SceneData, build_scene
from .gltf import load_gltf
from . import image_io, envmap

__all__ = ["SceneData", "build_scene", "load_gltf", "image_io", "envmap"]
