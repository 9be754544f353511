"""Texture atlas construction — material textures as fixed-size array layers.

Role parity with the reference's per-texture hardware sampler objects
(src/HIPRT-Orochi/OrochiTexture.{h,cpp} + texel fetch in
src/Device/includes/Texture.h). TPU has no samplers, so at load time every
material texture is resampled to one (L, S, S, 4) float32 layer stack
(PIL high-quality resize), sRGB decoded where appropriate, and fetched at
shading time with manual bilinear gathers (ops/texture.py).

sRGB semantics follow GLTF: baseColor + emissive are sRGB-encoded; normal /
metallicRoughness / occlusion are linear (reference: Texture.h sRGB handling).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .image_io import srgb_to_linear
from .scene import TextureAtlas

DEFAULT_LAYER_SIZE = 512


def build_texture_atlas(
    images: list,
    srgb_indices: set,
    layer_size: int = DEFAULT_LAYER_SIZE,
) -> Optional[TextureAtlas]:
    """images: list of HxWx4 uint8/float arrays (or None). srgb_indices: image
    indices holding color data to be sRGB-decoded."""
    if not images or all(im is None for im in images):
        return None
    try:
        from PIL import Image
    except Exception:  # pragma: no cover
        Image = None

    layers = np.zeros((len(images), layer_size, layer_size, 4), np.float32)
    srgb_flags = np.zeros((len(images),), bool)
    for i, im in enumerate(images):
        if im is None:
            layers[i] = 1.0
            continue
        arr = np.asarray(im)
        if Image is not None and arr.shape[:2] != (layer_size, layer_size):
            mode_arr = arr
            if mode_arr.dtype != np.uint8:
                mode_arr = np.clip(mode_arr * 255.0, 0, 255).astype(np.uint8)
            pil = Image.fromarray(mode_arr, "RGBA")
            pil = pil.resize((layer_size, layer_size), Image.BILINEAR)
            arr = np.asarray(pil)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        else:
            arr = arr.astype(np.float32)
        if i in srgb_indices:
            arr = np.concatenate(
                [srgb_to_linear(arr[..., :3]), arr[..., 3:4]], axis=-1
            )
            srgb_flags[i] = True
        layers[i] = arr
    has_alpha = bool((layers[..., 3] < 1.0).any())
    return TextureAtlas(
        layers=jnp.asarray(layers), is_srgb=jnp.asarray(srgb_flags),
        has_alpha=has_alpha,
    )


def srgb_texture_indices(material_rows: list) -> set:
    """Image indices referenced as color (sRGB) textures by any material."""
    srgb = set()
    for row in material_rows:
        for key in ("base_color_texture_index", "emission_texture_index"):
            if key in row and row[key] >= 0:
                srgb.add(int(row[key]))
    return srgb
