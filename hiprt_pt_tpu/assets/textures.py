"""Texture atlas construction — native-resolution flat uint8 storage + mips.

Role parity with the reference's texture pipeline (SceneParser texture
loading + OrochiTexture sampler objects): textures keep their native
resolution (capped), are stored as uint8 with sRGB decoded at FETCH time
(ops/texture.py), and carry a box-filtered mip chain for minification.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .scene import TextureAtlas

MAX_MIPS = 12
DEFAULT_MAX_SIZE = 2048
# footprint rows cost 4x storage; above this many texels (64M = 1 GB of
# 16-byte rows) fall back to plain 4-byte texel rows + 4-tap fetches
FOOTPRINT_MAX_TEXELS = 64 * 1024 * 1024


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _to_u8(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == np.uint8:
        return arr
    return np.clip(np.asarray(arr, np.float32) * 255.0 + 0.5, 0, 255).astype(
        np.uint8
    )


def _ensure_rgba(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.shape[-1] == 3:
        pad = np.full(arr.shape[:-1] + (1,), 255 if arr.dtype == np.uint8
                      else 1.0, arr.dtype)
        arr = np.concatenate([arr, pad], -1)
    elif arr.shape[-1] == 1:
        arr = np.concatenate([arr] * 3 + [
            np.full(arr.shape[:-1] + (1,), 255 if arr.dtype == np.uint8
                    else 1.0, arr.dtype)
        ], -1)
    return arr


def _downsample2(img: np.ndarray) -> np.ndarray:
    """Box-filter halving of an (H, W, 4) uint8 image."""
    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    f = img[: h2 * 2, : w2 * 2].astype(np.float32)
    if h >= 2 and w >= 2:
        f = f.reshape(h2, 2, w2, 2, 4).mean((1, 3))
    elif h >= 2:
        f = f.reshape(h2, 2, w2, 4).mean(1)
    elif w >= 2:
        f = f.reshape(h2, w2, 2, 4).mean(2)
    return np.clip(f + 0.5, 0, 255).astype(np.uint8)


def build_texture_atlas(
    images: list,
    srgb_indices: set,
    layer_size: int = DEFAULT_MAX_SIZE,
) -> Optional[TextureAtlas]:
    """images: list of HxWx{1,3,4} uint8/float arrays (or None).
    srgb_indices: image indices holding color data (decoded at fetch).
    layer_size: maximum texture dimension — larger sources are mip-shifted
    down so level 0 fits (HBM bound)."""
    if not images or all(im is None for im in images):
        return None

    L = len(images)
    levels = []  # per image: list of (H, W, 4) mip arrays
    offsets = np.full((L, MAX_MIPS), -1, np.int64)
    widths = np.zeros((L,), np.int32)
    heights = np.zeros((L,), np.int32)
    num_levels = np.zeros((L,), np.int32)
    srgb_flags = np.zeros((L,), bool)
    total = 0
    any_alpha = False

    for i, im in enumerate(images):
        if im is None:
            arr = np.full((1, 1, 4), 255, np.uint8)
        else:
            arr = _to_u8(_ensure_rgba(np.asarray(im)))
        # cap level 0 at layer_size
        while max(arr.shape[0], arr.shape[1]) > layer_size:
            arr = _downsample2(arr)
        any_alpha = any_alpha or bool((arr[..., 3] < 255).any())
        srgb_flags[i] = i in srgb_indices
        widths[i] = arr.shape[1]
        heights[i] = arr.shape[0]
        lvl = 0
        cur = arr
        mips = []
        while lvl < MAX_MIPS:
            offsets[i, lvl] = total
            mips.append(cur)
            total += cur.shape[0] * cur.shape[1]
            lvl += 1
            if cur.shape[0] == 1 and cur.shape[1] == 1:
                break
            cur = _downsample2(cur)
        num_levels[i] = lvl
        levels.append(mips)

    footprint = total <= FOOTPRINT_MAX_TEXELS
    chunks = []
    for mips in levels:
        for cur in mips:
            if footprint:
                # footprint row: texel (y,x) carries its wrap-addressed 2x2
                # bilinear neighborhood [(y,x),(y,x+1),(y+1,x),(y+1,x+1)] so
                # a bilinear fetch is ONE 16-byte row gather instead of four
                # 4-byte gathers (XLA TPU gathers are row-rate-bound — this
                # quarters the per-kind gather rows at 4x storage)
                fp = np.concatenate(
                    [cur,
                     np.roll(cur, -1, axis=1),
                     np.roll(cur, -1, axis=0),
                     np.roll(np.roll(cur, -1, axis=0), -1, axis=1)],
                    axis=-1)
                chunks.append(fp.reshape(-1, 16))
            else:
                chunks.append(cur.reshape(-1, 4))

    texels = np.concatenate(chunks, 0)
    return TextureAtlas(
        texels=jnp.asarray(texels),
        offsets=jnp.asarray(offsets.astype(np.int32)),
        widths=jnp.asarray(widths),
        heights=jnp.asarray(heights),
        num_levels=jnp.asarray(num_levels),
        is_srgb=jnp.asarray(srgb_flags),
        has_alpha=any_alpha,
        footprint=footprint,
    )


def srgb_texture_indices(material_rows: list) -> set:
    """Texture indices carrying COLOR data (sRGB-encoded in GLTF): base
    color + emission; normal/roughness/metallic stay linear."""
    out = set()
    for r in material_rows:
        for key in ("base_color_texture_index", "emission_texture_index"):
            if key in r and r[key] is not None and r[key] >= 0:
                out.add(int(r[key]))
    return out
