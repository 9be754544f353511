"""Internal pixel ordering — tile-major layout for packet coherence.

The framework's canonical flat pixel order is TILE-MAJOR: the image is split
into TILE_W x TILE_H (16x8 = 128) pixel tiles and each tile's pixels are
consecutive in the flat arrays. A 128-ray traversal packet (ops/traverse.py)
then covers one compact screen tile instead of a long scanline strip, which
tightens the packet union walk dramatically.

This mirrors the reference's 8x8 thread-block launch geometry
(GPURenderer.cpp:413-418, __launch_bounds__(64)) — trading its warp coherence
for packet coherence.

All state buffers (accumulation, G-buffer, reservoirs) live in tile order;
images are unscrambled to row-major only at host readout (render/renderer.py).
Spatial algorithms (ReSTIR neighbor taps, low-res masking, denoiser) convert
through px/py coordinates computed here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

TILE_W = 16
TILE_H = 8


def is_tileable(width: int, height: int) -> bool:
    return width % TILE_W == 0 and height % TILE_H == 0


def pixel_coords(width: int, height: int):
    """px, py (jnp i32 arrays, length W*H) for the canonical flat order.
    Tile-major when the resolution allows it, row-major otherwise."""
    n = width * height
    idx = jnp.arange(n, dtype=jnp.int32)
    if not is_tileable(width, height):
        return idx % width, idx // width
    tiles_x = width // TILE_W
    tile_id = idx // (TILE_W * TILE_H)
    within = idx % (TILE_W * TILE_H)
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    px = tx * TILE_W + (within % TILE_W)
    py = ty * TILE_H + (within // TILE_W)
    return px, py


def linear_index(width: int, height: int):
    """(W*H,) i32: canonical-order position i → row-major pixel index."""
    px, py = pixel_coords(width, height)
    return py * width + px


def unscramble(flat: np.ndarray, width: int, height: int) -> np.ndarray:
    """Host-side: canonical-order flat array (N, ...) → row-major (H, W, ...)."""
    flat = np.asarray(flat)
    if not is_tileable(width, height):
        return flat.reshape(height, width, *flat.shape[1:])
    lin = np.asarray(linear_index(width, height))
    out = np.empty_like(flat)
    out[lin] = flat
    return out.reshape(height, width, *flat.shape[1:])


def scramble(img: np.ndarray) -> np.ndarray:
    """Host-side: row-major (H, W, ...) → canonical-order flat (N, ...)."""
    h, w = img.shape[:2]
    flat = np.asarray(img).reshape(h * w, *img.shape[2:])
    if not is_tileable(w, h):
        return flat
    lin = np.asarray(linear_index(w, h))
    return flat[lin]
