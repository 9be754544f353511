"""Image IO — PNG/HDR/EXR read+write and color-space helpers.

Role parity with the reference's ``Image8Bit``/``Image32Bit`` (src/Image/Image.h:
23-148: stbi/tinyexr readers, PNG/HDR writers, sRGB conversions). Backed by
imageio/PIL instead of native stbi/tinyexr.
"""

from __future__ import annotations

import os

import numpy as np


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, dtype=np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: np.ndarray) -> np.ndarray:
    c = np.clip(np.asarray(c, dtype=np.float32), 0.0, 1.0)
    return np.where(c <= 0.0031308, c * 12.92, 1.055 * (c ** (1.0 / 2.4)) - 0.055)


def read_image(path: str, linearize_srgb: bool = True) -> np.ndarray:
    """Read any supported image → (H, W, C) float32. LDR images are scaled to
    [0,1] and optionally sRGB-decoded; HDR formats pass through linear."""
    import imageio.v3 as iio

    arr = iio.imread(path)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
        if linearize_srgb:
            if arr.ndim == 3 and arr.shape[-1] == 4:
                arr = np.concatenate(
                    [srgb_to_linear(arr[..., :3]), arr[..., 3:]], axis=-1
                )
            else:
                arr = srgb_to_linear(arr)
    elif arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    else:
        arr = arr.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def read_hdr(path: str) -> np.ndarray:
    """Radiance .hdr (RGBE) → (H, W, 3) float32 linear."""
    return read_image(path, linearize_srgb=False)[..., :3]


def write_png(path: str, linear_rgb: np.ndarray, gamma_encode: bool = True):
    """(H, W, 3) linear float → 8-bit PNG (reference: Image8Bit::write_image_png)."""
    import imageio.v3 as iio

    img = np.asarray(linear_rgb, dtype=np.float32)
    if gamma_encode:
        img = linear_to_srgb(img)
    img8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    iio.imwrite(path, img8)


def write_hdr(path: str, linear_rgb: np.ndarray):
    """(H, W, 3) float32 → Radiance .hdr RGBE (pure numpy encoder; flat format,
    no RLE — every reader accepts it). reference: Image32Bit::write_image_hdr."""
    img = np.asarray(linear_rgb, dtype=np.float32)
    h, w, _ = img.shape
    maxc = img.max(axis=-1)
    valid = maxc >= 1e-32
    exp = np.zeros((h, w), dtype=np.int32)
    mant = np.zeros((h, w), dtype=np.float32)
    m, e = np.frexp(np.maximum(maxc, 1e-32))
    exp = e
    scale = np.where(valid, m * 256.0 / np.maximum(maxc, 1e-32), 0.0)
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    rgbe[..., 0] = np.clip(img[..., 0] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 1] = np.clip(img[..., 1] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 2] = np.clip(img[..., 2] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, exp + 128, 0).astype(np.uint8)
    header = f"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y {h} +X {w}\n".encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header)
        f.write(rgbe.tobytes())


def write_exr(path: str, linear_rgb: np.ndarray):  # pragma: no cover
    """EXR write if the imageio freeimage/openexr plugin is present; falls back
    to .hdr next to the requested path otherwise (tinyexr has no pip analog)."""
    try:
        import imageio.v3 as iio

        iio.imwrite(path, np.asarray(linear_rgb, dtype=np.float32))
    except Exception:
        write_hdr(os.path.splitext(path)[0] + ".hdr", linear_rgb)


def luminance(rgb: np.ndarray) -> np.ndarray:
    """Rec.709 luminance (reference: ColorRGB32F::luminance)."""
    rgb = np.asarray(rgb)
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
