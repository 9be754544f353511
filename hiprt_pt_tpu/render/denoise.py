"""Denoiser — edge-avoiding à-trous wavelet filter with AOV guidance.

Role parity with the reference's Intel OIDN wrapper
(src/Renderer/OpenImageDenoiser.{h,cpp}: "RT" filter with optional
albedo/normal AOVs and CPU fallback). OIDN has no TPU build, so the denoiser
is a native-JAX edge-avoiding à-trous wavelet transform (Dammertz, Sewtz,
Hanika & Lensch, "Edge-Avoiding À-Trous Wavelet Transform for fast Global
Illumination Filtering", HPG 2010) guided by the same beauty/albedo/normal
AOVs the renderer already accumulates (FullPathTracer.h:296-326).

Runs as one jitted program over the (H, W, 3) resolved image; each iteration
doubles the tap stride (the à-trous trick), edge weights combine color,
albedo and normal differences.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 5-tap B3-spline kernel (outer product applied separably via offsets)
_KERNEL_1D = np.asarray([1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16])


@jax.jit
def suppress_fireflies(color: jax.Array, k: float = 3.0) -> jax.Array:
    """Clamp isolated HDR outliers to k x the 3x3 neighbor mean (excluding the
    center). Russian-roulette boosts + grazing NEE produce rare huge samples;
    the reference exposes per-category clamps for the same problem
    (RenderSettings.h contribution clamps)."""
    acc = jnp.zeros_like(color)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc = acc + jnp.roll(color, (dy, dx), axis=(0, 1))
    nb_mean = acc / 8.0
    limit = jnp.maximum(k * nb_mean, 0.25)
    return jnp.minimum(color, limit)


@partial(jax.jit, static_argnames=("iterations", "prefilter"))
def atrous_denoise(
    color: jax.Array,
    albedo: jax.Array | None = None,
    normal: jax.Array | None = None,
    iterations: int = 5,
    sigma_color: float = 0.5,
    sigma_albedo: float = 0.25,
    sigma_normal: float = 0.3,
    prefilter: bool = True,
) -> jax.Array:
    """Denoise an (H, W, 3) HDR image. albedo/normal: optional (H, W, 3) AOVs
    (reference: OIDN albedo/normal auxiliary images)."""
    img = suppress_fireflies(color) if prefilter else color

    def edge_weight(c_center, c_tap, sigma):
        d2 = jnp.sum((c_center - c_tap) ** 2, axis=-1)
        return jnp.exp(-d2 / jnp.maximum(sigma * sigma, 1e-8))

    for it in range(iterations):
        stride = 1 << it
        accum = jnp.zeros_like(img)
        wsum = jnp.zeros(img.shape[:2], img.dtype)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                k = _KERNEL_1D[dy + 2] * _KERNEL_1D[dx + 2]
                tap = jnp.roll(img, (dy * stride, dx * stride), axis=(0, 1))
                w = k * edge_weight(img, tap, sigma_color * (2.0 ** -it))
                if albedo is not None:
                    tap_a = jnp.roll(
                        albedo, (dy * stride, dx * stride), axis=(0, 1)
                    )
                    w = w * edge_weight(albedo, tap_a, sigma_albedo)
                if normal is not None:
                    tap_n = jnp.roll(
                        normal, (dy * stride, dx * stride), axis=(0, 1)
                    )
                    w = w * edge_weight(normal, tap_n, sigma_normal)
                accum = accum + tap * w[..., None]
                wsum = wsum + w
        img = accum / jnp.maximum(wsum, 1e-8)[..., None]
    return img


def denoise(renderer, blend: float = 1.0) -> np.ndarray:
    """Denoise a Renderer's current image using its accumulated AOVs
    (reference: RenderWindow::denoise + denoiser blend setting).
    Returns (H, W, 3) numpy, blended denoised/raw by `blend`."""
    hdr = jnp.asarray(renderer.hdr_image().copy())
    alb, nrm = renderer.aov_images()
    out = atrous_denoise(hdr, jnp.asarray(alb.copy()), jnp.asarray(nrm.copy()))
    out = blend * out + (1.0 - blend) * hdr
    return np.asarray(jax.device_get(out))
