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
    variance: jax.Array | None = None,
    spp_map: jax.Array | None = None,
) -> jax.Array:
    """Denoise an (H, W, 3) HDR image. albedo/normal: optional (H, W, 3) AOVs
    (reference: OIDN albedo/normal auxiliary images).

    variance: optional (H, W) per-pixel variance of the MEAN luminance
    estimate (from the adaptive-sampling squared-luminance accumulator).
    When given, the color edge weight blends (per pixel, in log space)
    the SVGF-style exp(-|l_p - l_q| / (sigma_l * sqrt(var_3x3) + eps))
    [Schied et al. 2017] with the fixed-sigma weight, by how converged the
    pixel is (spp_map / 32 clamped to [0,1]): noisy pixels smooth by the
    variance rule, converged pixels keep the detail-preserving fixed
    sigma. Measured on the cornell curve (benchmarks/denoise_curve.py):
    better than either pure rule across 2-64 spp."""
    img = suppress_fireflies(color) if prefilter else color

    def edge_weight(c_center, c_tap, sigma):
        d2 = jnp.sum((c_center - c_tap) ** 2, axis=-1)
        return jnp.exp(-d2 / jnp.maximum(sigma * sigma, 1e-8))

    if variance is not None:
        # 3x3 gaussian-prefiltered std of the luminance mean (SVGF g3x3)
        vacc = jnp.zeros_like(variance)
        wtot = 0.0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                kk = (2.0 if dy == 0 else 1.0) * (2.0 if dx == 0 else 1.0)
                vacc = vacc + kk * jnp.roll(variance, (dy, dx), axis=(0, 1))
                wtot += kk
        std_f = jnp.sqrt(jnp.maximum(vacc / wtot, 0.0))
        conv_t = (
            jnp.clip(spp_map / 32.0, 0.0, 1.0)
            if spp_map is not None else jnp.zeros_like(variance)
        )
        if spp_map is not None:
            # at n < 2 the sample variance is identically 0 (degenerate) —
            # fall back fully to the fixed-sigma rule
            conv_t = jnp.where(spp_map < 2.0, 1.0, conv_t)

    def lum(c):
        return (0.2126 * c[..., 0] + 0.7152 * c[..., 1]
                + 0.0722 * c[..., 2])

    for it in range(iterations):
        stride = 1 << it
        accum = jnp.zeros_like(img)
        wsum = jnp.zeros(img.shape[:2], img.dtype)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                k = _KERNEL_1D[dy + 2] * _KERNEL_1D[dx + 2]
                tap = jnp.roll(img, (dy * stride, dx * stride), axis=(0, 1))
                if variance is not None:
                    # log-space per-pixel blend of the variance rule and
                    # the fixed-sigma rule by convergence t
                    dl = jnp.abs(lum(img) - lum(tap))
                    e_var = dl / (4.0 * std_f + 1e-3)
                    sig = sigma_color * (2.0 ** -it)
                    d2c = jnp.sum((img - tap) ** 2, axis=-1)
                    e_fix = d2c / jnp.maximum(sig * sig, 1e-8)
                    w = k * jnp.exp(
                        -((1.0 - conv_t) * e_var + conv_t * e_fix))
                else:
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


def collect_aovs(renderer, use_variance: bool = True):
    """Gather the denoiser inputs from a Renderer in display pixel order:
    (hdr (H,W,3) jnp, albedo (H,W,3) np, normal (H,W,3) np,
    variance-of-mean (H,W) jnp | None, spp_map (H,W) jnp | None).
    Shared by denoise() and the learned-denoiser trainer so training data
    matches inference inputs exactly."""
    from ..ops.pixel_order import unscramble

    hdr = jnp.asarray(renderer.hdr_image().copy())
    alb, nrm = renderer.aov_images()
    var = None
    spp_map = None
    if use_variance:
        st = renderer.state
        n = jnp.maximum(st.pixel_sample_count.astype(jnp.float32), 1.0)
        # variance of the mean: (E[l^2] - E[l]^2) / n
        from ..ops.tonemap import luminance as _lum_fn

        ml = _lum_fn(st.accum) / n
        v = jnp.maximum(st.accum_sq_luminance / n - ml * ml, 0.0) / n
        var = jnp.asarray(unscramble(
            np.asarray(jax.device_get(v)), renderer.width, renderer.height,
        )[::-1])
        spp_map = jnp.asarray(unscramble(
            np.asarray(jax.device_get(n)), renderer.width, renderer.height,
        )[::-1])
    return hdr, alb, nrm, var, spp_map


def denoise(renderer, blend: float = 1.0, use_variance: bool = True,
            method: str = "auto") -> np.ndarray:
    """Denoise a Renderer's current image using its accumulated AOVs
    (reference: RenderWindow::denoise + denoiser blend setting).
    Returns (H, W, 3) numpy, blended denoised/raw by `blend`.

    method: "atrous" = the wavelet filter; "nn" = the learned denoiser
    (render/denoise_nn.py, OIDN-class role) refining the wavelet output;
    "auto" = the wavelet filter. (r5 held-out measurement,
    benchmarks/train_denoiser.py with the dispersion scene excluded from
    training: the residual CNN's wins on its training scenes are marginal
    (-0.3..-0.5%) and it REGRESSES on unseen transport (+2..+6% rel-RMSE
    at 8-64 spp) — so the generalizing filter is the default and the net
    is explicit opt-in until its capacity/data reach OIDN class.)"""
    hdr, alb, nrm, var, spp_map = collect_aovs(
        renderer, use_variance=use_variance)
    alb_j = jnp.asarray(alb.copy())
    nrm_j = jnp.asarray(nrm.copy())
    out = atrous_denoise(hdr, alb_j, nrm_j, variance=var, spp_map=spp_map)
    if method == "nn":
        from . import denoise_nn

        params = denoise_nn.load_params()
        if params is not None:
            out = denoise_nn.apply_jit(
                params, hdr, out, alb_j, nrm_j, var, spp_map)
        elif method == "nn":
            raise FileNotFoundError(
                f"learned-denoiser weights missing: {denoise_nn.WEIGHTS_PATH}"
            )
    out = blend * out + (1.0 - blend) * hdr
    return np.asarray(jax.device_get(out))
