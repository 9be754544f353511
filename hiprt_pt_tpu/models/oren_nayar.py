"""Oren-Nayar rough diffuse BRDF (reference: src/Device/includes/BSDFs/OrenNayar.h
with the A/B coefficients of Material.h:73-78)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.material import oren_nayar_AB
from ..ops.sampling import INV_PI, sample_cosine_hemisphere, to_local


def eval_pdf(base_color, sigma, n, wo, wi):
    """Qualitative Oren-Nayar model. Returns (f (N,3), pdf (N,))."""
    lo = to_local(wo, n)
    li = to_local(wi, n)
    cos_o = lo[..., 2]
    cos_i = li[..., 2]
    valid = (cos_i > 1e-6) & (cos_o > 1e-6)
    A, B = oren_nayar_AB(sigma)
    sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    # cos(phi_i - phi_o) from the azimuthal projections
    denom = jnp.maximum(sin_i * sin_o, 1e-7)
    cos_dphi = jnp.clip(
        (li[..., 0] * lo[..., 0] + li[..., 1] * lo[..., 1]) / denom, -1.0, 1.0
    )
    sin_alpha = jnp.maximum(sin_i, sin_o)
    tan_beta = jnp.minimum(sin_i, sin_o) / jnp.maximum(
        jnp.minimum(cos_i, cos_o), 1e-7
    )
    fr = INV_PI * (A + B * jnp.maximum(0.0, cos_dphi) * sin_alpha * tan_beta)
    f = jnp.where(valid[..., None], base_color * fr[..., None], 0.0)
    pdf = jnp.where(valid, cos_i * INV_PI, 0.0)
    return f, pdf


def sample(base_color, sigma, n, wo, u1, u2):
    wi, pdf = sample_cosine_hemisphere(n, u1, u2)
    f, _ = eval_pdf(base_color, sigma, n, wo, wi)
    return wi, f, pdf
