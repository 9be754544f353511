"""Thin-film interference — Airy-summation iridescent Fresnel.

Role parity with src/Device/includes/BSDFs/ThinFilm.h (221 LoC, Belcour-Barla
2017 thin-film fresnel over the metal/specular lobes, controlled by
thin_film/thin_film_ior/thin_film_thickness/hue-shift parameters,
Material.h:193-199).

Model: classic two-interface Airy interference of a film of IOR n1 and
thickness d over a base, evaluated at three representative RGB wavelengths —
the phase difference 2·n1·d·cosθ1 drives the per-channel reflectance

    R(λ) = (r12² + r23² + 2 r12 r23 cos φ) / (1 + r12²r23² + 2 r12 r23 cos φ)

with amplitude coefficients r = ±sqrt(F). A hue shift rotates the effective
wavelengths (reference: thin_film_hue_shift_degrees).
"""

from __future__ import annotations

import jax.numpy as jnp

from .fresnel import fresnel_dielectric

# representative RGB wavelengths (nm)
_LAMBDA_RGB = (650.0, 550.0, 440.0)


def _amp_reflectance(cos_i, n_from, n_to):
    """Signed amplitude reflection coefficient (unpolarized approximation):
    magnitude sqrt(F), sign negative when entering a denser medium."""
    F = fresnel_dielectric(cos_i, n_to / n_from)
    sign = jnp.where(n_to > n_from, -1.0, 1.0)
    return sign * jnp.sqrt(jnp.clip(F, 0.0, 1.0))


def thin_film_reflectance(
    cos_theta0,
    film_ior,
    thickness_nm,
    base_ior,
    hue_shift_deg,
    outside_ior=1.0,
):
    """RGB reflectance of a thin film over a dielectric-ish base.
    All args (N,); returns (N,3)."""
    n0 = jnp.full_like(cos_theta0, outside_ior)
    n1 = jnp.maximum(film_ior, 1.0 + 1e-3)
    n2 = jnp.maximum(base_ior, 1.0 + 1e-3)
    cos0 = jnp.clip(cos_theta0, 1e-4, 1.0)
    sin0 = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos0 * cos0))
    sin1 = jnp.clip(n0 / n1 * sin0, 0.0, 1.0)
    cos1 = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin1 * sin1))

    r12 = _amp_reflectance(cos0, n0, n1)
    r23 = _amp_reflectance(cos1, n1, n2)

    opd = 2.0 * n1 * thickness_nm * cos1  # optical path difference (nm)
    chans = []
    for lam in _LAMBDA_RGB:
        lam_eff = lam * (1.0 + hue_shift_deg / 360.0)
        phi = 2.0 * jnp.pi * opd / jnp.maximum(lam_eff, 1.0)
        c = jnp.cos(phi)
        num = r12 * r12 + r23 * r23 + 2.0 * r12 * r23 * c
        den = 1.0 + (r12 * r23) ** 2 + 2.0 * r12 * r23 * c
        chans.append(jnp.clip(num / jnp.maximum(den, 1e-6), 0.0, 1.0))
    return jnp.stack(chans, axis=-1)
