"""GGX microfacet building blocks — local shading frame (z = normal).

Role parity with src/Device/includes/BSDFs/Microfacet.h (GGX NDF, Smith
height-correlated masking-shadowing, VNDF sampling incl. the spherical-caps
variant of Dupuy & Benyoub 2023) used by every specular lobe of the principled
BSDF. All functions are vectorized over (...,) batches; directions are (...,3)
in the local frame.
"""

from __future__ import annotations

import jax.numpy as jnp


def ggx_ndf(h, ax, ay):
    """Anisotropic GGX normal distribution D(h)."""
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    d = (hx / ax) ** 2 + (hy / ay) ** 2 + hz * hz
    return jnp.where(
        hz > 0.0,
        1.0 / (jnp.pi * ax * ay * jnp.maximum(d * d, 1e-12)),
        0.0,
    )


def smith_lambda(w, ax, ay):
    """Smith Λ for GGX."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    az2 = (wx * ax) ** 2 + (wy * ay) ** 2
    wz2 = wz * wz
    return 0.5 * (jnp.sqrt(1.0 + az2 / jnp.maximum(wz2, 1e-12)) - 1.0)


def smith_g1(w, ax, ay):
    return 1.0 / (1.0 + smith_lambda(w, ax, ay))


def smith_g2_height_correlated(wo, wi, ax, ay):
    """Height-correlated masking-shadowing G2."""
    return 1.0 / (1.0 + smith_lambda(wo, ax, ay) + smith_lambda(wi, ax, ay))


def sample_vndf(wo, ax, ay, u1, u2):
    """Classic VNDF sampling (Heitz 2018, "Sampling the GGX Distribution of
    Visible Normals") — the reference's alternative GGX sampling variant
    (GGXSamplingVariant.VNDF)."""
    vh = jnp.stack([ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]], axis=-1)
    vh = vh / jnp.maximum(jnp.linalg.norm(vh, axis=-1, keepdims=True), 1e-12)
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-9)[..., None],
        jnp.stack(
            [-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1
        ) / jnp.sqrt(jnp.maximum(lensq, 1e-12))[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    h = jnp.stack(
        [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(nh[..., 2], 1e-9)],
        axis=-1,
    )
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


def sample_vndf_spherical_caps(wo, ax, ay, u1, u2):
    """Sample a visible normal via the spherical-caps method
    (Dupuy & Benyoub, "Sampling Visible GGX Normals with Spherical Caps", 2023;
    reference option GGX_SAMPLE_FUNCTION spherical caps, KernelOptions.h).

    wo must be in the upper hemisphere (wo.z > 0)."""
    # stretch to hemisphere configuration
    vh = jnp.stack(
        [ax * wo[..., 0], ay * wo[..., 1], wo[..., 2]], axis=-1
    )
    vh = vh / jnp.maximum(jnp.linalg.norm(vh, axis=-1, keepdims=True), 1e-12)
    # spherical cap sampling
    phi = 2.0 * jnp.pi * u1
    z = (1.0 - u2) * (1.0 + vh[..., 2]) - vh[..., 2]
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    x = sin_t * jnp.cos(phi)
    y = sin_t * jnp.sin(phi)
    c = jnp.stack([x, y, z], axis=-1) + vh
    # unstretch
    h = jnp.stack(
        [ax * c[..., 0], ay * c[..., 1], jnp.maximum(c[..., 2], 1e-9)], axis=-1
    )
    return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)


def vndf_pdf(wo, h, ax, ay):
    """pdf of a visible normal h given view wo: D_vis(h) = G1(wo) D(h) <wo,h> / wo.z."""
    d = ggx_ndf(h, ax, ay)
    g1 = smith_g1(wo, ax, ay)
    doth = jnp.maximum(jnp.sum(wo * h, axis=-1), 0.0)
    return g1 * d * doth / jnp.maximum(jnp.abs(wo[..., 2]), 1e-9)


def reflect_local(wo, h):
    return 2.0 * jnp.sum(wo * h, axis=-1, keepdims=True) * h - wo


def refract_local(wo, h, eta_rel):
    """Refract wo about h with relative IOR eta_rel = n_incident/n_transmitted.
    Returns (wt, total_internal_reflection_mask)."""
    cos_i = jnp.sum(wo * h, axis=-1)
    sin2_t = eta_rel * eta_rel * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 0.0, 1.0))
    wt = (-wo) * eta_rel[..., None] + h * (
        eta_rel * cos_i - cos_t
    )[..., None]
    wt = wt / jnp.maximum(jnp.linalg.norm(wt, axis=-1, keepdims=True), 1e-12)
    return wt, tir


def anisotropy_rotate(w, rotation):
    """Rotate tangent-plane components by the anisotropy-rotation angle
    (reference: anisotropy_rotation material param)."""
    c = jnp.cos(rotation)
    s = jnp.sin(rotation)
    x = c * w[..., 0] + s * w[..., 1]
    y = -s * w[..., 0] + c * w[..., 1]
    return jnp.stack([x, y, w[..., 2]], axis=-1)
