"""Sampling primitives and MIS heuristics (vectorized).

Role parity with src/Device/includes/Sampling.h:1-217 and ONB.h: orthonormal
bases, cosine-hemisphere/disk sampling, Hammersley points, balance/power MIS
heuristics, uniform triangle/area-light sampling (LightUtils.h:13-101).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi


def build_onb(n):
    """Branchless ONB from a unit normal (Duff et al. 2017, JCGT — the standard
    revised-ONB construction). n: (...,3) → (tangent, bitangent)."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(local_dir, n):
    """Local (z-up) direction → world around normal n."""
    t, b = build_onb(n)
    return (
        local_dir[..., 0:1] * t
        + local_dir[..., 1:2] * b
        + local_dir[..., 2:3] * n
    )


def to_local(world_dir, n):
    t, b = build_onb(n)
    return jnp.stack(
        [
            jnp.sum(world_dir * t, axis=-1),
            jnp.sum(world_dir * b, axis=-1),
            jnp.sum(world_dir * n, axis=-1),
        ],
        axis=-1,
    )


def sample_cosine_hemisphere(n, u1, u2):
    """Cosine-weighted hemisphere around n. Returns (dir, pdf)."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    local = jnp.stack([x, y, z], axis=-1)
    d = to_world(local, n)
    pdf = jnp.maximum(z, 1e-8) * INV_PI
    return d, pdf


def sample_disk(u1, u2):
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return r * jnp.cos(phi), r * jnp.sin(phi)


def sample_uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_triangle(v0, e1, e2, u1, u2):
    """Uniform point on triangle (sqrt warp). Returns (point, geometric normal
    (unnormalized = 2*area weighted))."""
    su1 = jnp.sqrt(u1)
    b0 = 1.0 - su1
    b1 = u2 * su1
    p = v0 + e1 * b0[..., None] + e2 * b1[..., None]
    ng = jnp.cross(e1, e2)
    return p, ng


def radical_inverse_base2(bits):
    """Van der Corput radical inverse for Hammersley points."""
    bits = bits.astype(jnp.uint32)
    bits = (bits << jnp.uint32(16)) | (bits >> jnp.uint32(16))
    bits = ((bits & jnp.uint32(0x55555555)) << jnp.uint32(1)) | (
        (bits & jnp.uint32(0xAAAAAAAA)) >> jnp.uint32(1)
    )
    bits = ((bits & jnp.uint32(0x33333333)) << jnp.uint32(2)) | (
        (bits & jnp.uint32(0xCCCCCCCC)) >> jnp.uint32(2)
    )
    bits = ((bits & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | (
        (bits & jnp.uint32(0xF0F0F0F0)) >> jnp.uint32(4)
    )
    bits = ((bits & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | (
        (bits & jnp.uint32(0xFF00FF00)) >> jnp.uint32(8)
    )
    return bits.astype(jnp.float32) * 2.3283064365386963e-10


def hammersley_2d(i, n):
    return i.astype(jnp.float32) / n, radical_inverse_base2(i)


def balance_heuristic(pdf_a, pdf_b):
    """MIS balance heuristic (reference: Sampling.h power/balance heuristics)."""
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-12)


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-12)


def reflect(d, n):
    """Mirror reflect direction d (pointing away from surface) about n."""
    return 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n - d


def sphere_to_equirect_uv(d):
    """Unit direction → equirectangular (u, v) in [0,1)^2; v=0 is +Y pole
    (matches the reference's envmap parameterization, Envmap.h)."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    u = (phi / TWO_PI) % 1.0
    v = theta / jnp.pi
    return u, v


def equirect_uv_to_sphere(u, v):
    theta = v * jnp.pi
    phi = u * TWO_PI
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)], axis=-1)
