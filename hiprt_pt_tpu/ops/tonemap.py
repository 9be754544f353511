"""Tonemapping / display transforms.

Role parity with the reference's display fragment shaders
(src/Shaders/default_display.frag: scale-by-sample-count + exposure + gamma).
Runs as jnp on device; only the final uint8 image crosses to the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_accumulation(accum: jax.Array, sample_count) -> jax.Array:
    """Accumulated radiance sum → mean radiance."""
    return accum / jnp.maximum(
        jnp.asarray(sample_count, jnp.float32), 1.0
    )


def tonemap_gamma(hdr: jax.Array, exposure=1.0, gamma=2.2) -> jax.Array:
    """exposure scale + gamma encode, clamped to [0,1]
    (reference: default_display.frag)."""
    x = hdr * exposure
    x = jnp.clip(x, 0.0, None) ** (1.0 / gamma)
    return jnp.clip(x, 0.0, 1.0)


def to_uint8(img01: jax.Array) -> jax.Array:
    return (jnp.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


def luminance(rgb: jax.Array) -> jax.Array:
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )
