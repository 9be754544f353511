"""Environment-map evaluation and importance sampling (CDF + alias table).

Role parity with src/Device/includes/Envmap.h:1-248: equirectangular radiance
eval, CDF-binary-search OR alias-table texel sampling (strategy = static
option), solid-angle pdf conversion, and full bidirectional MIS against the
BSDF. Tables are built host-side in assets/envmap.py (reference:
Image.cpp:553-660).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets.scene import EnvmapData
from ..core import rng as rng_mod
from ..core.settings import (
    AmbientLightType,
    EnvmapSamplingStrategy,
    RenderOptions,
    WorldSettings,
)
from ..ops.sampling import equirect_uv_to_sphere, sphere_to_equirect_uv


def eval_envmap(
    world: WorldSettings, envmap: EnvmapData | None, d: jax.Array
) -> jax.Array:
    """Radiance arriving from direction d (N,3) → (N,3). Handles the three
    ambient modes (reference: WorldSettings.h ambient type)."""
    n = d.shape[0]
    uniform = jnp.broadcast_to(world.uniform_light_color, (n, 3))
    if envmap is None:
        is_env = world.ambient_light_type == int(AmbientLightType.ENVMAP)
        none_col = jnp.zeros((n, 3), jnp.float32)
        out = jnp.where(
            world.ambient_light_type == int(AmbientLightType.UNIFORM),
            uniform,
            none_col,
        )
        return jnp.where(is_env, none_col, out)
    # rotate world direction into envmap space
    d_env = d @ world.world_to_envmap.T
    u, v = sphere_to_equirect_uv(d_env)
    h, w = envmap.texels.shape[:2]
    # bilinear fetch with wrap in u, clamp in v
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    t00 = envmap.texels[y0i, x0i]
    t10 = envmap.texels[y0i, x1i]
    t01 = envmap.texels[y1i, x0i]
    t11 = envmap.texels[y1i, x1i]
    tex = (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )
    env_col = tex * world.envmap_intensity
    is_env = world.ambient_light_type == int(AmbientLightType.ENVMAP)
    is_uni = world.ambient_light_type == int(AmbientLightType.UNIFORM)
    return jnp.where(is_env, env_col, jnp.where(is_uni, uniform, 0.0))


def _texel_pdf_to_solid_angle(envmap: EnvmapData, texel_pdf, v):
    """Discrete texel pdf → solid-angle pdf. Texel solid angle =
    (2π/w)(π/h)sin(θ) (reference: Envmap.h pdf conversion)."""
    h, w = envmap.texels.shape[:2]
    theta = v * jnp.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-8)
    d_omega = (2.0 * jnp.pi / w) * (jnp.pi / h) * sin_t
    return texel_pdf / d_omega


def _texel_importance_pdf(envmap: EnvmapData, texel_idx):
    """Discrete probability of drawing a texel: reconstructed from the CDF."""
    prev = jnp.where(
        texel_idx > 0, envmap.cdf[jnp.maximum(texel_idx - 1, 0)], 0.0
    )
    return envmap.cdf[texel_idx] - prev


def sample_envmap(
    options: RenderOptions,
    world: WorldSettings,
    envmap: EnvmapData,
    rng_state,
    n_rays: int,
):
    """Draw one envmap direction per ray.

    Returns (rng_state, wi (N,3) world, radiance (N,3), pdf (N,) solid angle).
    """
    h, w = envmap.texels.shape[:2]
    n_texels = h * w
    rng_state, u_sel = rng_mod.next_float(rng_state)
    rng_state, u_jit1, u_jit2 = rng_mod.next_float2(rng_state)

    if options.envmap_sampling == EnvmapSamplingStrategy.ALIAS_TABLE:
        rng_state, u_alias = rng_mod.next_float(rng_state)
        idx = jnp.clip((u_sel * n_texels).astype(jnp.int32), 0, n_texels - 1)
        take_alias = u_alias >= envmap.alias_probas[idx]
        texel = jnp.where(take_alias, envmap.alias_indices[idx], idx)
    else:  # CDF binary search
        texel = jnp.clip(
            jnp.searchsorted(envmap.cdf, u_sel, side="left"), 0, n_texels - 1
        ).astype(jnp.int32)

    ty = texel // w
    tx = texel % w
    u = (tx.astype(jnp.float32) + u_jit1) / w
    v = (ty.astype(jnp.float32) + u_jit2) / h
    d_env = equirect_uv_to_sphere(u, v)
    wi = d_env @ world.envmap_to_world.T

    texel_pdf = _texel_importance_pdf(envmap, texel)
    pdf = _texel_pdf_to_solid_angle(envmap, texel_pdf, v)
    radiance = envmap.texels[ty, tx] * world.envmap_intensity
    return rng_state, wi, radiance, jnp.maximum(pdf, 0.0)


def envmap_pdf_of_direction(
    options: RenderOptions, world: WorldSettings, envmap: EnvmapData, d: jax.Array
):
    """Solid-angle pdf the sampler above would assign to direction d — for MIS
    of BSDF samples that escape to the envmap (reference: Envmap.h:77-218)."""
    h, w = envmap.texels.shape[:2]
    d_env = d @ world.world_to_envmap.T
    u, v = sphere_to_equirect_uv(d_env)
    tx = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    ty = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    texel = ty * w + tx
    texel_pdf = _texel_importance_pdf(envmap, texel)
    return _texel_pdf_to_solid_angle(envmap, texel_pdf, v)
