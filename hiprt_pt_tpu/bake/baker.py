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
    reference artifact: GlossyDielectrics tables). 2D slice at a fixed eta —
    the 3D consumed-by-the-renderer variant is bake_glossy_base_ess."""
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


def _glossy_base_albedo(cos_o, rough, eta, n_samples, seed):
    """Directional albedo of the production glossy base layer: dielectric
    GGX specular (specular=1) + white Lambert diffuse darkened by the same
    (1 - F(cos_o))·(1 - F(cos_i)) factors _eval_lobes applies — baked
    through the production terms so 1/E inverts the layer's actual furnace
    sag. Mixture-sampled 50/50 VNDF-reflection / cosine, exactly the
    reference integrand (src/Device/kernels/Baking/
    GlossyDielectricDirectionalAlbedo.h:71-120; axes differ: we keep the
    uniform cos/roughness grid + explicit GLASS_IORS axis of the glass
    tables instead of cos^2.5 / F0^4 warping)."""
    a = jnp.maximum(rough * rough, 1e-4)
    sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
    wo = jnp.stack(
        [jnp.broadcast_to(sin_o, (n_samples,)),
         jnp.zeros((n_samples,)),
         jnp.broadcast_to(cos_o, (n_samples,))],
        axis=-1,
    )
    s = rng_mod.seed(jnp.arange(n_samples, dtype=jnp.uint32), 1, seed)
    s, u1 = rng_mod.next_float(s)
    s, u2 = rng_mod.next_float(s)
    s, u3 = rng_mod.next_float(s)
    s, u4 = rng_mod.next_float(s)
    s, u5 = rng_mod.next_float(s)
    ax = jnp.full((n_samples,), a)
    h = mf.sample_vndf_spherical_caps(wo, ax, ax, u1, u2)
    wi_spec = mf.reflect_local(wo, h)
    ci = jnp.sqrt(jnp.clip(u4, 1e-7, 1.0))
    si = jnp.sqrt(jnp.maximum(0.0, 1.0 - u4))
    phi = 2.0 * jnp.pi * u5
    wi_cos = jnp.stack([si * jnp.cos(phi), si * jnp.sin(phi), ci], axis=-1)
    pick_spec = u3 < 0.5
    wi = jnp.where(pick_spec[..., None], wi_spec, wi_cos)
    cos_i = wi[..., 2]
    valid = cos_i > 1e-6

    hf = wo + wi
    hf = hf / jnp.maximum(jnp.linalg.norm(hf, axis=-1, keepdims=True), 1e-12)
    doth = jnp.maximum(jnp.sum(wo * hf, axis=-1), 1e-9)
    d = mf.ggx_ndf(hf, ax, ax)
    g2 = mf.smith_g2_height_correlated(wo, wi, ax, ax)
    F_h = fresnel_dielectric(doth, eta)
    # f_spec * cos_i = D F G2 / (4 cos_o)
    fspec_cos = d * F_h * g2 / (4.0 * jnp.maximum(cos_o, 1e-6))
    Fo = fresnel_dielectric(jnp.maximum(cos_o, 0.0), eta)
    Fi = fresnel_dielectric(jnp.maximum(cos_i, 0.0), eta)
    fdiff_cos = (1.0 - Fo) * (1.0 - Fi) * cos_i / jnp.pi

    pdf_spec = mf.vndf_pdf(wo, hf, ax, ax) / (4.0 * doth)
    pdf_cos = jnp.maximum(cos_i, 0.0) / jnp.pi
    pdf = 0.5 * pdf_spec + 0.5 * pdf_cos
    est = jnp.where(
        valid & (pdf > 1e-9), (fspec_cos + fdiff_cos) / pdf, 0.0
    )
    return jnp.clip(jnp.mean(est), 0.0, 1.5)


def bake_glossy_base_ess(res: int = 16, n_samples: int = 4096,
                         seed: int = 19):
    """3D (ior, roughness, cos) glossy-base layer albedo over the GLASS_IORS
    grid — the table PrincipledEnergyCompensation.h samples for BOTH the
    glossy-base and clearcoat compensation (reference binds it as
    bsdfs_data.glossy_dielectric_Ess, BSDFsData.h:41)."""
    cos_grid = (jnp.arange(res) + 0.5) / res
    rough_grid = (jnp.arange(res) + 0.5) / res
    out = np.zeros((len(GLASS_IORS), res, res), np.float32)
    f = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda r, c, e: _glossy_base_albedo(c, r, e, n_samples, seed),
                in_axes=(None, 0, None),
            ),
            in_axes=(0, None, None),
        )
    )
    for k, ior in enumerate(GLASS_IORS):
        out[k] = np.asarray(f(rough_grid, cos_grid, jnp.float32(ior)))
    return out


def bake_ggx_fresnel_ess(res: int = 16, n_samples: int = 4096,
                         seed: int = 23):
    """3D (ior, roughness, cos) directional albedo of the bare
    fresnel-weighted GGX lobe (reference baking capability:
    src/Device/kernels/Baking/GGXFresnelDirectionalAlbedo.h — an offline
    artifact in the reference too; its renderer never binds it)."""
    cos_grid = (jnp.arange(res) + 0.5) / res
    rough_grid = (jnp.arange(res) + 0.5) / res
    out = np.zeros((len(GLASS_IORS), res, res), np.float32)
    f = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda r, c, e: _directional_albedo_ggx(
                    c, r, n_samples, seed, eta=e
                ),
                in_axes=(None, 0, None),
            ),
            in_axes=(0, None, None),
        )
    )
    for k, ior in enumerate(GLASS_IORS):
        out[k] = np.asarray(f(rough_grid, cos_grid, jnp.float32(ior)))
    return out


def _glass_albedo(cos_o, rough, eta, n_samples, seed, thin=False):
    """Directional albedo of the FRAMEWORK's own glass lobe (compensation
    off), normalized by its smooth-surface value at the same (cos, eta) — so
    1/E exactly inverts the lobe's single-scatter roughness loss.

    The first bake attempt integrated an independent G2/G1 estimator; its
    losses did not match the lobe's actual furnace sag (table said 0.73
    where the lobe measured 0.85 at roughness 1), over-boosting by ~17%.
    Baking through the lobe itself is what the reference effectively does —
    its baking kernels run the production BSDF single-scatter eval
    (kernels/Baking/*.h)."""
    from ..core.material import MaterialBank
    from ..core.settings import RenderOptions
    from ..models import principled

    opts = RenderOptions(do_energy_compensation=False)

    def albedo_at(r):
        row = dict(
            base_color=[1.0, 1.0, 1.0],
            specular_transmission=1.0,
            roughness=float(r) if isinstance(r, float) else 0.0,
            ior=1.5,  # placeholder; eta_rel aux below is what matters
            specular=0.0,
        )
        bank = MaterialBank.from_rows([row])
        mats = bank.at_indices(jnp.zeros((n_samples,), jnp.int32)).make_safe()
        mats = mats.replace(
            roughness=jnp.full((n_samples,), jnp.float32(r)),
            thin_walled=jnp.full(
                (n_samples,), jnp.float32(1.0 if thin else 0.0)
            ),
        )
        sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
        wo = jnp.stack(
            [jnp.broadcast_to(sin_o, (n_samples,)),
             jnp.zeros((n_samples,)),
             jnp.broadcast_to(cos_o, (n_samples,))],
            axis=-1,
        )
        nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_samples, 1))
        s = rng_mod.seed(jnp.arange(n_samples, dtype=jnp.uint32), 2, seed)
        aux = {"eta_rel": jnp.full((n_samples,), jnp.float32(eta))}
        s, wi, f, pdf, _ = principled.sample(opts, mats, nrm, wo, s, aux)
        cos_i = jnp.abs(wi[..., 2])
        est = jnp.where(
            (pdf > 1e-8)[..., None],
            f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None],
            0.0,
        )
        return jnp.mean(est)

    smooth = albedo_at(0.02)
    val = albedo_at(rough)
    return jnp.clip(val / jnp.maximum(smooth, 1e-6), 0.05, 1.5)


# IOR grid of the 3D glass tables (cos x roughness x ior); reference:
# GPUBakerConstants GGX_GLASS_ESS_TEXTURE_SIZE_IOR
GLASS_IORS = (1.1, 1.2, 1.3, 1.4, 1.5, 1.7, 2.0, 2.5)


def _bake_glass_grid(res, n_samples, seed, eta_of, thin=False):
    cos_grid = (jnp.arange(res) + 0.5) / res
    rough_grid = (jnp.arange(res) + 0.5) / res
    out = np.zeros((len(GLASS_IORS), res, res), np.float32)
    f = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda r, c, e: _glass_albedo(
                    c, r, e, n_samples, seed, thin=thin
                ),
                in_axes=(None, 0, None),
            ),
            in_axes=(0, None, None),
        ),
        static_argnums=(),
    )
    for k, ior in enumerate(GLASS_IORS):
        out[k] = np.asarray(f(rough_grid, cos_grid, jnp.float32(eta_of(ior))))
    return out


def bake_ggx_glass_ess(res: int = 16, n_samples: int = 4096, seed: int = 11):
    """Entering tables Ess(ior; roughness, cos) (reference artifact:
    GGX_Ess_glass.hdr 3D stack)."""
    return _bake_glass_grid(res, n_samples, seed, lambda i: i)


def bake_ggx_glass_inv_ess(res: int = 16, n_samples: int = 4096,
                           seed: int = 13):
    """Exiting (inside->outside) tables: relative IOR 1/ior (reference:
    GGX_Ess_glass_inverse.hdr)."""
    return _bake_glass_grid(res, n_samples, seed, lambda i: 1.0 / i)


def bake_ggx_thin_glass_ess(res: int = 16, n_samples: int = 4096,
                            seed: int = 17):
    """Thin-walled glass tables (reference: GGX_Ess_thin_glass.hdr)."""
    return _bake_glass_grid(res, n_samples, seed, lambda i: i, thin=True)


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
    gres = max(res // 2, 8)
    glass = bake_ggx_glass_ess(res=gres)
    glass_inv = bake_ggx_glass_inv_ess(res=gres)
    thin = bake_ggx_thin_glass_ess(res=gres)
    glossy_base = bake_glossy_base_ess(res=gres)
    fresnel = bake_ggx_fresnel_ess(res=gres)
    for name, tab in (("Glass", glass), ("GlassInv", glass_inv),
                      ("ThinGlass", thin), ("GlossyBase", glossy_base),
                      ("Fresnel", fresnel)):
        np.save(os.path.join(out_dir, f"GGX_{name}_Ess_{gres}.npy"),
                tab.astype(np.float32))
    return {"conductor": ess, "glossy_dielectric": gd, "glass": glass,
            "glass_inv": glass_inv, "thin_glass": thin,
            "glossy_base": glossy_base, "fresnel": fresnel}
