"""Layered principled BSDF — eval / sample / pdf, fully vectorized.

Role parity with src/Device/includes/BSDFs/Principled.h (1195 LoC layered
BSDF: coat GGX → sheen → {metal GGX w/ F82 tint, specular GGX dielectric,
glass GGX, diffuse Oren-Nayar} with layer throughput compositing, lobe
weights + sampling probabilities, eval/sample entry points).

TPU-first structure (SURVEY.md §7.2 hard part #2): every lobe is evaluated
branchlessly for the whole wavefront and blended by weights; sampling picks a
lobe per ray with a `jnp.where` ladder over the lobe-probability CDF and the
combined pdf is the probability-weighted sum of all lobe pdfs (one-sample MIS),
so eval and sample are exactly consistent.

Lobe model:
  f = coat·f_coat
    + coat_att · [ sheen·f_sheen
                 + metallic·f_metal(F82-tint)
                 + (1-metallic)·trans·f_glass(Walter07 reflect+refract)
                 + (1-metallic)·(1-trans)·(f_specular + (1-F)·f_diffuse(ON)) ]
where coat_att accounts for light passing the coat interface twice and
coat darkening (reference: Principled.h:493,717).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..core.material import MaterialBank, get_alphas, oren_nayar_AB
from ..core.settings import GGXSamplingVariant, RenderOptions
from ..core import rng as rng_mod
from ..ops.sampling import INV_PI, build_onb
from . import microfacet as mf
from .fresnel import f82_tint, fresnel_dielectric

_MIN_P = 1e-4

# Baked GGX single-scattering directional albedo Ess(roughness, cos_theta) —
# regenerate with bake/baker.py (reference: data/BRDFsData GGX_Conductor LUT +
# MicrofacetEnergyCompensation.h Turquin-2019 compensation)
_ESS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "bake", "data_ggx_conductor_ess_32.npy"
)
try:
    _GGX_ESS = np.load(_ESS_PATH).astype(np.float32)
except Exception:  # pragma: no cover — LUT not baked yet
    _GGX_ESS = np.ones((32, 32), np.float32)

# Fitted sheen LTC (Ai, Bi, R) polynomial coefficients over
# (cos_theta_o, alpha) — OWN fit against a volumetric SGGX fiber-slab
# reference (bake/sheen_ltc_fit.py; reference parity: SheenLTC.h +
# SheenLTCFittedParameters.h Zeltner-2022 fitted table). Shipped as 8x8
# CHEBYSHEV polys T_i(2*cos-1)*T_j(2*alpha-1) — bake/sheen_ltc_fit.py
# fit_poly rejects the monomial basis for f32 stability; table gathers at
# wavefront width are ~23 ms on TPU so the hot path is gather-free
# (weighted poly rms vs the fitted table <= 0.007). Missing file falls
# back to the analytic Charlie lobe.
_SHEEN_LTC_POLY_PATH = os.path.join(
    os.path.dirname(__file__), "..", "bake", "data_sheen_ltc_poly.npy"
)
try:
    _SHEEN_LTC_POLY = np.load(_SHEEN_LTC_POLY_PATH).astype(np.float32)
except Exception:  # pragma: no cover — fit not run yet
    _SHEEN_LTC_POLY = None

# 3D glass tables (ior, roughness, cos) — bake/baker.py bake_ggx_glass_*
# (reference: GGX_Ess_glass[.inverse]/thin .hdr stacks consumed by
# MicrofacetEnergyCompensation.h get_GGX_energy_compensation_dielectrics)
_GLASS_IORS = np.asarray([1.1, 1.2, 1.3, 1.4, 1.5, 1.7, 2.0, 2.5], np.float32)


def _load_glass(name):
    path = os.path.join(os.path.dirname(__file__), "..", "bake", name)
    try:
        return np.load(path).astype(np.float32)
    except Exception:  # pragma: no cover
        return np.ones((len(_GLASS_IORS), 16, 16), np.float32)


_GLASS_ESS = _load_glass("data_ggx_glass_ess_16.npy")
_GLASS_INV_ESS = _load_glass("data_ggx_glass_inv_ess_16.npy")
_THIN_GLASS_ESS = _load_glass("data_ggx_thin_glass_ess_16.npy")
# glossy-base layer albedo (spec + darkened diffuse), the table
# PrincipledEnergyCompensation.h binds as glossy_dielectric_Ess and samples
# for both the glossy-base and clearcoat compensation
_GLOSSY_BASE_ESS = _load_glass("data_glossy_base_ess_16.npy")
# fused (selector, ior, rough, cos) stack: ONE 8-gather trilinear lookup per
# eval instead of three (a separate lookup per table tripled the eval's
# gather count and cost 3x on the full-BSDF bench)
_GLASS_ALL = np.stack(
    [_GLASS_ESS, _GLASS_INV_ESS, _THIN_GLASS_ESS, _GLOSSY_BASE_ESS], 0
)


def _fit_glass_poly():
    """Gather-free tensor-polynomial fit of the glass Ess tables.

    Even the fused trilinear lookup costs 8 per-ray gathers per BSDF eval —
    ~2x on the full-principled bench (a (N,) gather is HBM-latency-bound
    regardless of table size). The tables are smooth except the exiting
    table's TIR cliff, so a (5,5,3)-degree tensor polynomial per selector
    fits enter/thin to ~4%/8% max and exit to ~19% max in the (noisy) TIR
    corner; options.glass_compensation_exact keeps the table path for
    quality-critical renders."""
    res = _GLASS_ESS.shape[1]
    cos = (np.arange(res) + 0.5) / res
    rough = (np.arange(res) + 0.5) / res
    iorp = (_GLASS_IORS - 1.0) / 1.5
    DR, DC, DI = 5, 5, 3
    II, RR, CC = np.meshgrid(iorp, rough, cos, indexing="ij")

    def design(r_, c_, i_):
        cols = []
        for a in range(DR):
            for b in range(DC):
                for g in range(DI):
                    cols.append((r_ ** a) * (c_ ** b) * (i_ ** g))
        return np.stack(cols, -1)

    A = design(RR.ravel(), CC.ravel(), II.ravel())
    coefs = []
    for t in (_GLASS_ESS, _GLASS_INV_ESS, _THIN_GLASS_ESS,
              _GLOSSY_BASE_ESS):
        y = np.clip(t, 0.2, 1.0).ravel()
        c, *_ = np.linalg.lstsq(A, y, rcond=None)
        coefs.append(c.astype(np.float32))
    return np.stack(coefs, 0), (DR, DC, DI)


_GLASS_POLY, _GLASS_POLY_DEG = _fit_glass_poly()


def _glass_ess_poly(rough, cos_o, ior, sel):
    """Evaluate the fitted polynomial — pure VPU math, zero gathers."""
    DR, DC, DI = _GLASS_POLY_DEG
    ip = jnp.clip((ior - 1.0) / 1.5, 0.0, 1.0)
    coef = jnp.asarray(_GLASS_POLY)  # (4, DR*DC*DI)
    # per-ray coefficient selection is 4 static branches blended by masks
    # (sel is tiny-cardinality; no gather needed). Passing a Python int for
    # sel folds the chain to a single coefficient row at trace time.
    c0 = coef[0]
    c1 = coef[1]
    c2 = coef[2]
    c3 = coef[3]
    out = jnp.zeros_like(rough)
    k = 0
    ra = jnp.ones_like(rough)
    for a in range(DR):
        cb = jnp.ones_like(cos_o)
        for b in range(DC):
            ig = jnp.ones_like(ip)
            for g in range(DI):
                if isinstance(sel, int):
                    ck = (c0, c1, c2, c3)[sel][k]
                else:
                    ck = jnp.where(
                        sel == 0,
                        c0[k],
                        jnp.where(
                            sel == 1, c1[k],
                            jnp.where(sel == 2, c2[k], c3[k]),
                        ),
                    )
                out = out + ck * ra * cb * ig
                k += 1
                ig = ig * ip
            cb = cb * cos_o
        ra = ra * rough
    return jnp.clip(out, 0.2, 1.0)


def _fit_conductor_poly():
    """Gather-free polynomial fit of the conductor Ess table.

    The bilinear table path costs 4 per-ray gathers per lookup and the metal
    lobe does two lookups per eval — measured ~46 ms of the ~162 ms dense
    per-bounce shading body at 540p (dead-lane ablation, v5e). The table is
    smooth, so a (7,7)-degree polynomial fits to 2.7% max abs / 3.3% max
    boost error; options.glass_compensation_exact keeps the table path."""
    res_r, res_c = _GGX_ESS.shape
    rough = (np.arange(res_r) + 0.5) / res_r
    cos = (np.arange(res_c) + 0.5) / res_c
    DR, DC = 7, 7
    RR, CC = np.meshgrid(rough, cos, indexing="ij")
    A = np.stack(
        [(RR.ravel() ** a) * (CC.ravel() ** b)
         for a in range(DR) for b in range(DC)], -1,
    )
    y = np.clip(_GGX_ESS, 0.05, 1.0).ravel()
    c, *_ = np.linalg.lstsq(A, y, rcond=None)
    return c.astype(np.float32), (DR, DC)


_CONDUCTOR_POLY, _CONDUCTOR_POLY_DEG = _fit_conductor_poly()


def _ess_poly(rough, cos_o):
    """Fitted-polynomial Ess(roughness, cos) — pure VPU math, zero gathers."""
    DR, DC = _CONDUCTOR_POLY_DEG
    coef = _CONDUCTOR_POLY
    out = jnp.zeros_like(rough)
    k = 0
    ra = jnp.ones_like(rough)
    for a in range(DR):
        cb = jnp.ones_like(cos_o)
        for b in range(DC):
            out = out + float(coef[k]) * ra * cb
            k += 1
            cb = cb * cos_o
        ra = ra * rough
    return jnp.clip(out, 0.05, 1.0)


def _ess_lookup(rough, cos_o):
    """Bilinear lookup of Ess(roughness, cos). Both args (N,) in [0,1]."""
    res_r, res_c = _GGX_ESS.shape
    table = jnp.asarray(_GGX_ESS.reshape(-1))
    r = jnp.clip(rough * res_r - 0.5, 0.0, res_r - 1.0)
    c = jnp.clip(cos_o * res_c - 0.5, 0.0, res_c - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, res_r - 1)
    c1 = jnp.minimum(c0 + 1, res_c - 1)
    fr = r - r0
    fc = c - c0
    t00 = table[r0 * res_c + c0]
    t01 = table[r0 * res_c + c1]
    t10 = table[r1 * res_c + c0]
    t11 = table[r1 * res_c + c1]
    return (
        t00 * (1 - fr) * (1 - fc)
        + t01 * (1 - fr) * fc
        + t10 * fr * (1 - fc)
        + t11 * fr * fc
    )


def _to_local(n, w):
    t, b = build_onb(n)
    return jnp.stack(
        [
            jnp.sum(w * t, axis=-1),
            jnp.sum(w * b, axis=-1),
            jnp.sum(w * n, axis=-1),
        ],
        axis=-1,
    )


def _to_world(n, w):
    t, b = build_onb(n)
    return w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * n


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


# ---------------------------------------------------------------- lobes


def _ggx_reflection_lobe(wo, wi, ax, ay):
    """Shared GGX reflection term D·G2/(4 cos_o cos_i) (no Fresnel) + VNDF pdf.
    Valid only when wo.z>0 and wi.z>0."""
    valid = (wo[..., 2] > 1e-6) & (wi[..., 2] > 1e-6)
    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    h = jnp.where(h[..., 2:3] < 0.0, -h, h)
    d = mf.ggx_ndf(h, ax, ay)
    g2 = mf.smith_g2_height_correlated(wo, wi, ax, ay)
    denom = 4.0 * jnp.maximum(wo[..., 2] * wi[..., 2], 1e-9)
    spec = jnp.where(valid, d * g2 / denom, 0.0)
    doth = jnp.maximum(jnp.sum(wo * h, axis=-1), 1e-9)
    pdf = jnp.where(valid, mf.vndf_pdf(wo, h, ax, ay) / (4.0 * doth), 0.0)
    cos_h = jnp.sum(wo * h, axis=-1)
    return spec, pdf, cos_h, valid


def _sheen_ltc_params(cos_o, sheen_roughness):
    """(Ai, Bi, R) of the fitted sheen LTC at (cos_theta_o, alpha) — the
    8x8 CHEBYSHEV polynomials from bake/sheen_ltc_fit.py (bounded O(1)
    coefficients stay exact in f32; pure VPU, no table gather)."""
    deg = _SHEEN_LTC_POLY.shape[1]

    def cheb(x):
        t = 2.0 * jnp.clip(x, 0.0, 1.0) - 1.0
        Ts = [jnp.ones_like(t), t]
        for _ in range(2, deg):
            Ts.append(2.0 * t * Ts[-1] - Ts[-2])
        return Ts[:deg]

    Tc = cheb(cos_o)
    Ta = cheb(sheen_roughness)
    out = []
    for ch in range(3):
        co = _SHEEN_LTC_POLY[ch]
        acc = 0.0
        for i in range(deg):
            row = 0.0
            for j in range(deg):
                row = row + float(co[i, j]) * Ta[j]
            acc = acc + row * Tc[i]
        out.append(acc)
    Ai = jnp.maximum(out[0], 1e-3)
    Bi = out[1]
    R = jnp.clip(out[2], 0.0, 1.0)
    return Ai, Bi, R


def _sheen_view_frame(wo):
    """cos/sin of the view azimuth — the LTC is fitted in the standard
    frame with the view direction at phi = 0 (SheenLTC.h get_phi)."""
    rho = jnp.sqrt(wo[..., 0] ** 2 + wo[..., 1] ** 2)
    safe = rho > 1e-8
    c = jnp.where(safe, wo[..., 0] / jnp.maximum(rho, 1e-8), 1.0)
    s = jnp.where(safe, wo[..., 1] / jnp.maximum(rho, 1e-8), 0.0)
    return c, s


def _sheen_lobe_ltc(wo, wi, sheen_roughness):
    """Fitted-LTC sheen (own SGGX-slab fit; reference: SheenLTC.h:24-124
    eval path). f = R * D(wi) / cos_i with D the transformed cosine;
    pdf = D (the sampler draws from the same D)."""
    valid = (wo[..., 2] > 1e-6) & (wi[..., 2] > 1e-6)
    Ai, Bi, R = _sheen_ltc_params(wo[..., 2], sheen_roughness)
    c, s = _sheen_view_frame(wo)
    # rotate wi so the view sits at phi=0, then apply M^-1
    x = c * wi[..., 0] + s * wi[..., 1]
    y = -s * wi[..., 0] + c * wi[..., 1]
    z = wi[..., 2]
    xp = x * Ai + z * Bi
    yp = y * Ai
    l2 = jnp.maximum(xp * xp + yp * yp + z * z, 1e-12)
    Do = z * Ai * Ai / (jnp.pi * l2 * l2)  # cos(norm)/pi * detMinv / len^3
    Do = jnp.where(valid & (Do > 0.0) & jnp.isfinite(Do), Do, 0.0)
    f = R * Do / jnp.maximum(wi[..., 2], 1e-8)
    return jnp.where(valid, f, 0.0), Do


def _sheen_sample_ltc(wo, sheen_roughness, u1, u2):
    """Sample the fitted sheen LTC: cosine-sample the original space, map
    through M, rotate back to the view azimuth (SheenLTC.h:126-152)."""
    Ai, Bi, R = _sheen_ltc_params(wo[..., 2], sheen_roughness)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    cx = r * jnp.cos(phi)
    cy = r * jnp.sin(phi)
    cz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    inv_Ai = 1.0 / Ai
    x = (cx - cz * Bi) * inv_Ai
    y = cy * inv_Ai
    v = jnp.stack([x, y, cz], axis=-1)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    c, s = _sheen_view_frame(wo)
    return jnp.stack(
        [c * v[..., 0] - s * v[..., 1],
         s * v[..., 0] + c * v[..., 1],
         v[..., 2]],
        axis=-1,
    )


def _sheen_lobe_charlie(wo, wi, sheen_roughness):
    """'Charlie' sheen NDF (Estevez & Kulla 2017) — fallback when the
    fitted LTC polys are absent; benchmarks/sheen_parity.py measured this
    family cannot match the reference's SGGX-derived lobe."""
    valid = (wo[..., 2] > 1e-6) & (wi[..., 2] > 1e-6)
    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    alpha = jnp.clip(sheen_roughness, 0.05, 1.0)
    inv_a = 1.0 / alpha
    cos_h = jnp.clip(h[..., 2], -1.0, 1.0)
    sin_h2 = jnp.maximum(1.0 - cos_h * cos_h, 1e-8)
    d = (2.0 + inv_a) * (sin_h2 ** (0.5 * inv_a)) / (2.0 * jnp.pi)
    # Neubelt-Pettineo visibility-ish denominator (cheap, energy bounded)
    denom = 4.0 * jnp.maximum(
        wo[..., 2] + wi[..., 2] - wo[..., 2] * wi[..., 2], 1e-6
    )
    f = jnp.where(valid, d / denom, 0.0)
    pdf = jnp.where(valid, jnp.maximum(wi[..., 2], 1e-8) * INV_PI, 0.0)
    return f, pdf


def _sheen_lobe(wo, wi, sheen_roughness):
    if _SHEEN_LTC_POLY is not None:
        return _sheen_lobe_ltc(wo, wi, sheen_roughness)
    return _sheen_lobe_charlie(wo, wi, sheen_roughness)


def _diffuse_lobe(base_color, sigma, wo, wi):
    """Oren-Nayar diffuse in local frame."""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    valid = (cos_i > 1e-6) & (cos_o > 1e-6)
    A, B = oren_nayar_AB(sigma)
    sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    denom = jnp.maximum(sin_i * sin_o, 1e-7)
    cos_dphi = jnp.clip(
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / denom, -1.0, 1.0
    )
    sin_alpha = jnp.maximum(sin_i, sin_o)
    tan_beta = jnp.minimum(sin_i, sin_o) / jnp.maximum(
        jnp.minimum(cos_i, cos_o), 1e-7
    )
    fr = INV_PI * (A + B * jnp.maximum(0.0, cos_dphi) * sin_alpha * tan_beta)
    f = jnp.where(valid[..., None], base_color * fr[..., None], 0.0)
    pdf = jnp.where(valid, cos_i * INV_PI, 0.0)
    return f, pdf


def _glass_ess_lookup(table_np, rough, cos_o, ior, sel=None):
    """Trilinear lookup of Ess(ior; roughness, cos) over the static
    _GLASS_IORS grid. rough/cos in [0,1]; ior = MAX(eta, 1/eta) >= 1.
    With a 4D (selector, ior, rough, cos) stack, sel (N,) i32 picks the
    sub-table per ray at no extra gather cost."""
    tab = jnp.asarray(table_np)
    if table_np.ndim == 4:
        n_sel, n_ior, res_r, res_c = table_np.shape
        sel_off = (sel if sel is not None else 0) * n_ior
    else:
        n_ior, res_r, res_c = table_np.shape
        sel_off = 0
    iors = jnp.asarray(_GLASS_IORS)
    # ior segment: idx of the lower grid point
    k = jnp.clip(
        jnp.sum((ior[..., None] >= iors[None, :]).astype(jnp.int32), -1) - 1,
        0, n_ior - 2,
    )
    i0 = iors[k]
    i1 = iors[k + 1]
    fi = jnp.clip((ior - i0) / jnp.maximum(i1 - i0, 1e-6), 0.0, 1.0)

    r = jnp.clip(rough * res_r - 0.5, 0.0, res_r - 1.0)
    c = jnp.clip(cos_o * res_c - 0.5, 0.0, res_c - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, res_r - 1)
    c1 = jnp.minimum(c0 + 1, res_c - 1)
    fr = r - r0
    fc = c - c0
    flat = tab.reshape(-1)

    def at(kk, rr, cc):
        return flat[((sel_off + kk) * res_r + rr) * res_c + cc]

    def bil(kk):
        return (
            at(kk, r0, c0) * (1 - fr) * (1 - fc)
            + at(kk, r0, c1) * (1 - fr) * fc
            + at(kk, r1, c0) * fr * (1 - fc)
            + at(kk, r1, c1) * fr * fc
        )

    return bil(k) * (1 - fi) + bil(k + 1) * fi


def _glass_lobe(base_color, wo, wi, ax, ay, eta_rel):
    """Rough dielectric (Walter et al. 2007): reflection + refraction.
    eta_rel = n_transmitted / n_incident (>1 entering denser medium).
    Returns (f (N,3), pdf (N,))."""
    cos_o = wo[..., 2]
    cos_i = wi[..., 2]
    is_reflect = cos_i > 0.0

    # --- reflection half vector ---
    h_r = wo + wi
    h_r = h_r / jnp.maximum(jnp.linalg.norm(h_r, axis=-1, keepdims=True), 1e-12)
    h_r = jnp.where(h_r[..., 2:3] < 0.0, -h_r, h_r)

    # --- transmission half vector: h = -(wo + eta*wi) normalized ---
    h_t = -(wo + eta_rel[..., None] * wi)
    h_t = h_t / jnp.maximum(jnp.linalg.norm(h_t, axis=-1, keepdims=True), 1e-12)
    h_t = jnp.where(h_t[..., 2:3] < 0.0, -h_t, h_t)

    h = jnp.where(is_reflect[..., None], h_r, h_t)
    doth_o = jnp.sum(wo * h, axis=-1)
    doth_i = jnp.sum(wi * h, axis=-1)

    F = fresnel_dielectric(jnp.abs(doth_o), eta_rel)
    d = mf.ggx_ndf(h, ax, ay)
    g2 = mf.smith_g2_height_correlated(
        wo, jnp.where(is_reflect[..., None], wi, -wi), ax, ay
    )
    g1o = mf.smith_g1(wo, ax, ay)
    vpdf = mf.vndf_pdf(wo, h, ax, ay)

    # reflection branch
    denom_r = 4.0 * jnp.maximum(jnp.abs(cos_o * cos_i), 1e-9)
    f_r = F * d * g2 / denom_r
    pdf_r = F * vpdf / (4.0 * jnp.maximum(jnp.abs(doth_o), 1e-9))

    # transmission branch (Walter eq. 21) — radiance transport, no eta^2
    # asymmetry factor for unidirectional path tracing from the camera
    jac_denom = jnp.square(doth_o + eta_rel * doth_i)
    common = (
        jnp.abs(doth_o * doth_i)
        / jnp.maximum(jnp.abs(cos_o * cos_i), 1e-9)
        * d
        * g2
        / jnp.maximum(jac_denom, 1e-12)
    )
    f_t = (1.0 - F) * common
    jac_t = (
        eta_rel * eta_rel
        * jnp.abs(doth_i)
        / jnp.maximum(jac_denom, 1e-12)
    )
    pdf_t = (1.0 - F) * vpdf * jac_t

    valid_o = cos_o > 1e-6
    f_scalar = jnp.where(is_reflect, f_r, f_t)
    f_scalar = jnp.where(valid_o, f_scalar, 0.0)
    pdf = jnp.where(is_reflect, pdf_r, pdf_t)
    pdf = jnp.where(valid_o, pdf, 0.0)
    # refraction tinted by base color (reference glass uses base color)
    tint = jnp.where(is_reflect[..., None], jnp.ones_like(base_color), base_color)
    return f_scalar[..., None] * tint, pdf


# ------------------------------------------------- lobe weights/probabilities


def _lobe_setup(options: RenderOptions, mats: MaterialBank, wo):
    """Per-ray lobe weights + sampling probabilities (normalized)."""
    cos_o = jnp.abs(wo[..., 2])
    trans = mats.specular_transmission
    w_coat = mats.coat
    w_metal = mats.metallic
    w_glass = (1.0 - mats.metallic) * trans
    w_base = (1.0 - mats.metallic) * (1.0 - trans)
    w_sheen = mats.sheen

    eta_spec = jnp.maximum(mats.ior, 1.0 + 1e-3)
    F_spec = fresnel_dielectric(cos_o, eta_spec) * mats.specular
    Fc = fresnel_dielectric(cos_o, jnp.maximum(mats.coat_ior, 1.0 + 1e-3))

    F0_metal = mats.base_color
    f_metal_approx = _lum(
        f82_tint(
            F0_metal,
            mats.metallic_F82,
            mats.metallic_F90,
            mats.metallic_F90_falloff_exponent,
            cos_o,
        )
    )

    p_coat = w_coat * Fc
    p_sheen = w_sheen * 0.08
    p_metal = w_metal * jnp.maximum(f_metal_approx, 0.05)
    p_glass = w_glass
    p_spec = w_base * F_spec
    p_diff = w_base * (1.0 - F_spec) * jnp.maximum(_lum(mats.base_color), 0.05)

    total = p_coat + p_sheen + p_metal + p_glass + p_spec + p_diff
    total = jnp.maximum(total, 1e-8)
    probs = [
        p_coat / total,
        p_sheen / total,
        p_metal / total,
        p_glass / total,
        p_spec / total,
        p_diff / total,
    ]
    weights = dict(
        coat=w_coat, sheen=w_sheen, metal=w_metal, glass=w_glass, base=w_base
    )
    return probs, weights


def _eval_lobes(
    options: RenderOptions, mats: MaterialBank, wo, wi, eta_rel
):
    """Evaluate every lobe. Returns (f_total (N,3), [pdf_lobe (N,)] x 6)."""
    # anisotropy rotation: spin the tangent frame (reference:
    # anisotropy_rotation, Material.h:143) — isotropic lobes are unaffected
    rot = mats.anisotropy_rotation * jnp.pi
    wo = mf.anisotropy_rotate(wo, rot)
    wi = mf.anisotropy_rotate(wi, rot)
    ax, ay = get_alphas(mats.roughness, mats.anisotropy)
    cax, cay = get_alphas(mats.coat_roughness, mats.coat_anisotropy)
    cos_o = jnp.abs(wo[..., 2])
    cos_i_signed = wi[..., 2]

    # coat (dielectric GGX reflection, white)
    spec_c, pdf_c, cosh_c, _ = _ggx_reflection_lobe(wo, wi, cax, cay)
    Fc_h = fresnel_dielectric(
        jnp.maximum(cosh_c, 0.0), jnp.maximum(mats.coat_ior, 1.0 + 1e-3)
    )
    f_coat = (spec_c * Fc_h)[..., None] * jnp.ones_like(mats.base_color)

    # coat attenuation of everything below (two interface crossings +
    # user-controlled darkening, reference: Principled.h coat_darkening)
    Fc_o = fresnel_dielectric(cos_o, jnp.maximum(mats.coat_ior, 1.0 + 1e-3))
    Fc_i = fresnel_dielectric(
        jnp.abs(cos_i_signed), jnp.maximum(mats.coat_ior, 1.0 + 1e-3)
    )
    coat_att = 1.0 - mats.coat * (
        0.5 * (Fc_o + Fc_i) * mats.coat_darkening
    )
    # coat medium absorption: Beer-Lambert tint over the in-coat path length
    # ~ thickness·(1/cos_o + 1/cos_i) (reference: coat_medium_absorption /
    # coat_medium_thickness, Material.h:160-163)
    coat_path = mats.coat_medium_thickness * 0.01 * (
        1.0 / jnp.maximum(cos_o, 0.1)
        + 1.0 / jnp.maximum(jnp.abs(cos_i_signed), 0.1)
    )
    coat_tint = jnp.exp(
        jnp.log(jnp.clip(mats.coat_medium_absorption, 1e-3, 1.0))
        * coat_path[..., None]
    )
    coat_att_rgb = coat_att[..., None] * (
        (1.0 - mats.coat[..., None]) + mats.coat[..., None] * coat_tint
    )

    # sheen
    f_sh_s, pdf_sh = _sheen_lobe(wo, wi, mats.sheen_roughness)
    f_sheen = f_sh_s[..., None] * mats.sheen_color

    # metal — double-roughness blend (reference: second_roughness_weight /
    # second_roughness, Material.h:144-145): two GGX lobes sharing the Fresnel
    spec_m1, pdf_m1, cosh_m, _ = _ggx_reflection_lobe(wo, wi, ax, ay)
    ax2, ay2 = get_alphas(mats.second_roughness, mats.anisotropy)
    spec_m2, pdf_m2, _, _ = _ggx_reflection_lobe(wo, wi, ax2, ay2)
    w2 = mats.second_roughness_weight
    spec_m = (1.0 - w2) * spec_m1 + w2 * spec_m2
    pdf_m = (1.0 - w2) * pdf_m1 + w2 * pdf_m2
    F_metal = f82_tint(
        mats.base_color,
        mats.metallic_F82,
        mats.metallic_F90,
        mats.metallic_F90_falloff_exponent,
        jnp.maximum(cosh_m, 0.0),
    )
    if options.do_thin_film:
        # iridescent coating over the metal/specular lobes (reference:
        # ThinFilm.h over the F82 metal fresnel)
        from .thin_film import thin_film_reflectance

        tf_base_ior = jnp.where(
            mats.thin_film_do_ior_override > 0.5,
            mats.thin_film_base_ior_override,
            jnp.maximum(mats.ior, 1.0 + 1e-3),
        )
        F_tf = thin_film_reflectance(
            jnp.maximum(cosh_m, 0.0),
            mats.thin_film_ior,
            mats.thin_film_thickness,
            tf_base_ior,
            mats.thin_film_hue_shift_degrees,
        )
        F_metal = (
            (1.0 - mats.thin_film[..., None]) * F_metal
            + mats.thin_film[..., None] * F_tf
        )
    f_metal = spec_m[..., None] * F_metal
    if options.do_energy_compensation:
        # Turquin 2019 multiple-scattering compensation, symmetric in
        # (wo, wi) to preserve reciprocity: boost by (1-E)/E with
        # E = sqrt(Ess(mu_o) Ess(mu_i)) (reference:
        # MicrofacetEnergyCompensation.h reading the baked Ess LUTs)
        if options.glass_compensation_exact:
            E_o = _ess_lookup(mats.roughness, jnp.abs(wo[..., 2]))
            E_i = _ess_lookup(mats.roughness, jnp.abs(wi[..., 2]))
        else:
            E_o = _ess_poly(mats.roughness, jnp.abs(wo[..., 2]))
            E_i = _ess_poly(mats.roughness, jnp.abs(wi[..., 2]))
        E = jnp.sqrt(jnp.clip(E_o * E_i, 1e-3, 1.0))
        ms_boost = 1.0 + mats.base_color * ((1.0 - E) / E)[..., None]
        f_metal = f_metal * ms_boost

    # glass — thin-walled surfaces transmit straight through (no bend, no
    # medium entry) with the remapped roughness of a double interface
    # (reference: thin_walled + get_thin_walled_roughness, Material.h:87-111)
    from ..core.material import thin_walled_roughness

    r_thin = thin_walled_roughness(
        mats.thin_walled, mats.roughness, jnp.maximum(eta_rel, 1.0 + 1e-3)
    )
    axt, ayt = get_alphas(r_thin, mats.anisotropy)
    ax_g = jnp.where(mats.thin_walled > 0.5, axt, ax)
    ay_g = jnp.where(mats.thin_walled > 0.5, ayt, ay)
    eta_g = jnp.where(mats.thin_walled > 0.5, 1.0 + 1e-3, eta_rel)
    f_glass, pdf_g = _glass_lobe(mats.base_color, wo, wi, ax_g, ay_g, eta_g)
    if options.do_energy_compensation:
        # glass multiple-scattering compensation (Turquin 2019; reference:
        # MicrofacetEnergyCompensation.h dielectrics path reading the baked
        # entering/exiting/thin tables) — symmetric in (wo, wi)
        ior_key = jnp.maximum(
            jnp.maximum(eta_rel, 1.0 / jnp.maximum(eta_rel, 1e-3)),
            1.0 + 1e-3,
        )
        entering = eta_rel >= 1.0
        r_key = jnp.where(mats.thin_walled > 0.5, r_thin, mats.roughness)

        sel = jnp.where(
            mats.thin_walled > 0.5,
            2,
            jnp.where(entering, 0, 1),
        ).astype(jnp.int32)

        if options.glass_compensation_exact:
            def glass_E(cos):
                return _glass_ess_lookup(
                    _GLASS_ALL, r_key, cos, ior_key, sel
                )
        else:
            def glass_E(cos):
                return _glass_ess_poly(r_key, cos, ior_key, sel)

        # keyed on wo only: wi lives on the OTHER side of the interface
        # where the retention function differs — pairing the two tables
        # over-boosts (the reference's dielectric path is wo-keyed too)
        Eg = jnp.clip(glass_E(jnp.abs(wo[..., 2])), 1e-2, 1.0)
        f_glass = f_glass * (1.0 / Eg)[..., None]

    # specular dielectric reflection on the base
    F_s_h = fresnel_dielectric(
        jnp.maximum(cosh_m, 0.0), jnp.maximum(mats.ior, 1.0 + 1e-3)
    )
    f_spec = (spec_m * F_s_h * mats.specular)[..., None] * (
        mats.specular_color * mats.specular_tint[..., None]
        + (1.0 - mats.specular_tint[..., None])
    )
    pdf_s = pdf_m

    # diffuse under specular: energy-conserving-ish (1-F) factors
    Fo = fresnel_dielectric(cos_o, jnp.maximum(mats.ior, 1.0 + 1e-3))
    Fi = fresnel_dielectric(
        jnp.abs(cos_i_signed), jnp.maximum(mats.ior, 1.0 + 1e-3)
    )
    f_diff, pdf_d = _diffuse_lobe(mats.base_color, mats.oren_nayar_sigma, wo, wi)
    f_diff = f_diff * (
        (1.0 - Fo * mats.specular) * (1.0 - Fi * mats.specular)
    )[..., None]

    if options.do_energy_compensation:
        # glossy-base layer compensation: boost spec+diffuse by the
        # reciprocal of the layer's baked directional albedo, lerped by
        # `specular` strength and faded out with thin-film (reference:
        # PrincipledEnergyCompensation.h
        # get_principled_energy_compensation_glossy_base)
        ior_b = jnp.maximum(mats.ior, 1.0 + 1e-3)
        if options.glass_compensation_exact:
            E_gb = _glass_ess_lookup(
                _GLASS_ALL, mats.roughness, cos_o, ior_b,
                jnp.full(cos_o.shape, 3, jnp.int32),
            )
        else:
            E_gb = _glass_ess_poly(mats.roughness, cos_o, ior_b, 3)
        E_gb = jnp.clip(E_gb, 0.2, 1.0)
        boost_gb = 1.0 / (1.0 + mats.specular * (E_gb - 1.0))
        boost_gb = boost_gb + mats.thin_film * (1.0 - boost_gb)
        f_spec = f_spec * boost_gb[..., None]
        f_diff = f_diff * boost_gb[..., None]

    trans = mats.specular_transmission
    w_metal = mats.metallic
    w_glass = (1.0 - mats.metallic) * trans
    w_base = (1.0 - mats.metallic) * (1.0 - trans)

    f_total = mats.coat[..., None] * f_coat + coat_att_rgb * (
        mats.sheen[..., None] * f_sheen
        + w_metal[..., None] * f_metal
        + w_glass[..., None] * f_glass
        + w_base[..., None] * (f_spec + f_diff)
    )
    if options.do_energy_compensation:
        # clearcoat layer compensation: treat the coat as a glossy base
        # (spec over lambertian-ish below) and boost the WHOLE stack by the
        # reciprocal of that layer's albedo, lerped by coat*(1-transmission)
        # and faded with thin-film (reference:
        # PrincipledEnergyCompensation.h
        # get_principled_energy_compensation_clearcoat_lobe — it samples
        # the same glossy_dielectric_Ess table)
        ior_c = jnp.maximum(mats.coat_ior, 1.0 + 1e-3)
        if options.glass_compensation_exact:
            E_c = _glass_ess_lookup(
                _GLASS_ALL, mats.coat_roughness, cos_o, ior_c,
                jnp.full(cos_o.shape, 3, jnp.int32),
            )
        else:
            E_c = _glass_ess_poly(mats.coat_roughness, cos_o, ior_c, 3)
        E_c = jnp.clip(E_c, 0.2, 1.0)
        w_cc = mats.coat * (1.0 - mats.specular_transmission)
        boost_c = 1.0 / (1.0 + w_cc * (E_c - 1.0))
        boost_c = boost_c + mats.thin_film * (1.0 - boost_c)
        f_total = f_total * boost_c[..., None]
    return f_total, [pdf_c, pdf_sh, pdf_m, pdf_g, pdf_s, pdf_d]


def eval_pdf(options: RenderOptions, mats: MaterialBank, n, wo, wi, aux=None):
    """World-frame entry. aux['eta_rel'] optional (N,) relative IOR for glass
    (defaults to entering: ior). Returns (f (N,3), pdf (N,))."""
    wo_l = _to_local(n, wo)
    wi_l = _to_local(n, wi)
    eta_rel = (
        aux["eta_rel"] if aux and "eta_rel" in aux
        else jnp.maximum(mats.ior, 1.0 + 1e-3)
    )
    f, pdfs = _eval_lobes(options, mats, wo_l, wi_l, eta_rel)
    probs, _ = _lobe_setup(options, mats, wo_l)
    pdf = sum(p * l for p, l in zip(probs, pdfs))
    good = jnp.isfinite(pdf) & jnp.all(jnp.isfinite(f), axis=-1)
    return jnp.where(good[..., None], f, 0.0), jnp.where(good, pdf, 0.0)


def sample(
    options: RenderOptions, mats: MaterialBank, n, wo, rng_state, aux=None
):
    """Sample a direction: pick a lobe by probability, sample it, then return
    the FULL bsdf eval and the combined pdf (one-sample MIS estimator).

    Returns (rng_state, wi_world (N,3), f (N,3), pdf (N,), sample_aux dict with
    'refracted' mask)."""
    wo_l = _to_local(n, wo)
    eta_rel = (
        aux["eta_rel"] if aux and "eta_rel" in aux
        else jnp.maximum(mats.ior, 1.0 + 1e-3)
    )
    probs, _ = _lobe_setup(options, mats, wo_l)
    rng_state, u_sel = rng_mod.next_float(rng_state)
    rng_state, u1, u2 = rng_mod.next_float2(rng_state)
    rng_state, u3 = rng_mod.next_float(rng_state)

    ax, ay = get_alphas(mats.roughness, mats.anisotropy)
    cax, cay = get_alphas(mats.coat_roughness, mats.coat_anisotropy)
    sampler = (
        mf.sample_vndf
        if options.ggx_sampling == GGXSamplingVariant.VNDF
        else mf.sample_vndf_spherical_caps
    )

    wo_up = jnp.where(wo_l[..., 2:3] < 0.0, -wo_l, wo_l)  # guard degenerate
    # sample in the rotated tangent frame, un-rotate the result (must match
    # the rotation applied inside _eval_lobes)
    rot = mats.anisotropy_rotation * jnp.pi
    wo_rot = mf.anisotropy_rotate(wo_up, rot)

    # candidate directions per lobe
    h_coat = sampler(wo_rot, cax, cay, u1, u2)
    wi_coat = mf.anisotropy_rotate(mf.reflect_local(wo_rot, h_coat), -rot)

    h_base = sampler(wo_rot, ax, ay, u1, u2)
    wi_specm = mf.anisotropy_rotate(
        mf.reflect_local(wo_rot, h_base), -rot
    )  # metal + specular share

    # cosine for diffuse; the sheen branch draws from its own LTC when the
    # fitted polys are shipped (pdf consistency with _sheen_lobe_ltc)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    wi_cos = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi),
         jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))],
        axis=-1,
    )
    if _SHEEN_LTC_POLY is not None:
        wi_sheen = _sheen_sample_ltc(wo_up, mats.sheen_roughness, u1, u2)
    else:
        wi_sheen = wi_cos

    # glass: reflect or refract through h_base by Fresnel (rotated frame);
    # thin-walled surfaces use eta~1 → straight-through transmission
    eta_g = jnp.where(mats.thin_walled > 0.5, 1.0 + 1e-3, eta_rel)
    doth = jnp.maximum(jnp.sum(wo_rot * h_base, axis=-1), 1e-9)
    Fg = fresnel_dielectric(doth, eta_g)
    wt, tir = mf.refract_local(wo_rot, h_base, 1.0 / eta_g)
    wt = mf.anisotropy_rotate(wt, -rot)
    choose_reflect = (u3 < Fg) | tir
    wi_glass = jnp.where(choose_reflect[..., None], wi_specm, wt)

    # lobe CDF selection ladder
    c0 = probs[0]
    c1 = c0 + probs[1]
    c2 = c1 + probs[2]
    c3 = c2 + probs[3]
    c4 = c3 + probs[4]
    sel_coat = u_sel < c0
    sel_sheen = (~sel_coat) & (u_sel < c1)
    sel_metal = (~sel_coat & ~sel_sheen) & (u_sel < c2)
    sel_glass = (~sel_coat & ~sel_sheen & ~sel_metal) & (u_sel < c3)
    sel_spec = (~sel_coat & ~sel_sheen & ~sel_metal & ~sel_glass) & (u_sel < c4)
    # remainder: diffuse

    wi_l = jnp.where(
        sel_coat[..., None],
        wi_coat,
        jnp.where(
            (sel_sheen)[..., None],
            wi_sheen,
            jnp.where(
                sel_metal[..., None],
                wi_specm,
                jnp.where(
                    sel_glass[..., None],
                    wi_glass,
                    jnp.where(sel_spec[..., None], wi_specm, wi_cos),
                ),
            ),
        ),
    )

    f, pdfs = _eval_lobes(options, mats, wo_up, wi_l, eta_rel)
    pdf = sum(p * l for p, l in zip(probs, pdfs))
    good = (
        jnp.isfinite(pdf)
        & (pdf > 0.0)
        & jnp.all(jnp.isfinite(f), axis=-1)
    )
    f = jnp.where(good[..., None], f, 0.0)
    pdf = jnp.where(good, pdf, 0.0)

    refracted = sel_glass & (wi_l[..., 2] < 0.0)
    wi_world = _to_world(n, wi_l)
    return rng_state, wi_world, f, pdf, {"refracted": refracted}
