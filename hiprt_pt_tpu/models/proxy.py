"""Cheap proxy BSDF for RIS/ReSTIR candidate weighting and sampling.

TPU-first optimization: under RIS the reference evaluates the FULL layered
BSDF for every candidate (src/Device/includes/RIS/RIS.h:100-139 calls
bsdf_dispatcher_eval per candidate) — ~5 full evaluations per path vertex.
On TPU the full principled eval (6 lobes + energy-compensation LUT fits +
thin film) dominates the step once traversal is fast, so candidates here are
weighted by this cheap 3-lobe proxy and only the WINNING candidate is
re-evaluated exactly at final shading. The RIS estimator stays unbiased for
ANY positive target function: f_true(X) · W with W = Σw / p_hat_proxy(X) has
expectation ∫f as long as p_hat_proxy > 0 wherever f_true > 0, which the
support floors below guarantee.

Proxy model (local frame, +z = shading normal):
  * diffuse reflection:  w_d · base_color/π              (upper hemisphere)
  * GGX specular:        w_s · D·G2/(4 cos_o cos_i)      (upper hemisphere)
  * diffuse transmission: w_t · base_color/π             (lower hemisphere,
    only for transmissive materials — stands in for the glass lobe)
plus a small support floor on each side so no true-BSDF direction ever gets
target 0 (bias guard; fireflies from tiny targets are bounded by the winner's
true f and the direct-contribution clamp).

The same three lobes back a proxy SAMPLER (cosine / VNDF / flipped cosine)
whose mixture pdf is exactly evaluable — it replaces the full-BSDF candidate
sampler in RIS, so Talbot-MIS mixture pdfs stay consistent and cheap.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.material import MaterialBank, get_alphas
from ..ops.sampling import INV_PI, build_onb
from . import microfacet as mf
from .fresnel import fresnel_dielectric


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


_FLOOR = 1e-4  # support floor (relative to a unit-albedo diffuse lobe)


def _weights(mats: MaterialBank, cos_o):
    """Per-ray proxy lobe weights (w_diff, w_spec_rgb, w_trans) + iso alpha."""
    trans = mats.specular_transmission
    w_metal = mats.metallic
    w_glass = (1.0 - mats.metallic) * trans
    w_base = (1.0 - mats.metallic) * (1.0 - trans)

    F_spec = fresnel_dielectric(cos_o, jnp.maximum(mats.ior, 1.0 + 1e-3))
    Fc = fresnel_dielectric(cos_o, jnp.maximum(mats.coat_ior, 1.0 + 1e-3))

    alb = jnp.maximum(_lum(mats.base_color), 0.05)
    w_diff = w_base * (1.0 - F_spec * mats.specular) * alb
    # one GGX lobe stands in for metal + specular + coat + glass reflection
    spec_rgb = (
        w_metal[..., None] * mats.base_color
        + (
            w_base * mats.specular * F_spec
            + mats.coat * Fc
            + w_glass * F_spec
        )[..., None]
    )
    w_trans = w_glass * (1.0 - F_spec) * alb

    ax, ay = get_alphas(jnp.maximum(mats.roughness, 0.04), mats.anisotropy)
    return w_diff, spec_rgb, w_trans, ax, ay


def eval_pdf_local(mats: MaterialBank, wo_l, wi_l):
    """Proxy eval in the local frame. Returns (f (N,3), pdf (N,))."""
    wo = jnp.where(wo_l[..., 2:3] < 0.0, -wo_l, wo_l)
    wi = jnp.where(wo_l[..., 2:3] < 0.0, -wi_l, wi_l)
    cos_o = jnp.maximum(wo[..., 2], 1e-6)
    cos_i = wi[..., 2]
    upper = cos_i > 1e-6
    lower = cos_i < -1e-6

    w_diff, spec_rgb, w_trans, ax, ay = _weights(mats, cos_o)

    # GGX specular (shared-D reflection term, no per-lobe Fresnel chains)
    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    h = jnp.where(h[..., 2:3] < 0.0, -h, h)
    d = mf.ggx_ndf(h, ax, ay)
    g2 = mf.smith_g2_height_correlated(wo, wi, ax, ay)
    spec = jnp.where(
        upper, d * g2 / (4.0 * jnp.maximum(cos_o * cos_i, 1e-9)), 0.0
    )
    doth = jnp.maximum(jnp.sum(wo * h, axis=-1), 1e-9)
    pdf_spec = jnp.where(upper, mf.vndf_pdf(wo, h, ax, ay) / (4.0 * doth), 0.0)

    base = jnp.maximum(mats.base_color, 0.05)
    f_up = (
        (w_diff * INV_PI + _FLOOR)[..., None] * base
        + spec[..., None] * spec_rgb
    )
    transmissive = mats.specular_transmission > 0.0
    f_dn = (
        (w_trans * INV_PI + _FLOOR * transmissive)[..., None] * base
    )
    f = jnp.where(
        upper[..., None], f_up, jnp.where(lower[..., None], f_dn, 0.0)
    )

    # mixture pdf of the proxy sampler (normalized selection weights)
    p_d = w_diff
    p_s = _lum(spec_rgb)
    p_t = w_trans
    tot = jnp.maximum(p_d + p_s + p_t, 1e-8)
    pdf = (
        p_d / tot * jnp.where(upper, cos_i * INV_PI, 0.0)
        + p_s / tot * pdf_spec
        + p_t / tot * jnp.where(lower, -cos_i * INV_PI, 0.0)
    )
    return f, pdf


def sample_local(mats: MaterialBank, wo_l, rng_state):
    """Sample the proxy mixture. Returns (rng, wi_l (N,3), f (N,3), pdf)."""
    wo = jnp.where(wo_l[..., 2:3] < 0.0, -wo_l, wo_l)
    cos_o = jnp.maximum(wo[..., 2], 1e-6)
    w_diff, spec_rgb, w_trans, ax, ay = _weights(mats, cos_o)
    p_d = w_diff
    p_s = _lum(spec_rgb)
    p_t = w_trans
    tot = jnp.maximum(p_d + p_s + p_t, 1e-8)

    rng_state, u_sel = rng_mod.next_float(rng_state)
    rng_state, u1, u2 = rng_mod.next_float2(rng_state)

    # cosine hemisphere (diffuse / flipped for transmission)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    wi_cos = jnp.stack(
        [r * jnp.cos(phi), r * jnp.sin(phi),
         jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))],
        axis=-1,
    )
    h = mf.sample_vndf(wo, ax, ay, u1, u2)
    wi_spec = mf.reflect_local(wo, h)

    c_d = p_d / tot
    c_s = c_d + p_s / tot
    pick_d = u_sel < c_d
    pick_s = (~pick_d) & (u_sel < c_s)
    wi = jnp.where(
        pick_d[..., None],
        wi_cos,
        jnp.where(pick_s[..., None], wi_spec, wi_cos * jnp.asarray([1.0, 1.0, -1.0])),
    )
    f, pdf = eval_pdf_local(mats, wo, wi)
    # un-flip if wo_l was below the frame (matches eval's canonicalization)
    wi = jnp.where(wo_l[..., 2:3] < 0.0, -wi, wi)
    return rng_state, wi, f, pdf


def eval_pdf(mats: MaterialBank, n, wo, wi):
    """World-frame proxy eval."""
    t, b = build_onb(n)

    def to_local(w):
        return jnp.stack(
            [jnp.sum(w * t, axis=-1), jnp.sum(w * b, axis=-1),
             jnp.sum(w * n, axis=-1)],
            axis=-1,
        )

    return eval_pdf_local(mats, to_local(wo), to_local(wi))


def sample(mats: MaterialBank, n, wo, rng_state):
    """World-frame proxy sample. Returns (rng, wi_world, f, pdf)."""
    t, b = build_onb(n)
    wo_l = jnp.stack(
        [jnp.sum(wo * t, axis=-1), jnp.sum(wo * b, axis=-1),
         jnp.sum(wo * n, axis=-1)],
        axis=-1,
    )
    rng_state, wi_l, f, pdf = sample_local(mats, wo_l, rng_state)
    wi = wi_l[..., 0:1] * t + wi_l[..., 1:2] * b + wi_l[..., 2:3] * n
    return rng_state, wi, f, pdf
