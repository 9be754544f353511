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


def _ctx_from_weights(mats: MaterialBank, cos_o):
    """Candidate-invariant proxy state for a batch of shading vertices.

    RIS/ReSTIR evaluate the proxy once per CANDIDATE (~5x per vertex) but
    every lobe weight (two Fresnel chains) depends only on (material,
    cos_o) — hoisting them into this context removes that work from the
    per-candidate loop, where XLA's while-loop LICM does not reliably lift
    it. Deliberately SMALL (one (N,3) + five (N,) arrays): the ctx is
    captured by the candidate-loop body closures (a loop-invariant constant
    of the compiled while-loop, NOT part of its carry), so keeping it small
    bounds the buffer set that stays live across the whole candidate loop —
    a fat context (frames, canonicalized vectors) measured as an HBM
    peak-memory blowup at the 2M stress wavefront. The frame and wo
    canonicalization are recomputed per candidate — cheap dot/select
    chains."""
    w_diff, spec_rgb, w_trans, ax, ay = _weights(mats, cos_o)
    p_s = _lum(spec_rgb)
    tot = jnp.maximum(w_diff + p_s + w_trans, 1e-8)
    return dict(
        w_diff=w_diff,
        spec_rgb=spec_rgb,
        w_trans=w_trans,
        ax=ax,
        ay=ay,
        p_s=p_s,
        tot=tot,
    )


def make_ctx(mats: MaterialBank, n, wo):
    """World-frame proxy context (lobe weights shared by every candidate
    eval/sample at these vertices). cos_o = |wo·n| matches the canonical
    local frame's wo.z after the below-frame flip — no ONB needed here."""
    cos_o = jnp.maximum(jnp.abs(jnp.sum(wo * n, axis=-1)), 1e-6)
    ctx = _ctx_from_weights(mats, cos_o)
    ctx["mats"] = mats
    return ctx


def _eval_core(ctx, wo, wi):
    """Proxy eval of canonicalized local-frame (wo, wi) against a context."""
    cos_o = jnp.maximum(wo[..., 2], 1e-6)
    ax, ay = ctx["ax"], ctx["ay"]
    mats = ctx["mats"]
    cos_i = wi[..., 2]
    upper = cos_i > 1e-6
    lower = cos_i < -1e-6

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
    transmissive = mats.specular_transmission > 0.0
    f_up = (
        (ctx["w_diff"] * INV_PI + _FLOOR)[..., None] * base
        + spec[..., None] * ctx["spec_rgb"]
    )
    f_dn = (
        (ctx["w_trans"] * INV_PI + _FLOOR * transmissive)[..., None] * base
    )
    f = jnp.where(
        upper[..., None], f_up, jnp.where(lower[..., None], f_dn, 0.0)
    )

    # mixture pdf of the proxy sampler (normalized selection weights)
    tot = ctx["tot"]
    pdf = (
        ctx["w_diff"] / tot * jnp.where(upper, cos_i * INV_PI, 0.0)
        + ctx["p_s"] / tot * pdf_spec
        + ctx["w_trans"] / tot * jnp.where(lower, -cos_i * INV_PI, 0.0)
    )
    return f, pdf


def eval_pdf_ctx(ctx, n, wo, wi_world):
    """Per-candidate proxy eval against a hoisted context (frame + flips
    recomputed here — cheap; the hoisted part is the lobe weights)."""
    t, b = build_onb(n)

    def to_local(w):
        return jnp.stack(
            [jnp.sum(w * t, axis=-1), jnp.sum(w * b, axis=-1),
             jnp.sum(w * n, axis=-1)],
            axis=-1,
        )

    wo_l = to_local(wo)
    wi_l = to_local(wi_world)
    flip = wo_l[..., 2:3] < 0.0
    return _eval_core(
        ctx, jnp.where(flip, -wo_l, wo_l), jnp.where(flip, -wi_l, wi_l)
    )


def eval_pdf_local(mats: MaterialBank, wo_l, wi_l):
    """Proxy eval in the local frame. Returns (f (N,3), pdf (N,))."""
    flip = wo_l[..., 2:3] < 0.0
    wo = jnp.where(flip, -wo_l, wo_l)
    ctx = _ctx_from_weights(mats, jnp.maximum(wo[..., 2], 1e-6))
    ctx["mats"] = mats
    return _eval_core(ctx, wo, jnp.where(flip, -wi_l, wi_l))


def _sample_core(ctx, wo, rng_state):
    """Sample the proxy mixture in the canonical local frame.

    Returns (rng, wi canonical-local (N,3), f, pdf)."""
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
    h = mf.sample_vndf(wo, ctx["ax"], ctx["ay"], u1, u2)
    wi_spec = mf.reflect_local(wo, h)

    c_d = ctx["w_diff"] / ctx["tot"]
    c_s = c_d + ctx["p_s"] / ctx["tot"]
    pick_d = u_sel < c_d
    pick_s = (~pick_d) & (u_sel < c_s)
    wi = jnp.where(
        pick_d[..., None],
        wi_cos,
        jnp.where(pick_s[..., None], wi_spec, wi_cos * jnp.asarray([1.0, 1.0, -1.0])),
    )
    f, pdf = _eval_core(ctx, wo, wi)
    return rng_state, wi, f, pdf


def sample_local(mats: MaterialBank, wo_l, rng_state):
    """Sample the proxy mixture. Returns (rng, wi_l (N,3), f (N,3), pdf)."""
    flip = wo_l[..., 2:3] < 0.0
    wo = jnp.where(flip, -wo_l, wo_l)
    ctx = _ctx_from_weights(mats, jnp.maximum(wo[..., 2], 1e-6))
    ctx["mats"] = mats
    rng_state, wi, f, pdf = _sample_core(ctx, wo, rng_state)
    # un-flip if wo_l was below the frame (matches eval's canonicalization)
    wi = jnp.where(flip, -wi, wi)
    return rng_state, wi, f, pdf


def sample_ctx(ctx, n, wo, rng_state):
    """Per-candidate proxy sample against a hoisted context.
    Returns (rng, wi_world (N,3), f (N,3), pdf (N,))."""
    t, b = build_onb(n)
    wo_l = jnp.stack(
        [jnp.sum(wo * t, axis=-1), jnp.sum(wo * b, axis=-1),
         jnp.sum(wo * n, axis=-1)],
        axis=-1,
    )
    flip = wo_l[..., 2:3] < 0.0
    rng_state, wi, f, pdf = _sample_core(
        ctx, jnp.where(flip, -wo_l, wo_l), rng_state
    )
    wi_l = jnp.where(flip, -wi, wi)
    wi_world = (
        wi_l[..., 0:1] * t + wi_l[..., 1:2] * b + wi_l[..., 2:3] * n
    )
    return rng_state, wi_world, f, pdf


def eval_pdf(mats: MaterialBank, n, wo, wi):
    """World-frame proxy eval."""
    return eval_pdf_ctx(make_ctx(mats, n, wo), n, wo, wi)


def sample(mats: MaterialBank, n, wo, rng_state):
    """World-frame proxy sample. Returns (rng, wi_world, f, pdf)."""
    return sample_ctx(make_ctx(mats, n, wo), n, wo, rng_state)
