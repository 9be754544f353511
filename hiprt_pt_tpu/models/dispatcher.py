"""BSDF dispatch by static override option.

Role parity with the reference's ``bsdf_dispatcher_eval/sample``
(src/Device/includes/Dispatcher.h:18-68): the `BSDFOverride` compile-time option
forces every surface to one BSDF model for debugging/furnace tests; the default
routes to the full principled BSDF. The dispatch is resolved at *trace time*
(static Python branch under jit) — the TPU analog of the reference's
macro-compiled dispatch, with zero runtime branching.

The dispatched functions consume a gathered ``MaterialBank`` (one row per hit).
Uniform interface:
  bsdf_eval(options, mats, n, wo, wi, aux)      -> (f (N,3), pdf (N,))
  bsdf_sample(options, mats, n, wo, rng, aux)   -> (rng, wi, f, pdf, sample_aux)
aux may carry 'eta_rel' (relative IOR for transmission); sample_aux carries a
'refracted' mask for volume tracking.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.settings import BSDFOverride, RenderOptions
from . import lambert, oren_nayar


def _no_refract(n_rays):
    return {"refracted": jnp.zeros((n_rays,), jnp.bool_)}


def bsdf_eval(options: RenderOptions, mats, n, wo, wi, aux=None):
    ov = options.bsdf_override
    if ov == BSDFOverride.LAMBERTIAN:
        return lambert.eval_pdf(mats.base_color, n, wo, wi)
    if ov == BSDFOverride.OREN_NAYAR:
        return oren_nayar.eval_pdf(
            mats.base_color, mats.oren_nayar_sigma, n, wo, wi
        )
    from . import principled

    return principled.eval_pdf(options, mats, n, wo, wi, aux)


def bsdf_proxy_eval(options: RenderOptions, mats, n, wo, wi, aux=None):
    """Cheap target-function eval for RIS/ReSTIR candidate weighting (see
    models/proxy.py). Non-principled overrides are already cheap — they route
    to the real eval so proxy and exact targets coincide."""
    ov = options.bsdf_override
    if ov in (BSDFOverride.LAMBERTIAN, BSDFOverride.OREN_NAYAR):
        return bsdf_eval(options, mats, n, wo, wi, aux)
    from . import proxy

    return proxy.eval_pdf(mats, n, wo, wi)


def bsdf_proxy_ctx(options: RenderOptions, mats, n, wo):
    """Hoisted candidate-invariant proxy context (models/proxy.py make_ctx):
    the local frame + lobe weights RIS/ReSTIR would otherwise recompute per
    candidate. None for cheap overrides (they route to the real eval)."""
    ov = options.bsdf_override
    if ov in (BSDFOverride.LAMBERTIAN, BSDFOverride.OREN_NAYAR):
        return None
    from . import proxy

    return proxy.make_ctx(mats, n, wo)


def bsdf_proxy_eval_ctx(options, ctx, mats, n, wo, wi, aux=None):
    """bsdf_proxy_eval through a hoisted context (falls back when None)."""
    if ctx is None:
        return bsdf_proxy_eval(options, mats, n, wo, wi, aux)
    from . import proxy

    return proxy.eval_pdf_ctx(ctx, n, wo, wi)


def bsdf_proxy_sample_ctx(options, ctx, mats, n, wo, rng_state, aux=None):
    """bsdf_proxy_sample through a hoisted context (falls back when None)."""
    if ctx is None:
        return bsdf_proxy_sample(options, mats, n, wo, rng_state, aux)
    from . import proxy

    return proxy.sample_ctx(ctx, n, wo, rng_state)


def bsdf_proxy_sample(options: RenderOptions, mats, n, wo, rng_state, aux=None):
    """Cheap candidate-direction sampler paired with bsdf_proxy_eval.
    Returns (rng, wi, f_proxy, pdf) — pdf is the exact mixture pdf of this
    sampler (required for consistent Talbot-MIS weights)."""
    ov = options.bsdf_override
    if ov in (BSDFOverride.LAMBERTIAN, BSDFOverride.OREN_NAYAR):
        rng_state, wi, f, pdf, _aux = bsdf_sample(
            options, mats, n, wo, rng_state, aux
        )
        return rng_state, wi, f, pdf
    from . import proxy

    return proxy.sample(mats, n, wo, rng_state)


def bsdf_sample(options: RenderOptions, mats, n, wo, rng_state, aux=None):
    from ..core import rng as rng_mod

    ov = options.bsdf_override
    if ov == BSDFOverride.LAMBERTIAN:
        rng_state, u1, u2 = rng_mod.next_float2(rng_state)
        wi, f, pdf = lambert.sample(mats.base_color, n, wo, u1, u2)
        return rng_state, wi, f, pdf, _no_refract(n.shape[0])
    if ov == BSDFOverride.OREN_NAYAR:
        rng_state, u1, u2 = rng_mod.next_float2(rng_state)
        wi, f, pdf = oren_nayar.sample(
            mats.base_color, mats.oren_nayar_sigma, n, wo, u1, u2
        )
        return rng_state, wi, f, pdf, _no_refract(n.shape[0])
    from . import principled

    return principled.sample(options, mats, n, wo, rng_state, aux)
