"""Emissive-triangle light sampling (NEE) + strategy dispatch.

Role parity with src/Device/includes/Lights.h:277-321 (``sample_one_light``
strategy dispatch over no-NEE/uniform/BSDF/MIS/RIS/ReSTIR) and
LightUtils.h:13-101 (triangle sampling and area→solid-angle pdf conversion).

TPU-first: one vectorized light draw for the whole wavefront; the emissive set
is sampled through a power-weighted CDF (a strict upgrade over the reference's
uniform triangle pick — fewer wasted shadow rays on dim lights) and the pdf is
reported exactly so the estimator stays unbiased.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets.scene import SceneData
from ..core import rng as rng_mod
from ..ops.sampling import sample_triangle


def searchsorted_cdf(cdf: jax.Array, u: jax.Array) -> jax.Array:
    """First index with cdf[i] >= u; vectorized binary search."""
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="left"), 0, cdf.shape[0] - 1
    ).astype(jnp.int32)


def sample_emissive_triangle(scene: SceneData, p: jax.Array, rng_state):
    """Sample one emissive triangle point per shading point p (N,3).

    Returns (rng_state, dict) with:
      wi (N,3) unit direction to light, dist (N,), radiance (N,3),
      pdf (N,) solid-angle pdf, valid (N,) bool, light_normal (N,3).
    """
    n = p.shape[0]
    rng_state, u_sel = rng_mod.next_float(rng_state)
    rng_state, u1, u2 = rng_mod.next_float2(rng_state)
    rng_state, u_acc = rng_mod.next_float(rng_state)

    # O(1) Vose alias draw (searchsorted lowers to a while-loop binary
    # search on TPU — measured 200+ ms/step on a 240-light scene)
    e = scene.emissive_alias_prob.shape[0]
    j = jnp.minimum((u_sel * e).astype(jnp.int32), e - 1)
    slot = jnp.where(
        u_acc < scene.emissive_alias_prob[j], j, scene.emissive_alias[j]
    )
    tri_idx = scene.emissive_tri_indices[slot]
    safe_tri = jnp.maximum(tri_idx, 0)
    tri = scene.triangles[safe_tri]
    v0 = scene.vertices[tri[:, 0]]
    e1 = scene.vertices[tri[:, 1]] - v0
    e2 = scene.vertices[tri[:, 2]] - v0

    light_p, ng = sample_triangle(v0, e1, e2, u1, u2)
    area = 0.5 * jnp.linalg.norm(ng, axis=-1)
    light_n = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)

    to_light = light_p - p
    dist2 = jnp.sum(to_light * to_light, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi = to_light / dist[..., None]

    # pdf of having picked this triangle (power pmf entry)
    pdf_tri = scene.emissive_pmf[slot]
    # area pdf → solid angle (reference: LightUtils.h area_to_solid_angle_pdf)
    cos_light = jnp.abs(jnp.sum(light_n * (-wi), axis=-1))
    pdf = pdf_tri / jnp.maximum(area, 1e-12) * dist2 / jnp.maximum(cos_light, 1e-8)

    mats = scene.materials.at_indices(scene.material_ids[safe_tri])
    radiance = mats.effective_emission()

    valid = (tri_idx >= 0) & (cos_light > 1e-8) & (scene.num_emissives > 0)
    return rng_state, {
        "wi": wi,
        "dist": dist,
        "radiance": radiance,
        "pdf": jnp.where(valid, pdf, 0.0),
        "valid": valid,
        "light_normal": light_n,
        "light_point": light_p,
        "tri_index": tri_idx,
    }


def emissive_pdf_of_direction(
    scene: SceneData, p: jax.Array, hit_prim: jax.Array, hit_t: jax.Array, wi: jax.Array
):
    """Solid-angle pdf that NEE would have produced the direction wi which hit
    emissive primitive hit_prim at distance hit_t — for MIS weighting of BSDF
    samples that land on lights (reference: Lights.h MIS path).

    Returns (pdf (N,), is_emissive_hit (N,) bool).
    """
    safe_prim = jnp.maximum(hit_prim, 0)
    mat_id = scene.material_ids[safe_prim]
    mats = scene.materials.at_indices(mat_id)
    em = mats.effective_emission()
    is_em = (hit_prim >= 0) & jnp.any(em > 0.0, axis=-1)

    tri = scene.triangles[safe_prim]
    v0 = scene.vertices[tri[:, 0]]
    e1 = scene.vertices[tri[:, 1]] - v0
    e2 = scene.vertices[tri[:, 2]] - v0
    ng = jnp.cross(e1, e2)
    area2 = jnp.linalg.norm(ng, axis=-1)
    area = 0.5 * area2
    light_n = ng / jnp.maximum(area2[..., None], 1e-12)

    # pdf of selecting this triangle under the power CDF: power_i / total.
    # power_i = area * sum(emission); reconstruct from the CDF via the slot of
    # this prim — emissive_tri_indices is sorted ascending, so search it.
    slot = jnp.clip(
        jnp.searchsorted(scene.emissive_tri_indices, safe_prim, side="left"),
        0,
        scene.emissive_tri_indices.shape[0] - 1,
    )
    matched = scene.emissive_tri_indices[slot] == safe_prim
    pdf_tri = scene.emissive_pmf[slot]

    cos_light = jnp.abs(jnp.sum(light_n * (-wi), axis=-1))
    dist2 = hit_t * hit_t
    pdf = pdf_tri / jnp.maximum(area, 1e-12) * dist2 / jnp.maximum(cos_light, 1e-8)
    ok = is_em & matched & jnp.isfinite(pdf)
    return jnp.where(ok, pdf, 0.0), is_em
