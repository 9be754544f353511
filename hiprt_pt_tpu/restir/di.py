"""ReSTIR DI — spatiotemporal reservoir reuse for direct lighting.

Role parity with the reference's 5-kernel ReSTIR DI pipeline
(src/Renderer/RenderPasses/ReSTIRDIRenderPass.cpp + src/Device/kernels/ReSTIR/DI/*):
light presampling [Wyman & Panteleev 2021], per-pixel initial candidates (RIS
over presampled lights + BSDF samples), temporal reuse with back-projection and
similarity heuristics, N spatial reuse passes with configurable bias
correction, and final shading with visibility. The fused spatiotemporal mode
runs temporal+spatial in one pass (reference: FusedSpatiotemporalReuse.h).

Measure convention: area-light samples are stored and weighted in AREA measure
(pixel-independent → no reuse Jacobians); envmap samples in solid angle (also
pixel-independent). The target function p_hat is the unshadowed luminance of
f·Le·G in the sample's measure.

TPU-first: every pass is a pure function Reservoir → Reservoir over the flat
pixel wavefront; neighbor taps are gathers in the canonical tile-major order
(ops/pixel_order.py) converted through pixel coordinates; the reference's
ping-pong output-buffer bookkeeping (ReSTIRDIRenderPass.cpp:559-575)
disappears into functional state threading.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets.scene import SceneData
from ..core import rng as rng_mod
from ..core.settings import (
    EnvmapSamplingStrategy,
    ReSTIRBiasCorrection,
    RenderOptions,
    WorldSettings,
)
from ..lights.envmap_sampling import sample_envmap
from ..lights.light_sampling import searchsorted_cdf
from ..models.dispatcher import bsdf_eval, bsdf_sample
from ..ops.intersect import offset_ray_origin
from ..ops.pixel_order import pixel_coords, linear_index
from ..ops.sampling import sample_triangle
from ..ops.tonemap import luminance
from ..ops.traverse import closest_hit_coherent, occluded_coherent
from .reservoir import Reservoir


# ----------------------------------------------------------------- target fn


def eval_target(options, mats, p, ns, wo, eta_rel, res_or_sample, scene=None,
                world=None):
    """p_hat of a (light_point, light_normal, radiance, is_envmap) sample at
    surface (p, ns, wo). Returns (p_hat (N,), wi (N,3), dist (N,))."""
    lp = res_or_sample["light_point"]
    ln = res_or_sample["light_normal"]
    rad = res_or_sample["radiance"]
    is_env = res_or_sample["is_envmap"]

    to_l = lp - p
    d2 = jnp.sum(to_l * to_l, axis=-1)
    dist_area = jnp.sqrt(jnp.maximum(d2, 1e-12))
    wi_area = to_l / dist_area[:, None]
    wi = jnp.where(is_env[:, None], lp, wi_area)
    dist = jnp.where(is_env, jnp.inf, dist_area)

    cos_i = jnp.maximum(jnp.sum(ns * wi, axis=-1), 0.0)
    cos_l = jnp.abs(jnp.sum(ln * (-wi), axis=-1))
    f, _ = bsdf_eval(options, mats, ns, wo, wi, {"eta_rel": eta_rel})
    base = luminance(f * rad) * cos_i
    ph_area = base * cos_l / jnp.maximum(d2, 1e-12)
    ph = jnp.where(is_env, base, ph_area)
    return jnp.where(jnp.isfinite(ph) & (ph >= 0.0), ph, 0.0), wi, dist


def _sample_of(res: Reservoir):
    return {
        "light_point": res.light_point,
        "light_normal": res.light_normal,
        "radiance": res.radiance,
        "is_envmap": res.is_envmap,
    }


# ------------------------------------------------------------- presampling


def presample_lights(scene: SceneData, sample_number):
    """Presampled light pool (reference: LightsPresampling.h — subsets x
    subset-size light table regenerated per frame, tile-coherent access).

    Returns a pool dict of (S*K,) arrays with area-measure pdfs."""
    S = 32  # subsets (reference: 128x1024; scaled to the pool's per-sample
            # regeneration here)
    K = 256
    n = S * K
    pool_rng = rng_mod.seed(
        jnp.arange(n, dtype=jnp.uint32), sample_number, jnp.uint32(977)
    )
    pool_rng, u0 = rng_mod.next_float(pool_rng)
    pool_rng, u1, u2 = rng_mod.next_float2(pool_rng)

    slot = searchsorted_cdf(scene.emissive_power_cdf, u0)
    tri_idx = scene.emissive_tri_indices[slot]
    safe_tri = jnp.maximum(tri_idx, 0)
    tri = scene.triangles[safe_tri]
    v0 = scene.vertices[tri[:, 0]]
    e1 = scene.vertices[tri[:, 1]] - v0
    e2 = scene.vertices[tri[:, 2]] - v0
    lp, ng = sample_triangle(v0, e1, e2, u1, u2)
    area = 0.5 * jnp.linalg.norm(ng, axis=-1)
    ln = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)
    prev = jnp.where(slot > 0, scene.emissive_power_cdf[jnp.maximum(slot - 1, 0)], 0.0)
    pdf_area = (scene.emissive_power_cdf[slot] - prev) / jnp.maximum(area, 1e-12)
    mats = scene.materials.at_indices(scene.material_ids[safe_tri])
    rad = mats.effective_emission()
    valid = tri_idx >= 0

    pool = {
        "light_point": lp,
        "light_normal": ln,
        "radiance": rad,
        "pdf": jnp.where(valid, pdf_area, 0.0),
        "is_envmap": jnp.zeros((n,), jnp.bool_),
        "valid": valid,
        "S": S,
        "K": K,
    }
    return pool


# ------------------------------------------------------- initial candidates


def initial_candidates(
    options: RenderOptions,
    scene: SceneData,
    bvh,
    world: WorldSettings,
    settings,
    mats,
    p, ns, ng, wo, eta_rel,
    active,
    rng_state,
    pool=None,
    tile_id=None,
):
    """Per-pixel RIS over light (+envmap) + BSDF candidates into a reservoir
    (reference: InitialCandidates.h:449, tile-coherent presampled subsets)."""
    n = p.shape[0]
    res = Reservoir.empty(n)
    M_l = settings.restir_di.num_light_candidates
    M_b = settings.restir_di.num_bsdf_candidates
    p_env = settings.restir_di.envmap_candidate_probability
    has_env = (
        scene.envmap is not None
        and options.envmap_sampling != EnvmapSamplingStrategy.NO_SAMPLING
    )

    def light_body(i, carry):
        res, rng_state = carry
        rng_state, u_env = rng_mod.next_float(rng_state)
        use_env = has_env & (u_env < p_env)

        if pool is not None and tile_id is not None:
            # tile-coherent subset pick from the presampled pool
            # (reference: Cantor-pairing subset selection)
            rng_state, u_pick = rng_mod.next_float(rng_state)
            subset = (tile_id + i) % pool["S"]
            k = jnp.clip((u_pick * pool["K"]).astype(jnp.int32), 0, pool["K"] - 1)
            idx = subset * pool["K"] + k
            lp = pool["light_point"][idx]
            ln = pool["light_normal"][idx]
            rad = pool["radiance"][idx]
            pdf_area = pool["pdf"][idx]
            lvalid = pool["valid"][idx]
        else:
            from ..lights.light_sampling import sample_emissive_triangle

            rng_state, ls = sample_emissive_triangle(scene, p, rng_state)
            lp = ls["light_point"]
            ln = ls["light_normal"]
            rad = ls["radiance"]
            # convert returned solid-angle pdf back to area measure
            cos_l = jnp.abs(jnp.sum(ln * (-ls["wi"]), axis=-1))
            pdf_area = ls["pdf"] * cos_l / jnp.maximum(ls["dist"] ** 2, 1e-12)
            lvalid = ls["valid"]

        if has_env:
            rng_state, wi_e, rad_e, pdf_e = sample_envmap(
                options, world, scene.envmap, rng_state, n
            )
            lp = jnp.where(use_env[:, None], wi_e, lp)
            ln = jnp.where(use_env[:, None], -wi_e, ln)
            rad = jnp.where(use_env[:, None], rad_e, rad)
            pdf_area = jnp.where(
                use_env, pdf_e * p_env, pdf_area * (1.0 - p_env)
            )
            lvalid = jnp.where(use_env, pdf_e > 0.0, lvalid)
            is_env = use_env
        else:
            is_env = jnp.zeros((n,), jnp.bool_)

        sample = {
            "light_point": lp,
            "light_normal": ln,
            "radiance": rad,
            "is_envmap": is_env,
        }
        ph, wi, dist = eval_target(options, mats, p, ns, wo, eta_rel, sample)
        valid = active & lvalid & (pdf_area > 0.0)
        w = ph / jnp.maximum(pdf_area, 1e-12) / M_l.astype(jnp.float32)
        res, rng_state = res.update(
            rng_state, w, lp, ln, rad, ph, is_env, valid
        )
        return res, rng_state

    res, rng_state = jax.lax.fori_loop(0, M_l, light_body, (res, rng_state))

    # BSDF candidates: trace to find the emitter they hit
    def bsdf_body(i, carry):
        res, rng_state = carry
        rng_state, wi, f, pdf_b, _aux = bsdf_sample(
            options, mats, ns, wo, rng_state, {"eta_rel": eta_rel}
        )
        cos_i = jnp.sum(ns * wi, axis=-1)
        cand = active & (pdf_b > 0.0) & (cos_i > 0.0)
        o = offset_ray_origin(p, ng, wi)
        rec = closest_hit_coherent(bvh, o, wi, t_min=0.0, active=cand)
        hit = rec.prim >= 0
        em_mats = scene.materials.at_indices(
            scene.material_ids[jnp.maximum(rec.prim, 0)]
        )
        rad = em_mats.effective_emission()
        is_em = jnp.any(rad > 0.0, axis=-1) & hit
        # reconstruct the hit point + normal
        lp = o + wi * jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)[:, None]
        from ..render.integrator import _interpolate_hit

        ns_l, ng_l, _, _, _ = _interpolate_hit(scene, rec.prim, rec.u, rec.v, wi)
        cos_l = jnp.abs(jnp.sum(ng_l * (-wi), axis=-1))
        d2 = jnp.maximum(rec.t * rec.t, 1e-12)
        pdf_area = pdf_b * cos_l / d2  # solid → area
        sample = {
            "light_point": lp,
            "light_normal": ng_l,
            "radiance": rad,
            "is_envmap": jnp.zeros((n,), jnp.bool_),
        }
        ph, _, _ = eval_target(options, mats, p, ns, wo, eta_rel, sample)
        valid = cand & is_em & (pdf_area > 0.0)
        w = ph / jnp.maximum(pdf_area, 1e-12) / jnp.maximum(
            M_b.astype(jnp.float32), 1.0
        )
        res, rng_state = res.update(
            rng_state, w,
            lp, ng_l, rad, ph, jnp.zeros((n,), jnp.bool_), valid,
        )
        return res, rng_state

    res, rng_state = jax.lax.fori_loop(0, M_b, bsdf_body, (res, rng_state))

    res = res.finalize()  # 1/M over the candidate streams
    res = res.replace(M=jnp.where(res.M > 0, 1.0, 0.0))  # confidence = 1

    # optional visibility reuse: kill occluded winners before any reuse
    # (reference: ReSTIR_DI_DoVisibilityReuse)
    if options.restir_di_initial_visibility:
        ph, wi, dist = eval_target(
            options, mats, p, ns, wo, eta_rel, _sample_of(res)
        )
        so = offset_ray_origin(p, ng, wi)
        blocked = occluded_coherent(
            bvh, so, wi,
            t_max=jnp.where(jnp.isfinite(dist), dist * (1.0 - 1e-3), 1e30),
            active=active & (res.W > 0.0),
        )
        res = res.replace(W=jnp.where(blocked, 0.0, res.W))
    return res, rng_state


# ------------------------------------------------------------ temporal reuse


def temporal_reuse(
    options: RenderOptions,
    settings,
    scene: SceneData,
    mats,
    gbuf,
    prev_gbuf,
    prev_res: Reservoir,
    cur_res: Reservoir,
    eta_rel,
    active,
    width: int,
    height: int,
    prev_view_proj,
    rng_state,
):
    """Combine each pixel's reservoir with its back-projected previous-frame
    reservoir (reference: TemporalReuse.h:48 — M-cap + similarity heuristics)."""
    p = gbuf.position
    ns = gbuf.shading_normal
    wo = gbuf.view_direction
    n = p.shape[0]

    # back-project current hit into the previous frame's screen
    ph4 = jnp.concatenate([p, jnp.ones((n, 1), jnp.float32)], axis=-1)
    clip = ph4 @ prev_view_proj.T
    ndc = clip[:, :2] / jnp.maximum(jnp.abs(clip[:, 3:4]), 1e-12) * jnp.sign(
        clip[:, 3:4]
    )
    prev_px = jnp.clip(((ndc[:, 0] * 0.5 + 0.5) * width).astype(jnp.int32), 0, width - 1)
    prev_py = jnp.clip(((ndc[:, 1] * 0.5 + 0.5) * height).astype(jnp.int32), 0, height - 1)
    in_screen = (
        (ndc[:, 0] > -1.0) & (ndc[:, 0] < 1.0)
        & (ndc[:, 1] > -1.0) & (ndc[:, 1] < 1.0)
        & (clip[:, 3] > 0.0)
    )
    # row-major pixel → canonical order index
    lin2canon = jnp.argsort(linear_index(width, height))
    prev_idx = lin2canon[prev_py * width + prev_px]

    prev_r = prev_res.gather(prev_idx)
    prev_n = prev_gbuf.shading_normal[prev_idx]
    prev_p = prev_gbuf.position[prev_idx]
    prev_mat = prev_gbuf.material_id[prev_idx]

    # similarity heuristics (reference: normal / plane-distance / roughness)
    normal_ok = jnp.sum(ns * prev_n, axis=-1) > settings.restir_di.normal_similarity_threshold
    plane_d = jnp.abs(jnp.sum((prev_p - p) * ns, axis=-1))
    plane_ok = plane_d < settings.restir_di.plane_distance_threshold
    valid = (
        active
        & settings.restir_di.temporal_enabled
        & in_screen
        & normal_ok
        & plane_ok
        & (prev_gbuf.prim_index[prev_idx] >= 0)
        & (prev_r.M > 0.0)
    )

    prev_r = prev_r.m_capped(settings.restir_di.m_cap)
    ph_here, _, _ = eval_target(
        options, mats, p, ns, wo, eta_rel, _sample_of(prev_r)
    )
    combined, rng_state = cur_res.combine(
        rng_state, prev_r, ph_here, prev_r.M, valid
    )
    combined = combined.finalize()
    return combined, rng_state


# ------------------------------------------------------------- spatial reuse


def spatial_reuse_pass(
    options: RenderOptions,
    settings,
    scene: SceneData,
    mats,
    gbuf,
    res: Reservoir,
    eta_rel,
    active,
    width: int,
    height: int,
    rng_state,
    pass_index: int = 0,
):
    """One spatial pass: resample from N disk neighbors with similarity
    heuristics and the configured bias correction (reference: SpatialReuse.h:64
    + the 6 bias-correction MIS schemes of KernelOptions.h).

    Implemented schemes:
      M_WEIGHT_1_OVER_M      — confidence weights, biased (cheap)
      M_WEIGHT_1_OVER_Z      — unbiased Z-counting normalization
      PAIRWISE_MIS           — pairwise MIS weights vs the canonical sample
      PAIRWISE_MIS_DEFENSIVE — ditto with the defensive canonical term
                               (the reference's default)
    Other enum values fall back to 1/Z.
    """
    p = gbuf.position
    ns = gbuf.shading_normal
    wo = gbuf.view_direction
    n = p.shape[0]
    px, py = pixel_coords(width, height)
    lin2canon = jnp.argsort(linear_index(width, height))

    num_nb = settings.restir_di.num_spatial_neighbors
    radius = settings.restir_di.spatial_radius
    scheme = options.restir_di_bias_correction
    pairwise = scheme in (
        ReSTIRBiasCorrection.PAIRWISE_MIS,
        ReSTIRBiasCorrection.PAIRWISE_MIS_DEFENSIVE,
    )
    defensive = scheme == ReSTIRBiasCorrection.PAIRWISE_MIS_DEFENSIVE

    def _nb_index(u1, u2):
        r = radius * jnp.sqrt(u1)
        theta = 2.0 * jnp.pi * u2
        ox = (r * jnp.cos(theta)).astype(jnp.int32)
        oy = (r * jnp.sin(theta)).astype(jnp.int32)
        nx = jnp.clip(px + ox, 0, width - 1)
        ny = jnp.clip(py + oy, 0, height - 1)
        return lin2canon[ny * width + nx]

    def _nb_valid(nb_idx, nb_M):
        nb_n = gbuf.shading_normal[nb_idx]
        nb_p = gbuf.position[nb_idx]
        normal_ok = (
            jnp.sum(ns * nb_n, axis=-1)
            > settings.restir_di.normal_similarity_threshold
        )
        plane_ok = (
            jnp.abs(jnp.sum((nb_p - p) * ns, axis=-1))
            < settings.restir_di.plane_distance_threshold
        )
        return (
            active
            & normal_ok
            & plane_ok
            & (gbuf.prim_index[nb_idx] >= 0)
            & (nb_M > 0.0)
            & (nb_idx != jnp.arange(n))
        )

    def neighbor_index_at(u1, u2):
        nb_idx = _nb_index(u1, u2)
        nb_M = res.M[nb_idx]
        return nb_idx, _nb_valid(nb_idx, nb_M), nb_M

    def neighbor_tap_at(u1, u2, rng_state):
        """Validated neighbor + its sample's target at our surface (+ ours at
        the neighbor's surface, for pairwise)."""
        nb_idx = _nb_index(u1, u2)
        nb_r = res.gather(nb_idx)
        valid = _nb_valid(nb_idx, nb_r.M)
        ph_here, _, _ = eval_target(
            options, mats, p, ns, wo, eta_rel, _sample_of(nb_r)
        )
        nb_mats = scene.materials.at_indices(
            jnp.maximum(gbuf.material_id[nb_idx], 0)
        ).make_safe()
        ph_at_nb, _, _ = eval_target(
            options, nb_mats, gbuf.position[nb_idx],
            gbuf.shading_normal[nb_idx], gbuf.view_direction[nb_idx],
            eta_rel, _sample_of(res),
        )
        return rng_state, nb_r, ph_here, ph_at_nb, valid

    def neighbor_tap(j, rng_state):
        rng_state, u1, u2 = rng_mod.next_float2(rng_state)
        return neighbor_tap_at(u1, u2, rng_state)

    if pairwise:
        # ---- pairwise MIS (canonical vs each neighbor pairing) ----
        # m_i(x_i) = phat_i(x_i) / (phat_c(x_i) + K*phat_i(x_i))
        # m_c(x_c) = (1/K) sum_i phat_c(x_c)/(phat_c(x_c) + K*phat_i(x_c))
        # (defensive: scale by K/(K+1) and add 1/(K+1) to the canonical term)
        Kf = jnp.maximum(num_nb.astype(jnp.float32), 1.0)
        out = Reservoir.empty(n)
        m_c = jnp.zeros((n,), jnp.float32)
        m_total = res.M

        def nb_body(j, carry):
            out, m_c, m_total, rng_state = carry
            rng_state, nb_r, ph_here, ph_at_nb, valid = neighbor_tap(
                j, rng_state
            )
            m_i = nb_r.target / jnp.maximum(
                ph_here + Kf * nb_r.target, 1e-12
            )
            if defensive:
                m_i = m_i * (Kf / (Kf + 1.0))
            new_out, rng_state = out.combine(
                rng_state, nb_r, ph_here, m_i, valid
            )
            out = new_out
            # canonical MIS accumulation for this pairing
            term = res.target / jnp.maximum(
                res.target + Kf * ph_at_nb, 1e-12
            )
            m_c = m_c + jnp.where(valid, term, 1.0)  # invalid neighbor: our
            # sample is the only candidate of that pairing
            m_total = m_total + jnp.where(valid, nb_r.M, 0.0)
            return out, m_c, m_total, rng_state

        out, m_c, m_total, rng_state = jax.lax.fori_loop(
            0, num_nb, nb_body, (out, m_c, m_total, rng_state)
        )
        m_c = m_c / Kf
        if defensive:
            m_c = m_c * (Kf / (Kf + 1.0)) + 1.0 / (Kf + 1.0)
        # stream the canonical reservoir's sample with its MIS weight
        canon_w = m_c * res.target * res.W
        out, rng_state = out.update(
            rng_state,
            canon_w,
            res.light_point,
            res.light_normal,
            res.radiance,
            res.target,
            res.is_envmap,
            active & (res.M > 0.0),
        )
        out = out.finalize(normalization=jnp.ones((n,), jnp.float32))
        out = out.replace(M=m_total)
        return out, rng_state

    # ---- confidence-weight schemes: 1/M (biased) or 1/Z (unbiased) ----
    unbiased = scheme != ReSTIRBiasCorrection.M_WEIGHT_1_OVER_M
    # dedicated tap stream so the Z pass can REPLAY the same neighbor picks
    # (Z must be counted against the FINAL winner, not the evolving one)
    tap_rng0 = rng_mod.pcg_hash(rng_state ^ jnp.uint32(0x5F3759DF))
    out = res
    m_total = res.M

    def combine_body(j, carry):
        out, m_total, rng_state, tap_rng = carry
        tap_rng, u1 = rng_mod.next_float(tap_rng)
        tap_rng, u2 = rng_mod.next_float(tap_rng)
        rng_state, nb_r, ph_here, _, valid = neighbor_tap_at(u1, u2, rng_state)
        new_out, rng_state = out.combine(rng_state, nb_r, ph_here, nb_r.M, valid)
        m_total = m_total + jnp.where(valid, nb_r.M, 0.0)
        return new_out, m_total, rng_state, tap_rng

    out, m_total, rng_state, _ = jax.lax.fori_loop(
        0, num_nb, combine_body, (out, m_total, rng_state, tap_rng0)
    )

    if unbiased:
        # second pass: count confidence of every participant whose surface
        # could produce the final winner (target > 0 there)
        z0 = jnp.where(res.target > 0.0, res.M, 0.0)

        def z_body(j, carry):
            z, tap_rng = carry
            tap_rng, u1 = rng_mod.next_float(tap_rng)
            tap_rng, u2 = rng_mod.next_float(tap_rng)
            nb_idx, nb_valid, nb_M = neighbor_index_at(u1, u2)
            nb_mats = scene.materials.at_indices(
                jnp.maximum(gbuf.material_id[nb_idx], 0)
            ).make_safe()
            ph_at_nb, _, _ = eval_target(
                options, nb_mats, gbuf.position[nb_idx],
                gbuf.shading_normal[nb_idx], gbuf.view_direction[nb_idx],
                eta_rel, _sample_of(out),
            )
            z = z + jnp.where(nb_valid & (ph_at_nb > 0.0), nb_M, 0.0)
            return z, tap_rng

        z_count, _ = jax.lax.fori_loop(0, num_nb, z_body, (z0, tap_rng0))
        out = out.finalize(normalization=jnp.maximum(z_count, 1e-6))
        out = out.replace(M=m_total)
    else:
        out = out.replace(M=m_total).finalize()
    return out, rng_state


def fused_spatiotemporal_reuse(
    options: RenderOptions,
    settings,
    scene: SceneData,
    mats,
    gbuf,
    prev_gbuf,
    prev_res: Reservoir,
    cur_res: Reservoir,
    eta_rel,
    active,
    width: int,
    height: int,
    prev_view_proj,
    rng_state,
):
    """Fused spatiotemporal reuse — one pass streaming the back-projected
    temporal reservoir AND spatial neighbors (taken from the previous frame's
    reservoirs, since the current frame's are not finished) into the initial-
    candidate reservoir (reference: FusedSpatiotemporalReuse.h:135 +
    ReSTIRDIRenderPass.cpp:475-506). Pairwise-MIS-defensive weights between
    the canonical (initial-candidate) sample and every tap keep it unbiased
    without a separate normalization pass."""
    p = gbuf.position
    ns = gbuf.shading_normal
    wo = gbuf.view_direction
    n = p.shape[0]
    lin2canon = jnp.argsort(linear_index(width, height))

    # back-project the current hit into the previous frame
    ph4 = jnp.concatenate([p, jnp.ones((n, 1), jnp.float32)], axis=-1)
    clip = ph4 @ prev_view_proj.T
    ndc = clip[:, :2] / jnp.maximum(jnp.abs(clip[:, 3:4]), 1e-12) * jnp.sign(
        clip[:, 3:4]
    )
    prev_px = jnp.clip(
        ((ndc[:, 0] * 0.5 + 0.5) * width).astype(jnp.int32), 0, width - 1
    )
    prev_py = jnp.clip(
        ((ndc[:, 1] * 0.5 + 0.5) * height).astype(jnp.int32), 0, height - 1
    )
    in_screen = (
        (ndc[:, 0] > -1.0) & (ndc[:, 0] < 1.0)
        & (ndc[:, 1] > -1.0) & (ndc[:, 1] < 1.0)
        & (clip[:, 3] > 0.0)
    )

    Kf = settings.restir_di.num_spatial_neighbors.astype(jnp.float32) + 1.0

    def tap(rng_state, tap_px, tap_py, tap_valid, out, m_c, m_total):
        idx = lin2canon[
            jnp.clip(tap_py, 0, height - 1) * width
            + jnp.clip(tap_px, 0, width - 1)
        ]
        r_n = prev_res.gather(idx).m_capped(settings.restir_di.m_cap)
        nb_n = prev_gbuf.shading_normal[idx]
        nb_p = prev_gbuf.position[idx]
        normal_ok = (
            jnp.sum(ns * nb_n, axis=-1)
            > settings.restir_di.normal_similarity_threshold
        )
        plane_ok = (
            jnp.abs(jnp.sum((nb_p - p) * ns, axis=-1))
            < settings.restir_di.plane_distance_threshold
        )
        valid = (
            tap_valid
            & active
            & normal_ok
            & plane_ok
            & (prev_gbuf.prim_index[idx] >= 0)
            & (r_n.M > 0.0)
        )
        # pairwise MIS: the tap's own-domain target is stored in r_n.target
        ph_here, _, _ = eval_target(
            options, mats, p, ns, wo, eta_rel, _sample_of(r_n)
        )
        m_i = r_n.target / jnp.maximum(ph_here + Kf * r_n.target, 1e-12)
        m_i = m_i * (Kf / (Kf + 1.0))  # defensive
        new_out, rng_state = out.combine(rng_state, r_n, ph_here, m_i, valid)
        # canonical pairing term: OUR canonical sample at the tap's surface
        nb_mats = scene.materials.at_indices(
            jnp.maximum(prev_gbuf.material_id[idx], 0)
        ).make_safe()
        ph_at_nb, _, _ = eval_target(
            options, nb_mats, nb_p, nb_n, prev_gbuf.view_direction[idx],
            eta_rel, _sample_of(cur_res),
        )
        term = cur_res.target / jnp.maximum(
            cur_res.target + Kf * ph_at_nb, 1e-12
        )
        m_c = m_c + jnp.where(valid, term, 1.0)
        m_total = m_total + jnp.where(valid, r_n.M, 0.0)
        return rng_state, new_out, m_c, m_total

    out = Reservoir.empty(n)
    m_c = jnp.zeros((n,), jnp.float32)
    m_total = cur_res.M

    # temporal center tap
    rng_state, out, m_c, m_total = tap(
        rng_state, prev_px, prev_py,
        in_screen & settings.restir_di.temporal_enabled,
        out, m_c, m_total,
    )

    # spatial neighbor taps around the reprojected position
    def nb_body(j, carry):
        out, m_c, m_total, rng_state = carry
        rng_state, u1, u2 = rng_mod.next_float2(rng_state)
        r = settings.restir_di.spatial_radius * jnp.sqrt(u1)
        theta = 2.0 * jnp.pi * u2
        ox = (r * jnp.cos(theta)).astype(jnp.int32)
        oy = (r * jnp.sin(theta)).astype(jnp.int32)
        rng_state, out, m_c, m_total = tap(
            rng_state, prev_px + ox, prev_py + oy, in_screen,
            out, m_c, m_total,
        )
        return out, m_c, m_total, rng_state

    out, m_c, m_total, rng_state = jax.lax.fori_loop(
        0, settings.restir_di.num_spatial_neighbors, nb_body,
        (out, m_c, m_total, rng_state),
    )
    m_c = m_c / Kf
    m_c = m_c * (Kf / (Kf + 1.0)) + 1.0 / (Kf + 1.0)  # defensive floor
    canon_w = m_c * cur_res.target * cur_res.W
    out, rng_state = out.update(
        rng_state,
        canon_w,
        cur_res.light_point,
        cur_res.light_normal,
        cur_res.radiance,
        cur_res.target,
        cur_res.is_envmap,
        active & (cur_res.M > 0.0),
    )
    out = out.finalize(normalization=jnp.ones((n,), jnp.float32))
    out = out.replace(M=m_total)
    return out, rng_state


# ------------------------------------------------------------- final shading


def final_shading(
    options: RenderOptions,
    scene: SceneData,
    bvh,
    world: WorldSettings,
    mats,
    gbuf,
    res: Reservoir,
    eta_rel,
    active,
):
    """Shade the winning reservoir sample with (optional) final visibility
    (reference: FinalShading.h:117). Returns (radiance (N,3), rays scalar)."""
    p = gbuf.position
    ns = gbuf.shading_normal
    ng = gbuf.geometric_normal
    wo = gbuf.view_direction

    lp = res.light_point
    is_env = res.is_envmap
    to_l = lp - p
    d2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    wi = jnp.where(is_env[:, None], lp, to_l / dist[:, None])
    dist = jnp.where(is_env, jnp.inf, dist)

    cos_i = jnp.maximum(jnp.sum(ns * wi, axis=-1), 0.0)
    cos_l = jnp.abs(jnp.sum(res.light_normal * (-wi), axis=-1))
    f, _ = bsdf_eval(options, mats, ns, wo, wi, {"eta_rel": eta_rel})
    geom = jnp.where(is_env, 1.0, cos_l / jnp.maximum(d2, 1e-12))
    contrib = f * res.radiance * (cos_i * geom * res.W)[:, None]

    has = active & (res.W > 0.0) & (res.target > 0.0)
    n_rays = jnp.float32(0.0)
    if options.restir_di_final_visibility:
        so = offset_ray_origin(p, ng, wi)
        blocked = occluded_coherent(
            bvh, so, wi,
            t_max=jnp.where(jnp.isfinite(dist), dist * (1.0 - 1e-3), 1e30),
            active=has,
        )
        has = has & ~blocked
        n_rays = jnp.sum(has.astype(jnp.float32))
    ok = res.sanity_mask()
    return jnp.where((has & ok)[:, None], contrib, 0.0), n_rays
