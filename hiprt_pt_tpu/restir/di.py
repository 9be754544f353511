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
    AmbientLightType,
    EnvmapSamplingStrategy,
    ReSTIRBiasCorrection,
    RenderOptions,
    WorldSettings,
)
from ..lights.envmap_sampling import (
    envmap_pdf_of_direction,
    eval_envmap,
    sample_envmap,
)
from ..lights.light_sampling import (
    emissive_pdf_of_direction,
    gather_rows_T,
)
from ..models.dispatcher import (
    bsdf_eval,
    bsdf_proxy_ctx,
    bsdf_proxy_eval,
    bsdf_proxy_eval_ctx,
    bsdf_proxy_sample,
    bsdf_proxy_sample_ctx,
    bsdf_sample,
)
from ..ops.intersect import offset_ray_origin
from ..ops.pixel_order import pixel_coords, linear_index
from ..ops.sampling import sample_triangle
from ..ops.tonemap import luminance
def _tracers(options, coherent: bool = False):
    # backend-selected traversal (Pallas/XLA) — see render.integrator.
    # NOTE (round 4, measured): routing the ReSTIR visibility sweeps to the
    # coherent packet kernel (coherent=True at the three winner-visibility
    # sites) REGRESSED the restir bench 1.67 -> 1.52 Mrays/s — after
    # temporal/spatial reuse the winner samples come from NEIGHBOR pixels'
    # reservoirs, so the packet union inflates vs RIS's tile-shared
    # candidates. All sites therefore stay on the per-lane default.
    from ..render.integrator import _make_tracers

    return _make_tracers(options, coherent=coherent)
from .reservoir import Reservoir


# ----------------------------------------------------------------- target fn


def eval_target_full(options, mats, p, ns, wo, eta_rel, res_or_sample,
                     pctx=None):
    """p_hat of a (light_point, light_normal, radiance, is_envmap) sample at
    surface (p, ns, wo), plus the geometry/pdf terms MIS needs.

    pctx: optional hoisted proxy context (models/dispatcher.bsdf_proxy_ctx)
    for THIS (mats, ns, wo) surface batch — callers that evaluate many
    candidates/neighbor m-terms at one surface build it once so the
    Fresnel-chain lobe weights drop out of the per-candidate loop (the same
    hoist ris.py applies).

    Returns dict(ph, wi, dist, bsdf_pdf [solid angle], cos_l, d2)."""
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
    # cheap proxy target (models/proxy.py): every reuse-pass m-term and UCW
    # uses this SAME target function, and final_shading evaluates the winner
    # with the exact BSDF — unbiased for any positive target
    if options.ris_proxy_target:
        if pctx is not None:
            f, bsdf_pdf = bsdf_proxy_eval_ctx(
                options, pctx, mats, ns, wo, wi, {"eta_rel": eta_rel}
            )
        else:
            f, bsdf_pdf = bsdf_proxy_eval(
                options, mats, ns, wo, wi, {"eta_rel": eta_rel}
            )
    else:
        f, bsdf_pdf = bsdf_eval(options, mats, ns, wo, wi, {"eta_rel": eta_rel})
    base = luminance(f * rad) * cos_i
    ph_area = base * cos_l / jnp.maximum(d2, 1e-12)
    ph = jnp.where(is_env, base, ph_area)
    return {
        "ph": jnp.where(jnp.isfinite(ph) & (ph >= 0.0), ph, 0.0),
        "wi": wi,
        "dist": dist,
        "bsdf_pdf": bsdf_pdf,
        "cos_l": cos_l,
        "d2": d2,
    }


def eval_target(options, mats, p, ns, wo, eta_rel, res_or_sample, scene=None,
                world=None, pctx=None):
    """p_hat of a sample at surface (p, ns, wo).
    Returns (p_hat (N,), wi (N,3), dist (N,))."""
    tf = eval_target_full(
        options, mats, p, ns, wo, eta_rel, res_or_sample, pctx=pctx
    )
    return tf["ph"], tf["wi"], tf["dist"]


def _power_heuristic_counts(pdf_a, count_a, pdf_b, count_b):
    """Count-weighted power heuristic, with the MIS estimator's 1/count_a
    already folded in (reference: Sampling.h:75-87 power_heuristic —
    returns n_a·p_a² / ((n_a·p_a)² + (n_b·p_b)²))."""
    a = count_a * pdf_a
    b = count_b * pdf_b
    return jnp.where(
        a > 0.0,
        count_a * pdf_a * pdf_a / jnp.maximum(a * a + b * b, 1e-24),
        0.0,
    )


def _sample_of(res: Reservoir):
    return {
        "light_point": res.light_point,
        "light_normal": res.light_normal,
        "radiance": res.radiance,
        "is_envmap": res.is_envmap,
    }


# ------------------------------------------------------------- presampling


def presample_lights(scene: SceneData, sample_number,
                     options: RenderOptions = RenderOptions()):
    """Presampled light pool (reference: LightsPresampling.h — subsets x
    subset-size light table regenerated per frame, tile-coherent access).

    Pool geometry comes from the static options
    (RenderOptions.restir_presample_subset_count/size ≡ the reference's
    ReSTIRDISettings.h LightPresamplingSettings).

    Returns a pool dict of (S*K,) arrays with area-measure pdfs."""
    S = options.restir_presample_subset_count
    K = options.restir_presample_subset_size
    n = S * K
    pool_rng = rng_mod.seed(
        jnp.arange(n, dtype=jnp.uint32), sample_number, jnp.uint32(977)
    )
    pool_rng, u0 = rng_mod.next_float(pool_rng)
    pool_rng, u1, u2 = rng_mod.next_float2(pool_rng)
    pool_rng, u_acc = rng_mod.next_float(pool_rng)

    # O(1) alias draw (see SceneData.emissive_alias_prob)
    e = scene.emissive_alias_prob.shape[0]
    j = jnp.minimum((u0 * e).astype(jnp.int32), e - 1)
    slot = jnp.where(
        u_acc < scene.emissive_alias_prob[j], j, scene.emissive_alias[j]
    )
    tri_idx = scene.emissive_tri_indices[slot]
    safe_tri = jnp.maximum(tri_idx, 0)
    tri = scene.triangles[safe_tri]
    v0 = scene.vertices[tri[:, 0]]
    e1 = scene.vertices[tri[:, 1]] - v0
    e2 = scene.vertices[tri[:, 2]] - v0
    lp, ng = sample_triangle(v0, e1, e2, u1, u2)
    area = 0.5 * jnp.linalg.norm(ng, axis=-1)
    ln = ng / jnp.maximum(jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-12)
    pdf_area = scene.emissive_pmf[slot] / jnp.maximum(area, 1e-12)
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
    # hoisted proxy lobe weights for THIS surface batch: shared by every
    # light/BSDF candidate eval and the visibility-reuse re-eval below
    pctx = bsdf_proxy_ctx(options, mats, ns, wo) \
        if options.ris_proxy_target else None
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
        tf = eval_target_full(
            options, mats, p, ns, wo, eta_rel, sample, pctx=pctx
        )
        ph = tf["ph"]
        valid = active & lvalid & (pdf_area > 0.0)
        # MIS against the BSDF candidate stream, in the candidate's own
        # measure (area for surface lights, solid angle for envmap)
        # (reference: InitialCandidates.h:241 power_heuristic with counts)
        pdf_b_meas = jnp.where(
            is_env,
            tf["bsdf_pdf"],
            tf["bsdf_pdf"] * tf["cos_l"] / jnp.maximum(tf["d2"], 1e-12),
        )
        mis_w = _power_heuristic_counts(
            pdf_area, M_l.astype(jnp.float32),
            pdf_b_meas, M_b.astype(jnp.float32),
        )
        w = mis_w * ph / jnp.maximum(pdf_area, 1e-12)
        res, rng_state = res.update(
            rng_state, w, lp, ln, rad, ph, is_env, valid
        )
        return res, rng_state

    res, rng_state = jax.lax.fori_loop(0, M_l, light_body, (res, rng_state))

    # BSDF candidates: trace to find the emitter (or envmap) they hit
    def bsdf_body(i, carry):
        res, rng_state = carry
        if options.ris_proxy_target:
            # candidates drawn from the proxy sampler so pdf_b is the true
            # density of the draw AND matches eval_target_full's bsdf_pdf in
            # the cross-stream MIS weights
            rng_state, wi, f, pdf_b = bsdf_proxy_sample_ctx(
                options, pctx, mats, ns, wo, rng_state, {"eta_rel": eta_rel}
            )
        else:
            rng_state, wi, f, pdf_b, _aux = bsdf_sample(
                options, mats, ns, wo, rng_state, {"eta_rel": eta_rel}
            )
        cos_i = jnp.sum(ns * wi, axis=-1)
        cand = active & (pdf_b > 0.0) & (cos_i > 0.0)
        o = offset_ray_origin(p, ng, wi)
        from ..lights.ris import DENSE_EMISSIVE_MAX

        dense = 0 < scene.emissive_rows.shape[0] <= DENSE_EMISSIVE_MAX
        if dense:
            # dense emissive-only sweep — occlusion is settled by final
            # visibility, not candidate generation (see closest_emissive_hit)
            from ..lights.light_sampling import closest_emissive_hit

            t_e, slot = closest_emissive_hit(scene, o, wi, active=cand)
            em_hit = slot >= 0
            rowT = gather_rows_T(scene.emissive_rows, jnp.maximum(slot, 0))
            rad = rowT[14:17].T
            ng_l = rowT[9:12].T
            lp = o + wi * jnp.where(em_hit, t_e, 0.0)[:, None]
            cos_l = jnp.abs(jnp.sum(ng_l * (-wi), axis=-1))
            d2 = jnp.maximum(t_e * t_e, 1e-12)
            pdf_l_area = rowT[13] / jnp.maximum(rowT[12], 1e-12)
            is_em = em_hit
            miss_for_env = ~em_hit
        else:
            rec = _tracers(options)[0](bvh, o, wi, t_min=0.0, active=cand)
            hit = rec.prim >= 0
            em_mats = scene.materials.at_indices(
                scene.material_ids[jnp.maximum(rec.prim, 0)]
            )
            rad = em_mats.effective_emission()
            is_em = jnp.any(rad > 0.0, axis=-1) & hit
            # reconstruct the hit point + normal
            lp = o + wi * jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)[:, None]
            from ..render.integrator import _interpolate_hit

            ns_l, ng_l, _, _, _ = _interpolate_hit(
                scene, rec.prim, rec.u, rec.v, wi
            )
            cos_l = jnp.abs(jnp.sum(ng_l * (-wi), axis=-1))
            d2 = jnp.maximum(rec.t * rec.t, 1e-12)
            # light-domain pdf of this point for MIS (area measure) —
            # reference: InitialCandidates.h:350
            pdf_l_solid, _ = emissive_pdf_of_direction(
                scene, o, rec.prim, rec.t, wi
            )
            pdf_l_area = pdf_l_solid * cos_l / d2
            miss_for_env = ~hit
        pdf_area = pdf_b * cos_l / d2  # solid → area
        sample = {
            "light_point": lp,
            "light_normal": ng_l,
            "radiance": rad,
            "is_envmap": jnp.zeros((n,), jnp.bool_),
        }
        ph, _, _ = eval_target(
            options, mats, p, ns, wo, eta_rel, sample, pctx=pctx
        )
        valid = cand & is_em & (pdf_area > 0.0)
        if has_env:
            pdf_l_area = pdf_l_area * (1.0 - p_env)
        mis_w = _power_heuristic_counts(
            pdf_area, M_b.astype(jnp.float32),
            pdf_l_area, M_l.astype(jnp.float32),
        )
        w = mis_w * ph / jnp.maximum(pdf_area, 1e-12)
        res, rng_state = res.update(
            rng_state, w,
            lp, ng_l, rad, ph, jnp.zeros((n,), jnp.bool_), valid,
        )

        if has_env:
            # miss → envmap candidate (solid-angle measure; reference:
            # InitialCandidates.h:377-405)
            env_rad = eval_envmap(world, scene.envmap, wi)
            env_sample = {
                "light_point": wi,
                "light_normal": -wi,
                "radiance": env_rad,
                "is_envmap": jnp.ones((n,), jnp.bool_),
            }
            ph_e, _, _ = eval_target(
                options, mats, p, ns, wo, eta_rel, env_sample, pctx=pctx
            )
            pdf_e_l = envmap_pdf_of_direction(
                options, world, scene.envmap, wi
            ) * p_env
            mis_e = _power_heuristic_counts(
                pdf_b, M_b.astype(jnp.float32),
                pdf_e_l, M_l.astype(jnp.float32),
            )
            w_e = mis_e * ph_e / jnp.maximum(pdf_b, 1e-12)
            env_on = world.ambient_light_type == int(AmbientLightType.ENVMAP)
            res, rng_state = res.update(
                rng_state, w_e, wi, -wi, env_rad, ph_e,
                jnp.ones((n,), jnp.bool_), cand & miss_for_env & env_on,
            )
        return res, rng_state

    res, rng_state = jax.lax.fori_loop(0, M_b, bsdf_body, (res, rng_state))

    # MIS weights already sum to 1 across streams → UCW = w_sum / p_hat(y)
    # (reference: Reservoir.h end(); no extra 1/M)
    res = res.finalize(normalization=jnp.ones((n,), jnp.float32))
    res = res.replace(M=jnp.where(res.M > 0, 1.0, 0.0))  # confidence = 1

    # optional visibility reuse: kill occluded winners before any reuse
    # (reference: ReSTIR_DI_DoVisibilityReuse)
    if options.restir_di_initial_visibility:
        ph, wi, dist = eval_target(
            options, mats, p, ns, wo, eta_rel, _sample_of(res), pctx=pctx
        )
        so = offset_ray_origin(p, ng, wi)
        blocked = _tracers(options)[1](
            bvh, so, wi,
            t_max=jnp.where(jnp.isfinite(dist), dist * (1.0 - 1e-3), 1e30),
            active=active & (res.W > 0.0),
        )
        res = res.replace(W=jnp.where(blocked, 0.0, res.W))
    return res, rng_state


# ------------------------------------------------------------ temporal reuse


def _similarity_ok(settings, ns, p, rough_here, nb_n, nb_p, nb_rough):
    """Neighbor similarity heuristics — normal cone, plane distance, roughness
    (reference: check_neighbor_similarity_heuristics, ReSTIR/DI/Utils.h)."""
    normal_ok = (
        jnp.sum(ns * nb_n, axis=-1)
        > settings.restir_di.normal_similarity_threshold
    )
    plane_ok = (
        jnp.abs(jnp.sum((nb_p - p) * ns, axis=-1))
        < settings.restir_di.plane_distance_threshold
    )
    rough_ok = (
        jnp.abs(nb_rough - rough_here)
        <= settings.restir_di.roughness_similarity_threshold
    )
    return normal_ok & plane_ok & rough_ok


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
    """Combine each pixel's reservoir with a valid back-projected
    previous-frame reservoir (reference: TemporalReuse.h:48).

    Implements the reference's full temporal-neighbor machinery
    (find_temporal_neighbor_index, ReSTIR/DI/Utils.h:426): the exact
    reprojected tap (optionally permutation-sampled) plus up to
    ``temporal_max_neighbor_search`` random taps in a disk until one passes
    the similarity heuristics (normal / plane distance / roughness), then an
    M-capped combine with the configured bias-correction scheme."""
    p = gbuf.position
    ns = gbuf.shading_normal
    wo = gbuf.view_direction
    n = p.shape[0]
    rough_here = mats.roughness
    # hoisted proxy lobe weights for the center surface (shared by every
    # m-term evaluated AT this surface; neighbor-surface evals stay inline)
    pctx = bsdf_proxy_ctx(options, mats, ns, wo) \
        if options.ris_proxy_target else None

    # back-project current hit into the previous frame's screen
    ph4 = jnp.concatenate([p, jnp.ones((n, 1), jnp.float32)], axis=-1)
    clip = ph4 @ prev_view_proj.T
    ndc = clip[:, :2] / jnp.maximum(jnp.abs(clip[:, 3:4]), 1e-12) * jnp.sign(
        clip[:, 3:4]
    )
    fx = (ndc[:, 0] * 0.5 + 0.5) * width
    fy = (ndc[:, 1] * 0.5 + 0.5) * height
    in_screen = (
        (ndc[:, 0] > -1.0) & (ndc[:, 0] < 1.0)
        & (ndc[:, 1] > -1.0) & (ndc[:, 1] < 1.0)
        & (clip[:, 3] > 0.0)
    )
    # row-major pixel → canonical order index
    lin2canon = jnp.argsort(linear_index(width, height))

    # ONE packed previous-frame table (same rationale as the spatial pass:
    # per-tap reads collapse from ~6 row gathers to 1; see packed_nb there)
    prev_rough = scene.materials.roughness[
        jnp.clip(prev_gbuf.material_id, 0, None)
    ]
    packed_prev = jnp.concatenate([
        prev_res.pack_columns(),                              # 0:14
        prev_gbuf.shading_normal,                             # 14:17
        prev_gbuf.position,                                   # 17:20
        prev_gbuf.view_direction,                             # 20:23
        prev_gbuf.prim_index.astype(jnp.float32)[:, None],    # 23
        prev_gbuf.material_id.astype(jnp.float32)[:, None],   # 24
        prev_rough[:, None],                                  # 25
    ], axis=1)

    def tap_valid_at(idx):
        row = packed_prev[idx]
        sim = _similarity_ok(settings, ns, p, rough_here,
                             row[:, 14:17], row[:, 17:20], row[:, 25])
        return sim & (row[:, 23] >= 0.0) & (row[:, 1] > 0.0)

    # --- neighbor search: tap 0 = exact reprojection (± permutation
    # sampling), taps 1..max = random disk offsets; keep the FIRST valid ---
    # (reference: find_temporal_neighbor_index + apply_permutation_sampling)
    max_search = settings.restir_di.temporal_max_neighbor_search
    radius = settings.restir_di.temporal_neighbor_search_radius
    # frame-constant permutation bits (reference: permutation_sampling_random_bits)
    perm_bits = (rng_state[0] >> jnp.uint32(8)).astype(jnp.int32) & 15

    def search_body(i, carry):
        found_idx, rng_state = carry
        rng_state, u1, u2 = rng_mod.next_float2(rng_state)
        off_x = jnp.where(i > 0, (u1 - 0.5) * radius, 0.0)
        off_y = jnp.where(i > 0, (u2 - 0.5) * radius, 0.0)
        tx = jnp.round(fx - 0.5 + off_x).astype(jnp.int32)
        ty = jnp.round(fy - 0.5 + off_y).astype(jnp.int32)
        # permutation sampling of the exact tap only
        do_perm = settings.restir_di.temporal_use_permutation_sampling & (i == 0)
        ox_p = perm_bits & 3
        oy_p = (perm_bits >> 2) & 3
        tx = jnp.where(do_perm, ((tx + ox_p) ^ 3) - ox_p, tx)
        ty = jnp.where(do_perm, ((ty + oy_p) ^ 3) - oy_p, ty)
        inside = (tx >= 0) & (tx < width) & (ty >= 0) & (ty < height)
        idx = lin2canon[
            jnp.clip(ty, 0, height - 1) * width + jnp.clip(tx, 0, width - 1)
        ]
        ok = inside & tap_valid_at(idx)
        found_idx = jnp.where((found_idx < 0) & ok, idx, found_idx)
        return found_idx, rng_state

    found_idx, rng_state = jax.lax.fori_loop(
        0, jnp.maximum(max_search, 0) + 1, search_body,
        (jnp.full((n,), -1, jnp.int32), rng_state),
    )

    valid = (
        active
        & settings.restir_di.temporal_enabled
        & in_screen
        & (found_idx >= 0)
    )
    prev_idx = jnp.maximum(found_idx, 0)
    prev_row = packed_prev[prev_idx]
    prev_r = Reservoir.from_columns(prev_row[:, 0:14]).m_capped(
        settings.restir_di.m_cap)

    ph_here, _, _ = eval_target(
        options, mats, p, ns, wo, eta_rel, _sample_of(prev_r), pctx=pctx
    )

    scheme = options.restir_di_bias_correction
    use_conf = options.restir_di_confidence_weights
    M_t = jnp.where(valid, prev_r.M, 0.0)
    M_c = jnp.maximum(cur_res.M, 0.0)
    c_t = M_t if use_conf else jnp.where(valid, 1.0, 0.0)
    c_c = M_c if use_conf else jnp.where(M_c > 0, 1.0, 0.0)

    if scheme in (
        ReSTIRBiasCorrection.M_WEIGHT_1_OVER_M,
        ReSTIRBiasCorrection.M_WEIGHT_1_OVER_Z,
    ):
        combined, rng_state = cur_res.combine(
            rng_state, prev_r, ph_here, M_t, valid
        )
        if scheme == ReSTIRBiasCorrection.M_WEIGHT_1_OVER_Z:
            # Z = confidence of participants whose surface CAN produce the
            # final winner (reference: TemporalNormalizationWeight 1/Z)
            prev_mats = scene.materials.at_indices(
                jnp.clip(prev_row[:, 24].astype(jnp.int32), 0, None)
            ).make_safe()
            ph_win_at_prev, _, _ = eval_target(
                options, prev_mats, prev_row[:, 17:20],
                prev_row[:, 14:17], prev_row[:, 20:23],
                eta_rel, _sample_of(combined),
            )
            z = jnp.where(combined.target > 0.0, M_c, 0.0) + jnp.where(
                valid & (ph_win_at_prev > 0.0), M_t, 0.0
            )
            combined = combined.finalize(normalization=jnp.maximum(z, 1e-6))
            combined = combined.replace(M=M_c + M_t)
        else:
            combined = combined.finalize()
        return combined, rng_state

    # --- proper two-candidate MIS (MIS_LIKE / GBH / pairwise±defensive all
    # reduce to the confidence-weighted balance heuristic at 2 participants;
    # reference: TemporalMISWeight.h) ---
    prev_mats = scene.materials.at_indices(
        jnp.clip(prev_row[:, 24].astype(jnp.int32), 0, None)
    ).make_safe()
    # temporal candidate x_t: target at its own surface is stored
    ph_t_at_prev = prev_r.target
    m_t = c_t * ph_t_at_prev / jnp.maximum(
        c_t * ph_t_at_prev + c_c * ph_here, 1e-12
    )
    # canonical candidate x_c evaluated at the temporal surface
    ph_c_at_prev, _, _ = eval_target(
        options, prev_mats, prev_row[:, 17:20],
        prev_row[:, 14:17], prev_row[:, 20:23],
        eta_rel, _sample_of(cur_res),
    )
    m_c = c_c * cur_res.target / jnp.maximum(
        c_c * cur_res.target + c_t * jnp.where(valid, ph_c_at_prev, 0.0), 1e-12
    )

    out = Reservoir.empty(n)
    out, rng_state = out.combine(rng_state, prev_r, ph_here, m_t, valid)
    canon_w = m_c * cur_res.target * cur_res.W
    out, rng_state = out.update(
        rng_state, canon_w, cur_res.light_point, cur_res.light_normal,
        cur_res.radiance, cur_res.target, cur_res.is_envmap,
        active & (cur_res.M > 0.0),
    )
    out = out.finalize(normalization=jnp.ones((n,), jnp.float32))
    out = out.replace(M=M_c + M_t)
    return out, rng_state


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
    bvh=None,
    is_last_pass=False,
):
    """One spatial pass: resample from N disk neighbors with similarity
    heuristics (normal / plane / roughness) and the configured bias correction
    (reference: SpatialReuse.h:64 + all 6 bias-correction MIS schemes of
    KernelOptions.h — SpatialMISWeight.h / SpatialNormalizationWeight.h).

    Implemented schemes:
      M_WEIGHT_1_OVER_M      — confidence weights, biased (cheap)
      M_WEIGHT_1_OVER_Z      — unbiased Z-counting normalization
      MIS_LIKE               — confidence resampling + winner-normalization
                               over participant surfaces
      MIS_GBH                — full generalized balance heuristic
                               ((K+1)² target evaluations)
      PAIRWISE_MIS           — pairwise MIS vs the canonical sample, with
                               confidence weights inside the m-terms
      PAIRWISE_MIS_DEFENSIVE — ditto with the defensive canonical term
                               (the reference's default)

    Disocclusion boost (reference: SpatialReuse.h:112-114): pixels whose
    reservoir has M ≤ 1 reuse ``disocclusion_boost_candidates`` neighbors
    instead of ``num_spatial_neighbors``.

    When ``options.restir_di_spatial_visibility_last_pass`` and a ``bvh`` is
    given, the winner of the last pass (``is_last_pass``, traced bool) is
    visibility-tested and its W zeroed if occluded (reference:
    ReSTIR_DI_DoSpatialVisibilityReuse on the last spatial pass).
    """
    p = gbuf.position
    ns = gbuf.shading_normal
    wo = gbuf.view_direction
    n = p.shape[0]
    # hoisted proxy lobe weights for the center surface (shared by every
    # per-neighbor m-term evaluated AT this surface)
    pctx = bsdf_proxy_ctx(options, mats, ns, wo) \
        if options.ris_proxy_target else None
    px, py = pixel_coords(width, height)
    lin2canon = jnp.argsort(linear_index(width, height))
    rough_here = mats.roughness

    base_nb = settings.restir_di.num_spatial_neighbors
    boost = settings.restir_di.disocclusion_boost_candidates
    # per-pixel neighbor count with disocclusion boost
    px_nb = jnp.where(
        (res.M <= 1.0) & (boost > 0), jnp.maximum(boost, base_nb), base_nb
    ).astype(jnp.float32)
    loop_nb = jnp.maximum(base_nb, jnp.where(boost > 0, boost, base_nb))

    radius = settings.restir_di.spatial_radius
    scheme = options.restir_di_bias_correction
    use_conf = options.restir_di_confidence_weights
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

    # ---- ONE packed neighbor table (N, 26): an XLA row gather is per-ROW
    # rate bound and column-free to 128 cols (ROUND5.md), so every tap
    # reads reservoir + G-buffer + roughness in ONE gather instead of ~13
    # separate ones — this was the bulk of the 3.4 s/pass spatial cost in
    # BENCH r4's 3x ReSTIR tax (benchmarks/restir_profile.py).
    nb_rough_bank = scene.materials.roughness[
        jnp.clip(gbuf.material_id, 0, None)
    ]
    packed_nb = jnp.concatenate([
        res.pack_columns(),                                   # 0:14
        gbuf.shading_normal,                                  # 14:17
        gbuf.position,                                        # 17:20
        gbuf.view_direction,                                  # 20:23
        gbuf.prim_index.astype(jnp.float32)[:, None],         # 23
        gbuf.material_id.astype(jnp.float32)[:, None],        # 24
        nb_rough_bank[:, None],                               # 25
    ], axis=1)

    def read_tap(j, u1, u2):
        """One packed gather per neighbor tap. Returns a dict with the
        neighbor reservoir, surface fields and the validity mask."""
        nb_idx = _nb_index(u1, u2)
        row = packed_nb[nb_idx]
        nb_r = Reservoir.from_columns(row[:, 0:14])
        sn = row[:, 14:17]
        pos = row[:, 17:20]
        sim = _similarity_ok(
            settings, ns, p, rough_here, sn, pos, row[:, 25],
        )
        valid = (
            active
            & sim
            & (row[:, 23] >= 0.0)              # prim_index
            & (nb_r.M > 0.0)
            & (nb_idx != jnp.arange(n))
            & (j < px_nb)  # disocclusion-boost gating
        )
        return dict(idx=nb_idx, r=nb_r, sn=sn, pos=pos, wo=row[:, 20:23],
                    matid=row[:, 24].astype(jnp.int32), valid=valid)

    # dedicated REPLAYABLE tap stream: every pass below sees the same
    # neighbor picks (needed for pre-counts, Z-counting, GBH, MIS-like)
    tap_rng0 = rng_mod.pcg_hash(rng_state ^ jnp.uint32(0x5F3759DF))

    def taps_draw(tap_rng):
        tap_rng, u1 = rng_mod.next_float(tap_rng)
        tap_rng, u2 = rng_mod.next_float(tap_rng)
        return tap_rng, u1, u2

    def nb_surface_of(tap):
        nb_mats = scene.materials.at_indices(
            jnp.maximum(tap["matid"], 0)
        ).make_safe()
        return nb_mats, tap["pos"], tap["sn"], tap["wo"]

    # ---- pre-pass: valid-neighbor count and confidence sum (no target
    # evals; reference: count_valid_spatial_neighbors) ----
    def count_body(j, carry):
        cnt, msum, tap_rng = carry
        tap_rng, u1, u2 = taps_draw(tap_rng)
        tap = read_tap(j, u1, u2)
        cnt = cnt + jnp.where(tap["valid"], 1.0, 0.0)
        msum = msum + jnp.where(tap["valid"], tap["r"].M, 0.0)
        return cnt, msum, tap_rng

    valid_cnt, M_sum, _ = jax.lax.fori_loop(
        0, loop_nb, count_body,
        (jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32), tap_rng0),
    )
    M_c = res.M

    if pairwise:
        # ---- pairwise MIS with confidence weights inside the m-terms
        # (reference: SpatialMISWeight.h PAIRWISE(±DEFENSIVE), Eq. 7.6/7.7 of
        # "A Gentle Introduction to ReSTIR") ----
        conf_nb_sum = M_sum if use_conf else jnp.ones((n,), jnp.float32)
        conf_c = M_c if use_conf else jnp.ones((n,), jnp.float32)
        div = (
            jnp.ones((n,), jnp.float32) if use_conf
            else jnp.maximum(valid_cnt, 1.0)
        )

        out = Reservoir.empty(n)
        m_c_acc = jnp.zeros((n,), jnp.float32)
        m_total = res.M

        def nb_body(j, carry):
            out, m_c_acc, m_total, rng_state, tap_rng = carry
            tap_rng, u1, u2 = taps_draw(tap_rng)
            tap = read_tap(j, u1, u2)
            valid, nb_r = tap["valid"], tap["r"]
            ph_here, _, _ = eval_target(
                options, mats, p, ns, wo, eta_rel, _sample_of(nb_r),
                pctx=pctx,
            )
            conf_i = nb_r.M if use_conf else jnp.ones((n,), jnp.float32)
            t_nb = nb_r.target  # neighbor sample at its own surface
            # balance-heuristic denominator for x_i: neighbor-domain term
            # (lumped via the confidence sum) + canonical-domain term — the
            # canonical term evaluates x_i AT THE CENTER surface (ph_here)
            denom = t_nb * conf_nb_sum + (ph_here / div) * conf_c
            m_i = jnp.where(denom > 0.0, t_nb * conf_i / jnp.maximum(denom, 1e-12), 0.0)
            if defensive:
                if use_conf:
                    m_i = m_i * conf_nb_sum / jnp.maximum(
                        conf_nb_sum + conf_c, 1e-12
                    )
                else:
                    m_i = m_i / jnp.maximum(valid_cnt + 1.0, 1.0)
            else:
                m_i = m_i / div
            new_out, rng_state = out.combine(
                rng_state, nb_r, ph_here, m_i, valid
            )
            out = new_out
            # canonical accumulation for this pairing: our sample at the
            # neighbor's surface
            nb_m, nb_p_, nb_n_, nb_wo_ = nb_surface_of(tap)
            ph_c_at_nb, _, _ = eval_target(
                options, nb_m, nb_p_, nb_n_, nb_wo_, eta_rel, _sample_of(res)
            )
            t_cc = res.target
            nume_mc = (t_cc / div) * conf_c
            denom_mc = ph_c_at_nb * conf_nb_sum + (t_cc / div) * conf_c
            if defensive:
                conf_mult = (
                    conf_i / jnp.maximum(conf_c + conf_nb_sum, 1e-12)
                    if use_conf else jnp.ones((n,), jnp.float32)
                )
                term = jnp.where(
                    denom_mc > 0.0,
                    nume_mc / jnp.maximum(denom_mc, 1e-12) * conf_mult,
                    0.0,
                )
            else:
                conf_mult = (
                    conf_i / jnp.maximum(conf_nb_sum, 1e-12)
                    if use_conf else jnp.ones((n,), jnp.float32)
                )
                term = jnp.where(
                    denom_mc > 0.0,
                    nume_mc / jnp.maximum(denom_mc, 1e-12) / div * conf_mult,
                    0.0,
                )
            m_c_acc = m_c_acc + jnp.where(valid, term, 0.0)
            m_total = m_total + jnp.where(valid, nb_r.M, 0.0)
            return out, m_c_acc, m_total, rng_state, tap_rng

        out, m_c_acc, m_total, rng_state, _ = jax.lax.fori_loop(
            0, loop_nb, nb_body,
            (out, m_c_acc, m_total, rng_state, tap_rng0),
        )
        # canonical MIS weight (reference: resampling_canonical branch)
        no_nb = valid_cnt <= 0.0
        if defensive:
            if use_conf:
                m_canon = m_c_acc + M_c / jnp.maximum(M_c + M_sum, 1e-12)
            else:
                m_canon = (1.0 + m_c_acc) / jnp.maximum(valid_cnt + 1.0, 1.0)
        else:
            m_canon = m_c_acc
        m_canon = jnp.where(no_nb, 1.0, m_canon)
        canon_w = m_canon * res.target * res.W
        out, rng_state = out.update(
            rng_state, canon_w, res.light_point, res.light_normal,
            res.radiance, res.target, res.is_envmap, active & (res.M > 0.0),
        )
        out = out.finalize(normalization=jnp.ones((n,), jnp.float32))
        out = out.replace(M=m_total)

    elif scheme == ReSTIRBiasCorrection.MIS_GBH:
        # ---- generalized balance heuristic (reference: SpatialMISWeight.h
        # MIS_GBH — (K+1)² target evaluations) ----
        # participants: j = 0..K-1 neighbors (replayed stream) + canonical.
        # m_j = t_j(x_j)·c_j / Σ_k t_k(x_j)·c_k  with t_k = target at
        # participant k's surface.
        out = Reservoir.empty(n)
        m_total = res.M

        def denom_for(sample):
            """Σ_k t_k(x)·c_k over all participants (canonical + neighbors),
            where t_k = target of `sample` at participant k's surface."""
            ph_c, _, _ = eval_target(
                options, mats, p, ns, wo, eta_rel, sample, pctx=pctx
            )
            conf_c = M_c if use_conf else jnp.where(M_c > 0, 1.0, 0.0)
            dn = ph_c * conf_c

            def k_body(k, carry):
                dn, tap_rng = carry
                tap_rng, u1, u2 = taps_draw(tap_rng)
                tap = read_tap(k, u1, u2)
                nb_m, nb_p_, nb_n_, nb_wo_ = nb_surface_of(tap)
                ph_k, _, _ = eval_target(
                    options, nb_m, nb_p_, nb_n_, nb_wo_, eta_rel, sample
                )
                conf_k = tap["r"].M if use_conf else 1.0
                dn = dn + jnp.where(tap["valid"], ph_k * conf_k, 0.0)
                return dn, tap_rng

            dn, _ = jax.lax.fori_loop(0, loop_nb, k_body, (dn, tap_rng0))
            return dn

        def nb_body(j, carry):
            out, m_total, rng_state, tap_rng = carry
            tap_rng, u1, u2 = taps_draw(tap_rng)
            tap = read_tap(j, u1, u2)
            valid, nb_r = tap["valid"], tap["r"]
            ph_here, _, _ = eval_target(
                options, mats, p, ns, wo, eta_rel, _sample_of(nb_r),
                pctx=pctx,
            )
            conf_j = nb_r.M if use_conf else jnp.ones((n,), jnp.float32)
            dn = denom_for(_sample_of(nb_r))
            m_j = jnp.where(
                dn > 0.0,
                nb_r.target * conf_j / jnp.maximum(dn, 1e-12),
                0.0,
            )
            new_out, rng_state = out.combine(
                rng_state, nb_r, ph_here, m_j, valid
            )
            m_total = m_total + jnp.where(valid, nb_r.M, 0.0)
            return new_out, m_total, rng_state, tap_rng

        out, m_total, rng_state, _ = jax.lax.fori_loop(
            0, loop_nb, nb_body, (out, m_total, rng_state, tap_rng0)
        )
        # canonical candidate
        dn_c = denom_for(_sample_of(res))
        conf_c = M_c if use_conf else jnp.where(M_c > 0, 1.0, 0.0)
        m_canon = jnp.where(
            dn_c > 0.0, res.target * conf_c / jnp.maximum(dn_c, 1e-12), 0.0
        )
        canon_w = m_canon * res.target * res.W
        out, rng_state = out.update(
            rng_state, canon_w, res.light_point, res.light_normal,
            res.radiance, res.target, res.is_envmap, active & (res.M > 0.0),
        )
        out = out.finalize(normalization=jnp.ones((n,), jnp.float32))
        out = out.replace(M=m_total)

    elif scheme == ReSTIRBiasCorrection.MIS_LIKE:
        # ---- MIS-like: cheap confidence resampling, then normalize by the
        # winner's target over all participant surfaces (reference:
        # SpatialMISWeight.h MIS_LIKE + SpatialNormalizationWeight.h:109) ----
        # stream the center explicitly with ITS confidence weight so the
        # resampling weights match the normalization's confidence terms
        conf_c0 = M_c if use_conf else jnp.where(M_c > 0, 1.0, 0.0)
        out = Reservoir.empty(n)
        out, rng_state = out.update(
            rng_state, conf_c0 * res.target * res.W,
            res.light_point, res.light_normal, res.radiance, res.target,
            res.is_envmap, active & (res.M > 0.0),
        )
        m_total = res.M
        # selected participant: -1 = canonical (center)
        sel = jnp.full((n,), -1, jnp.int32)

        def combine_body(j, carry):
            out, m_total, sel, rng_state, tap_rng = carry
            tap_rng, u1, u2 = taps_draw(tap_rng)
            tap = read_tap(j, u1, u2)
            valid, nb_r = tap["valid"], tap["r"]
            ph_here, _, _ = eval_target(
                options, mats, p, ns, wo, eta_rel, _sample_of(nb_r),
                pctx=pctx,
            )
            m_w = nb_r.M if use_conf else jnp.ones((n,), jnp.float32)
            new_out, rng_state, take = out.combine_tracked(
                rng_state, nb_r, ph_here, m_w, valid
            )
            sel = jnp.where(take, j, sel)
            m_total = m_total + jnp.where(valid, nb_r.M, 0.0)
            return new_out, m_total, sel, rng_state, tap_rng

        out, m_total, sel, rng_state, _ = jax.lax.fori_loop(
            0, loop_nb, combine_body, (out, m_total, sel, rng_state, tap_rng0)
        )

        # normalization: nume = t_sel(y) (confidence was already applied in
        # the resampling weight — reference: SpatialNormalizationWeight.h
        # MIS_LIKE "Not multiplying by M here"), denom = Σ_j t_j(y)·c_j
        conf_c = M_c if use_conf else jnp.where(M_c > 0, 1.0, 0.0)
        # center participates if OUR original reservoir had a sample
        center_ok = (res.M > 0.0) & (out.target > 0.0)
        denom0 = jnp.where(center_ok, out.target * conf_c, 0.0)
        nume0 = jnp.where((sel < 0) & center_ok, out.target, 0.0)

        def norm_body(j, carry):
            nume, denom, tap_rng = carry
            tap_rng, u1, u2 = taps_draw(tap_rng)
            tap = read_tap(j, u1, u2)
            nb_m, nb_p_, nb_n_, nb_wo_ = nb_surface_of(tap)
            ph_j, _, _ = eval_target(
                options, nb_m, nb_p_, nb_n_, nb_wo_, eta_rel, _sample_of(out)
            )
            conf_j = tap["r"].M if use_conf else 1.0
            ok = tap["valid"] & (ph_j > 0.0)
            denom = denom + jnp.where(ok, ph_j * conf_j, 0.0)
            nume = nume + jnp.where(ok & (sel == j), ph_j, 0.0)
            return nume, denom, tap_rng

        nume, denom, _ = jax.lax.fori_loop(
            0, loop_nb, norm_body, (nume0, denom0, tap_rng0)
        )
        norm = jnp.where(nume > 0.0, denom / jnp.maximum(nume, 1e-12), 1e12)
        out = out.finalize(normalization=norm)
        out = out.replace(M=m_total)

    else:
        # ---- confidence-weight schemes: 1/M (biased) or 1/Z (unbiased) ----
        unbiased = scheme == ReSTIRBiasCorrection.M_WEIGHT_1_OVER_Z
        out = res
        m_total = res.M

        def combine_body(j, carry):
            out, m_total, rng_state, tap_rng = carry
            tap_rng, u1, u2 = taps_draw(tap_rng)
            tap = read_tap(j, u1, u2)
            valid, nb_r = tap["valid"], tap["r"]
            ph_here, _, _ = eval_target(
                options, mats, p, ns, wo, eta_rel, _sample_of(nb_r),
                pctx=pctx,
            )
            new_out, rng_state = out.combine(
                rng_state, nb_r, ph_here, nb_r.M, valid
            )
            m_total = m_total + jnp.where(valid, nb_r.M, 0.0)
            return new_out, m_total, rng_state, tap_rng

        out, m_total, rng_state, _ = jax.lax.fori_loop(
            0, loop_nb, combine_body, (out, m_total, rng_state, tap_rng0)
        )

        if unbiased:
            # second pass: count confidence of every participant whose
            # surface could produce the final winner (target > 0 there)
            z0 = jnp.where(res.target > 0.0, res.M, 0.0)

            def z_body(j, carry):
                z, tap_rng = carry
                tap_rng, u1, u2 = taps_draw(tap_rng)
                tap = read_tap(j, u1, u2)
                nb_m, nb_p_, nb_n_, nb_wo_ = nb_surface_of(tap)
                ph_at_nb, _, _ = eval_target(
                    options, nb_m, nb_p_, nb_n_, nb_wo_, eta_rel,
                    _sample_of(out),
                )
                z = z + jnp.where(tap["valid"] & (ph_at_nb > 0.0),
                                  tap["r"].M, 0.0)
                return z, tap_rng

            z_count, _ = jax.lax.fori_loop(0, loop_nb, z_body, (z0, tap_rng0))
            out = out.finalize(normalization=jnp.maximum(z_count, 1e-6))
            out = out.replace(M=m_total)
        else:
            out = out.replace(M=m_total).finalize()

    # ---- last-pass visibility reuse (reference: visibility reuse after the
    # final spatial pass) ----
    if options.restir_di_spatial_visibility_last_pass and bvh is not None:
        ph, wi, dist = eval_target(
            options, mats, p, ns, wo, eta_rel, _sample_of(out),
            pctx=pctx,
        )
        do_vis = active & (out.W > 0.0) & jnp.asarray(is_last_pass)
        so = offset_ray_origin(p, gbuf.geometric_normal, wi)
        blocked = _tracers(options)[1](
            bvh, so, wi,
            t_max=jnp.where(jnp.isfinite(dist), dist * (1.0 - 1e-3), 1e30),
            active=do_vis,
        )
        out = out.replace(W=jnp.where(do_vis & blocked, 0.0, out.W))
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
    # hoisted proxy lobe weights for the center surface (shared by every
    # tap's m-term evaluated AT this surface)
    pctx = bsdf_proxy_ctx(options, mats, ns, wo) \
        if options.ris_proxy_target else None
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

    # ONE packed previous-frame table per pass (see spatial_reuse_pass):
    # each tap reads reservoir + G-buffer + roughness in ONE row gather
    prev_rough = scene.materials.roughness[
        jnp.clip(prev_gbuf.material_id, 0, None)
    ]
    packed_prev = jnp.concatenate([
        prev_res.pack_columns(),                              # 0:14
        prev_gbuf.shading_normal,                             # 14:17
        prev_gbuf.position,                                   # 17:20
        prev_gbuf.view_direction,                             # 20:23
        prev_gbuf.prim_index.astype(jnp.float32)[:, None],    # 23
        prev_gbuf.material_id.astype(jnp.float32)[:, None],   # 24
        prev_rough[:, None],                                  # 25
    ], axis=1)

    def tap(rng_state, tap_px, tap_py, tap_valid, out, m_c, m_total):
        idx = lin2canon[
            jnp.clip(tap_py, 0, height - 1) * width
            + jnp.clip(tap_px, 0, width - 1)
        ]
        row = packed_prev[idx]
        r_n = Reservoir.from_columns(row[:, 0:14]).m_capped(
            settings.restir_di.m_cap)
        nb_n = row[:, 14:17]
        nb_p = row[:, 17:20]
        sim = _similarity_ok(
            settings, ns, p, mats.roughness, nb_n, nb_p, row[:, 25]
        )
        valid = (
            tap_valid
            & active
            & sim
            & (row[:, 23] >= 0.0)
            & (r_n.M > 0.0)
        )
        # pairwise MIS: the tap's own-domain target is stored in r_n.target
        ph_here, _, _ = eval_target(
            options, mats, p, ns, wo, eta_rel, _sample_of(r_n),
            pctx=pctx,
        )
        m_i = r_n.target / jnp.maximum(ph_here + Kf * r_n.target, 1e-12)
        m_i = m_i * (Kf / (Kf + 1.0))  # defensive
        new_out, rng_state = out.combine(rng_state, r_n, ph_here, m_i, valid)
        # canonical pairing term: OUR canonical sample at the tap's surface
        nb_mats = scene.materials.at_indices(
            jnp.maximum(row[:, 24].astype(jnp.int32), 0)
        ).make_safe()
        ph_at_nb, _, _ = eval_target(
            options, nb_mats, nb_p, nb_n, row[:, 20:23],
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
    rng_state=None,
    settings=None,
):
    """Shade the winning reservoir sample with (optional) final visibility
    (reference: FinalShading.h:117). The visibility ray is alpha-aware when
    the scene has textures and an rng_state is provided (reference:
    FilterFunction.h alpha testing applies to ReSTIR shadow rays too).
    Returns (radiance (N,3), rays scalar, rng_state)."""
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
        t_max = jnp.where(jnp.isfinite(dist), dist * (1.0 - 1e-3), 1e30)
        if (scene.textures is not None and scene.textures.has_alpha and rng_state is not None):
            from ..ops.traverse import occluded_alpha

            _cl, _oc = _tracers(options)
            rng_state, blocked = occluded_alpha(
                bvh, scene, options, settings, so, wi, rng_state,
                t_max=t_max, active=has,
                closest_fn=_cl, occluded_fn=_oc,
            )
        else:
            blocked = _tracers(options)[1](
                bvh, so, wi, t_max=t_max, active=has)
        has = has & ~blocked
        n_rays = jnp.sum(has.astype(jnp.float32))
    ok = res.sanity_mask()
    return jnp.where((has & ok)[:, None], contrib, 0.0), n_rays, rng_state
