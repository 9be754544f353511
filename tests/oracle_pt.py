"""Independent ground-truth path tracer (VERDICT round-1 Missing #6).

A deliberately separate implementation used ONLY as a correctness oracle:
plain numpy, no BVH (brute-force closest-hit over every triangle), no
wavefront, per-pixel python loops over bounces, its own RNG (numpy
Generator), its own Lambertian BRDF + next-event estimation with the
balance-heuristic MIS — nothing shared with hiprt_pt_tpu's device path
except the scene arrays and the camera matrices (which are data, not code).

The reference's own headless CPU renderer (src/main.cpp GPU_RENDER=0) cannot
be built here — its ASSIMP/HIPRT submodules are not checked out — so this
oracle plays that role (SURVEY.md §4: CPU reference backend as test harness).
"""

from __future__ import annotations

import numpy as np


def _closest_hit(o, d, v0, e1, e2, t_min=1e-4):
    """Brute-force Moller-Trumbore over ALL triangles for a batch of rays.
    o,d: (N,3); v0,e1,e2: (T,3). Returns (t (N,), tri (N,), u, v)."""
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    best_tri = np.full(n, -1, np.int64)
    best_u = np.zeros(n)
    best_v = np.zeros(n)
    # chunk triangles to bound memory
    T = v0.shape[0]
    step = max(1, 4_000_000 // max(n, 1))
    for s in range(0, T, step):
        V0 = v0[s:s + step][None]  # (1,C,3)
        E1 = e1[s:s + step][None]
        E2 = e2[s:s + step][None]
        D = d[:, None]             # (N,1,3)
        O = o[:, None]
        P = np.cross(D, E2)
        det = np.sum(E1 * P, -1)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        TV = O - V0
        u = np.sum(TV * P, -1) * inv
        Q = np.cross(TV, E1)
        v = np.sum(D * Q, -1) * inv
        t = np.sum(E2 * Q, -1) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
        t = np.where(hit, t, np.inf)
        j = np.argmin(t, axis=1)
        tj = t[np.arange(n), j]
        better = tj < best_t
        best_t = np.where(better, tj, best_t)
        best_tri = np.where(better, s + j, best_tri)
        best_u = np.where(better, u[np.arange(n), j], best_u)
        best_v = np.where(better, v[np.arange(n), j], best_v)
    return best_t, best_tri, best_u, best_v


def _occluded(o, d, dist, v0, e1, e2, t_min=1e-4):
    t, tri, _, _ = _closest_hit(o, d, v0, e1, e2, t_min)
    return t < dist * (1.0 - 1e-3)


def render_oracle(
    scene_np: dict,
    width: int,
    height: int,
    spp: int,
    bounces: int = 3,
    seed: int = 0,
):
    """Lambertian + emissive MIS-NEE reference render.

    scene_np keys: vertices (V,3), triangles (T,3) int, material_ids (T,),
    albedo (M,3), emission (M,3) [already scaled by strength],
    cam_pos (3,), cam_rot (3,3) = view_inv rotation, proj_inv (4,4).
    Returns (H, W, 3) mean-radiance image, row 0 = bottom (NDC convention).
    """
    rng = np.random.default_rng(seed)
    V = scene_np["vertices"].astype(np.float64)
    T = scene_np["triangles"]
    mid = scene_np["material_ids"]
    albedo = scene_np["albedo"].astype(np.float64)
    emission = scene_np["emission"].astype(np.float64)

    v0 = V[T[:, 0]]
    e1 = V[T[:, 1]] - v0
    e2 = V[T[:, 2]] - v0
    gn = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(gn, axis=-1)
    gn_unit = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-30)

    em_tri = np.nonzero(emission[mid].sum(-1) > 0)[0]
    em_power = area[em_tri] * emission[mid[em_tri]].sum(-1)
    em_pmf = em_power / em_power.sum() if len(em_tri) else None

    n = width * height
    px = np.arange(n) % width
    py = np.arange(n) // width
    accum = np.zeros((n, 3))

    cam_pos = scene_np["cam_pos"].astype(np.float64)
    rot = scene_np["cam_rot"].astype(np.float64)
    proj_inv = scene_np["proj_inv"].astype(np.float64)

    for s in range(spp):
        jx = rng.random(n)
        jy = rng.random(n)
        ndc_x = (px + jx) / width * 2 - 1
        ndc_y = (py + jy) / height * 2 - 1
        ndc = np.stack([ndc_x, ndc_y, -np.ones(n), np.ones(n)], -1)
        vp = ndc @ proj_inv.T
        vp = vp[:, :3] / vp[:, 3:4]
        d = vp @ rot.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(cam_pos, (n, 3)).copy()

        throughput = np.ones((n, 3))
        radiance = np.zeros((n, 3))
        alive = np.ones(n, bool)
        prev_bsdf_pdf = np.zeros(n)  # 0 => delta/camera (no MIS weight)

        for b in range(bounces + 1):
            t, tri, _, _ = _closest_hit(o[alive], d[alive], v0, e1, e2)
            hit = tri >= 0
            gidx = np.nonzero(alive)[0]

            # emission at hit with MIS weight vs NEE
            em = np.zeros((len(t), 3))
            em_hit = hit & (emission[mid[np.maximum(tri, 0)]].sum(-1) > 0)
            if em_hit.any() and em_pmf is not None:
                h = np.nonzero(em_hit)[0]
                tr = tri[h]
                nrm = gn_unit[tr]
                cos_l = np.abs(np.sum(nrm * (-d[gidx[h]]), -1))
                # NEE pdf of this direction: pmf/area * r^2 / cos
                slot = np.searchsorted(em_tri, tr)
                matched = (slot < len(em_tri)) & (em_tri[np.minimum(
                    slot, len(em_tri) - 1)] == tr)
                pmf = np.where(matched, em_pmf[np.minimum(
                    slot, len(em_pmf) - 1)], 0.0)
                pdf_nee = pmf / np.maximum(area[tr], 1e-30) * (
                    t[h] ** 2) / np.maximum(cos_l, 1e-9)
                pb = prev_bsdf_pdf[gidx[h]]
                w = np.where(pb > 0, pb / np.maximum(pb + pdf_nee, 1e-30), 1.0)
                em[h] = emission[mid[tr]] * w[:, None]
            radiance[gidx] += throughput[gidx] * em

            # kill misses, stop at bounce limit
            alive_l = hit.copy()
            if b == bounces:
                alive_l[:] = False
            if not alive_l.any():
                break

            hidx = gidx[alive_l]
            tr = tri[alive_l]
            hp = o[hidx] + d[hidx] * t[alive_l][:, None]
            nrm = gn_unit[tr]
            # face forward
            flip = np.sum(nrm * d[hidx], -1) > 0
            nrm = np.where(flip[:, None], -nrm, nrm)
            alb = albedo[mid[tr]]

            # --- NEE: sample one emissive triangle by power ---
            if em_pmf is not None:
                k = rng.choice(len(em_tri), size=len(hidx), p=em_pmf)
                lt = em_tri[k]
                r1 = rng.random(len(hidx))
                r2 = rng.random(len(hidx))
                su = np.sqrt(r1)
                bu = 1 - su
                bv = r2 * su
                lp = v0[lt] + e1[lt] * bu[:, None] + e2[lt] * bv[:, None]
                ln = gn_unit[lt]
                to_l = lp - hp
                dist2 = np.sum(to_l * to_l, -1)
                dist = np.sqrt(np.maximum(dist2, 1e-30))
                wi = to_l / dist[:, None]
                cos_s = np.sum(nrm * wi, -1)
                cos_l = np.abs(np.sum(ln * (-wi), -1))
                pdf_nee = em_pmf[k] / np.maximum(area[lt], 1e-30) * dist2 / \
                    np.maximum(cos_l, 1e-9)
                f = alb / np.pi
                pdf_b = np.maximum(cos_s, 0.0) / np.pi
                w = pdf_nee / np.maximum(pdf_nee + pdf_b, 1e-30)
                cand = (cos_s > 0) & (cos_l > 1e-8) & (pdf_nee > 0)
                so = hp + nrm * 1e-4
                blocked = np.ones(len(hidx), bool)
                if cand.any():
                    blocked[cand] = _occluded(
                        so[cand], wi[cand], dist[cand], v0, e1, e2
                    )
                contrib = f * emission[mid[lt]] * (
                    np.maximum(cos_s, 0) / np.maximum(pdf_nee, 1e-30) * w
                )[:, None]
                contrib = np.where((cand & ~blocked)[:, None], contrib, 0.0)
                radiance[hidx] += throughput[hidx] * contrib

            # --- cosine-weighted bounce ---
            r1 = rng.random(len(hidx))
            r2 = rng.random(len(hidx))
            # build ONB around nrm
            a = np.where(np.abs(nrm[:, 0:1]) > 0.9, [[0.0, 1.0, 0.0]],
                         [[1.0, 0.0, 0.0]])
            tang = np.cross(a, nrm)
            tang /= np.maximum(np.linalg.norm(tang, axis=-1, keepdims=True),
                               1e-30)
            bit = np.cross(nrm, tang)
            rr = np.sqrt(r1)
            phi = 2 * np.pi * r2
            lx = rr * np.cos(phi)
            ly = rr * np.sin(phi)
            lz = np.sqrt(np.maximum(1 - r1, 0.0))
            nd = tang * lx[:, None] + bit * ly[:, None] + nrm * lz[:, None]
            pdf_b = np.maximum(lz, 1e-9) / np.pi
            # lambertian: f*cos/pdf = albedo
            throughput[hidx] *= alb
            prev_bsdf_pdf[hidx] = pdf_b
            o[hidx] = hp + nrm * 1e-4
            d[hidx] = nd

            new_alive = np.zeros(n, bool)
            new_alive[hidx] = True
            alive = new_alive

        accum += radiance

    return (accum / spp).reshape(height, width, 3)
