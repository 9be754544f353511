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
    # chunk triangles to bound memory; all cross/dot products written in
    # components — np.cross on broadcast (N,C,3) temporaries measured ~10x
    # slower than the explicit (N,C) arithmetic
    T = v0.shape[0]
    step = max(1, 4_000_000 // max(n, 1))
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]       # (N,1)
    ox_, oy_, oz_ = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    for s in range(0, T, step):
        e1x, e1y, e1z = (e1[s:s + step, k][None] for k in range(3))  # (1,C)
        e2x, e2y, e2z = (e2[s:s + step, k][None] for k in range(3))
        v0x, v0y, v0z = (v0[s:s + step, k][None] for k in range(3))
        px_ = dy * e2z - dz * e2y
        py_ = dz * e2x - dx * e2z
        pz_ = dx * e2y - dy * e2x
        det = e1x * px_ + e1y * py_ + e1z * pz_
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvx = ox_ - v0x
        tvy = oy_ - v0y
        tvz = oz_ - v0z
        u = (tvx * px_ + tvy * py_ + tvz * pz_) * inv
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
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
    nee_mode: str = "nee",
    ris_m: int = 4,
):
    """Lambertian + emissive MIS-NEE reference render.

    nee_mode="ris": replaces single-sample NEE with an independent
    weighted-reservoir-sampling RIS estimator over ris_m light candidates
    (Talbot 2005 / Bitterli 2020 eq. 6): candidates drawn from the
    power-area pmf, resampling target p-hat = luminance of the unshadowed
    contribution, winner shaded with W = (1/M)*sum(w_i)/p-hat(winner) and
    a final visibility ray. Emitter hits via bounce rays then carry no MIS
    weight (the candidate pool owns direct lighting), matching the
    framework's RIS strategy — but implemented in plain numpy with
    nothing shared with hiprt_pt_tpu's RIS/proxy machinery
    (VERDICT r4 weak #7: an oracle-side WRS estimator so config-4
    validation is independent of models/proxy.py).

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
                if nee_mode == "ris":
                    # the RIS candidate pool owns ALL direct lighting at
                    # shaded vertices; emitter hits count only from the
                    # camera (pb == 0 marks camera/delta vertices)
                    w = np.where(pb > 0, 0.0, 1.0)
                else:
                    w = np.where(pb > 0,
                                 pb / np.maximum(pb + pdf_nee, 1e-30), 1.0)
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

            # --- RIS: weighted reservoir sampling over M light candidates
            if em_pmf is not None and nee_mode == "ris":
                Nh = len(hidx)
                M = ris_m
                k = rng.choice(len(em_tri), size=(Nh, M), p=em_pmf)
                lt = em_tri[k]                                   # (Nh, M)
                r1 = rng.random((Nh, M))
                r2 = rng.random((Nh, M))
                su = np.sqrt(r1)
                bu = 1 - su
                bv = r2 * su
                lp = v0[lt] + e1[lt] * bu[..., None] + e2[lt] * bv[..., None]
                ln = gn_unit[lt]
                to_l = lp - hp[:, None, :]
                dist2 = np.sum(to_l * to_l, -1)
                dist = np.sqrt(np.maximum(dist2, 1e-30))
                wi = to_l / dist[..., None]
                cos_s = np.sum(nrm[:, None, :] * wi, -1)
                cos_l = np.abs(np.sum(ln * (-wi), -1))
                p_src = em_pmf[k] / np.maximum(area[lt], 1e-30)  # area pdf
                contrib = (alb[:, None, :] / np.pi) * emission[mid[lt]] * (
                    np.maximum(cos_s, 0.0) * cos_l
                    / np.maximum(dist2, 1e-30))[..., None]
                phat = contrib @ np.asarray([0.2126, 0.7152, 0.0722])
                w_i = np.where((phat > 0) & (p_src > 0),
                               phat / np.maximum(p_src, 1e-30), 0.0)
                wsum = w_i.sum(-1)
                u_sel = rng.random(Nh)
                cdf = np.cumsum(w_i, -1) / np.maximum(wsum, 1e-30)[:, None]
                sel = np.argmax(cdf >= u_sel[:, None], -1)
                rows = np.arange(Nh)
                phat_w = phat[rows, sel]
                W = np.where(phat_w > 0,
                             wsum / (M * np.maximum(phat_w, 1e-30)), 0.0)
                wi_w = wi[rows, sel]
                dist_w = dist[rows, sel]
                cand = (wsum > 0) & (phat_w > 0)
                so = hp + nrm * 1e-4
                blocked = np.ones(Nh, bool)
                if cand.any():
                    blocked[cand] = _occluded(
                        so[cand], wi_w[cand], dist_w[cand], v0, e1, e2
                    )
                contrib_w = contrib[rows, sel] * W[:, None]
                contrib_w = np.where((cand & ~blocked)[:, None],
                                     contrib_w, 0.0)
                radiance[hidx] += throughput[hidx] * contrib_w

            # --- NEE: sample one emissive triangle by power ---
            elif em_pmf is not None:
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


# --------------------------------------------------------------------------
# PBR oracle: smooth glass (+ Cauchy dispersion) and GGX metal, still fully
# independent numpy (VERDICT r2 #6). Conventions shared with the framework
# are DATA, not code: the Cauchy-from-Abbe relation and the Wyman 2013 CIE
# fit constants (published), and build_scene's area-weighted vertex-normal
# rule (mirrored in _vertex_normals so both sides shade the same geometry).
# --------------------------------------------------------------------------

KIND_LAMBERT = 0
KIND_GLASS = 1
KIND_METAL = 2

_L_D, _L_F, _L_C = 589.3, 486.1, 656.3
_LAM_MIN, _LAM_MAX = 380.0, 730.0
_XYZ2RGB = np.asarray([
    [3.2406, -1.5372, -0.4986],
    [-0.9689, 1.8758, 0.0415],
    [0.0557, -0.2040, 1.0570],
])


def _cie_xyz(lam):
    def g(x, alpha, mu, s1, s2):
        s = np.where(x < mu, s1, s2)
        return alpha * np.exp(-0.5 * ((x - mu) / s) ** 2)

    x = (g(lam, 1.056, 599.8, 37.9, 31.0) + g(lam, 0.362, 442.0, 16.0, 26.7)
         + g(lam, -0.065, 501.1, 20.4, 26.2))
    y = g(lam, 0.821, 568.8, 46.9, 40.5) + g(lam, 0.286, 530.9, 16.3, 31.1)
    z = g(lam, 1.217, 437.0, 11.8, 36.0) + g(lam, 0.681, 459.0, 26.0, 13.8)
    return np.stack([x, y, z], -1)


_lam_grid = np.linspace(_LAM_MIN, _LAM_MAX, 4096)
_RGB_NORM_ORACLE = np.maximum(
    np.clip(_cie_xyz(_lam_grid) @ _XYZ2RGB.T, 0.0, None).mean(0), 1e-6)


def _lam_rgb_weight(lam):
    rgb = np.clip(_cie_xyz(lam) @ _XYZ2RGB.T, 0.0, None)
    return rgb / _RGB_NORM_ORACLE


def _cauchy_ior(ior_d, abbe, scale, lam_nm):
    B = (ior_d - 1.0) / (np.maximum(abbe, 1e-3)
                         * (1.0 / (_L_F * 1e-3) ** 2 - 1.0 / (_L_C * 1e-3) ** 2))
    A = ior_d - B / (_L_D * 1e-3) ** 2
    lam_um = lam_nm * 1e-3
    n = A + scale * B / np.maximum(lam_um * lam_um, 1e-6) + (1 - scale) * (
        ior_d - A)
    return np.maximum(n, 1.0 + 1e-4)


def _fresnel_diel(cos_i, eta):
    """Exact unpolarized dielectric Fresnel; eta = n_t/n_i; cos_i >= 0."""
    cos_i = np.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / np.maximum(eta * eta, 1e-12)
    tir = sin2_t >= 1.0
    cos_t = np.sqrt(np.clip(1.0 - sin2_t, 0.0, 1.0))
    r_par = (eta * cos_i - cos_t) / np.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / np.maximum(cos_i + eta * cos_t, 1e-12)
    return np.where(tir, 1.0, 0.5 * (r_par ** 2 + r_perp ** 2))


def _ggx_d(cos_h, a):
    a2 = a * a
    d = (a2 - 1.0) * cos_h * cos_h + 1.0
    return np.where(cos_h > 0, a2 / np.maximum(np.pi * d * d, 1e-18), 0.0)


def _smith_lambda(cos_t, a):
    cos2 = np.clip(cos_t, 1e-8, 1.0) ** 2
    tan2 = (1.0 - cos2) / cos2
    return 0.5 * (np.sqrt(1.0 + a * a * tan2) - 1.0)


def _ggx_g2(cos_o, cos_i, a):
    return 1.0 / (1.0 + _smith_lambda(cos_o, a) + _smith_lambda(cos_i, a))


def _schlick(F0, cos_h):
    m = np.clip(1.0 - cos_h, 0.0, 1.0)
    return F0 + (1.0 - F0) * (m ** 5)[..., None]


def _onb(n):
    a = np.where(np.abs(n[:, 0:1]) > 0.9, [[0.0, 1.0, 0.0]],
                 [[1.0, 0.0, 0.0]])
    t = np.cross(a, n)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-30)
    return t, np.cross(n, t)


def _vertex_normals(V, T):
    """build_scene's rule: sum of UNnormalized face normals per vertex."""
    vn = np.zeros_like(V)
    v0 = V[T[:, 0]]
    fn = np.cross(V[T[:, 1]] - v0, V[T[:, 2]] - v0)
    for k in range(3):
        np.add.at(vn, T[:, k], fn)
    return vn / np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)


def render_oracle_pbr(scene_np, width, height, spp, bounces=6, seed=0):
    """Path-trace with per-material kinds: Lambert / smooth glass (exact
    Fresnel, Snell refraction, optional Cauchy dispersion with uniform hero
    wavelengths and Wyman-CIE RGB weights) / GGX metal (NDF h-sampling,
    height-correlated Smith, Schlick F0 = base color). Emission hits carry
    balance-heuristic MIS vs NEE; delta (glass) vertices skip NEE and leave
    full MIS weight to the BSDF path.

    Extra scene_np keys over render_oracle: kind (M,), roughness (M,),
    ior (M,), abbe (M,), dispersion_scale (M,)."""
    rng = np.random.default_rng(seed)
    V = scene_np["vertices"].astype(np.float64)
    T = scene_np["triangles"]
    mid = scene_np["material_ids"]
    albedo = scene_np["albedo"].astype(np.float64)
    emission = scene_np["emission"].astype(np.float64)
    kind = scene_np["kind"]
    rough = scene_np["roughness"].astype(np.float64)
    ior_d = scene_np["ior"].astype(np.float64)
    abbe = scene_np["abbe"].astype(np.float64)
    disp = scene_np["dispersion_scale"].astype(np.float64)

    v0 = V[T[:, 0]]
    e1 = V[T[:, 1]] - v0
    e2 = V[T[:, 2]] - v0
    gn = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(gn, axis=-1)
    gn_unit = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True),
                              1e-30)
    vn = _vertex_normals(V, T)

    em_tri = np.nonzero(emission[mid].sum(-1) > 0)[0]
    em_power = area[em_tri] * emission[mid[em_tri]].sum(-1)
    em_pmf = em_power / em_power.sum() if len(em_tri) else None

    npx = width * height
    # fold spp into the ray axis in chunks: at 16-32 px the per-op numpy
    # overhead dominates, so tracing K samples of every pixel in one batch
    # is ~Kx faster at identical statistics
    K = max(1, min(spp, 32768 // max(npx, 1)))
    n = npx * K
    px = np.tile(np.arange(npx) % width, K)
    py = np.tile(np.arange(npx) // width, K)
    accum = np.zeros((npx, 3))
    done_spp = 0
    cam_pos = scene_np["cam_pos"].astype(np.float64)
    rot = scene_np["cam_rot"].astype(np.float64)
    proj_inv = scene_np["proj_inv"].astype(np.float64)

    while done_spp < spp:
        jx, jy = rng.random(n), rng.random(n)
        ndc = np.stack([(px + jx) / width * 2 - 1,
                        (py + jy) / height * 2 - 1,
                        -np.ones(n), np.ones(n)], -1)
        vp = ndc @ proj_inv.T
        vp = vp[:, :3] / vp[:, 3:4]
        d = vp @ rot.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(cam_pos, (n, 3)).copy()

        thr = np.ones((n, 3))
        radiance = np.zeros((n, 3))
        alive = np.ones(n, bool)
        prev_pdf = np.zeros(n)
        prev_delta = np.ones(n, bool)   # camera vertex: full weight
        inside = np.zeros(n, bool)
        lam = np.full(n, -1.0)          # hero wavelength, -1 = not sampled

        for b in range(bounces + 1):
            if not alive.any():
                break
            gidx = np.nonzero(alive)[0]
            t, tri, hu, hv = _closest_hit(o[gidx], d[gidx], v0, e1, e2)
            hit = tri >= 0

            # emission with MIS weight vs NEE
            em_hit = hit & (emission[mid[np.maximum(tri, 0)]].sum(-1) > 0)
            if em_hit.any() and em_pmf is not None:
                h = np.nonzero(em_hit)[0]
                tr = tri[h]
                cos_l = np.abs(np.sum(gn_unit[tr] * (-d[gidx[h]]), -1))
                slot = np.searchsorted(em_tri, tr)
                matched = (slot < len(em_tri)) & (
                    em_tri[np.minimum(slot, len(em_tri) - 1)] == tr)
                pmf = np.where(matched, em_pmf[np.minimum(
                    slot, len(em_pmf) - 1)], 0.0)
                pdf_nee = pmf / np.maximum(area[tr], 1e-30) * (
                    t[h] ** 2) / np.maximum(cos_l, 1e-9)
                pb = prev_pdf[gidx[h]]
                w = np.where(prev_delta[gidx[h]], 1.0,
                             pb / np.maximum(pb + pdf_nee, 1e-30))
                radiance[gidx[h]] += thr[gidx[h]] * emission[mid[tr]] * \
                    w[:, None]

            keep = hit.copy()
            if b == bounces:
                keep[:] = False
            if not keep.any():
                break
            hidx = gidx[keep]
            tr = tri[keep]
            hk = kind[mid[tr]]
            hp = o[hidx] + d[hidx] * t[keep][:, None]
            # smooth shading normal (barycentric over vertex normals)
            w0 = (1.0 - hu[keep] - hv[keep])[:, None]
            ns = (w0 * vn[T[tr, 0]] + hu[keep][:, None] * vn[T[tr, 1]]
                  + hv[keep][:, None] * vn[T[tr, 2]])
            ns /= np.maximum(np.linalg.norm(ns, axis=-1, keepdims=True),
                             1e-30)
            ng = gn_unit[tr]
            # face-forward both normals against the incoming ray
            flip = np.sum(ns * d[hidx], -1) > 0
            ns = np.where(flip[:, None], -ns, ns)
            ng_f = np.where((np.sum(ng * d[hidx], -1) > 0)[:, None], -ng, ng)
            alb = albedo[mid[tr]]
            m = len(hidx)
            new_d = np.zeros((m, 3))
            new_o = np.zeros((m, 3))
            pdf_out = np.zeros(m)
            delta_out = np.zeros(m, bool)
            dead = np.zeros(m, bool)

            # ---- NEE for non-delta kinds --------------------------------
            surf = hk != KIND_GLASS
            if em_pmf is not None and surf.any():
                k = rng.choice(len(em_tri), size=m, p=em_pmf)
                lt = em_tri[k]
                r1, r2 = rng.random(m), rng.random(m)
                su = np.sqrt(r1)
                lp = v0[lt] + e1[lt] * (1 - su)[:, None] + \
                    e2[lt] * (r2 * su)[:, None]
                to_l = lp - hp
                dist2 = np.sum(to_l * to_l, -1)
                dist = np.sqrt(np.maximum(dist2, 1e-30))
                wi = to_l / dist[:, None]
                cos_s = np.sum(ns * wi, -1)
                cos_l = np.abs(np.sum(gn_unit[lt] * (-wi), -1))
                pdf_nee = em_pmf[k] / np.maximum(area[lt], 1e-30) * dist2 / \
                    np.maximum(cos_l, 1e-9)
                # per-kind f and pdf_b toward the light
                f = np.zeros((m, 3))
                pdf_b = np.zeros(m)
                lam_mask = hk == KIND_LAMBERT
                f[lam_mask] = alb[lam_mask] / np.pi
                pdf_b[lam_mask] = np.maximum(cos_s[lam_mask], 0.0) / np.pi
                met = hk == KIND_METAL
                if met.any():
                    a = np.maximum(rough[mid[tr[met]]] ** 2, 1e-4)
                    wo_m = -d[hidx[met]]
                    cos_o = np.sum(ns[met] * wo_m, -1)
                    hvec = wo_m + wi[met]
                    hvec /= np.maximum(
                        np.linalg.norm(hvec, axis=-1, keepdims=True), 1e-30)
                    cos_h = np.sum(ns[met] * hvec, -1)
                    doth = np.abs(np.sum(wo_m * hvec, -1))
                    D = _ggx_d(cos_h, a)
                    G = _ggx_g2(np.abs(cos_o), np.abs(cos_s[met]), a)
                    F = _schlick(alb[met], doth)
                    ok = (cos_o > 1e-6) & (cos_s[met] > 1e-6)
                    f[met] = np.where(
                        ok[:, None],
                        F * (D * G / np.maximum(
                            4 * cos_o * cos_s[met], 1e-9))[:, None], 0.0)
                    pdf_b[met] = np.where(
                        ok, D * np.maximum(cos_h, 0.0) /
                        np.maximum(4 * doth, 1e-9), 0.0)
                w_mis = pdf_nee / np.maximum(pdf_nee + pdf_b, 1e-30)
                cand = surf & (cos_s > 0) & (cos_l > 1e-8) & (pdf_nee > 0) \
                    & (np.sum(np.abs(f), -1) > 0)
                so = hp + ng_f * 1e-4
                blocked = np.ones(m, bool)
                if cand.any():
                    blocked[cand] = _occluded(
                        so[cand], wi[cand], dist[cand], v0, e1, e2)
                contrib = f * emission[mid[lt]] * (
                    np.maximum(cos_s, 0) / np.maximum(pdf_nee, 1e-30)
                    * w_mis)[:, None]
                contrib = np.where((cand & ~blocked)[:, None], contrib, 0.0)
                radiance[hidx] += thr[hidx] * contrib

            # ---- Lambert bounce -----------------------------------------
            lamb = hk == KIND_LAMBERT
            if lamb.any():
                mm = np.nonzero(lamb)[0]
                r1, r2 = rng.random(len(mm)), rng.random(len(mm))
                tang, bit = _onb(ns[mm])
                rr = np.sqrt(r1)
                phi = 2 * np.pi * r2
                lz = np.sqrt(np.maximum(1 - r1, 0.0))
                nd = tang * (rr * np.cos(phi))[:, None] + \
                    bit * (rr * np.sin(phi))[:, None] + ns[mm] * lz[:, None]
                thr[hidx[mm]] *= alb[mm]
                pdf_out[mm] = np.maximum(lz, 1e-9) / np.pi
                new_d[mm] = nd
                new_o[mm] = hp[mm] + ng_f[mm] * 1e-4

            # ---- metal bounce (GGX NDF h-sampling) ----------------------
            met = hk == KIND_METAL
            if met.any():
                mm = np.nonzero(met)[0]
                a = np.maximum(rough[mid[tr[mm]]] ** 2, 1e-4)
                r1, r2 = rng.random(len(mm)), rng.random(len(mm))
                cos_h = np.sqrt(np.clip(
                    (1.0 - r1) / (1.0 + (a * a - 1.0) * r1), 0.0, 1.0))
                sin_h = np.sqrt(np.maximum(1 - cos_h ** 2, 0.0))
                phi = 2 * np.pi * r2
                tang, bit = _onb(ns[mm])
                hvec = tang * (sin_h * np.cos(phi))[:, None] + \
                    bit * (sin_h * np.sin(phi))[:, None] + \
                    ns[mm] * cos_h[:, None]
                wo_m = -d[hidx[mm]]
                doth = np.sum(wo_m * hvec, -1)
                nd = 2 * doth[:, None] * hvec - wo_m
                cos_i = np.sum(ns[mm] * nd, -1)
                cos_o = np.sum(ns[mm] * wo_m, -1)
                ok = (cos_i > 1e-6) & (cos_o > 1e-6) & (doth > 1e-6)
                D = _ggx_d(cos_h, a)
                G = _ggx_g2(np.abs(cos_o), np.abs(cos_i), a)
                F = _schlick(alb[mm], np.abs(doth))
                pdf = D * cos_h / np.maximum(4 * np.abs(doth), 1e-9)
                f = F * (D * G / np.maximum(4 * cos_o * cos_i, 1e-9))[:, None]
                wgt = np.where(ok[:, None],
                               f * (cos_i / np.maximum(pdf, 1e-18))[:, None],
                               0.0)
                thr[hidx[mm]] *= wgt
                pdf_out[mm] = np.where(ok, pdf, 0.0)
                dead[mm] |= ~ok
                new_d[mm] = nd
                new_o[mm] = hp[mm] + ng_f[mm] * 1e-4

            # ---- smooth glass (delta reflect/refract) -------------------
            gls = hk == KIND_GLASS
            if gls.any():
                mm = np.nonzero(gls)[0]
                gi = hidx[mm]
                # hero wavelength for dispersive glass, sampled on first
                # interaction with the medium
                dsc = disp[mid[tr[mm]]]
                need_lam = (dsc > 0) & (lam[gi] < 0)
                if need_lam.any():
                    lam_new = _LAM_MIN + rng.random(int(need_lam.sum())) * (
                        _LAM_MAX - _LAM_MIN)
                    lam[gi[need_lam]] = lam_new
                    thr[gi[need_lam]] *= _lam_rgb_weight(lam_new)
                n_g = np.where(
                    dsc > 0,
                    _cauchy_ior(ior_d[mid[tr[mm]]], abbe[mid[tr[mm]]],
                                dsc, np.where(lam[gi] > 0, lam[gi], _L_D)),
                    ior_d[mid[tr[mm]]])
                ins = inside[gi]
                eta = np.where(ins, 1.0 / n_g, n_g)   # n_t / n_i
                cos_i = -np.sum(ns[mm] * d[gi], -1)
                cos_i = np.clip(cos_i, 0.0, 1.0)
                F = _fresnel_diel(cos_i, eta)
                refl = rng.random(len(mm)) < F
                # reflect
                dr = d[gi] + 2 * cos_i[:, None] * ns[mm]
                # refract
                sin2_t = (1 - cos_i ** 2) / np.maximum(eta ** 2, 1e-12)
                cos_t = np.sqrt(np.clip(1 - sin2_t, 0.0, 1.0))
                dt = (d[gi] + cos_i[:, None] * ns[mm]) / \
                    np.maximum(eta, 1e-9)[:, None] - cos_t[:, None] * ns[mm]
                dt /= np.maximum(
                    np.linalg.norm(dt, axis=-1, keepdims=True), 1e-30)
                nd = np.where(refl[:, None], dr, dt)
                inside[gi] = np.where(refl, ins, ~ins)
                new_d[mm] = nd
                # offset along the geometric normal on the OUTGOING side
                side = np.sign(np.sum(nd * ng_f[mm], -1, keepdims=True))
                new_o[mm] = hp[mm] + ng_f[mm] * side * 1e-4
                delta_out[mm] = True
                pdf_out[mm] = 1.0

            live = ~dead
            nidx = hidx[live]
            o[nidx] = new_o[live]
            d[nidx] = new_d[live]
            prev_pdf[nidx] = pdf_out[live]
            prev_delta[nidx] = delta_out[live]
            new_alive = np.zeros(n, bool)
            new_alive[nidx] = True
            alive = new_alive

        accum += radiance.reshape(K, npx, 3).sum(0)
        done_spp += K

    return (accum / done_spp).reshape(height, width, 3)
