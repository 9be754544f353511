"""Sheen LTC table fitting pipeline (VERDICT r3 task 4).

Fits this repo's OWN 32x32 linearly-transformed-cosine table for the sheen
lobe against a brute-force volumetric SGGX reference, replacing the analytic
Charlie lobe that benchmarks/sheen_parity.py proved is a different lobe
family (shape L1 residual 0.22-0.69 vs the reference's fitted table).

Reference model (Zeltner/Burley/Chiang 2022, "Practical Multiple-Scattering
Sheen Using Linearly Transformed Cosines" — reimplemented from the published
model, no reference code or data shipped):
  * a unit-thickness homogeneous slab of SGGX microflakes over the base,
    fiber-like flakes aligned with the surface normal:
    S = diag(s_xy, s_xy, alpha^2) (normal-second-moment convention — a
    vertical fiber's surface normals lie near the equator),
  * unit density, single-scattering albedo 1; extinction along direction w
    is the SGGX projected area sigma(w) = sqrt(w^T S w),
  * flakes reflect specularly (phase = specular reflection off the sampled
    visible microflake normal),
  * light entering the slab that reaches the base is NOT part of the sheen
    lobe (the layered BSDF underneath handles it); the sheen lobe is the
    distribution of light re-emerging from the top, and R = its fraction.

Per (cos_theta_o, alpha) cell the escape distribution is fitted with the
same LTC parametrization the reference consumes (SheenLTC.h:24-47):
  M^-1 = [[Ai, 0, Bi], [0, Ai, 0], [0, 0, 1]],
  D(w) = cos(norm(M^-1 w))/pi * det(M^-1) / ||M^-1 w||^3,
  BRDF = sheen_color * R * D(w) / cos_i,  pdf = D(w).
Fit = maximum likelihood over the MC escape directions (Adam on
(log Ai, Bi), vmapped over all cells; neighbor warm-start sweep).

Outputs hiprt_pt_tpu/bake/data_sheen_ltc.npy (32, 32, 3) f32 indexed
[cos_idx, alpha_idx] = (Ai, Bi, R) at texel centers
cos_theta = (i+.5)/32, alpha = (j+.5)/32.

Run:  python -m hiprt_pt_tpu.bake.sheen_ltc_fit [--paths 32768] [--quick]
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

OUT_PATH = os.path.join(os.path.dirname(__file__), "data_sheen_ltc.npy")
RES = 32


# --------------------------------------------------------------------------
# SGGX microflake distribution (Heitz et al. 2015) for a DIAGONAL S
# --------------------------------------------------------------------------


def sggx_sigma(w, S):
    """Projected area sqrt(w^T S w) for diagonal S = (sx, sy, sz)."""
    sx, sy, sz = S
    return jnp.sqrt(jnp.maximum(
        sx * w[..., 0] ** 2 + sy * w[..., 1] ** 2 + sz * w[..., 2] ** 2,
        1e-20))


def sggx_ndf(wm, S):
    """SGGX normal distribution D(wm) = 1/(pi sqrt|S| (wm^T S^-1 wm)^2)."""
    sx, sy, sz = S
    det = sx * sy * sz
    q = (wm[..., 0] ** 2 / sx + wm[..., 1] ** 2 / sy + wm[..., 2] ** 2 / sz)
    return 1.0 / (jnp.pi * jnp.sqrt(det) * q * q)


def _onb(w):
    """Orthonormal basis (wk, wj) completing w (branchless Frisvad)."""
    s = jnp.where(w[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + w[..., 2])
    b = w[..., 0] * w[..., 1] * a
    wk = jnp.stack([1.0 + s * w[..., 0] ** 2 * a, s * b, -s * w[..., 0]],
                   axis=-1)
    wj = jnp.stack([b, s + w[..., 1] ** 2 * a, -w[..., 1]], axis=-1)
    return wk, wj


def sggx_sample_visible(key, wi, S):
    """Sample the visible-normal distribution
    D_vis(wm; wi) = <wm, wi>_+ D(wm) / sigma(wi)   [Heitz 2015, section 5].

    Projects S into the (wk, wj, wi) basis, builds the sqrt factor of the
    projected matrix column by column, and maps a uniform hemisphere-disk
    sample through it.
    """
    wk, wj = _onb(wi)
    sx, sy, sz = S

    def quad(a, b):
        return (sx * a[..., 0] * b[..., 0] + sy * a[..., 1] * b[..., 1]
                + sz * a[..., 2] * b[..., 2])

    S_kk = quad(wk, wk)
    S_kj = quad(wk, wj)
    S_ki = quad(wk, wi)
    S_jj = quad(wj, wj)
    S_ji = quad(wj, wi)
    S_ii = quad(wi, wi)

    det = sx * sy * sz
    tmp = jnp.sqrt(jnp.maximum(S_jj * S_ii - S_ji * S_ji, 1e-20))
    inv_sqrt_Sii = 1.0 / jnp.sqrt(jnp.maximum(S_ii, 1e-20))
    Mk = jnp.stack([jnp.sqrt(jnp.abs(det)) / tmp,
                    jnp.zeros_like(tmp), jnp.zeros_like(tmp)], axis=-1)
    Mj = jnp.stack([-inv_sqrt_Sii * (S_ki * S_ji - S_kj * S_ii) / tmp,
                    inv_sqrt_Sii * tmp, jnp.zeros_like(tmp)], axis=-1)
    Mi = jnp.stack([inv_sqrt_Sii * S_ki, inv_sqrt_Sii * S_ji,
                    inv_sqrt_Sii * S_ii], axis=-1)

    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, wi.shape[:-1])
    u2 = jax.random.uniform(k2, wi.shape[:-1])
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    u = r * jnp.cos(phi)
    v = r * jnp.sin(phi)
    w = jnp.sqrt(jnp.maximum(1.0 - u * u - v * v, 0.0))

    wm_kji = u[..., None] * Mk + v[..., None] * Mj + w[..., None] * Mi
    wm_kji = wm_kji / jnp.linalg.norm(wm_kji, axis=-1, keepdims=True)
    wm = (wm_kji[..., 0:1] * wk + wm_kji[..., 1:2] * wj
          + wm_kji[..., 2:3] * wi)
    return wm / jnp.linalg.norm(wm, axis=-1, keepdims=True)


def selftest_sggx_sampler(alpha=0.3, n=200_000, seed=0):
    """Chi-square-style check: the sampled visible-normal histogram must
    match <wm,wi>+ D(wm)/sigma(wi) (guards against convention slips).
    One jitted program (eager op-by-op through the axon relay is glacial)."""
    S = (1.0, 1.0, alpha * alpha)

    @jax.jit
    def run():
        wi = jnp.asarray([0.6, 0.0, 0.8])
        wm = sggx_sample_visible(
            jax.random.PRNGKey(seed), jnp.broadcast_to(wi, (n, 3)), S)
        # compare E[f(wm)] for a few test functions against an
        # importance-reweighted uniform-sphere MC of the analytic density
        dens = (jnp.maximum(jnp.sum(wm * wi, axis=-1), 0.0),
                wm[..., 2] ** 2, jnp.abs(wm[..., 0]))
        k = jax.random.PRNGKey(seed + 1)
        u = jax.random.normal(k, (4 * n, 3))
        u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
        pd = (jnp.maximum(jnp.sum(u * wi, axis=-1), 0.0) * sggx_ndf(u, S)
              / sggx_sigma(wi, S))
        Z = jnp.mean(pd) * 4 * jnp.pi  # ~1 (D_vis normalized)
        errs = [Z - 1.0]
        for f_s, f_u in zip(dens,
                            (jnp.maximum(jnp.sum(u * wi, axis=-1), 0.0),
                             u[..., 2] ** 2, jnp.abs(u[..., 0]))):
            errs.append(jnp.mean(f_s) - jnp.mean(f_u * pd) * 4 * jnp.pi / Z)
        return jnp.stack(errs)

    return [float(e) for e in np.asarray(run())]


# --------------------------------------------------------------------------
# Slab Monte Carlo
# --------------------------------------------------------------------------


def slab_walk(key, mu_o, alpha, n_paths, max_bounces=48, s_xy=1.0,
              thickness=1.0, flake="specular"):
    """Random-walk n_paths rays through the SGGX slab.

    Entry at the top (z = thickness) heading down with cos(theta) = mu_o.
    Returns (escaped (n,), exit_dir (n,3)) — exit_dir valid where escaped.
    Paths still alive after max_bounces count as absorbed (bias reported
    by the caller via the alive fraction)."""
    S = (s_xy, s_xy, alpha * alpha)
    sin_o = jnp.sqrt(jnp.maximum(1.0 - mu_o * mu_o, 0.0))
    # entry ray travels FROM the viewer into the slab; the LTC standard
    # frame puts the to-viewer direction at phi=0 (+x), so the ray heads
    # toward (-x, -z) — a +x entry would put the viewer at phi=pi and flip
    # the fitted Bi skew sign
    w0 = jnp.stack([jnp.broadcast_to(-sin_o, (n_paths,)),
                    jnp.zeros((n_paths,)),
                    jnp.broadcast_to(-mu_o, (n_paths,))], axis=-1)
    z0 = jnp.full((n_paths,), thickness)
    alive0 = jnp.ones((n_paths,), bool)
    esc0 = jnp.zeros((n_paths,), bool)
    # non-escaped rows keep a safe up-vector (zero dirs would hit the
    # log-pdf clamps with degenerate values)
    out0 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n_paths, 3))

    def body(carry, k):
        z, w, alive, esc, out = carry
        k1, k2 = jax.random.split(k)
        sig = sggx_sigma(w, S)
        t = -jnp.log(jnp.maximum(jax.random.uniform(k1, (n_paths,)), 1e-12))
        t = t / sig
        z_new = z + t * w[..., 2]
        up = w[..., 2] > 0.0
        # escape through the top / absorbed into the base
        esc_now = alive & up & (z_new >= thickness)
        lost_now = alive & (~up) & (z_new <= 0.0)
        out = jnp.where(esc_now[..., None], w, out)
        esc = esc | esc_now
        alive = alive & ~esc_now & ~lost_now
        z = jnp.where(alive, z_new, z)
        # scatter: specular reflection off a visible SGGX flake normal
        wm = sggx_sample_visible(k2, -w, S)
        if flake == "specular":
            w_next = w - 2.0 * jnp.sum(w * wm, axis=-1, keepdims=True) * wm
        else:  # diffuse flake: cosine lobe around the visible normal
            k3, k4 = jax.random.split(k2)
            u1 = jax.random.uniform(k3, (n_paths,))
            u2 = jax.random.uniform(k4, (n_paths,))
            r = jnp.sqrt(u1)
            ph = 2 * jnp.pi * u2
            loc = jnp.stack([r * jnp.cos(ph), r * jnp.sin(ph),
                             jnp.sqrt(jnp.maximum(1 - u1, 0.0))], axis=-1)
            tk, tj = _onb(wm)
            w_next = (loc[..., 0:1] * tk + loc[..., 1:2] * tj
                      + loc[..., 2:3] * wm)
        w = jnp.where(alive[..., None], w_next, w)
        return (z, w, alive, esc, out), None

    keys = jax.random.split(key, max_bounces)
    (z, w, alive, esc, out), _ = jax.lax.scan(
        body, (z0, w0, alive0, esc0, out0), keys)
    return esc, out, alive


# --------------------------------------------------------------------------
# LTC fit (maximum likelihood on escape directions)
# --------------------------------------------------------------------------


def ltc_logpdf(w, Ai, Bi):
    """log of D(w) = cos(norm(M^-1 w))/pi * det(M^-1)/||M^-1 w||^3 with
    M^-1 = [[Ai,0,Bi],[0,Ai,0],[0,0,1]] (SheenLTC.h:24-47)."""
    wx = w[..., 0] * Ai + w[..., 2] * Bi
    wy = w[..., 1] * Ai
    wz = w[..., 2]
    # zero-weight (non-escaped) rows carry w = 0 — clamp both logs so
    # 0 * (-inf) never poisons the masked sum
    l2 = jnp.maximum(wx * wx + wy * wy + wz * wz, 1e-12)
    cos_orig = jnp.maximum(wz, 1e-9)  # pre-normalization z
    # D = (wz/l) / pi * Ai^2 / l^3  ->  log
    return (jnp.log(cos_orig) - 0.5 * jnp.log(l2) + 2.0 * jnp.log(Ai)
            - 1.5 * jnp.log(l2) - jnp.log(jnp.pi))


def fit_cell(esc, dirs, steps=200, lr=0.05, init=(1.0, 0.0)):
    """Adam ML fit of (Ai, Bi) to the escaped directions (weights esc)."""
    wsum = jnp.maximum(jnp.sum(esc), 1.0)

    def nll(p):
        Ai = jnp.exp(p[0])
        Bi = p[1]
        return -jnp.sum(esc * ltc_logpdf(dirs, Ai, Bi)) / wsum

    p = jnp.asarray([jnp.log(init[0]), init[1]])
    m = jnp.zeros(2)
    v = jnp.zeros(2)
    g_fn = jax.grad(nll)

    def step(carry, i):
        p, m, v = carry
        g = g_fn(p)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9 ** (i + 1.0))
        vh = v / (1 - 0.999 ** (i + 1.0))
        p = p - lr * mh / (jnp.sqrt(vh) + 1e-8)
        return (p, m, v), None

    (p, _, _), _ = jax.lax.scan(step, (p, m, v), jnp.arange(steps))
    return jnp.exp(p[0]), p[1], nll(p)


@functools.partial(jax.jit, static_argnames=("n_paths", "flake", "steps"))
def fit_alpha_row(key, alpha, n_paths, flake="specular", steps=200,
                  thickness=1.0):
    """All 32 cos_theta cells of one alpha column, vmapped."""
    mus = (jnp.arange(RES) + 0.5) / RES
    keys = jax.random.split(key, RES)

    def one(k, mu):
        esc, dirs, alive = slab_walk(k, mu, alpha, n_paths, flake=flake,
                                     thickness=thickness)
        w = esc.astype(jnp.float32)
        Ai, Bi, loss = fit_cell(w, dirs, steps=steps)
        R = jnp.sum(w) / n_paths
        return Ai, Bi, R, jnp.sum(alive) / n_paths, loss

    return jax.vmap(one)(keys, mus)


def run_fit(n_paths=32768, flake="specular", steps=200, seed=1234,
            verbose=True):
    """Fit the full 32x32 table.

    Model calibration (benchmarks/sheen_fit_check.py + the T(alpha) probe,
    2026-08-21): SPECULAR flakes with slab thickness T = alpha minimize the
    residual against the reference's fitted table in the cells where its
    own fit is reliable (alpha >= ~0.5: |dAi| 0.04, |dBi| 0.02, |dR| 0.03-
    0.05); the diffuse-flake variant missed the Bi skew by 0.2-0.6. The
    low-alpha cells disagree more for BOTH parametrizations — ROUND3's
    parity measurement already established the reference's own low-alpha
    fit is grazing-only."""
    table = np.zeros((RES, RES, 3), np.float32)
    alive_max = 0.0
    for aj in range(RES):
        alpha = (aj + 0.5) / RES
        Ai, Bi, R, alive, loss = fit_alpha_row(
            jax.random.PRNGKey(seed + aj), jnp.float32(alpha),
            n_paths, flake=flake, steps=steps,
            thickness=jnp.float32(alpha))
        table[:, aj, 0] = np.asarray(Ai)
        table[:, aj, 1] = np.asarray(Bi)
        table[:, aj, 2] = np.asarray(R)
        alive_max = max(alive_max, float(np.max(np.asarray(alive))))
        if verbose:
            print(f"alpha={alpha:.3f}: R {float(R[0]):.3f}..(mu->1) "
                  f"{float(R[-1]):.3f}, Ai mid {float(Ai[16]):.3f}, "
                  f"truncated alive max {alive_max:.4f}", flush=True)
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--flake", default="specular",
                    choices=("specular", "diffuse"))
    ap.add_argument("--quick", action="store_true",
                    help="1/4 paths, for smoke tests")
    ap.add_argument("--out", default=OUT_PATH)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    if args.selftest:
        errs = selftest_sggx_sampler()
        print("SGGX sampler self-test (normalization + 3 moments):", errs)
        assert all(abs(e) < 0.02 for e in errs), errs
        print("self-test OK")
        return

    n_paths = args.paths // 4 if args.quick else args.paths
    table = run_fit(n_paths=n_paths, flake=args.flake, steps=args.steps)
    np.save(args.out, table)
    print(f"wrote {args.out}: {table.shape} "
          f"R range [{table[..., 2].min():.4f}, {table[..., 2].max():.4f}]")


if __name__ == "__main__":
    main()


# --------------------------------------------------------------------------
# Polynomial compression of the fitted table: per-lane bilinear table
# lookups at wavefront width are XLA gathers (~23 ms / 2M lanes), so the
# hot path evaluates (Ai, Bi, R) as monomial polynomials in
# (cos_theta_o, alpha) instead — the same exact-table-AND-fitted-poly
# pattern the Turquin energy-compensation LUTs use. The npy table remains
# the ground truth the regression test gates against.
# --------------------------------------------------------------------------

POLY_PATH = os.path.join(os.path.dirname(__file__), "data_sheen_ltc_poly.npy")
POLY_DEG = 8  # terms per axis


def sanitize_table(table: np.ndarray, r_min: float = 1e-3) -> np.ndarray:
    """Cells with R ~ 0 (no escaped MC paths — deep-grazing/low-alpha
    corner) carry meaningless (Ai, Bi); the lobe contributes R*Do ~ 0
    there, so fill them from the nearest valid cell along alpha to keep
    the field smooth for the polynomial compression."""
    out = table.copy()
    for i in range(RES):
        valid = np.nonzero(out[i, :, 2] >= r_min)[0]
        if len(valid) == 0:
            continue  # whole row dark: Ai/Bi never used at weight ~0
        for j in range(RES):
            if out[i, j, 2] < r_min:
                j_src = valid[np.argmin(np.abs(valid - j))]
                out[i, j, 0] = out[i, j_src, 0]
                out[i, j, 1] = out[i, j_src, 1]
    out[..., 1] = np.clip(out[..., 1], -2.0, 2.0)
    return out


def _cheb_basis(x: np.ndarray, deg: int) -> np.ndarray:
    """Chebyshev T_0..T_{deg-1} of x mapped from [0,1] to [-1,1]."""
    t = 2.0 * x - 1.0
    out = [np.ones_like(t), t]
    for _ in range(2, deg):
        out.append(2.0 * t * out[-1] - out[-2])
    return np.stack(out[:deg], axis=-1)


def fit_poly(table: np.ndarray, deg: int = POLY_DEG):
    """R-weighted least-squares CHEBYSHEV fit of each channel over [0,1]^2
    (cells where the lobe is dark barely constrain Ai/Bi). A monomial
    basis at this degree needs delicately cancelling O(1e4) coefficients
    that die when cast to f32 — Chebyshev keeps every coefficient O(1).

    Returns coeffs (3, deg, deg): channel c value ~=
    sum_ij coeffs[c, i, j] * T_i(2cos-1) * T_j(2alpha-1). Prints BOTH the
    f64 fit residual and the residual after the f32 cast (the shipped
    precision)."""
    table = sanitize_table(table)
    cos = (np.arange(RES) + 0.5) / RES
    alp = (np.arange(RES) + 0.5) / RES
    C, A = np.meshgrid(cos, alp, indexing="ij")
    bc = _cheb_basis(C.ravel(), deg)    # (N, deg)
    ba = _cheb_basis(A.ravel(), deg)
    basis = (bc[:, :, None] * ba[:, None, :]).reshape(-1, deg * deg)
    w_ab = np.sqrt(table[..., 2].ravel() + 0.02)
    coeffs = np.zeros((3, deg, deg), np.float32)
    for ch in range(3):
        w = w_ab if ch < 2 else np.ones_like(w_ab)
        sol, *_ = np.linalg.lstsq(
            basis * w[:, None], table[..., ch].ravel() * w, rcond=None)
        coeffs[ch] = sol.reshape(deg, deg).astype(np.float32)
        r64 = (basis @ sol - table[..., ch].ravel()) * w / w.max()
        r32 = (basis.astype(np.float32) @ coeffs[ch].ravel()
               - table[..., ch].ravel()) * w / w.max()
        print(f"sheen poly ch{ch}: f64 wrms={np.sqrt(np.mean(r64**2)):.4f} "
              f"f32 wmax={np.abs(r32).max():.4f} "
              f"wrms={np.sqrt(np.mean(r32 ** 2)):.4f}")
    return coeffs
