"""Sheen lobe parity measurement (round-2 verdict "What's missing" #5).

The reference's sheen is the Zeltner 2022 fitted-LTC approximation of a
volumetric SGGX layer (src/Device/includes/BSDFs/SheenLTCFittedParameters.h,
32x32 (A, B, R) table; SheenLTC.h evaluation); this repo uses the analytic
"Charlie" sheen (Estevez & Kulla 2017). This script MEASURES how far apart
the two lobes are — the quantity the round-2 verdict flagged as never
measured:

- the LTC table is parsed from the reference header AT RUNTIME (data read
  for a parity check, no code or constants shipped in this repo);
- the LTC lobe is evaluated from the published LTC definition
  (D(w) = cos(M^-1 w-normalized)/pi * |det M^-1| / ||M^-1 w||^2 scaled by
  the fitted reflectance R, with M = [[a,0,b],[0,a,0],[0,0,1]]);
- both lobes' DIRECTIONAL ALBEDO over (cos_theta_o, alpha) and their
  normalized angular shapes are compared on a Gauss grid.

Prints a markdown summary for ROUND3.md. CPU-only.
"""

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_TABLE = ("/root/reference/src/Device/includes/BSDFs/"
             "SheenLTCFittedParameters.h")


def load_ltc_table():
    txt = open(REF_TABLE).read()
    vals = re.findall(
        r"make_float3\(\s*([-\d.e+]+)f?\s*,\s*([-\d.e+]+)f?\s*,"
        r"\s*([-\d.e+]+)f?\s*\)",
        txt)
    arr = np.asarray([[float(a), float(b), float(c)] for a, b, c in vals],
                     np.float64)
    assert arr.shape == (32 * 32, 3), arr.shape
    return arr.reshape(32, 32, 3)  # [cos_theta_idx][alpha_idx] = (A, B, R)


def ltc_eval(A, B, R, wo, wi):
    """Fitted-LTC sheen BRDF*cos value for directions in the
    plane-of-incidence frame (wo in xz-plane, view at phi=0).

    SheenLTC.h:24-47 semantics: (A, B) ARE the entries of
    M^-1 = [[A,0,B],[0,A,0],[0,0,1]], applied DIRECTLY to the light
    direction; D = cos(norm(M^-1 w))/pi * det(M^-1)/||M^-1 w||^3.
    (Two round-3 bugs fixed here: the old version applied M instead of
    M^-1 — i.e. (x/A - zB/A, y/A, z) — and divided by l^2 instead of l^3;
    the resulting density integrated to ~1.25 and skewed every ROUND3.md
    shape-L1 number.)"""
    w = np.asarray(wi, np.float64)
    wx = w[..., 0] * A + w[..., 2] * B
    wy = w[..., 1] * A
    wz = w[..., 2]
    l = np.sqrt(wx * wx + wy * wy + wz * wz)
    det_minv = A * A
    cos_orig = np.maximum(wz / np.maximum(l, 1e-12), 0.0)
    D = cos_orig / np.pi * det_minv / np.maximum(l, 1e-12) ** 3
    return R * D  # BRDF * cos_i convention: D integrates to 1 over the
    # hemisphere, R is the directional reflectance


_LOBE_JIT = None


def charlie_eval_cos(alpha, wo, wi):
    """This repo's SHIPPED sheen lobe f*cos_i (models/principled.py
    _sheen_lobe through the real code path — since round 4 this is the own
    fitted SGGX-slab LTC when bake/data_sheen_ltc_poly.npy is present, the
    analytic Charlie lobe otherwise). Jitted: eager per-op dispatch through
    the axon relay is glacial."""
    import jax
    import jax.numpy as jnp

    global _LOBE_JIT
    if _LOBE_JIT is None:
        from hiprt_pt_tpu.models.principled import _sheen_lobe

        _LOBE_JIT = jax.jit(
            lambda wo_, wi_, a_: _sheen_lobe(wo_, wi_, a_)[0])
    f = _LOBE_JIT(jnp.asarray(wo, jnp.float32), jnp.asarray(wi, jnp.float32),
                  jnp.broadcast_to(jnp.float32(alpha), wo.shape[:-1]))
    return np.asarray(f, np.float64) * np.maximum(wi[..., 2], 0.0)


def hemisphere_grid(n_theta=64, n_phi=64):
    t = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    p = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    T, P = np.meshgrid(t, p, indexing="ij")
    w = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                  np.cos(T)], -1)
    dw = np.sin(T) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)
    return w.reshape(-1, 3), dw.ravel()


def main():
    import jax

    try:  # sitecustomize overrides JAX_PLATFORMS; force selection directly
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    table = load_ltc_table()
    wi, dw = hemisphere_grid()

    print("| alpha | cos_o | ref-LTC albedo | ours albedo | ratio | "
          "shape L1 |")
    print("|---|---|---|---|---|---|")
    worst_ratio, worst_l1 = 1.0, 0.0
    for ai, alpha in [(5, None), (15, None), (25, None), (31, None)]:
        alpha = (ai + 0.5) / 32  # tizian table: alpha = (x+.5)/32
        for ci in (4, 15, 27):
            cos_o = (ci + 0.5) / 32
            # header comment says [y][x] = [cos][alpha], but the physics of
            # the stored R (reflectance 0.34 -> 0 along x at the first row)
            # identifies the FIRST dim as alpha and the second as cos_theta:
            # sheen reflectance decays toward normal incidence at any alpha
            A, B, R = table[ai, ci]
            so = np.sqrt(max(1 - cos_o ** 2, 0.0))
            wo = np.asarray([so, 0.0, cos_o])
            ltc = ltc_eval(A, B, R, wo, wi)           # already f*cos form
            ch = charlie_eval_cos(
                alpha, np.broadcast_to(wo, wi.shape), wi)
            alb_l = float(np.sum(ltc * dw))
            alb_c = float(np.sum(ch * dw))
            # normalized angular shapes
            nl = ltc / max(alb_l, 1e-12)
            nc = ch / max(alb_c, 1e-12)
            l1 = float(np.sum(np.abs(nl - nc) * dw)) / 2.0  # in [0,1]
            ratio = alb_c / max(alb_l, 1e-12)
            worst_ratio = max(worst_ratio, max(ratio, 1 / max(ratio, 1e-9)))
            worst_l1 = max(worst_l1, l1)
            print(f"| {alpha:.3f} | {cos_o:.3f} | {alb_l:.4f} | "
                  f"{alb_c:.4f} | {ratio:.2f} | {l1:.3f} |")
    print(f"\nworst albedo ratio {worst_ratio:.2f}, worst normalized shape "
          f"L1 {worst_l1:.3f}")

    # --- model-family distance: best-fit Charlie alpha per LTC alpha -----
    # (the two parametrizations need not agree; what matters is whether SOME
    # Charlie roughness reproduces each LTC lobe shape)
    print("\n| LTC alpha | cos_o | best Charlie alpha | residual shape L1 |")
    print("|---|---|---|---|")
    scan = np.linspace(0.05, 1.0, 39)
    for ai in (5, 15, 25, 31):
        alpha = (ai + 0.5) / 32
        for ci in (4, 15, 27):
            cos_o = (ci + 0.5) / 32
            A, B, R = table[ai, ci]
            so = np.sqrt(max(1 - cos_o ** 2, 0.0))
            wo = np.asarray([so, 0.0, cos_o])
            ltc = ltc_eval(A, B, R, wo, wi)
            alb_l = float(np.sum(ltc * dw))
            if alb_l < 1e-4:
                continue
            nl = ltc / alb_l
            best = (1e9, None)
            for ca in scan:
                ch = charlie_eval_cos(
                    float(ca), np.broadcast_to(wo, wi.shape), wi)
                alb_c = float(np.sum(ch * dw))
                if alb_c < 1e-9:
                    continue
                l1 = float(np.sum(np.abs(nl - ch / alb_c) * dw)) / 2.0
                if l1 < best[0]:
                    best = (l1, ca)
            print(f"| {alpha:.3f} | {cos_o:.3f} | {best[1]:.2f} | "
                  f"{best[0]:.3f} |")


if __name__ == "__main__":
    main()
