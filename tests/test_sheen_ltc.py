"""Fitted sheen LTC regression (bake/sheen_ltc_fit.py + principled.py
_sheen_lobe_ltc): shipped polys exist and are sane, the lobe conserves
energy, eval/pdf share the transformed-cosine density (which integrates to
1 over the hemisphere), and the sampler agrees with the density.

Reference parity: SheenLTC.h eval/sample semantics with an OWN fitted
table (VERDICT r3 task 4)."""

import numpy as np
import jax.numpy as jnp

from hiprt_pt_tpu.models import principled as pr


def _hemi_grid(n_t=48, n_p=48):
    t = (np.arange(n_t) + 0.5) / n_t * (np.pi / 2)
    p = (np.arange(n_p) + 0.5) / n_p * (2 * np.pi)
    T, P = np.meshgrid(t, p, indexing="ij")
    w = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                  np.cos(T)], -1).reshape(-1, 3)
    dw = (np.sin(T) * (np.pi / 2 / n_t) * (2 * np.pi / n_p)).ravel()
    return jnp.asarray(w, jnp.float32), np.asarray(dw)


def test_sheen_ltc_polys_shipped():
    assert pr._SHEEN_LTC_POLY is not None, "sheen LTC polys missing"
    assert pr._SHEEN_LTC_POLY.shape[0] == 3
    Ai, Bi, R = pr._sheen_ltc_params(
        jnp.asarray([0.1, 0.5, 0.9]), jnp.asarray([0.3, 0.6, 0.9]))
    assert np.all(np.asarray(Ai) > 0)
    assert np.all(np.abs(np.asarray(Bi)) < 2.5)
    assert np.all((np.asarray(R) >= 0) & (np.asarray(R) <= 1))


def test_sheen_ltc_pdf_normalized_and_energy():
    wi, dw = _hemi_grid()
    n = wi.shape[0]
    for cos_o, alpha in ((0.3, 0.8), (0.7, 0.5), (0.9, 0.95)):
        so = float(np.sqrt(1 - cos_o ** 2))
        wo = jnp.broadcast_to(jnp.asarray([so, 0.0, cos_o], jnp.float32),
                              (n, 3))
        al = jnp.full((n,), alpha, jnp.float32)
        f, pdf = pr._sheen_lobe_ltc(wo, wi, al)
        # the transformed cosine integrates to 1 over the hemisphere
        total_pdf = float(np.sum(np.asarray(pdf) * dw))
        assert abs(total_pdf - 1.0) < 0.05, (cos_o, alpha, total_pdf)
        # directional albedo = R <= 1 (energy conserving)
        alb = float(np.sum(np.asarray(f) * np.maximum(
            np.asarray(wi[:, 2]), 0.0) * dw))
        assert 0.0 <= alb <= 1.0 + 1e-3, alb


def test_sheen_ltc_sampler_matches_density():
    import jax

    cos_o, alpha = 0.4, 0.7
    so = float(np.sqrt(1 - cos_o ** 2))
    n = 20000
    wo = jnp.broadcast_to(jnp.asarray([so, 0.0, cos_o], jnp.float32), (n, 3))
    al = jnp.full((n,), alpha, jnp.float32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    wi = pr._sheen_sample_ltc(wo, al, u1, u2)
    assert np.all(np.asarray(wi[:, 2]) > 0)
    # MC moments under the sampler vs quadrature of the density
    _f, pdf_s = pr._sheen_lobe_ltc(wo, wi, al)
    assert np.all(np.asarray(pdf_s) > 0)
    grid, dw = _hemi_grid(64, 64)
    g = grid.shape[0]
    wo_g = jnp.broadcast_to(jnp.asarray([so, 0.0, cos_o], jnp.float32),
                            (g, 3))
    _fg, pdf_g = pr._sheen_lobe_ltc(wo_g, grid, jnp.full((g,), alpha))
    for moment in (lambda w: np.asarray(w[:, 2]),
                   lambda w: np.asarray(w[:, 0])):
        mc = float(np.mean(moment(wi)))
        ref = float(np.sum(moment(grid) * np.asarray(pdf_g) * dw))
        assert abs(mc - ref) < 0.03, (mc, ref)
