"""BSDF correctness: white-furnace energy conservation per lobe (reference
test strategy §4.3: white furnace mode, BSDFsData.h:26-27) and sample/eval
consistency."""

import numpy as np
import jax.numpy as jnp

from hiprt_pt_tpu.core import rng
from hiprt_pt_tpu.models import lambert, oren_nayar


def _hemisphere_mc(eval_fn, n_samples=100000, seed=3):
    """Estimate ∫ f·cos dω by cosine-weighted importance sampling."""
    s = rng.seed(jnp.arange(n_samples), 0, seed)
    s, u1 = rng.next_float(s)
    s, u2 = rng.next_float(s)
    from hiprt_pt_tpu.ops.sampling import sample_cosine_hemisphere

    n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_samples, 1))
    wi, pdf = sample_cosine_hemisphere(n, u1, u2)
    f, _ = eval_fn(n, wi)
    cos_i = wi[:, 2]
    est = f * (cos_i / jnp.maximum(pdf, 1e-9))[:, None]
    return np.asarray(jnp.mean(est, axis=0))


def test_lambert_white_furnace():
    albedo = jnp.ones((100000, 3))
    wo = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (100000, 1))
    refl = _hemisphere_mc(
        lambda n, wi: lambert.eval_pdf(albedo, n, wo, wi)
    )
    assert np.allclose(refl, 1.0, atol=0.01), refl


def test_lambert_sample_eval_consistency():
    n_samples = 10000
    albedo = jnp.full((n_samples, 3), 0.7)
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_samples, 1))
    wo_np = np.tile([0.3, -0.2, 0.9], (n_samples, 1))
    wo_np /= np.linalg.norm(wo_np, axis=-1, keepdims=True)
    wo = jnp.asarray(wo_np, jnp.float32)
    s = rng.seed(jnp.arange(n_samples), 0, 11)
    s, u1 = rng.next_float(s)
    s, u2 = rng.next_float(s)
    wi, f, pdf = lambert.sample(albedo, nrm, wo, u1, u2)
    f2, pdf2 = lambert.eval_pdf(albedo, nrm, wo, wi)
    assert np.allclose(np.asarray(f), np.asarray(f2), atol=1e-6)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), atol=1e-6)


def test_oren_nayar_energy_bounded():
    """ON must not gain energy; at sigma=0 it reduces to Lambert."""
    n_s = 100000
    albedo = jnp.ones((n_s, 3))
    wo_np = np.tile([0.0, 0.4, 0.9165151], (n_s, 1))
    wo = jnp.asarray(wo_np, jnp.float32)
    for sigma, tol_hi in [(0.0, 1.005), (0.35, 1.005), (0.8, 1.005)]:
        sig = jnp.full((n_s,), sigma)
        refl = _hemisphere_mc(
            lambda n, wi: oren_nayar.eval_pdf(albedo, sig, n, wo, wi)
        )
        assert np.all(refl <= tol_hi), (sigma, refl)
        assert np.all(refl > 0.5), (sigma, refl)
    # sigma=0 == lambert
    sig0 = jnp.zeros((n_s,))
    r0 = _hemisphere_mc(lambda n, wi: oren_nayar.eval_pdf(albedo, sig0, n, wo, wi))
    assert np.allclose(r0, 1.0, atol=0.02)


def test_reciprocity_lambert():
    n_s = 1000
    albedo = jnp.full((n_s, 3), 0.5)
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_s, 1))
    g = np.random.default_rng(4)
    a = g.normal(size=(n_s, 3))
    a[:, 2] = np.abs(a[:, 2]) + 0.1
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = g.normal(size=(n_s, 3))
    b[:, 2] = np.abs(b[:, 2]) + 0.1
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    f_ab, _ = lambert.eval_pdf(albedo, nrm, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    f_ba, _ = lambert.eval_pdf(albedo, nrm, jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32))
    assert np.allclose(np.asarray(f_ab), np.asarray(f_ba), atol=1e-6)
