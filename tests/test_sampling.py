"""Sampler pdf correctness — chi-square and analytic checks
(SURVEY.md §4 'implication for the rebuild': chi-square for every sampler)."""

import numpy as np
import jax.numpy as jnp

from hiprt_pt_tpu.core import rng
from hiprt_pt_tpu.ops import sampling


def _draws(n, seed=0):
    s = rng.seed(jnp.arange(n), 0, seed)
    s, u1 = rng.next_float(s)
    s, u2 = rng.next_float(s)
    return np.asarray(u1), np.asarray(u2)


def test_onb_orthonormal():
    d = np.random.default_rng(0).normal(size=(500, 3))
    n = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    t, b = sampling.build_onb(n)
    t, b = np.asarray(t), np.asarray(b)
    nn = np.asarray(n)
    assert np.allclose((t * nn).sum(-1), 0, atol=1e-5)
    assert np.allclose((b * nn).sum(-1), 0, atol=1e-5)
    assert np.allclose((t * b).sum(-1), 0, atol=1e-5)
    assert np.allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)


def test_cosine_hemisphere_pdf():
    """Monte-Carlo estimate of ∫ pdf dω over the hemisphere must be 1, and the
    z-distribution must match cos·sin."""
    u1, u2 = _draws(200000)
    n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (u1.size, 1))
    d, pdf = sampling.sample_cosine_hemisphere(n, jnp.asarray(u1), jnp.asarray(u2))
    d, pdf = np.asarray(d), np.asarray(pdf)
    assert np.all(d[:, 2] >= 0)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1, atol=1e-4)
    # pdf = cos/pi exactly
    assert np.allclose(pdf, np.maximum(d[:, 2], 1e-8) / np.pi, rtol=1e-3, atol=1e-5)
    # E[cos] under cosine-weighted sampling = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3


def test_mis_heuristic_partition():
    a = jnp.asarray(np.random.default_rng(1).uniform(0.01, 5.0, 100))
    b = jnp.asarray(np.random.default_rng(2).uniform(0.01, 5.0, 100))
    w1 = sampling.balance_heuristic(a, b)
    w2 = sampling.balance_heuristic(b, a)
    assert np.allclose(np.asarray(w1 + w2), 1.0, atol=1e-5)


def test_equirect_roundtrip():
    u1, u2 = _draws(1000, seed=5)
    d = sampling.sample_uniform_sphere(jnp.asarray(u1), jnp.asarray(u2))
    u, v = sampling.sphere_to_equirect_uv(d)
    d2 = sampling.equirect_uv_to_sphere(u, v)
    assert np.allclose(np.asarray(d), np.asarray(d2), atol=1e-4)


def test_triangle_sampling_uniform():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    u1, u2 = _draws(20000, seed=9)
    p, ng = sampling.sample_triangle(v0, e1, e2, jnp.asarray(u1), jnp.asarray(u2))
    p = np.asarray(p)
    assert np.all(p[:, 0] >= -1e-6) and np.all(p[:, 1] >= -1e-6)
    assert np.all(p[:, 0] + p[:, 1] <= 1 + 1e-5)
    # centroid of uniform samples = triangle centroid
    assert np.allclose(p.mean(0)[:2], [1 / 3, 1 / 3], atol=5e-3)


def test_closest_emissive_hit_mxu_matches_loop(cornell_scene):
    """The MXU Woop-transform emissive sweep must agree with the
    per-triangle Moller-Trumbore loop on hit slots and distances."""
    import dataclasses

    import jax

    from hiprt_pt_tpu.lights.light_sampling import closest_emissive_hit

    scene, camera = cornell_scene
    assert scene.emissive_woop is not None
    g = np.random.default_rng(3)
    n = 4096
    lo = np.asarray(scene.vertices).min(0)
    hi = np.asarray(scene.vertices).max(0)
    o = jnp.asarray(
        g.uniform(lo * 0.7, hi * 0.7, (n, 3)).astype(np.float32))
    d = g.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    t_mxu, slot_mxu = jax.jit(
        lambda o_, d_: closest_emissive_hit(scene, o_, d_))(o, d)
    scene_loop = dataclasses.replace(scene, emissive_woop=None)
    t_loop, slot_loop = jax.jit(
        lambda o_, d_: closest_emissive_hit(scene_loop, o_, d_))(o, d)

    slot_mxu, slot_loop = np.asarray(slot_mxu), np.asarray(slot_loop)
    t_mxu, t_loop = np.asarray(t_mxu), np.asarray(t_loop)
    assert np.mean(slot_mxu == slot_loop) > 0.999
    both = (slot_mxu == slot_loop) & (slot_mxu >= 0)
    assert both.any()
    assert np.allclose(t_mxu[both], t_loop[both], rtol=1e-3, atol=1e-4)
