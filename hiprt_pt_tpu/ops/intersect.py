"""Ray-primitive intersection primitives (vectorized, branch-free).

Role parity with the reference's intersection layer (src/Device/includes/
Intersect.h + HIPRT's hardware tests): Möller-Trumbore ray/triangle and slab
ray/AABB tests, written as pure jnp over batched rays so XLA maps them onto the
VPU. Also hosts the brute-force all-triangles intersector used as the
correctness oracle for BVH traversal (playing the role of the reference's CPU
octree BVH, src/Renderer/BVH.h:24-266, as the independent second implementation).
"""

from __future__ import annotations

import jax.numpy as jnp

INF = jnp.inf
TRI_EPS = 1e-9


def ray_triangle(o, d, v0, e1, e2, t_min=1e-4, t_max=jnp.inf):
    """Möller-Trumbore. All args broadcastable on leading dims; vectors (...,3).

    Returns (hit mask, t, u, v). Backface hits are reported (the reference
    intersects both sides; materials decide two-sidedness).
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > TRI_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, jnp.where(hit, t, INF), u, v


def ray_aabb(o, inv_d, bmin, bmax, t_max):
    """Slab test. Returns (hit mask, t_entry). inv_d precomputed 1/d."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_entry = jnp.maximum(jnp.max(tsm, axis=-1), 0.0)
    t_exit = jnp.min(tbg, axis=-1)
    return (t_entry <= jnp.minimum(t_exit, t_max)), t_entry


def brute_force_closest(vertices, triangles, o, d, t_min=1e-4, t_max=jnp.inf):
    """O(N_rays × N_tris) closest hit — the traversal correctness oracle.

    o, d: (N,3). Returns (t (N,), prim (N,) i32 [-1=miss], u, v).
    """
    v0 = vertices[triangles[:, 0]]
    e1 = vertices[triangles[:, 1]] - v0
    e2 = vertices[triangles[:, 2]] - v0
    hit, t, u, v = ray_triangle(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None], t_min, t_max
    )  # (N, T)
    best = jnp.argmin(t, axis=1)
    n = o.shape[0]
    rows = jnp.arange(n)
    best_t = t[rows, best]
    miss = ~jnp.isfinite(best_t)
    return (
        jnp.where(miss, INF, best_t),
        jnp.where(miss, -1, best).astype(jnp.int32),
        u[rows, best],
        v[rows, best],
    )


def offset_ray_origin(p, n_geom, d):
    """Shadow-ray/bounce origin offset along the geometric normal to avoid
    self-intersection (reference: Intersect.h self-hit handling + filter
    function's last-prim-index rejection, src/Device/functions/FilterFunction.h:
    19-49 — we use the robust normal-offset idiom instead of prim-id filtering)."""
    sign = jnp.where(jnp.sum(n_geom * d, axis=-1, keepdims=True) >= 0.0, 1.0, -1.0)
    scale = 1e-4 * jnp.maximum(1.0, jnp.linalg.norm(p, axis=-1, keepdims=True))
    return p + sign * n_geom * scale
