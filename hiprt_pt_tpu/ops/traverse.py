"""Vectorized BVH traversal — the framework's hot loop.

Role parity with the reference's ``trace_ray`` / ``evaluate_shadow_ray``
(src/Device/includes/Intersect.h:114-410: shared-memory + global-stack HIPRT
custom traversal, any-hit shadow variant, alpha-test filter function).

TPU-first design: instead of one divergent stack walk per SIMT thread, all N
rays of a wavefront advance in lockstep through a ``lax.while_loop``; each ray
carries a short stack in a (N, STACK) register array. Every iteration pops one
node per ray, evaluates BOTH the internal-node path (two child AABB slab tests,
near-first push) and the leaf path (MAX_LEAF=4 pre-gathered triangle tests)
under masks — the vector analog of warp divergence, but with XLA fusing the
whole body into a handful of VPU ops + gathers. Rays that finish early simply
stop popping (empty stack) while the wavefront drains.

The loop terminates when every ray's stack is empty; per-ray early-out for
shadow rays is expressed by clearing the stack pointer on first hit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..accel.build import BVHData, MAX_LEAF
from .intersect import ray_aabb, ray_triangle

STACK_SIZE = 48  # matches the reference's largest tuned shared-stack size
                 # (GPURenderer.cpp:206-213); BVH2 depth for SAH trees is ~2log2(T)


@struct.dataclass
class HitRecord:
    t: jax.Array        # (N,) inf = miss
    prim: jax.Array     # (N,) i32, -1 = miss
    u: jax.Array        # (N,) barycentric
    v: jax.Array


def _leaf_intersect(bvh: BVHData, first, count, o, d, t_min, best_t):
    """Test the MAX_LEAF pre-gathered triangles of a leaf block.
    first: (N,) leaf slot base; count: (N,). Returns (t, slot, u, v) best-of-leaf."""
    lt = jnp.full_like(best_t, jnp.inf)
    lslot = jnp.full(first.shape, -1, jnp.int32)
    lu = jnp.zeros_like(best_t)
    lv = jnp.zeros_like(best_t)
    for k in range(MAX_LEAF):
        slot = first + k
        valid = k < count
        v0 = bvh.leaf_v0[slot]
        e1 = bvh.leaf_e1[slot]
        e2 = bvh.leaf_e2[slot]
        hit, t, u, v = ray_triangle(o, d, v0, e1, e2, t_min, best_t)
        hit = hit & valid & (t < lt)
        lt = jnp.where(hit, t, lt)
        lslot = jnp.where(hit, slot, lslot)
        lu = jnp.where(hit, u, lu)
        lv = jnp.where(hit, v, lv)
    return lt, lslot, lu, lv


@partial(jax.jit, static_argnames=("any_hit",))
def traverse(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
) -> HitRecord:
    """Closest-hit (or any-hit) traversal for N rays.

    o, d: (N,3). active: optional (N,) bool — inactive rays skip traversal
    (reference: pixel_active masking, CameraRays.h:99-105).
    """
    n = o.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    stack = jnp.zeros((n, STACK_SIZE), jnp.int32)
    if active is None:
        ptr = jnp.ones((n,), jnp.int32)
    else:
        ptr = jnp.where(active, 1, 0).astype(jnp.int32)

    best_t = t_max
    best_slot = jnp.full((n,), -1, jnp.int32)
    best_u = jnp.zeros((n,), jnp.float32)
    best_v = jnp.zeros((n,), jnp.float32)
    rows = jnp.arange(n)

    def cond(carry):
        _, ptr, *_ = carry
        return jnp.any(ptr > 0)

    def body(carry):
        stack, ptr, best_t, best_slot, best_u, best_v = carry
        alive = ptr > 0
        top = jnp.maximum(ptr - 1, 0)
        node = jnp.where(alive, stack[rows, top], 0)
        ptr = jnp.where(alive, ptr - 1, 0)

        count = bvh.node_count[node]
        left = bvh.node_left[node]
        is_leaf = alive & (count > 0)
        is_internal = alive & (count == 0)

        # --- leaf path ---
        lt, lslot, lu, lv = _leaf_intersect(
            bvh, left, jnp.where(is_leaf, count, 0), o, d, t_min, best_t
        )
        closer = is_leaf & (lt < best_t)
        best_t = jnp.where(closer, lt, best_t)
        best_slot = jnp.where(closer, lslot, best_slot)
        best_u = jnp.where(closer, lu, best_u)
        best_v = jnp.where(closer, lv, best_v)
        if any_hit:
            # occlusion found → drain this ray's stack
            ptr = jnp.where(closer, 0, ptr)

        # --- internal path: test both children, push near-first ---
        c0 = left
        c1 = left + 1
        h0, te0 = ray_aabb(o, inv_d, bvh.nodes_min[c0], bvh.nodes_max[c0], best_t)
        h1, te1 = ray_aabb(o, inv_d, bvh.nodes_min[c1], bvh.nodes_max[c1], best_t)
        h0 = h0 & is_internal
        h1 = h1 & is_internal
        # order: push far child first so near is popped first
        near_is_0 = te0 <= te1
        first_child = jnp.where(near_is_0, c1, c0)   # pushed first (far)
        second_child = jnp.where(near_is_0, c0, c1)  # pushed last (near)
        first_hit = jnp.where(near_is_0, h1, h0)
        second_hit = jnp.where(near_is_0, h0, h1)

        push1 = first_hit
        stack = stack.at[rows, jnp.minimum(ptr, STACK_SIZE - 1)].set(
            jnp.where(push1, first_child, stack[rows, jnp.minimum(ptr, STACK_SIZE - 1)])
        )
        ptr = ptr + push1.astype(jnp.int32)
        push2 = second_hit
        stack = stack.at[rows, jnp.minimum(ptr, STACK_SIZE - 1)].set(
            jnp.where(push2, second_child, stack[rows, jnp.minimum(ptr, STACK_SIZE - 1)])
        )
        ptr = ptr + push2.astype(jnp.int32)
        ptr = jnp.minimum(ptr, STACK_SIZE)

        return stack, ptr, best_t, best_slot, best_u, best_v

    _, _, best_t, best_slot, best_u, best_v = jax.lax.while_loop(
        cond, body, (stack, ptr, best_t, best_slot, best_u, best_v)
    )

    prim = jnp.where(best_slot >= 0, bvh.prim_indices[jnp.maximum(best_slot, 0)], -1)
    miss = best_slot < 0
    return HitRecord(
        t=jnp.where(miss, jnp.inf, best_t),
        prim=prim.astype(jnp.int32),
        u=best_u,
        v=best_v,
    )


def closest_hit(bvh, o, d, t_min=1e-4, t_max=jnp.inf, active=None) -> HitRecord:
    return traverse(bvh, o, d, t_min, t_max, active, any_hit=False)


def occluded(bvh, o, d, t_min=1e-4, t_max=jnp.inf, active=None) -> jax.Array:
    """Shadow-ray any-hit test (reference: evaluate_shadow_ray,
    Intersect.h:224-410). Returns (N,) bool."""
    rec = traverse(bvh, o, d, t_min, t_max, active, any_hit=True)
    return rec.prim >= 0
