"""Experimental Pallas BVH traversal — VMEM-resident meganodes.

The XLA-level traversal (ops/traverse.py) is iteration-bound: every while
iteration pays an HBM meganode gather plus fusion/carry overhead. This kernel
keeps the ENTIRE meganode table resident in VMEM (cornell: 1.25 MB; fits up to
~100k-node scenes in 16 MB) and walks 8 ray-packets per program — the node
fetch becomes a VMEM dynamic slice, the packet math runs on (8, 128) tiles
with full lane occupancy, and there is no per-iteration carry traffic.

Status: prototype, correctness-verified against ops/traverse (exact prim/t/uv
match) in interpreter mode. THIS environment's axon remote-compile helper runs
with env_clear and cannot initialize libtpu for Mosaic kernels (HTTP 500 from
tpu_compile_helper), so on-device validation is deferred to an environment
with a local Mosaic compiler; the production path remains ops/traverse.py.
Round-2 plan in ROUND1.md: on-device benchmark + HBM-paging level for
Bistro-scale BVHs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.build import BVHData, MAX_LEAF
from .traverse import HitRecord, STACK_SIZE

PACKETS_PER_PROGRAM = 8
PACKET = 128
TRI_EPS = 1e-9
MAX_ITERS = 4096  # safety bound (SAH trees finish in O(100))


def _kernel(nodes_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref, act_ref,
            t_out, prim_out, u_out, v_out, *, any_hit: bool):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    t_min = tmin_ref[:]
    t_max = tmax_ref[:]
    active = act_ref[:] > 0

    def inv(c):
        return jnp.where(jnp.abs(c) > 1e-12, 1.0 / c, jnp.sign(c) * 1e12 + 1e12)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    K = PACKETS_PER_PROGRAM
    cur = jnp.zeros((K,), jnp.int32)
    cur_valid = jnp.any(active, axis=1)
    ptr = jnp.zeros((K,), jnp.int32)
    stack = jnp.zeros((K, STACK_SIZE), jnp.int32)
    slots = jax.lax.broadcasted_iota(jnp.int32, (K, STACK_SIZE), 1)

    best_t = t_max
    best_prim = jnp.full((K, PACKET), -1, jnp.int32)
    best_u = jnp.zeros((K, PACKET), jnp.float32)
    best_v = jnp.zeros((K, PACKET), jnp.float32)
    searching = active

    def cond(carry):
        it, _, ptr, _, cur_valid, *_ = carry
        return (it < MAX_ITERS) & jnp.any(cur_valid | (ptr > 0))

    def body(carry):
        (it, stack, ptr, cur, cur_valid, best_t, best_prim, best_u, best_v,
         searching) = carry

        # pop (compare-select over the tiny (K, STACK) block)
        need_pop = (~cur_valid) & (ptr > 0)
        top = ptr - 1
        popped = jnp.sum(jnp.where(slots == top[:, None], stack, 0), axis=1)
        cur = jnp.where(need_pop, popped, cur)
        cur_valid = cur_valid | need_pop
        ptr = jnp.where(need_pop, top, ptr)

        # ---- 8 VMEM dynamic-slice node fetches -> (K, 128) ----
        safe = jnp.where(cur_valid, cur, 0)
        rows = jnp.concatenate(
            [nodes_ref[pl.ds(safe[k], 1), :] for k in range(K)], axis=0
        )  # (K, 128)

        def col(j):
            return rows[:, j : j + 1]  # (K, 1), broadcasts over rays

        meta = jax.lax.bitcast_convert_type(rows[:, 12:16], jnp.int32)
        c0_ref = meta[:, 0]
        c0_cnt = meta[:, 1]
        c1_ref = meta[:, 2]
        c1_cnt = meta[:, 3]

        def slab(b):
            tx0 = (col(b + 0) - ox) * ix
            tx1 = (col(b + 3) - ox) * ix
            ty0 = (col(b + 1) - oy) * iy
            ty1 = (col(b + 4) - oy) * iy
            tz0 = (col(b + 2) - oz) * iz
            tz1 = (col(b + 5) - oz) * iz
            t_entry = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), best_t),
            )
            return (t_entry <= t_exit) & searching, t_entry

        h0_ray, te0 = slab(0)
        h1_ray, te1 = slab(6)
        h0_ray = h0_ray & cur_valid[:, None]
        h1_ray = h1_ray & cur_valid[:, None]
        h0 = jnp.any(h0_ray, axis=1)
        h1 = jnp.any(h1_ray, axis=1)

        def leaf_tests(base, prim_base, gate_cnt, gate_ray, best_t, best_prim,
                       best_u, best_v, searching):
            for k in range(MAX_LEAF):
                off = base + 9 * k
                v0x, v0y, v0z = col(off), col(off + 1), col(off + 2)
                e1x, e1y, e1z = col(off + 3), col(off + 4), col(off + 5)
                e2x, e2y, e2z = col(off + 6), col(off + 7), col(off + 8)
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = (
                    gate_ray
                    & (k < gate_cnt[:, None])
                    & (jnp.abs(det) > TRI_EPS)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < best_t)
                )
                prim_k = jax.lax.bitcast_convert_type(
                    rows[:, prim_base + k : prim_base + k + 1], jnp.int32
                )
                best_t = jnp.where(hit, t, best_t)
                best_prim = jnp.where(hit, prim_k, best_prim)
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)
                if any_hit:
                    searching = searching & ~hit
            return best_t, best_prim, best_u, best_v, searching

        best_t, best_prim, best_u, best_v, searching = leaf_tests(
            16, 88, jnp.where(h0, c0_cnt, 0), h0_ray,
            best_t, best_prim, best_u, best_v, searching,
        )
        best_t, best_prim, best_u, best_v, searching = leaf_tests(
            52, 92, jnp.where(h1, c1_cnt, 0), h1_ray,
            best_t, best_prim, best_u, best_v, searching,
        )
        if any_hit:
            dead = ~jnp.any(searching, axis=1)
            ptr = jnp.where(dead, 0, ptr)
        else:
            dead = jnp.zeros((K,), jnp.bool_)

        int0 = h0 & (c0_cnt == 0) & ~dead
        int1 = h1 & (c1_cnt == 0) & ~dead
        te0m = jnp.min(jnp.where(h0_ray, te0, jnp.inf), axis=1)
        te1m = jnp.min(jnp.where(h1_ray, te1, jnp.inf), axis=1)
        near_is_0 = te0m <= te1m
        both = int0 & int1
        near_ref = jnp.where(near_is_0, c0_ref, c1_ref)
        far_ref = jnp.where(near_is_0, c1_ref, c0_ref)

        stack = jnp.where(
            (slots == ptr[:, None]) & both[:, None], far_ref[:, None], stack
        )
        ptr = jnp.minimum(ptr + both.astype(jnp.int32), STACK_SIZE)
        next_cur = jnp.where(both, near_ref, jnp.where(int0, c0_ref, c1_ref))
        cur = jnp.where(cur_valid, next_cur, cur)
        cur_valid = cur_valid & (int0 | int1)

        return (it + 1, stack, ptr, cur, cur_valid, best_t, best_prim,
                best_u, best_v, searching)

    out = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), stack, ptr, cur, cur_valid, best_t, best_prim,
         best_u, best_v, searching),
    )
    best_t, best_prim, best_u, best_v = out[5], out[6], out[7], out[8]
    t_out[:] = best_t
    prim_out[:] = best_prim
    u_out[:] = best_u
    v_out[:] = best_v


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def traverse_pallas(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    interpret: bool = False,
) -> HitRecord:
    """Pallas packet traversal. N must divide by 1024 (8 packets x 128 rays)."""
    n = o.shape[0]
    block = PACKETS_PER_PROGRAM * PACKET
    assert n % block == 0, f"pallas traversal needs N % {block} == 0"
    rows = n // PACKET
    grid = rows // PACKETS_PER_PROGRAM

    def comp(x):
        return x.reshape(rows, PACKET)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2])
    tmin = comp(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,)))
    tmax = comp(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    act = comp(
        jnp.ones((n,), jnp.int32)
        if active is None
        else jnp.asarray(active).astype(jnp.int32)
    )

    ray_spec = pl.BlockSpec(
        (PACKETS_PER_PROGRAM, PACKET),
        lambda i: (i, 0),
        memory_space=pltpu.VMEM,
    )
    node_spec = pl.BlockSpec(
        bvh.nodes.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.int32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
    ]
    t, prim, u, v = pl.pallas_call(
        partial(_kernel, any_hit=any_hit),
        grid=(grid,),
        in_specs=[node_spec] + [ray_spec] * 9,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(bvh.nodes, ox, oy, oz, dx, dy, dz, tmin, tmax, act)

    miss = prim < 0
    return HitRecord(
        t=jnp.where(miss, jnp.inf, t).reshape(n),
        prim=prim.reshape(n),
        u=u.reshape(n),
        v=v.reshape(n),
    )
