"""Vectorized BVH traversal — the framework's hot loop.

Role parity with the reference's ``trace_ray`` / ``evaluate_shadow_ray``
(src/Device/includes/Intersect.h:114-410: shared-memory + global-stack HIPRT
custom traversal, any-hit shadow variant, alpha-test filter function).

TPU-first design, iterated against measured v5e behavior:
  * a gather costs ~2 cycles per ray-index REGARDLESS of row width up to 128
    floats — so each iteration performs exactly ONE 128-float meganode gather
    whose row carries both child AABBs, child meta, and embedded leaf
    triangles (accel/build.py). (A split node/leaf two-gather layout and a
    lax.cond phase-split were both tried and measured 4-5x SLOWER.)
  * the gathered (N,128) block is transposed once to (128,N) and ALL loop math
    runs on (N,)-shaped component vectors — N sits on the 8x128 VPU lanes with
    zero padding (math on (N,3) arrays or lane-axis slicing wastes ~40x);
  * the per-ray short stack is laid out (STACK, N) and addressed only with
    broadcast compare-selects (``stack[rows, ptr]`` lowers to a serialized
    scatter ~20x slower);
  * the "current node" register chains into the near child, so only far
    children are pushed;
  * all N rays advance in lockstep through one ``lax.while_loop`` — the vector
    analog of SIMT divergence; finished rays idle while the wavefront drains.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from ..accel.build import BVHData, MAX_LEAF

STACK_SIZE = 32  # far-child pushes only -> bounded by SAH tree depth
TRI_EPS = 1e-9


@struct.dataclass
class HitRecord:
    t: jax.Array        # (N,) inf = miss
    prim: jax.Array     # (N,) i32, -1 = miss
    u: jax.Array        # (N,) barycentric
    v: jax.Array


def empty_hit_record(n: int) -> HitRecord:
    """All-miss record — the cheap branch of empty-wavefront guards."""
    return HitRecord(
        t=jnp.full((n,), jnp.inf, jnp.float32),
        prim=jnp.full((n,), -1, jnp.int32),
        u=jnp.zeros((n,), jnp.float32),
        v=jnp.zeros((n,), jnp.float32),
    )


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
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ix, iy, iz = inv[:, 0], inv[:, 1], inv[:, 2]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    stack = jnp.zeros((STACK_SIZE, n), jnp.int32)
    slots = jnp.arange(STACK_SIZE, dtype=jnp.int32)[:, None]
    cur = jnp.zeros((n,), jnp.int32)  # root meganode
    if active is None:
        cur_valid = jnp.ones((n,), jnp.bool_)
    else:
        cur_valid = jnp.asarray(active)
    ptr = jnp.zeros((n,), jnp.int32)

    best_t = t_max
    best_prim = jnp.full((n,), -1, jnp.int32)
    best_u = jnp.zeros((n,), jnp.float32)
    best_v = jnp.zeros((n,), jnp.float32)

    def cond(carry):
        _, ptr, _, cur_valid, *_ = carry
        return jnp.any(cur_valid | (ptr > 0))

    def body(carry):
        stack, ptr, cur, cur_valid, best_t, best_prim, best_u, best_v = carry

        # pop for rays whose current node is exhausted (broadcast select)
        need_pop = (~cur_valid) & (ptr > 0)
        top = ptr - 1
        popped = jnp.sum(jnp.where(slots == top[None, :], stack, 0), axis=0)
        cur = jnp.where(need_pop, popped, cur)
        cur_valid = cur_valid | need_pop
        ptr = jnp.where(need_pop, top, ptr)

        # ---- THE one gather + one transpose of this iteration ----
        rowT = bvh.nodes[jnp.where(cur_valid, cur, 0)].T  # (128, N)

        c0_ref = jax.lax.bitcast_convert_type(rowT[12], jnp.int32)
        c0_cnt = jax.lax.bitcast_convert_type(rowT[13], jnp.int32)
        c1_ref = jax.lax.bitcast_convert_type(rowT[14], jnp.int32)
        c1_cnt = jax.lax.bitcast_convert_type(rowT[15], jnp.int32)

        def slab(b):
            tx0 = (rowT[b + 0] - ox) * ix
            tx1 = (rowT[b + 3] - ox) * ix
            ty0 = (rowT[b + 1] - oy) * iy
            ty1 = (rowT[b + 4] - oy) * iy
            tz0 = (rowT[b + 2] - oz) * iz
            tz1 = (rowT[b + 5] - oz) * iz
            t_entry = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), best_t),
            )
            return t_entry <= t_exit, t_entry

        h0, te0 = slab(0)
        h1, te1 = slab(6)
        h0 = h0 & cur_valid
        h1 = h1 & cur_valid

        # ---- embedded leaf children: intersect 4 tris each (pure VPU) ----
        def leaf_tests(base, prim_base, gate_cnt, best_t, best_prim, best_u, best_v):
            for k in range(MAX_LEAF):
                off = base + 9 * k
                v0x, v0y, v0z = rowT[off], rowT[off + 1], rowT[off + 2]
                e1x, e1y, e1z = rowT[off + 3], rowT[off + 4], rowT[off + 5]
                e2x, e2y, e2z = rowT[off + 6], rowT[off + 7], rowT[off + 8]
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
                    (k < gate_cnt)
                    & (jnp.abs(det) > TRI_EPS)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < best_t)
                )
                prim_k = jax.lax.bitcast_convert_type(
                    rowT[prim_base + k], jnp.int32
                )
                best_t = jnp.where(hit, t, best_t)
                best_prim = jnp.where(hit, prim_k, best_prim)
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)
            return best_t, best_prim, best_u, best_v

        best_t, best_prim, best_u, best_v = leaf_tests(
            16, 88, jnp.where(h0, c0_cnt, 0), best_t, best_prim, best_u, best_v
        )
        best_t, best_prim, best_u, best_v = leaf_tests(
            52, 92, jnp.where(h1, c1_cnt, 0), best_t, best_prim, best_u, best_v
        )
        if any_hit:
            drained = best_prim >= 0
            ptr = jnp.where(drained, 0, ptr)
        else:
            drained = jnp.zeros_like(h0)

        # ---- internal children: chain near, push far ----
        int0 = h0 & (c0_cnt == 0) & ~drained
        int1 = h1 & (c1_cnt == 0) & ~drained
        near_is_0 = te0 <= te1
        both = int0 & int1
        near_ref = jnp.where(near_is_0, c0_ref, c1_ref)
        far_ref = jnp.where(near_is_0, c1_ref, c0_ref)

        stack = jnp.where(
            (slots == ptr[None, :]) & both[None, :], far_ref[None, :], stack
        )
        ptr = jnp.minimum(ptr + both.astype(jnp.int32), STACK_SIZE)

        next_cur = jnp.where(both, near_ref, jnp.where(int0, c0_ref, c1_ref))
        next_valid = int0 | int1
        cur = jnp.where(cur_valid, next_cur, cur)
        cur_valid = cur_valid & next_valid

        return stack, ptr, cur, cur_valid, best_t, best_prim, best_u, best_v

    _, _, _, _, best_t, best_prim, best_u, best_v = jax.lax.while_loop(
        cond, body,
        (stack, ptr, cur, cur_valid, best_t, best_prim, best_u, best_v),
    )

    miss = best_prim < 0
    return HitRecord(
        t=jnp.where(miss, jnp.inf, best_t),
        prim=best_prim,
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


PACKET = 128  # rays per packet — full 128-lane width; one shared traversal stack


@partial(jax.jit, static_argnames=("any_hit", "packet"))
def traverse_packets(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    packet: int = PACKET,
) -> HitRecord:
    """Packet traversal for COHERENT rays (camera / shadow wavefronts).

    Rays are grouped into packets of 64 consecutive rays; each packet owns ONE
    stack and node cursor, so the per-iteration meganode gather indexes only
    N/64 rows (the gather is the per-ray traversal's dominant cost at ~2
    cycles/index). Every ray in the packet tests the fetched node; a child is
    descended if ANY ray wants it — the classic packet-traversal union walk
    (coherent packets visit barely more nodes than single rays; incoherent
    packets degenerate, so bounce rays should use ``traverse`` instead).

    Equivalent of the reference exploiting 8x8 thread-block coherence on GPU
    (GPURenderer.cpp:413-418 launch geometry + shared-memory traversal stacks).

    N must be a multiple of 64. Returns per-ray HitRecord like ``traverse``.
    """
    PACKET = packet
    n = o.shape[0]
    assert n % PACKET == 0, f"packet traversal needs N % {PACKET} == 0"
    p = n // PACKET

    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)

    def comp(x):
        return x.reshape(p, PACKET)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2])
    ix, iy, iz = comp(inv[:, 0]), comp(inv[:, 1]), comp(inv[:, 2])
    t_min = comp(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,)))
    t_max = comp(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)))
    if active is None:
        ray_active = jnp.ones((p, PACKET), jnp.bool_)
    else:
        ray_active = comp(jnp.asarray(active))

    stack = jnp.zeros((STACK_SIZE, p), jnp.int32)
    slots = jnp.arange(STACK_SIZE, dtype=jnp.int32)[:, None]
    cur = jnp.zeros((p,), jnp.int32)
    cur_valid = jnp.any(ray_active, axis=1)
    ptr = jnp.zeros((p,), jnp.int32)

    best_t = t_max
    best_prim = jnp.full((p, PACKET), -1, jnp.int32)
    # per-ray "still searching" mask: only mutated for any-hit (rays drain on
    # first hit); for closest-hit it is the constant active mask, kept OUT of
    # the loop carry to minimize per-iteration HBM traffic
    searching0 = ray_active

    def cond(carry):
        _, ptr, _, cur_valid, *_ = carry
        return jnp.any(cur_valid | (ptr > 0))

    def body(carry):
        if any_hit:
            (stack, ptr, cur, cur_valid, best_t, best_prim, searching) = carry
        else:
            (stack, ptr, cur, cur_valid, best_t, best_prim) = carry
            searching = searching0

        need_pop = (~cur_valid) & (ptr > 0)
        top = ptr - 1
        popped = jnp.sum(jnp.where(slots == top[None, :], stack, 0), axis=0)
        cur = jnp.where(need_pop, popped, cur)
        cur_valid = cur_valid | need_pop
        ptr = jnp.where(need_pop, top, ptr)

        rowT = bvh.nodes[jnp.where(cur_valid, cur, 0)].T  # (128, P)

        c0_ref = jax.lax.bitcast_convert_type(rowT[12], jnp.int32)
        c0_cnt = jax.lax.bitcast_convert_type(rowT[13], jnp.int32)
        c1_ref = jax.lax.bitcast_convert_type(rowT[14], jnp.int32)
        c1_cnt = jax.lax.bitcast_convert_type(rowT[15], jnp.int32)

        def slab(b):
            # rowT[k] is (P,) — broadcast against (P, PACKET) ray components
            tx0 = (rowT[b + 0][:, None] - ox) * ix
            tx1 = (rowT[b + 3][:, None] - ox) * ix
            ty0 = (rowT[b + 1][:, None] - oy) * iy
            ty1 = (rowT[b + 4][:, None] - oy) * iy
            tz0 = (rowT[b + 2][:, None] - oz) * iz
            tz1 = (rowT[b + 5][:, None] - oz) * iz
            t_entry = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), best_t),
            )
            hit_ray = (t_entry <= t_exit) & searching
            return hit_ray, t_entry

        h0_ray, te0 = slab(0)
        h1_ray, te1 = slab(6)
        h0_ray = h0_ray & cur_valid[:, None]
        h1_ray = h1_ray & cur_valid[:, None]
        h0 = jnp.any(h0_ray, axis=1)
        h1 = jnp.any(h1_ray, axis=1)

        def leaf_tests(base, prim_base, gate_cnt, gate_ray,
                       best_t, best_prim, searching):
            for k in range(MAX_LEAF):
                off = base + 9 * k
                v0x = rowT[off][:, None]
                v0y = rowT[off + 1][:, None]
                v0z = rowT[off + 2][:, None]
                e1x = rowT[off + 3][:, None]
                e1y = rowT[off + 4][:, None]
                e1z = rowT[off + 5][:, None]
                e2x = rowT[off + 6][:, None]
                e2y = rowT[off + 7][:, None]
                e2z = rowT[off + 8][:, None]
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
                    rowT[prim_base + k], jnp.int32
                )[:, None]
                best_t = jnp.where(hit, t, best_t)
                best_prim = jnp.where(hit, prim_k, best_prim)
                if any_hit:
                    searching = searching & ~hit
            return best_t, best_prim, searching

        best_t, best_prim, searching = leaf_tests(
            16, 88, jnp.where(h0, c0_cnt, 0), h0_ray,
            best_t, best_prim, searching,
        )
        best_t, best_prim, searching = leaf_tests(
            52, 92, jnp.where(h1, c1_cnt, 0), h1_ray,
            best_t, best_prim, searching,
        )
        if any_hit:
            packet_dead = ~jnp.any(searching, axis=1)
            ptr = jnp.where(packet_dead, 0, ptr)
        else:
            packet_dead = jnp.zeros((p,), jnp.bool_)

        int0 = h0 & (c0_cnt == 0) & ~packet_dead
        int1 = h1 & (c1_cnt == 0) & ~packet_dead
        # near ordering by the packet-min entry distance
        te0m = jnp.min(jnp.where(h0_ray, te0, jnp.inf), axis=1)
        te1m = jnp.min(jnp.where(h1_ray, te1, jnp.inf), axis=1)
        near_is_0 = te0m <= te1m
        both = int0 & int1
        near_ref = jnp.where(near_is_0, c0_ref, c1_ref)
        far_ref = jnp.where(near_is_0, c1_ref, c0_ref)

        stack = jnp.where(
            (slots == ptr[None, :]) & both[None, :], far_ref[None, :], stack
        )
        ptr = jnp.minimum(ptr + both.astype(jnp.int32), STACK_SIZE)

        next_cur = jnp.where(both, near_ref, jnp.where(int0, c0_ref, c1_ref))
        next_valid = int0 | int1
        cur = jnp.where(cur_valid, next_cur, cur)
        cur_valid = cur_valid & next_valid

        if any_hit:
            return (stack, ptr, cur, cur_valid, best_t, best_prim, searching)
        return (stack, ptr, cur, cur_valid, best_t, best_prim)

    init = (stack, ptr, cur, cur_valid, best_t, best_prim)
    if any_hit:
        init = init + (searching0,)
    out = jax.lax.while_loop(cond, body, init)
    best_t, best_prim = out[4].reshape(n), out[5].reshape(n)

    miss = best_prim < 0
    best_t = jnp.where(miss, jnp.inf, best_t)
    if any_hit:
        return HitRecord(
            t=best_t,
            prim=best_prim,
            u=jnp.zeros((n,), jnp.float32),
            v=jnp.zeros((n,), jnp.float32),
        )

    # reconstruct barycentrics with ONE post-loop gather + triangle test
    # (keeps u/v out of the hot loop's carry)
    rowT = bvh.tri_rows[jnp.maximum(best_prim, 0)].T  # (12, N)
    oxn, oyn, ozn = o[:, 0], o[:, 1], o[:, 2]
    dxn, dyn, dzn = d[:, 0], d[:, 1], d[:, 2]
    v0x, v0y, v0z = rowT[0], rowT[1], rowT[2]
    e1x, e1y, e1z = rowT[3], rowT[4], rowT[5]
    e2x, e2y, e2z = rowT[6], rowT[7], rowT[8]
    px = dyn * e2z - dzn * e2y
    py = dzn * e2x - dxn * e2z
    pz = dxn * e2y - dyn * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
    tx = oxn - v0x
    ty = oyn - v0y
    tz = ozn - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dxn * qx + dyn * qy + dzn * qz) * inv_det
    return HitRecord(
        t=best_t,
        prim=best_prim,
        u=jnp.where(miss, 0.0, jnp.clip(u, 0.0, 1.0)),
        v=jnp.where(miss, 0.0, jnp.clip(v, 0.0, 1.0)),
    )


CHUNK = 32768  # rays per lax.map chunk (measured optimum on v5e: 4.3x over
               # one global lockstep wavefront at 1M diffuse rays)


@partial(jax.jit, static_argnames=("any_hit", "chunk", "do_sort"))
def traverse_chunked(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    chunk: int = CHUNK,
    do_sort: bool = True,
) -> HitRecord:
    """Chunked packet traversal — the production path for big wavefronts.

    The single global ``lax.while_loop`` runs until the WORST packet in the
    whole image finishes; splitting the wavefront into ``chunk``-ray pieces
    under ``lax.map`` lets every chunk stop at its own max iteration count
    (measured 4.3x on 1M incoherent rays, v5e). With ``do_sort``, rays are
    stably partitioned active-first, so fully-dead chunks exit after zero
    iterations — this is the TPU-native analog of wavefront compaction
    (reference aspiration: "stream compaction", RenderWindow.cpp:149-150) at
    fixed shapes: no dynamic allocation, just a permutation.
    """
    n = o.shape[0]
    if n <= chunk or n % PACKET != 0:
        return (
            traverse_packets(bvh, o, d, t_min, t_max, active, any_hit=any_hit)
            if n % PACKET == 0
            else traverse(bvh, o, d, t_min, t_max, active, any_hit=any_hit)
        )

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    act = (
        jnp.ones((n,), jnp.bool_) if active is None else jnp.asarray(active)
    )

    # pad to a chunk multiple with dead rays
    pad = (-n) % chunk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_min = jnp.concatenate([t_min, jnp.zeros((pad,), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])
        act = jnp.concatenate([act, jnp.zeros((pad,), jnp.bool_)])
    m = n + pad

    if do_sort and active is not None:
        # stable active-first partition: preserves screen-tile coherence
        # within the active block (the packets' union walks rely on it)
        perm = jnp.argsort(~act, stable=True)
        o_s, d_s = o[perm], d[perm]
        tmin_s, tmax_s, act_s = t_min[perm], t_max[perm], act[perm]
    else:
        perm = None
        o_s, d_s, tmin_s, tmax_s, act_s = o, d, t_min, t_max, act

    c = m // chunk

    def body(args):
        o_c, d_c, tn_c, tx_c, a_c = args
        r = traverse_packets(
            bvh, o_c, d_c, tn_c, tx_c, a_c, any_hit=any_hit
        )
        return (r.t, r.prim, r.u, r.v)

    t, prim, u, v = jax.lax.map(
        body,
        (
            o_s.reshape(c, chunk, 3),
            d_s.reshape(c, chunk, 3),
            tmin_s.reshape(c, chunk),
            tmax_s.reshape(c, chunk),
            act_s.reshape(c, chunk),
        ),
    )
    t = t.reshape(m)
    prim = prim.reshape(m)
    u = u.reshape(m)
    v = v.reshape(m)
    if perm is not None:
        inv = jnp.argsort(perm)
        t, prim, u, v = t[inv], prim[inv], u[inv], v[inv]
    return HitRecord(t=t[:n], prim=prim[:n], u=u[:n], v=v[:n])


def closest_hit_coherent(bvh, o, d, t_min=1e-4, t_max=jnp.inf, active=None):
    """Closest hit via chunked packet traversal (camera/bounce wavefronts)."""
    if o.shape[0] % PACKET == 0:
        return traverse_chunked(bvh, o, d, t_min, t_max, active, any_hit=False)
    return traverse(bvh, o, d, t_min, t_max, active, any_hit=False)


def occluded_coherent(bvh, o, d, t_min=1e-4, t_max=jnp.inf, active=None):
    if o.shape[0] % PACKET == 0:
        rec = traverse_chunked(bvh, o, d, t_min, t_max, active, any_hit=True)
    else:
        rec = traverse(bvh, o, d, t_min, t_max, active, any_hit=True)
    return rec.prim >= 0


def occluded_alpha(
    bvh,
    scene,
    options,
    settings,
    o,
    d,
    rng_state,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    max_segments: int = 4,
    closest_fn=None,
    occluded_fn=None,
):
    """Alpha-aware shadow test (reference: stochastic alpha in the traversal
    filter function, FilterFunction.h:19-49): march up to `max_segments`
    closest hits, passing through each surface with probability (1 - alpha).

    Only worth the extra traversals when the scene actually has alpha-mapped
    materials; callers gate on that (TextureAtlas.has_alpha). closest_fn /
    occluded_fn override the traversal backend (callers pass the Pallas-aware
    tracers — this module cannot select them without a circular import).

    When occluded_fn is given, a cheap alpha-blind ANY-HIT pass prunes rays
    with no blocker at all (most shadow rays toward a visible light): only
    rays that found *something* enter the closest-hit march, and each march
    segment is wrapped in lax.cond so drained segments cost nothing.
    Returns (rng_state, occluded (N,) bool).
    """
    from ..core import rng as rng_mod
    from .texture import apply_textures

    n = o.shape[0]
    if active is None:
        active = jnp.ones((n,), jnp.bool_)
    searching = jnp.asarray(active)
    if occluded_fn is not None:
        blocked0 = occluded_fn(
            bvh, o, d, t_min=t_min, t_max=t_max, active=searching
        )
        searching = searching & blocked0
    occluded_mask = jnp.zeros((n,), jnp.bool_)
    remaining = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    def segment(carry):
        rng_state, occluded_mask, cur_o, remaining, searching = carry
        if closest_fn is not None:
            rec = closest_fn(
                bvh, cur_o, d, t_min=t_min, t_max=remaining, active=searching
            )
        elif n % PACKET == 0:
            rec = traverse_chunked(
                bvh, cur_o, d, t_min, remaining, searching, any_hit=False
            )
        else:
            rec = traverse(
                bvh, cur_o, d, t_min, remaining, searching, any_hit=False
            )
        hit = (rec.prim >= 0) & searching
        # fetch the hit material's alpha (with base-color texture alpha)
        safe = jnp.maximum(rec.prim, 0)
        rowT = scene.tri_data[safe].T
        mat_id = jax.lax.bitcast_convert_type(rowT[24], jnp.int32)
        w = 1.0 - rec.u - rec.v
        uv = jnp.stack(
            [
                rowT[9] * w + rowT[11] * rec.u + rowT[13] * rec.v,
                rowT[10] * w + rowT[12] * rec.u + rowT[14] * rec.v,
            ],
            axis=-1,
        )
        mats = scene.materials.at_indices(mat_id)
        if scene.textures is not None:
            mats = apply_textures(scene.textures, mats, uv)
        rng_state, u_a = rng_mod.next_float(rng_state)
        opaque_hit = hit & (u_a < mats.alpha_opacity)
        occluded_mask = occluded_mask | opaque_hit
        # pass-through rays continue from just past the hit
        passthrough = hit & ~opaque_hit
        seg = jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)
        cur_o = jnp.where(
            passthrough[:, None], cur_o + d * (seg + 1e-4)[:, None], cur_o
        )
        remaining = jnp.where(passthrough, remaining - seg - 1e-4, remaining)
        return rng_state, occluded_mask, cur_o, remaining, passthrough

    carry = (rng_state, occluded_mask, o, remaining, searching)
    for _ in range(max_segments):
        # skip drained segments entirely (traversal AND the dense texture /
        # material fetches above)
        carry = jax.lax.cond(
            jnp.any(carry[4]), segment, lambda c: c, carry
        )
    rng_state, occluded_mask = carry[0], carry[1]
    # anything still passing after max_segments is treated as unoccluded
    return rng_state, occluded_mask
