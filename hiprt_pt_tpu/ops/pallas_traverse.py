"""Pallas BVH traversal — VMEM-resident meganodes with scalar-core control.

Role parity with the reference's HW-accelerated shared-stack traversal
(src/Device/includes/Intersect.h:129-142) — this is the framework's
"irreplaceable custom kernel" (SURVEY.md §7.2 #1).

Design (v2, round 2 — the v1 kernel's concatenated dynamic slices with
vector-extracted indices crashed/hung the Mosaic compiler in this
environment; this version uses the canonical Mosaic split):

  * VECTOR phase: slab + triangle tests on an (8, 128) ray block — 8 packets
    of 128 rays, full VPU lane occupancy, all VMEM-resident.
  * SCALAR phase: per-packet traversal control (cursor, short stack, pop/push
    decisions) lives in SMEM and runs on the scalar core. The per-packet node
    fetch is a scalar-indexed VMEM row copy — no HBM traffic in the loop.
  * Child-metadata scalars for the control decisions are extracted from the
    fetched VMEM row via single-element-slice reductions (an SMEM metadata
    table was bisected to exceed this environment's SMEM capacity at
    realistic node counts).

The whole node table must fit in VMEM (~12 MB → ~24k meganodes → ~100k
triangles). Larger scenes fall back to the chunked XLA path
(ops/traverse.py) until an HBM-paging level lands.

Verified bit-exact against ops/traverse.py on the cornell scene (closest and
any-hit) — see tests/test_pallas_traverse.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.build import BVHData, MAX_LEAF
from .traverse import HitRecord, empty_hit_record

# (the L8_DUP marginal-cost probe scaffolding lived here through commit
# 0743450 — duplicate a sub-phase with un-CSE-able inputs and read its
# marginal cost off the wall clock; re-add from git history when needed)

K = 8            # packets per program
PACKET = 128     # rays per packet
BLOCK = K * PACKET
STACK = 48       # per-packet short stack (SMEM ints)
TRI_EPS = 1e-9
MAX_ITERS = 16384  # safety bound
# node refs must fit the 14-bit fields of the packed decision word (v4)
MAX_VMEM_NODES = 16384  # 8 MB of 128-float rows


def _kernel(nodes_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref, act_ref,
            t_out, prim_out, u_out, v_out,
            rows_s, cur_s, ptr_s, valid_s, stack_s,
            bt_s, bp_s, bu_s, bv_s, se_s,
            *, any_hit: bool, ordered: bool = True):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    t_min = tmin_ref[:]

    def inv(c):
        return jnp.where(jnp.abs(c) > 1e-12, 1.0 / c, jnp.sign(c) * 1e12 + 1e12)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    active0 = act_ref[:] > 0

    # running best_* state lives in VMEM scratch — Mosaic in this
    # environment hangs when OUTPUT refs are read+written inside a
    # while_loop body (bisected; scratch refs are fine)
    bt_s[:] = tmax_ref[:]
    bp_s[:] = jnp.full((K, PACKET), -1, jnp.int32)
    bu_s[:] = jnp.zeros((K, PACKET), jnp.float32)
    bv_s[:] = jnp.zeros((K, PACKET), jnp.float32)
    # per-ray "still searching" mask (any-hit drains rays on first hit)
    se_s[:] = active0.astype(jnp.float32)

    # scalar init
    n_alive = jnp.int32(0)
    for k in range(K):
        row_active = jnp.any(active0[k])  # scalar reduce
        cur_s[k] = 0
        ptr_s[k] = 0
        valid_s[k] = row_active.astype(jnp.int32)
        n_alive = n_alive + valid_s[k]

    def cond(c):
        it, alive = c
        return (it < MAX_ITERS) & (alive > 0)

    def body(c):
        it, _ = c

        # ---- scalar phase 1: pop + fetch ----
        for k in range(K):
            need_pop = (valid_s[k] == 0) & (ptr_s[k] > 0)
            top = jnp.maximum(ptr_s[k] - 1, 0)
            popped = stack_s[k, top]
            cur_s[k] = jnp.where(need_pop, popped, cur_s[k])
            ptr_s[k] = jnp.where(need_pop, top, ptr_s[k])
            valid_s[k] = jnp.where(need_pop, 1, valid_s[k])
            safe = jnp.where(valid_s[k] > 0, cur_s[k], 0)
            rows_s[pl.ds(k, 1), :] = nodes_ref[pl.ds(safe, 1), :]

        rows = rows_s[:]  # (K, 128)

        def col(j):
            return rows[:, j:j + 1]  # (K, 1) broadcasts over rays

        meta_vec = jax.lax.bitcast_convert_type(rows[:, 12:16], jnp.int32)
        c0_cnt_v = meta_vec[:, 1:2]
        c1_cnt_v = meta_vec[:, 3:4]

        if any_hit:
            searching = se_s[:] > 0.0
        else:
            searching = active0
        best_t = bt_s[:]

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

        # ---- leaf tests (vector; gated by per-child counts) ----
        best_prim = bp_s[:]
        best_u = bu_s[:]
        best_v = bv_s[:]

        def leaf_tests(base, prim_base, cnt_v, gate_ray,
                       best_t, best_prim, best_u, best_v, searching):
            for kk in range(MAX_LEAF):
                off = base + 9 * kk
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
                    & (kk < cnt_v)
                    & (jnp.abs(det) > TRI_EPS)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < best_t)
                )
                prim_k = jax.lax.bitcast_convert_type(
                    rows[:, prim_base + kk:prim_base + kk + 1], jnp.int32
                )
                best_t = jnp.where(hit, t, best_t)
                best_prim = jnp.where(hit, prim_k, best_prim)
                if any_hit:
                    searching = searching & ~hit
                else:
                    best_u = jnp.where(hit, u, best_u)
                    best_v = jnp.where(hit, v, best_v)
            return best_t, best_prim, best_u, best_v, searching

        best_t, best_prim, best_u, best_v, searching = leaf_tests(
            16, 88, c0_cnt_v, h0_ray,
            best_t, best_prim, best_u, best_v, searching,
        )
        best_t, best_prim, best_u, best_v, searching = leaf_tests(
            52, 92, c1_cnt_v, h1_ray,
            best_t, best_prim, best_u, best_v, searching,
        )

        bt_s[:] = best_t
        bp_s[:] = best_prim
        if any_hit:
            se_s[:] = searching.astype(jnp.float32)
        else:
            bu_s[:] = best_u
            bv_s[:] = best_v

        # ---- scalar phase 2: descend/push decisions ----
        alive = jnp.int32(0)
        for k in range(K):
            # scalar metadata via single-element slice reductions of the
            # already-fetched row (validated Mosaic pattern)
            c0r = jnp.sum(meta_vec[k, 0:1])
            c0c = jnp.sum(meta_vec[k, 1:2])
            c1r = jnp.sum(meta_vec[k, 2:3])
            c1c = jnp.sum(meta_vec[k, 3:4])

            if any_hit:
                row_dead = ~jnp.any(searching[k])
                ptr_s[k] = jnp.where(row_dead, 0, ptr_s[k])
            else:
                row_dead = jnp.bool_(False)

            h0k = jnp.any(h0_ray[k]) & (valid_s[k] > 0)
            h1k = jnp.any(h1_ray[k]) & (valid_s[k] > 0)

            int0 = h0k & (c0c == 0) & ~row_dead
            int1 = h1k & (c1c == 0) & ~row_dead
            both = int0 & int1
            if ordered:
                # near-first descent: better best_t pruning on long walks
                # (worth 2 extra vector->scalar crossings per packet)
                te0k = jnp.min(jnp.where(h0_ray[k], te0[k], jnp.inf))
                te1k = jnp.min(jnp.where(h1_ray[k], te1[k], jnp.inf))
                near_is_0 = te0k <= te1k
                near_ref = jnp.where(near_is_0, c0r, c1r)
                far_ref = jnp.where(near_is_0, c1r, c0r)
            else:
                # any-hit: no pruning benefit from ordering; skip the
                # reductions (measured ~18% faster per iteration)
                near_ref, far_ref = c0r, c1r

            push_slot = jnp.minimum(ptr_s[k], STACK - 1)
            stack_s[k, push_slot] = jnp.where(
                both, far_ref, stack_s[k, push_slot]
            )
            ptr_s[k] = jnp.minimum(
                ptr_s[k] + both.astype(jnp.int32), STACK
            )
            next_cur = jnp.where(both, near_ref, jnp.where(int0, c0r, c1r))
            cur_s[k] = jnp.where(valid_s[k] > 0, next_cur, cur_s[k])
            valid_s[k] = jnp.where(
                (valid_s[k] > 0) & (int0 | int1), 1, 0
            )
            alive = alive + jnp.where(
                (valid_s[k] > 0) | (ptr_s[k] > 0), 1, 0
            )

        return it + 1, alive

    jax.lax.while_loop(cond, body, (jnp.int32(0), n_alive))

    # copy running state to the output refs (outside the loop)
    t_out[:] = bt_s[:]
    prim_out[:] = bp_s[:]
    if any_hit:
        u_out[:] = jnp.zeros((K, PACKET), jnp.float32)
        v_out[:] = jnp.zeros((K, PACKET), jnp.float32)
    else:
        u_out[:] = bu_s[:]
        v_out[:] = bv_s[:]


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
    ordered = not any_hit
    """Pallas traversal. N must divide by 1024 (8 packets x 128 rays)."""
    n = o.shape[0]
    assert n % BLOCK == 0, f"pallas traversal needs N % {BLOCK} == 0"
    rows = n // PACKET
    grid = rows // K

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

    ray_spec = pl.BlockSpec((K, PACKET), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec(bvh.nodes.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.int32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
    ]
    t, prim, u, v = pl.pallas_call(
        partial(_kernel, any_hit=any_hit, ordered=ordered),
        grid=(grid,),
        in_specs=[node_spec] + [ray_spec] * 9,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K, PACKET), jnp.float32),  # rows_s
            pltpu.SMEM((K,), jnp.int32),           # cur_s
            pltpu.SMEM((K,), jnp.int32),           # ptr_s
            pltpu.SMEM((K,), jnp.int32),           # valid_s
            pltpu.SMEM((K, STACK), jnp.int32),     # stack_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # bt_s
            pltpu.VMEM((K, PACKET), jnp.int32),    # bp_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # bu_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # bv_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # se_s
        ],
        interpret=interpret,
    )(bvh.nodes, ox, oy, oz, dx, dy, dz, tmin, tmax, act)

    miss = prim < 0
    return HitRecord(
        t=jnp.where(miss, jnp.inf, t).reshape(n),
        prim=prim.reshape(n),
        u=u.reshape(n),
        v=v.reshape(n),
    )


def pallas_supported(bvh: BVHData, n: int) -> bool:
    """Can the Pallas kernel serve this scene/wavefront?

    All three checks are static at trace time: node count (VMEM residency +
    14-bit ref fields), wavefront divisibility, and the backend (Mosaic
    kernels only exist on TPU — the CPU reference backend always uses the
    XLA path, keeping CPU↔TPU single-source parity like the reference's
    __KERNELCC__ split, SURVEY.md §1 idea #1)."""
    return (
        jax.default_backend() == "tpu"
        and bvh.nodes.shape[0] <= MAX_VMEM_NODES
        and n % BLOCK == 0
    )


# --------------------------------------------------------------------------
# "wide" kernel: lockstep packet traversal over 4-wide nodes
# (accel/build._collapse4) kept VMEM-resident, fat leaf rows DMA'd from HBM
# per visit. Each node visit tests 4 child boxes, halving the iteration
# count on deep trees vs a BVH2 walk at unchanged per-iteration scalar
# crossings. Descent is unordered (fixed child order); near-first ordering
# with 4 children would cost a scalar sorting network per packet per
# iteration. Production default for COHERENT wavefronts on big scenes
# (integrator._make_tracers); the retired BVH2/streaming variants it
# outgrew are preserved in ROUND2.md's measurement history.
# --------------------------------------------------------------------------

MAX_COMPACT_NODES = 180224  # 16-float rows -> ~11.5 MB VMEM
LEAF_TRIS = 12  # capacity of a compact leaf row (12*9 + 12 ids + flags <=128)


def _kernel_compact4(nodes4_ref, leaves_hbm,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     tmin_ref, tmax_ref, act_ref,
                     t_out, prim_out, u_out, v_out,
                     rows_s, leaf_s, cur_s, ptr_s, valid_s, isleaf_s, stack_s,
                     bt_s, bp_s, bu_s, bv_s, se_s, dma_sems,
                     *, any_hit: bool):
    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    t_min = tmin_ref[:]

    def inv(c):
        return jnp.where(jnp.abs(c) > 1e-12, 1.0 / c, jnp.sign(c) * 1e12 + 1e12)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    active0 = act_ref[:] > 0

    bt_s[:] = tmax_ref[:]
    bp_s[:] = jnp.full((K, PACKET), -1, jnp.int32)
    bu_s[:] = jnp.zeros((K, PACKET), jnp.float32)
    bv_s[:] = jnp.zeros((K, PACKET), jnp.float32)
    se_s[:] = active0.astype(jnp.float32)

    n_alive = jnp.int32(0)
    for k in range(K):
        row_active = jnp.any(active0[k])
        cur_s[k] = 0
        ptr_s[k] = 0
        valid_s[k] = row_active.astype(jnp.int32)
        isleaf_s[k] = 0
        n_alive = n_alive + valid_s[k]

    def cond(c):
        it, alive = c
        return (it < MAX_ITERS) & (alive > 0)

    def body(c):
        it, _ = c

        for k in range(K):
            need_pop = (valid_s[k] == 0) & (ptr_s[k] > 0)
            top = jnp.maximum(ptr_s[k] - 1, 0)
            popped = stack_s[k, top]
            cur_s[k] = jnp.where(need_pop, popped, cur_s[k])
            ptr_s[k] = jnp.where(need_pop, top, ptr_s[k])
            valid_s[k] = jnp.where(need_pop, 1, valid_s[k])
            is_leaf = (valid_s[k] > 0) & (cur_s[k] < 0)
            isleaf_s[k] = is_leaf.astype(jnp.int32)
            node_idx = jnp.where((valid_s[k] > 0) & ~is_leaf, cur_s[k], 0)
            rows_s[pl.ds(k, 1), :] = nodes4_ref[pl.ds(node_idx, 1), :]

        any_leaf = jnp.int32(0)
        for k in range(K):
            any_leaf = any_leaf + isleaf_s[k]

        @pl.when(any_leaf > 0)
        def _do_leaf_dma():
            for k in range(K):
                leaf_idx = jnp.where(isleaf_s[k] > 0, -cur_s[k] - 1, 0)
                pltpu.make_async_copy(
                    leaves_hbm.at[pl.ds(leaf_idx, 1), :],
                    leaf_s.at[pl.ds(k, 1), :],
                    dma_sems.at[k],
                ).start()
            for k in range(K):
                pltpu.make_async_copy(
                    leaves_hbm.at[pl.ds(0, 1), :],
                    leaf_s.at[pl.ds(k, 1), :],
                    dma_sems.at[k],
                ).wait()

        @pl.when(any_leaf == 0)
        def _no_leaf():
            # ensure stale leaf data never re-fires: zero the flag column
            leaf_s[:, 120:122] = jnp.zeros((K, 2), jnp.float32)

        rows = rows_s[:]      # (K, 32)
        lrows = leaf_s[:]     # (K, 128)

        def ncol(j):
            return rows[:, j:j + 1]

        def lcol(j):
            return lrows[:, j:j + 1]

        refs_vec = jax.lax.bitcast_convert_type(rows[:, 24:28], jnp.int32)
        leaf_gate = lcol(120) > 0.0
        leaf_cnt = lcol(121)

        if any_hit:
            searching = se_s[:] > 0.0
        else:
            searching = active0
        best_t = bt_s[:]

        def slab(b):
            tx0 = (ncol(b + 0) - ox) * ix
            tx1 = (ncol(b + 3) - ox) * ix
            ty0 = (ncol(b + 1) - oy) * iy
            ty1 = (ncol(b + 4) - oy) * iy
            tz0 = (ncol(b + 2) - oz) * iz
            tz1 = (ncol(b + 5) - oz) * iz
            t_entry = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), best_t),
            )
            return (t_entry <= t_exit) & searching

        h_ray = [slab(c * 6) for c in range(4)]

        best_prim = bp_s[:]
        best_u = bu_s[:]
        best_v = bv_s[:]
        for kk in range(LEAF_TRIS):
            off = 9 * kk
            v0x, v0y, v0z = lcol(off), lcol(off + 1), lcol(off + 2)
            e1x, e1y, e1z = lcol(off + 3), lcol(off + 4), lcol(off + 5)
            e2x, e2y, e2z = lcol(off + 6), lcol(off + 7), lcol(off + 8)
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
                searching
                & leaf_gate
                & (kk < leaf_cnt)
                & (jnp.abs(det) > TRI_EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > t_min)
                & (t < best_t)
            )
            prim_k = jax.lax.bitcast_convert_type(
                lrows[:, 108 + kk:109 + kk], jnp.int32
            )
            best_t = jnp.where(hit, t, best_t)
            best_prim = jnp.where(hit, prim_k, best_prim)
            if any_hit:
                searching = searching & ~hit
            else:
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)

        bt_s[:] = best_t
        bp_s[:] = best_prim
        if any_hit:
            se_s[:] = searching.astype(jnp.float32)
        else:
            bu_s[:] = best_u
            bv_s[:] = best_v

        # pack the 4 per-packet hit flags (plus any-hit packet-death) into
        # ONE int column so the scalar side pays a single vector->scalar
        # crossing per packet instead of five
        hword = (
            jnp.max(h_ray[0].astype(jnp.int32), axis=1, keepdims=True)
            + 2 * jnp.max(h_ray[1].astype(jnp.int32), axis=1, keepdims=True)
            + 4 * jnp.max(h_ray[2].astype(jnp.int32), axis=1, keepdims=True)
            + 8 * jnp.max(h_ray[3].astype(jnp.int32), axis=1, keepdims=True)
        )
        if any_hit:
            hword = hword + 16 * (
                1 - jnp.max(searching.astype(jnp.int32), axis=1, keepdims=True)
            )

        alive = jnp.int32(0)
        for k in range(K):
            hw = jnp.sum(hword[k])
            if any_hit:
                row_dead = (hw >= 16)
                ptr_s[k] = jnp.where(row_dead, 0, ptr_s[k])
            else:
                row_dead = jnp.bool_(False)
            was_leaf = isleaf_s[k] > 0
            gate = (valid_s[k] > 0) & ~was_leaf & ~row_dead

            cur_new = cur_s[k]
            found = jnp.int32(0)
            ptr_k = ptr_s[k]
            for c in range(4):
                rc = jnp.sum(refs_vec[k, c:c + 1])
                hc = ((hw >> c) & 1) > 0
                hc = hc & gate
                take = hc & (found == 0)
                push = hc & (found > 0)
                cur_new = jnp.where(take, rc, cur_new)
                slot = jnp.minimum(ptr_k, STACK - 1)
                stack_s[k, slot] = jnp.where(push, rc, stack_s[k, slot])
                ptr_k = jnp.minimum(ptr_k + push.astype(jnp.int32), STACK)
                found = found + hc.astype(jnp.int32)
            ptr_s[k] = ptr_k
            cur_s[k] = jnp.where(gate, cur_new, cur_s[k])
            valid_s[k] = jnp.where(gate & (found > 0), 1, 0)
            alive = alive + jnp.where(
                (valid_s[k] > 0) | (ptr_s[k] > 0), 1, 0
            )

        return it + 1, alive

    jax.lax.while_loop(cond, body, (jnp.int32(0), n_alive))

    t_out[:] = bt_s[:]
    prim_out[:] = bp_s[:]
    if any_hit:
        u_out[:] = jnp.zeros((K, PACKET), jnp.float32)
        v_out[:] = jnp.zeros((K, PACKET), jnp.float32)
    else:
        u_out[:] = bu_s[:]
        v_out[:] = bv_s[:]


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def traverse_pallas_wide(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    interpret: bool = False,
) -> HitRecord:
    """BVH4 compact Pallas traversal for big scenes. N % 1024 == 0."""
    n = o.shape[0]
    assert n % BLOCK == 0, f"pallas traversal needs N % {BLOCK} == 0"
    assert bvh.nodes4 is not None and bvh.leaf_rows is not None
    rows = n // PACKET
    grid = rows // K

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

    ray_spec = pl.BlockSpec((K, PACKET), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec(bvh.nodes4.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    leaf_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_shape = [
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.int32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((rows, PACKET), jnp.float32),
    ]
    t, prim, u, v = pl.pallas_call(
        partial(_kernel_compact4, any_hit=any_hit),
        grid=(grid,),
        in_specs=[node_spec, leaf_spec] + [ray_spec] * 9,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K, 32), jnp.float32),      # rows_s
            pltpu.VMEM((K, 128), jnp.float32),     # leaf_s
            pltpu.SMEM((K,), jnp.int32),           # cur_s
            pltpu.SMEM((K,), jnp.int32),           # ptr_s
            pltpu.SMEM((K,), jnp.int32),           # valid_s
            pltpu.SMEM((K,), jnp.int32),           # isleaf_s
            pltpu.SMEM((K, STACK), jnp.int32),     # stack_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # bt_s
            pltpu.VMEM((K, PACKET), jnp.int32),    # bp_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # bu_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # bv_s
            pltpu.VMEM((K, PACKET), jnp.float32),  # se_s
            pltpu.SemaphoreType.DMA((K,)),         # dma_sems
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bvh.nodes4, bvh.leaf_rows, ox, oy, oz, dx, dy, dz, tmin, tmax, act)

    miss = prim < 0
    return HitRecord(
        t=jnp.where(miss, jnp.inf, t).reshape(n),
        prim=prim.reshape(n),
        u=u.reshape(n),
        v=v.reshape(n),
    )


def pallas_wide_supported(bvh: BVHData, n: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and bvh.nodes4 is not None
        and bvh.leaf_rows is not None
        and bvh.nodes4.shape[0] <= MAX_COMPACT_NODES // 2
        and n % BLOCK == 0
    )


# --------------------------------------------------------------------------
# v6: BVH8 streaming-refill kernel, LINEAR child layout (no SMEM refs).
#
# The v5 SMEM refs table does not scale: SMEM allocates scalars at 64-byte
# granularity, so the (M8, 8) i32 table costs 64x its logical bytes and
# busts the 1 MB SMEM at ~2k nodes (measured: 8752-row stress table asked
# for 4.48 MB). Here the children of a node are laid out CONSECUTIVELY
# (accel/build._collapse8_linear): internal children occupy consecutive
# node rows, leaf children consecutive leaf rows, and every child ref is
# derived from packed words that ride in the node row itself.
#
# Per packet per iteration the scalar side pays exactly TWO vector->scalar
# crossings at ANY scene size (vs 5 for the BVH4 streaming kernel):
#   word A = base_int | n_int << 26                  (from the node row)
#   word B = leaf_base | hit_word << 20 [| c_near << 28]   (vector-packed)
# where c_near is the packet-nearest hit child (min slab entry t over
# lanes), taken FIRST so best-t tightens earliest (closest-hit pruning);
# any-hit packs a 9-bit hit word (bit 8 = all-lanes-dead) instead.
#
# Leaf rows are DMA'd from HBM; the descend phase PREFETCHES the next
# row's leaf DMA as soon as the next ref is known, so the transfer
# overlaps the loop back-edge and the next iteration's scalar phase 1.
# --------------------------------------------------------------------------


def _kernel_stream8l(nodes_ref, leaves_hbm,
                     rays_hbm,
                     t_hbm, prim_hbm, u_hbm, v_hbm,
                     done_out,
                     rows_s, leaf_s, ray_s,
                     cur_s, ptr_s, valid_s, isleaf_s, pkt_s, live_s, qhead_s,
                     stack_s,
                     bt_s, bp_s, bu_s, bv_s, se_s,
                     dma_sems, ray_sems, out_sems,
                     *, any_hit: bool, n_packets: int):
    # --- init: row k starts on packet k ---
    for k in range(K):
        pkt_s[k] = k
        live_s[k] = jnp.int32(1 if k < n_packets else 0)
        cur_s[k] = 0
        ptr_s[k] = 0
        valid_s[k] = 0
        isleaf_s[k] = 0
        pltpu.make_async_copy(
            rays_hbm.at[pl.ds(min(k, n_packets - 1), 1)],
            ray_s.at[pl.ds(k, 1)],
            ray_sems.at[k],
        ).start()
    qhead_s[0] = jnp.int32(min(K, n_packets))
    leaf_s[:, 120:122] = jnp.zeros((K, 2), jnp.float32)
    for k in range(K):
        pltpu.make_async_copy(
            rays_hbm.at[pl.ds(0, 1)],
            ray_s.at[pl.ds(k, 1)],
            ray_sems.at[k],
        ).wait()
        bt_s[pl.ds(k, 1), :] = ray_s[k, 7:8, :]
        bp_s[pl.ds(k, 1), :] = jnp.full((1, PACKET), -1, jnp.int32)
        bu_s[pl.ds(k, 1), :] = jnp.zeros((1, PACKET), jnp.float32)
        bv_s[pl.ds(k, 1), :] = jnp.zeros((1, PACKET), jnp.float32)
        se_s[pl.ds(k, 1), :] = ray_s[k, 8:9, :]
        valid_s[k] = jnp.where(live_s[k] > 0, 1, 0)
        cur_s[k] = 0

    iter_cap = (n_packets // K + 2) * MAX_ITERS  # safety backstop only

    def cond(c):
        it, ndone, _nl, _nv = c
        return (it < iter_cap) & (ndone < n_packets)

    def body(c):
        it, ndone, nleaf, nvisit = c

        # ---- scalar phase 1: pop + node fetch + pop-leaf DMA ----
        # (leaf DMAs for descend-chosen refs were already started in the
        # previous iteration's phase 2; flags were zeroed there before any
        # DMA could land, so no stale-flag race)
        for k in range(K):
            need_pop = (valid_s[k] == 0) & (ptr_s[k] > 0) & (live_s[k] > 0)
            top = jnp.maximum(ptr_s[k] - 1, 0)
            popped = stack_s[k, top]
            cur_s[k] = jnp.where(need_pop, popped, cur_s[k])
            ptr_s[k] = jnp.where(need_pop, top, ptr_s[k])
            valid_s[k] = jnp.where(need_pop, 1, valid_s[k])
            is_leaf = (valid_s[k] > 0) & (cur_s[k] < 0)
            isleaf_s[k] = is_leaf.astype(jnp.int32)
            node_idx = jnp.where((valid_s[k] > 0) & ~is_leaf, cur_s[k], 0)
            rows_s[pl.ds(k, 1), :] = nodes_ref[pl.ds(node_idx, 1), :]

            @pl.when(is_leaf & need_pop)
            def _start_popped_leaf_dma():
                pltpu.make_async_copy(
                    leaves_hbm.at[pl.ds(-cur_s[k] - 1, 1), :],
                    leaf_s.at[pl.ds(k, 1), :],
                    dma_sems.at[k],
                ).start()
        for k in range(K):
            nleaf = nleaf + isleaf_s[k]
            nvisit = nvisit + valid_s[k]

            @pl.when(isleaf_s[k] > 0)
            def _wait_leaf_dma():
                pltpu.make_async_copy(
                    leaves_hbm.at[pl.ds(0, 1), :],
                    leaf_s.at[pl.ds(k, 1), :],
                    dma_sems.at[k],
                ).wait()

        rows = rows_s[:]      # (K, 64): 8 boxes + packed words A/B
        lrows = leaf_s[:]     # (K, 128)
        rd = ray_s[:]         # (K, 10, 128)
        ox, oy, oz = rd[:, 0, :], rd[:, 1, :], rd[:, 2, :]
        dx, dy, dz = rd[:, 3, :], rd[:, 4, :], rd[:, 5, :]
        t_min = rd[:, 6, :]

        def inv(c_):
            return jnp.where(
                jnp.abs(c_) > 1e-12, 1.0 / c_, jnp.sign(c_) * 1e12 + 1e12
            )

        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        active0 = rd[:, 8, :] > 0

        def ncol(j):
            return rows[:, j:j + 1]

        def lcol(j):
            return lrows[:, j:j + 1]

        wa_vec = jax.lax.bitcast_convert_type(rows[:, 48:49], jnp.int32)
        wb_vec = jax.lax.bitcast_convert_type(rows[:, 49:50], jnp.int32)
        leaf_gate = lcol(120) > 0.0
        leaf_cnt = lcol(121)

        if any_hit:
            searching = (se_s[:] > 0.0) & active0
        else:
            searching = active0
        best_t = bt_s[:]

        def slab(b):
            tx0 = (ncol(b + 0) - ox) * ix
            tx1 = (ncol(b + 3) - ox) * ix
            ty0 = (ncol(b + 1) - oy) * iy
            ty1 = (ncol(b + 4) - oy) * iy
            tz0 = (ncol(b + 2) - oz) * iz
            tz1 = (ncol(b + 5) - oz) * iz
            t_entry = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            t_exit = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), best_t),
            )
            return (t_entry <= t_exit) & searching, t_entry

        slabs = [slab(c * 6) for c in range(8)]
        h_ray = [s[0] for s in slabs]

        best_prim = bp_s[:]
        best_u = bu_s[:]
        best_v = bv_s[:]
        for kk in range(LEAF_TRIS):
            off = 9 * kk
            v0x, v0y, v0z = lcol(off), lcol(off + 1), lcol(off + 2)
            e1x, e1y, e1z = lcol(off + 3), lcol(off + 4), lcol(off + 5)
            e2x, e2y, e2z = lcol(off + 6), lcol(off + 7), lcol(off + 8)
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
                searching
                & leaf_gate
                & (kk < leaf_cnt)
                & (jnp.abs(det) > TRI_EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > t_min)
                & (t < best_t)
            )
            prim_k = jax.lax.bitcast_convert_type(
                lrows[:, 108 + kk:109 + kk], jnp.int32
            )
            best_t = jnp.where(hit, t, best_t)
            best_prim = jnp.where(hit, prim_k, best_prim)
            if any_hit:
                searching = searching & ~hit
            else:
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)

        bt_s[:] = best_t
        bp_s[:] = best_prim
        if any_hit:
            se_s[:] = searching.astype(jnp.float32)
        else:
            bu_s[:] = best_u
            bv_s[:] = best_v

        # packed per-packet word B: leaf_base | hit bits << 20 (+ death bit
        # 28 for any-hit; + nearest-hit-child << 28 for closest-hit)
        hword = jnp.max(h_ray[0].astype(jnp.int32), axis=1, keepdims=True)
        for c in range(1, 8):
            hword = hword + (
                jnp.max(h_ray[c].astype(jnp.int32), axis=1, keepdims=True) << c
            )
        bword = wb_vec + (hword << 20)
        if any_hit:
            bword = bword + (256 << 20) * (
                1 - jnp.max(searching.astype(jnp.int32), axis=1, keepdims=True)
            )
        else:
            # packet-nearest hit child: min slab-entry t over lanes per
            # child, argmin over the 8 children (vector side, ~24 ops)
            big = jnp.float32(3e38)
            tn = [
                jnp.min(jnp.where(h, te, big), axis=1, keepdims=True)
                for (h, te) in slabs
            ]
            c_near = jnp.zeros_like(hword)
            t_near = tn[0]
            for c in range(1, 8):
                closer = tn[c] < t_near
                t_near = jnp.where(closer, tn[c], t_near)
                c_near = jnp.where(closer, jnp.full_like(c_near, c), c_near)
            bword = bword + (c_near << 28)

        # ---- scalar phase 2: descend / finish / refill / leaf prefetch ----
        # zero leaf flags BEFORE any prefetch DMA can land (race-free gate)
        leaf_s[:, 120:122] = jnp.zeros((K, 2), jnp.float32)
        ndone_new = ndone
        for k in range(K):
            wbk = jnp.sum(bword[k])
            wak = jnp.sum(wa_vec[k])
            base_int = wak & jnp.int32((1 << 26) - 1)
            n_int = wak >> 26
            base_leaf = wbk & jnp.int32((1 << 20) - 1)
            if any_hit:
                hw = (wbk >> 20) & 0x1FF
                row_dead = (hw >= 256) & (live_s[k] > 0)
                hw = hw & 0xFF
                ptr_s[k] = jnp.where(row_dead, 0, ptr_s[k])
            else:
                hw = (wbk >> 20) & 0xFF
                c_nr = (wbk >> 28) & 0x7
                row_dead = jnp.bool_(False)
            was_leaf = isleaf_s[k] > 0
            gate = (valid_s[k] > 0) & ~was_leaf & ~row_dead & (live_s[k] > 0)

            valid_s[k] = 0

            @pl.when(gate)
            def _descend():
                def ref(c):
                    return jnp.where(
                        c < n_int,
                        base_int + c,
                        -(base_leaf + (c - n_int)) - 1,
                    )

                if any_hit:
                    # unordered first-hit take
                    cur_new = cur_s[k]
                    found = jnp.int32(0)
                    ptr_k = ptr_s[k]
                    for c in range(8):
                        rc = ref(jnp.int32(c))
                        hc = (((hw >> c) & 1) > 0)
                        take = hc & (found == 0)
                        push = hc & (found > 0)
                        cur_new = jnp.where(take, rc, cur_new)
                        slot = jnp.minimum(ptr_k, STACK - 1)
                        stack_s[k, slot] = jnp.where(
                            push, rc, stack_s[k, slot]
                        )
                        ptr_k = jnp.minimum(
                            ptr_k + push.astype(jnp.int32), STACK
                        )
                        found = found + hc.astype(jnp.int32)
                    any_found = found > 0
                else:
                    # nearest-first take (c_nr), push the rest in order
                    any_found = hw != 0
                    cur_new = jnp.where(any_found, ref(c_nr), cur_s[k])
                    ptr_k = ptr_s[k]
                    for c in range(8):
                        push = (((hw >> c) & 1) > 0) & (c_nr != c)
                        slot = jnp.minimum(ptr_k, STACK - 1)
                        stack_s[k, slot] = jnp.where(
                            push, ref(jnp.int32(c)), stack_s[k, slot]
                        )
                        ptr_k = jnp.minimum(
                            ptr_k + push.astype(jnp.int32), STACK
                        )
                ptr_s[k] = ptr_k
                cur_s[k] = cur_new
                valid_s[k] = any_found.astype(jnp.int32)

                # prefetch: if the chosen ref is a leaf, start its DMA now
                # so it overlaps the loop back-edge and next phase 1
                @pl.when(any_found & (cur_new < 0))
                def _prefetch_leaf_dma():
                    pltpu.make_async_copy(
                        leaves_hbm.at[pl.ds(-cur_new - 1, 1), :],
                        leaf_s.at[pl.ds(k, 1), :],
                        dma_sems.at[k],
                    ).start()

            fin = (live_s[k] > 0) & (valid_s[k] == 0) & (ptr_s[k] == 0)

            @pl.when(fin)
            def _finish():
                pkt = pkt_s[k]
                pltpu.make_async_copy(
                    bt_s.at[pl.ds(k, 1), :], t_hbm.at[pl.ds(pkt, 1), :],
                    out_sems.at[k],
                ).start()
                pltpu.make_async_copy(
                    bp_s.at[pl.ds(k, 1), :], prim_hbm.at[pl.ds(pkt, 1), :],
                    out_sems.at[k],
                ).start()
                pltpu.make_async_copy(
                    bu_s.at[pl.ds(k, 1), :], u_hbm.at[pl.ds(pkt, 1), :],
                    out_sems.at[k],
                ).start()
                pltpu.make_async_copy(
                    bv_s.at[pl.ds(k, 1), :], v_hbm.at[pl.ds(pkt, 1), :],
                    out_sems.at[k],
                ).start()
                for _ in range(4):
                    pltpu.make_async_copy(
                        bt_s.at[pl.ds(k, 1), :], t_hbm.at[pl.ds(pkt, 1), :],
                        out_sems.at[k],
                    ).wait()
                pkt_next = qhead_s[0]
                has_next = pkt_next < n_packets
                qhead_s[0] = qhead_s[0] + has_next.astype(jnp.int32)
                live_s[k] = jnp.where(has_next, 1, 0)
                pkt_s[k] = jnp.where(has_next, pkt_next, pkt_s[k])

                @pl.when(has_next)
                def _refill():
                    pltpu.make_async_copy(
                        rays_hbm.at[pl.ds(pkt_next, 1)],
                        ray_s.at[pl.ds(k, 1)],
                        ray_sems.at[k],
                    ).start()
                    pltpu.make_async_copy(
                        rays_hbm.at[pl.ds(0, 1)],
                        ray_s.at[pl.ds(k, 1)],
                        ray_sems.at[k],
                    ).wait()
                    bt_s[pl.ds(k, 1), :] = ray_s[k, 7:8, :]
                    bp_s[pl.ds(k, 1), :] = jnp.full((1, PACKET), -1, jnp.int32)
                    bu_s[pl.ds(k, 1), :] = jnp.zeros((1, PACKET), jnp.float32)
                    bv_s[pl.ds(k, 1), :] = jnp.zeros((1, PACKET), jnp.float32)
                    se_s[pl.ds(k, 1), :] = ray_s[k, 8:9, :]
                    cur_s[k] = 0
                    ptr_s[k] = 0
                    valid_s[k] = 1
                    isleaf_s[k] = 0

            ndone_new = ndone_new + fin.astype(jnp.int32)

        return it + 1, ndone_new, nleaf, nvisit

    _it, ndone, _nl, _nv = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
    )
    done_out[0, 0] = ndone
    done_out[0, 1] = _it
    done_out[0, 2] = _nl
    done_out[0, 3] = _nv


@partial(jax.jit, static_argnames=("any_hit", "interpret", "return_stats"))
def traverse_pallas_stream8l(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    interpret: bool = False,
    return_stats: bool = False,
) -> HitRecord:
    """BVH8 linear-layout streaming-refill traversal. N % 128 == 0.

    Scales to any node count that fits VMEM (256 B/row): no SMEM table.
    """
    n = o.shape[0]
    assert n % PACKET == 0
    assert bvh.nodes8l is not None and bvh.leaf_rows8 is not None
    p = n // PACKET

    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    act = (
        jnp.ones((n,), jnp.float32)
        if active is None
        else jnp.asarray(active).astype(jnp.float32)
    )
    zero = jnp.zeros((n,), jnp.float32)
    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         tmin, tmax, act, zero],
        axis=1,
    ).reshape(p, PACKET, 10).transpose(0, 2, 1)  # (P, 10, 128)

    out_shape = [
        jax.ShapeDtypeStruct((p, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((p, PACKET), jnp.int32),
        jax.ShapeDtypeStruct((p, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((p, PACKET), jnp.float32),
        jax.ShapeDtypeStruct((1, 4), jnp.int32),
    ]
    node_spec = pl.BlockSpec(bvh.nodes8l.shape, lambda: (0, 0),
                             memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    t, prim, u, v, _cnt = pl.pallas_call(
        partial(_kernel_stream8l, any_hit=any_hit, n_packets=p),
        grid=(),
        in_specs=[node_spec, hbm, hbm],
        out_specs=[hbm, hbm, hbm, hbm,
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K, 64), jnp.float32),       # rows_s
            pltpu.VMEM((K, 128), jnp.float32),      # leaf_s
            pltpu.VMEM((K, 10, PACKET), jnp.float32),  # ray_s
            pltpu.SMEM((K,), jnp.int32),            # cur_s
            pltpu.SMEM((K,), jnp.int32),            # ptr_s
            pltpu.SMEM((K,), jnp.int32),            # valid_s
            pltpu.SMEM((K,), jnp.int32),            # isleaf_s
            pltpu.SMEM((K,), jnp.int32),            # pkt_s
            pltpu.SMEM((K,), jnp.int32),            # live_s
            pltpu.SMEM((1,), jnp.int32),            # qhead_s
            pltpu.SMEM((K, STACK), jnp.int32),      # stack_s
            pltpu.VMEM((K, PACKET), jnp.float32),   # bt_s
            pltpu.VMEM((K, PACKET), jnp.int32),     # bp_s
            pltpu.VMEM((K, PACKET), jnp.float32),   # bu_s
            pltpu.VMEM((K, PACKET), jnp.float32),   # bv_s
            pltpu.VMEM((K, PACKET), jnp.float32),   # se_s
            pltpu.SemaphoreType.DMA((K,)),          # dma_sems
            pltpu.SemaphoreType.DMA((K,)),          # ray_sems
            pltpu.SemaphoreType.DMA((K,)),          # out_sems
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(bvh.nodes8l, bvh.leaf_rows8, rays)

    miss = prim < 0
    rec = HitRecord(
        t=jnp.where(miss, jnp.inf, t).reshape(n),
        prim=prim.reshape(n),
        u=u.reshape(n),
        v=v.reshape(n),
    )
    if return_stats:
        return rec, _cnt  # row: [done, iters, leaf_row_iters, visits]
    return rec


MAX_STREAM8L_NODES = 196608   # (M8, 64) f32 node table must fit VMEM (~48 MB)
MAX_STREAM8L_LEAVES = 1 << 20  # leaf base rides in 20 bits of word B


def pallas_stream8l_supported(bvh: BVHData, n: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and bvh.nodes8l is not None
        and bvh.leaf_rows8 is not None
        and bvh.nodes8l.shape[0] <= MAX_STREAM8L_NODES
        and bvh.leaf_rows8.shape[0] <= MAX_STREAM8L_LEAVES
        and n % PACKET == 0
    )


# --------------------------------------------------------------------------
# PER-LANE BVH8 traversal (the "lane8" family: lane8log below, lane8s after
# it) — one-hot MXU gather, no packet union. The family's original v7
# kernel was retired once lane8log/lane8s outperformed it (measurement
# history: ROUND2.md); this banner documents the shared design.
#
# Measurement that motivates the family: a lone incoherent ray
# needs ~13 node visits on the 29k-node stress BVH8, but a 128-ray packet's
# UNION is ~1190 visits — the lockstep packet kernels serialize ~90x more
# row-visits than per-ray work requires (lane utilization ~1%). Here every
# one of 1024 resident lanes walks its OWN tree path:
#
#   * node fetch   = one-hot matmul on the MXU:  G = nodes^T @ OH, where
#     OH[m, l] = (m == cur[l]).  Boxes are bf16 with DIRECTED rounding
#     (build._pack_lane8) so the slab test is conservative; meta rides as
#     bf16-exact byte columns reassembled in f32. ~4-6 us per iteration for
#     all 1024 lanes — cheaper than ONE packet row-visit per useful visit.
#   * per-lane stack = (STACK, L) i32 in VMEM; push/pop via iota==ptr masks.
#   * leaf tests   = banked: lanes park a pending leaf ref; when >=50% of
#     lanes are pending (or nobody has node work) a LEAF ROUND gathers each
#     lane's leaf row from the bf16 (hi, lo)-pair table and runs 12
#     Moller-Trumbore tests per lane in f32 (coord error <= 2^-17).
#   * streaming refill = finished lanes scatter their result into the
#     output buffer via an exact f32 one-hot matmul and take the next ray
#     from the resident ray table, assigned by a matmul prefix-rank. Lane
#     occupancy stays ~100% like the packet streaming kernels, but per
#     LANE, not per packet.
#
# All cross-layout moves (lane-major <-> sublane-major) are expressed as
# small exact f32 matmuls (transpose / broadcast / prefix-sum by
# triangular matrix) — the only dot_general forms used are the two Mosaic
# supports natively. No vector->scalar crossings in the node phase at all;
# leaf rounds pay a handful for the round decision and pool bookkeeping.
#
# Reference parity: src/Device/includes/Intersect.h:129-142 (the HW
# traversal this replaces) — redesigned for the MXU instead of translated.
# --------------------------------------------------------------------------

L8_STACK = 64        # per-lane stack depth (>= depth8 * 7)
L8_MAX_RAYS = 1 << 18  # per-call ray cap (VMEM out buffer; lane8log)
# lane8s per-call cap: the rays+out VMEM buffers cost 36 B/ray, so 1M rays
# adds ~50 MB — affordable at stress-table sizes and worth it: the 2.07M
# in-frame wavefront measured +97 ms/bounce of chunk-boundary overhead at
# 8 chunks (profile_stress r5). Big leaf tables shrink the cap to keep the
# total under the 120 MB VMEM window.
L8S_MAX_RAYS = 1 << 20
L8S_VMEM_BUDGET = 110 * 1024 * 1024
MAX_LANE8_NODES = 65536
MAX_LANE8_LEAF_BYTES = 48 * 1024 * 1024  # int8 leaf table VMEM budget


def pallas_lane8_supported(bvh: BVHData, n: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and bvh.nodes_lane8 is not None
        and bvh.leaves_lane8 is not None
        and bvh.lane8_frame is not None
        and bvh.nodes_lane8.shape[0] <= MAX_LANE8_NODES
        and bvh.leaves_lane8.size <= MAX_LANE8_LEAF_BYTES
    )

# --------------------------------------------------------------------------
# v8: lane8 + completion LOG ("lane8log") — windowless refill.
#
# The v7 scatter writes results IN ORDER through an 8-chunk window anchored
# at the oldest unflushed ray: per leaf round it runs up to 8 chunk scatters
# (two (LN, LN) f32 materializations + matmuls each), and — worse — REFILL
# is capped to the same window, so one straggler ray stalls refill once the
# pool head runs ahead and lanes idle (measured: ~62% node-lane occupancy on
# incoherent stress rays). Here finished lanes instead append
# (t, prim, u, v, rayid) UNORDERED to a completion log that is DMA'd to HBM
# one (5, LN) block at a time, and the caller unscrambles with one XLA
# scatter keyed on rayid. No window, no per-chunk scatter machinery; refill
# is bounded only by the ray pool itself.
#
# Flushes happen on leaf rounds when >= LN/4 lanes are done (or
# unconditionally once the pool is exhausted, to drain), which bounds the
# log to ~n_total/(LN/4) + drain blocks; the allocation carries a 2x margin
# over that bound and flushing is gated on log capacity so an overflow
# degrades to unflushed rays (reported in stats), never OOB.
#
# The ray pool is 8 rows per chunk [ox oy oz dx dy dz tmin tmax'] with
# activity encoded in the sign of tmax' (inactive rays carry tmax' = -1), so
# the refill gather moves exactly one aligned sublane tile per chunk. The
# refill rank is an exclusive prefix sum over lanes computed with log-step
# pltpu.roll shifts — no (LN, LN) lower-triangular scratch, no
# transpose-by-matmul chain (measured ~87 us/round at LN=1024, the largest
# marginal cost in the kernel; see ROUND2.md and commit 0743450 for the
# L8_DUP probe methodology).
#
# `lanes` parameterizes the resident-lane count. All per-lane state rows are
# (1, lanes): at 1024 lanes every op runs at 1/8 sublane occupancy and the
# body is issue/latency-bound (duplicating whole phases measured ~free at
# the margin), so wider programs amortize per-op overhead nearly linearly
# until VMEM caps out (leaf gather result is (18*Tc+13, lanes) i32).
# --------------------------------------------------------------------------


def _leaf_geo_decode(gl, Tc, leaf_bits):
    """Decode the quantized leaf-geometry gather result (build._pack_lane8
    layout; -128-encoded bytes already summed to i32 by the one-hot matmul).

    Returns (kx, ky, kz, qc, cnt, prim_base): 24-bit lattice anchors, the
    per-coordinate q decoder ((Tc, LN) i32 blocks), valid-slot count and the
    leaf's prim-position base. leaf_bits=16 reads two byte rows per coord;
    leaf_bits=12 reads one hi row plus half of a shared nibble row (coord
    pair 2p/2p+1 packed lo|hi in nibble row p, coord 8 in row 4's low
    nibble) — 22% less table streamed per leaf round."""
    HB = (18 if leaf_bits == 16 else 14) * Tc

    def kax(base):
        return (gl[base:base + 1] + gl[base + 1:base + 2] * 256
                + gl[base + 2:base + 3] * 65536
                + (128 + 128 * 256 + 128 * 65536))

    kx, ky, kz = kax(HB + 1), kax(HB + 4), kax(HB + 7)
    if leaf_bits == 16:
        def qc(j):
            return (gl[j * Tc:(j + 1) * Tc] * 256
                    + gl[9 * Tc + j * Tc:9 * Tc + (j + 1) * Tc]
                    + (128 * 256 + 128))
    else:
        def qc(j):
            hi = gl[j * Tc:(j + 1) * Tc] + 128
            pr = j // 2
            nib = gl[9 * Tc + pr * Tc:9 * Tc + (pr + 1) * Tc] + 128
            lo = (nib & 15) if (j % 2 == 0) else (nib >> 4)
            return hi * 16 + lo
    # two-byte count (lo, hi at HB+13): one byte capped leaves at 255
    # tris and zeroed full 256-tri leaves
    cnt = (gl[HB:HB + 1] + 128) + (gl[HB + 13:HB + 14] + 128) * 256
    prim_base = (gl[HB + 10:HB + 11] + gl[HB + 11:HB + 12] * 256
                 + gl[HB + 12:HB + 13] * 65536
                 + (128 + 128 * 256 + 128 * 65536))
    return kx, ky, kz, qc, cnt, prim_base

def _kernel_lane8log(nodes_ref, leaves_ref, rays_ref, log_ref, stats_ref,
                     cur_s, ptr_s, valid_s, pend_s, done_s, scat_s, rayid_s,
                     ray_s, bt_s, bu_s, bv_s, bp_s,
                     stack_s, sc_s, stage_s, dma_sem,
                     *, leaf_bits: int, any_hit: bool, n_chunks: int, m_nodes: int,
                     m_leaves: int, iter_cap: int, log_cap: int,
                     frame: tuple, leaf_tris: int, round_every: int,
                     lanes: int):
    NC = n_chunks
    LN = lanes
    LOG_LN = LN.bit_length() - 1
    n_total = NC * LN
    flush_min = LN // 4

    f32 = jnp.float32
    i32 = jnp.int32

    cur_s[:] = jnp.zeros((1, LN), i32)
    ptr_s[:] = jnp.zeros((1, LN), i32)
    valid_s[:] = jnp.zeros((1, LN), i32)
    pend_s[:] = jnp.zeros((1, LN), i32)
    done_s[:] = jnp.ones((1, LN), i32)
    scat_s[:] = jnp.ones((1, LN), i32)
    rayid_s[:] = jnp.full((1, LN), -1, i32)
    ray_s[:] = jnp.zeros((16, LN), f32)
    bt_s[:] = jnp.zeros((1, LN), f32)
    bu_s[:] = jnp.zeros((1, LN), f32)
    bv_s[:] = jnp.zeros((1, LN), f32)
    bp_s[:] = jnp.full((1, LN), -1, i32)
    stack_s[:] = jnp.zeros((L8_STACK, LN), i32)
    for _si in range(8):
        stats_ref[0, _si] = jnp.int32(0)
    sc_s[0, 0] = jnp.int32(0)  # ndone (flushed rays)
    sc_s[0, 1] = jnp.int32(0)  # pool head
    sc_s[0, 2] = jnp.int32(0)  # log_ptr (blocks written)

    slot_iota = jax.lax.broadcasted_iota(i32, (L8_STACK, LN), 0)
    lane_iota = jax.lax.broadcasted_iota(i32, (1, LN), 1)
    iota8 = jax.lax.broadcasted_iota(i32, (8, LN), 0)
    Tc = leaf_tris
    iota_t = jax.lax.broadcasted_iota(i32, (Tc, LN), 0)
    SLOTM = jnp.int32(max(16, 1 << (Tc - 1).bit_length()) - 1)
    IMAX = jnp.int32(0x7FFFFFFF)

    def cond(c):
        it, ndone = c
        return (it < iter_cap) & (ndone < n_total)

    def body(c):
        it, _nd = c

        done = done_s[:]
        ptr = ptr_s[:]
        valid = valid_s[:]
        cur = cur_s[:]
        pend = pend_s[:]

        # ---- pop (masked-sum over stack slots; Mosaic's dynamic_gather
        # cannot gather along a >1-vreg sublane dim: "Multiple source vregs
        # along gather dimension", measured on v5e 2026-08-18) ----
        need_pop = (done == 0) & (valid == 0) & (ptr > 0)
        top = jnp.maximum(ptr - 1, 0)
        popped = jnp.sum(
            jnp.where(slot_iota == top, stack_s[:], 0), axis=0, keepdims=True
        )
        cur = jnp.where(need_pop, popped, cur)
        ptr = jnp.where(need_pop, top, ptr)
        valid = jnp.where(need_pop, 1, valid)

        # ---- promote leaf cur -> pending bank ----
        promo = (valid > 0) & (cur < 0) & (pend == 0)
        pend = jnp.where(promo, -cur, pend)
        valid = jnp.where(promo, 0, valid)

        node_lane = (valid > 0) & (cur >= 0)

        if round_every > 0:
            # fixed cadence: the round decision is pure SCALAR arithmetic
            # on `it` — no per-body vector->scalar reduction at all. The
            # drain case (no node work left) is covered within
            # round_every bodies by the cadence itself.
            leaf_round = (it % round_every) == (round_every - 1)
            n_nodework = jnp.int32(0)  # stats-only in this mode
        else:
            n_pend = jnp.sum((pend > 0).astype(i32))
            n_nodework = jnp.sum(node_lane.astype(i32))
            leaf_round = (n_pend >= LN // 2) | (n_nodework == 0)

        # ---- node phase ----
        rd = ray_s[:]
        ox, oy, oz = rd[0:1], rd[1:2], rd[2:3]
        dx, dy, dz = rd[3:4], rd[4:5], rd[5:6]
        ix, iy, iz = rd[9:10], rd[10:11], rd[11:12]
        t_min = rd[6:7]
        best_t = bt_s[:]

        node_idx = jnp.where(node_lane, cur, -1)
        iota_nc = jax.lax.broadcasted_iota(i32, (m_nodes, LN), 0)
        oh_n = (iota_nc == node_idx).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            nodes_ref[:], oh_n, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

        tx0 = (g[0:8] - ox) * ix
        ty0 = (g[8:16] - oy) * iy
        tz0 = (g[16:24] - oz) * iz
        tx1 = (g[24:32] - ox) * ix
        ty1 = (g[32:40] - oy) * iy
        tz1 = (g[40:48] - oz) * iz
        te = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
        )
        tx = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.minimum(jnp.maximum(tz0, tz1), best_t),
        )
        hit8 = (te <= tx) & node_lane

        te_bits = jax.lax.bitcast_convert_type(te, i32)
        key8 = jnp.where(hit8, (te_bits & jnp.int32(~7)) | iota8, IMAX)
        kmin = jnp.min(key8, axis=0, keepdims=True)
        anyfound = jnp.max(hit8.astype(i32), axis=0, keepdims=True) > 0
        c_near = kmin & 7

        base_int = (g[48:49] + g[49:50] * 256.0 + g[50:51] * 65536.0
                    ).astype(i32)
        n_int = g[51:52].astype(i32)
        base_leaf = (g[52:53] + g[53:54] * 256.0 + g[54:55] * 65536.0
                     ).astype(i32)

        def ref_of(cc):
            return jnp.where(cc < n_int, base_int + cc,
                             -(base_leaf + (cc - n_int)) - 1)

        cur = jnp.where(node_lane,
                        jnp.where(anyfound, ref_of(c_near), cur), cur)
        new_stack = stack_s[:]
        for cc in range(8):
            push = hit8[cc:cc + 1] & (c_near != cc)
            slot = jnp.minimum(ptr, L8_STACK - 1)
            cval = ref_of(jnp.full((1, LN), cc, i32))
            new_stack = jnp.where((slot_iota == slot) & push, cval, new_stack)
            ptr = ptr + push.astype(i32)
        stack_s[:] = new_stack
        valid = jnp.where(node_lane, anyfound.astype(i32), valid)

        cur_s[:] = cur
        ptr_s[:] = jnp.minimum(ptr, L8_STACK)
        valid_s[:] = valid
        pend_s[:] = pend

        # ---- leaf round ----
        @pl.when(leaf_round)
        def _leaf_round():
            pendv = pend_s[:]
            pend_lane = pendv > 0
            lidx = jnp.where(pend_lane, pendv - 1, -1)
            iota_lc = jax.lax.broadcasted_iota(i32, (m_leaves, LN), 0)
            oh_l = (iota_lc == lidx).astype(jnp.int8)
            gl = jax.lax.dot_general(
                leaves_ref[:], oh_l, (((0,), (0,)), ((), ())),
                preferred_element_type=i32,
            )  # (18*Tc + 13 rounded, LN) i32 of -128-encoded bytes

            step = jnp.float32(frame[3])
            kx, ky, kz, qc, cnt, prim_base = _leaf_geo_decode(
                gl, Tc, leaf_bits)

            q0x, q0y, q0z = qc(0), qc(1), qc(2)
            v0x = jnp.float32(frame[0]) + (kx + q0x).astype(f32) * step
            v0y = jnp.float32(frame[1]) + (ky + q0y).astype(f32) * step
            v0z = jnp.float32(frame[2]) + (kz + q0z).astype(f32) * step
            e1x = (qc(3) - q0x).astype(f32) * step
            e1y = (qc(4) - q0y).astype(f32) * step
            e1z = (qc(5) - q0z).astype(f32) * step
            e2x = (qc(6) - q0x).astype(f32) * step
            e2y = (qc(7) - q0y).astype(f32) * step
            e2z = (qc(8) - q0z).astype(f32) * step
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

            # winner prim POSITION = leaf base + slot (prim ids are
            # not stored; the wrapper remaps through bvh.lane8_order)
            prim12 = prim_base + iota_t
            btv = bt_s[:]
            hit12 = (
                pend_lane
                & (iota_t < cnt)
                & (jnp.abs(det) > TRI_EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > t_min)
                & (t < btv)
            )
            t_bits = jax.lax.bitcast_convert_type(
                jnp.where(hit12, t, jnp.float32(jnp.inf)), i32)
            key12 = jnp.where(hit12, (t_bits & ~SLOTM) | iota_t, IMAX)
            kmin12 = jnp.min(key12, axis=0, keepdims=True)
            newhit = jnp.max(hit12.astype(i32), axis=0, keepdims=True) > 0
            win_t = jax.lax.bitcast_convert_type(
                kmin12 & ~SLOTM, f32)
            oh12 = (iota_t == (kmin12 & SLOTM)) & hit12
            win_p = jnp.sum(jnp.where(oh12, prim12, 0), axis=0, keepdims=True)
            bt_s[:] = jnp.where(newhit, win_t, btv)
            bp_s[:] = jnp.where(newhit, win_p, bp_s[:])
            pend_s[:] = jnp.where(pend_lane, 0, pendv)
            if any_hit:
                done_s[:] = jnp.where(newhit, 1, done_s[:])
                ptr_s[:] = jnp.where(newhit, 0, ptr_s[:])
                valid_s[:] = jnp.where(newhit, 0, valid_s[:])
            else:
                win_u = jnp.sum(jnp.where(oh12, u, 0.0), axis=0,
                                keepdims=True)
                win_v = jnp.sum(jnp.where(oh12, v, 0.0), axis=0,
                                keepdims=True)
                bu_s[:] = jnp.where(newhit, win_u, bu_s[:])
                bv_s[:] = jnp.where(newhit, win_v, bv_s[:])

        # ---- finish detection ----
        fin = ((done_s[:] == 0) & (rayid_s[:] >= 0) & (valid_s[:] == 0)
               & (ptr_s[:] == 0) & (pend_s[:] == 0))
        done_s[:] = jnp.where(fin, 1, done_s[:])

        # ---- flush + refill (leaf rounds only) ----
        @pl.when(leaf_round)
        def _flush_refill():
            pool_head = sc_s[0, 1]
            log_ptr = sc_s[0, 2]
            donev = done_s[:]
            scatv = scat_s[:]
            ridv = rayid_s[:]
            unflushed = (donev > 0) & (scatv == 0)
            n_unflushed = jnp.sum(unflushed.astype(i32))
            drain = pool_head >= n_total
            do_flush = (
                ((n_unflushed >= flush_min)
                 | (drain & (n_unflushed > 0)))
                & (log_ptr < log_cap)
            )

            @pl.when(do_flush)
            def _flush():
                stage_s[0:1] = bt_s[:]
                stage_s[1:2] = bp_s[:].astype(f32)
                stage_s[2:3] = bu_s[:]
                stage_s[3:4] = bv_s[:]
                stage_s[4:5] = jnp.where(unflushed, ridv, -1).astype(f32)
                cp = pltpu.make_async_copy(
                    stage_s, log_ref.at[pl.ds(log_ptr * 8, 8)], dma_sem
                )
                cp.start()
                cp.wait()
                scat_s[:] = jnp.where(unflushed, 1, scat_s[:])
                sc_s[0, 0] = sc_s[0, 0] + n_unflushed
                sc_s[0, 2] = log_ptr + 1

            # ---- refill (windowless: bounded only by the pool) ----
            elig = (done_s[:] > 0) & (scat_s[:] > 0)
            can_n = jnp.maximum(0, n_total - pool_head)
            # exclusive prefix rank over lanes: log-step rolls, i32-exact
            ev = elig.astype(i32)
            cs = ev
            k = 1
            while k < LN:
                cs = cs + jnp.where(
                    lane_iota >= k, pltpu.roll(cs, k, 1), 0)
                k *= 2
            rank = cs - ev
            take = elig & (rank < can_n)
            slot = jnp.where(take, pool_head + rank, -1)
            c0 = pool_head >> LOG_LN
            gsum = jnp.zeros((8, LN), f32)
            iota_p = jax.lax.broadcasted_iota(i32, (LN, LN), 0)
            for h in range(2):
                ch_ok = (c0 + h) < NC
                ch = jnp.minimum(c0 + h, NC - 1)
                loc = slot - (ch << LOG_LN)
                sel = take & (loc >= 0) & (loc < LN) & ch_ok
                ohp = ((iota_p == loc) & sel).astype(f32)
                rows = rays_ref[pl.ds(ch * 8, 8), :]
                gsum = gsum + jax.lax.dot_general(
                    rows, ohp, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)

            def inv3(c_):
                return jnp.where(jnp.abs(c_) > 1e-12, 1.0 / c_,
                                 jnp.sign(c_) * 1e12 + 1e12)

            act = gsum[7:8] > 0.0
            newray = jnp.concatenate(
                [gsum, jnp.zeros((1, LN), f32),
                 inv3(gsum[3:4]), inv3(gsum[4:5]), inv3(gsum[5:6]),
                 jnp.zeros((4, LN), f32)], axis=0)
            ray_s[:] = jnp.where(take, newray, ray_s[:])
            bt_s[:] = jnp.where(take, gsum[7:8], bt_s[:])
            bu_s[:] = jnp.where(take, 0.0, bu_s[:])
            bv_s[:] = jnp.where(take, 0.0, bv_s[:])
            bp_s[:] = jnp.where(take, -1, bp_s[:])
            cur_s[:] = jnp.where(take, 0, cur_s[:])
            ptr_s[:] = jnp.where(take, 0, ptr_s[:])
            valid_s[:] = jnp.where(take, act.astype(i32), valid_s[:])
            pend_s[:] = jnp.where(take, 0, pend_s[:])
            done_s[:] = jnp.where(take, 1 - act.astype(i32), done_s[:])
            scat_s[:] = jnp.where(take, 0, scat_s[:])
            rayid_s[:] = jnp.where(take, slot, rayid_s[:])
            sc_s[0, 1] = pool_head + jnp.sum(take.astype(i32))

        if round_every > 0:
            @pl.when(leaf_round)
            def _stats():
                stats_ref[0, 3] = stats_ref[0, 3] + 1
        else:
            stats_ref[0, 2] = stats_ref[0, 2] + n_nodework
            stats_ref[0, 3] = stats_ref[0, 3] + jnp.where(leaf_round, 1, 0)
        return it + 1, sc_s[0, 0]

    it, ndone = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0)))
    stats_ref[0, 0] = it
    stats_ref[0, 1] = ndone
    stats_ref[0, 4] = sc_s[0, 2]  # log blocks written


def _lane8log_call(bvh: BVHData, o, d, tmin, tmax, act,
                   any_hit: bool, interpret: bool, round_every: int = 0,
                   lanes: int = 1024):
    """One pallas_call over <= L8_MAX_RAYS rays; the completion log is
    unscrambled into ray order by ONE XLA scatter keyed on rayid."""
    n = o.shape[0]
    LN = lanes
    nc = max(1, -(-n // LN))
    npad = nc * LN

    def padto(x, fill=0.0):
        return jnp.pad(x, (0, npad - n), constant_values=fill)

    # 8-row chunks: [ox oy oz dx dy dz tmin tmax'] with activity in the
    # sign of tmax' (one aligned sublane tile per chunk)
    f7 = jnp.where(act > 0, tmax, -1.0)
    fields = jnp.stack([
        padto(o[:, 0]), padto(o[:, 1]), padto(o[:, 2]),
        padto(d[:, 0]), padto(d[:, 1]), padto(d[:, 2], fill=1.0),
        padto(tmin), padto(f7, fill=-1.0),
    ], axis=0)
    rays = fields.reshape(8, nc, LN).transpose(1, 0, 2).reshape(nc * 8, LN)

    m_nodes = bvh.nodes_lane8.shape[0]
    m_leaves = bvh.leaves_lane8.shape[0]
    iter_cap = 64 * nc * max(1, LN // 1024) + 4096
    # flush blocks: <= n/(LN/4) + drain rounds; 2x margin
    log_cap = 2 * max(1, npad // (LN // 4)) + 64

    log, stats = pl.pallas_call(
        partial(_kernel_lane8log, leaf_bits=bvh.lane8_leaf_bits,
                any_hit=any_hit, n_chunks=nc,
                m_nodes=m_nodes, m_leaves=m_leaves, iter_cap=iter_cap,
                log_cap=log_cap, frame=bvh.lane8_frame,
                leaf_tris=bvh.lane8_leaf_tris, round_every=round_every,
                lanes=LN),
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((log_cap * 8, LN), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, LN), jnp.int32),    # cur_s
            pltpu.VMEM((1, LN), jnp.int32),    # ptr_s
            pltpu.VMEM((1, LN), jnp.int32),    # valid_s
            pltpu.VMEM((1, LN), jnp.int32),    # pend_s
            pltpu.VMEM((1, LN), jnp.int32),    # done_s
            pltpu.VMEM((1, LN), jnp.int32),    # scat_s
            pltpu.VMEM((1, LN), jnp.int32),    # rayid_s
            pltpu.VMEM((16, LN), jnp.float32),  # ray_s
            pltpu.VMEM((1, LN), jnp.float32),  # bt_s
            pltpu.VMEM((1, LN), jnp.float32),  # bu_s
            pltpu.VMEM((1, LN), jnp.float32),  # bv_s
            pltpu.VMEM((1, LN), jnp.int32),    # bp_s
            pltpu.VMEM((L8_STACK, LN), jnp.int32),  # stack_s
            pltpu.SMEM((1, 4), jnp.int32),      # sc_s
            pltpu.VMEM((8, LN), jnp.float32),   # stage_s
            pltpu.SemaphoreType.DMA,            # dma_sem
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bvh.nodes_lane8, bvh.leaves_lane8, rays)

    # unscramble: one scatter keyed on the logged rayid. Blocks past the
    # kernel's final log_ptr (stats[0, 4]) were never written (garbage) and
    # are masked out; flushed blocks mark non-flushing lanes with rayid -1.
    n_blocks = log.shape[0] // 8
    blk = log.reshape(n_blocks, 8, LN)
    written = (
        jnp.arange(n_blocks, dtype=jnp.int32)[:, None] < stats[0, 4]
    )
    rid = jnp.where(written, blk[:, 4].astype(jnp.int32), -1).reshape(-1)
    tv = blk[:, 0].reshape(-1)
    pv = blk[:, 1].reshape(-1).astype(jnp.int32)
    uv = blk[:, 2].reshape(-1)
    vv = blk[:, 3].reshape(-1)
    idx = jnp.where(rid >= 0, rid, npad)  # sentinel row dropped by .at[]
    t = jnp.full((npad + 1,), jnp.inf, jnp.float32).at[idx].set(
        tv, mode="drop")[:npad][:n]
    prim = jnp.full((npad + 1,), -1, jnp.int32).at[idx].set(
        pv, mode="drop")[:npad][:n]
    u = jnp.zeros((npad + 1,), jnp.float32).at[idx].set(
        uv, mode="drop")[:npad][:n]
    v = jnp.zeros((npad + 1,), jnp.float32).at[idx].set(
        vv, mode="drop")[:npad][:n]
    miss = prim < 0
    # kernels return prim POSITIONS (leaf base + slot); remap to prim ids
    prim = jnp.where(
        miss, -1, bvh.lane8_order[jnp.clip(prim, 0,
                                           bvh.lane8_order.shape[0] - 1)])
    return HitRecord(
        t=jnp.where(miss, jnp.inf, t), prim=prim, u=u, v=v,
    ), stats


@partial(jax.jit, static_argnames=("any_hit", "interpret", "return_stats",
                                  "round_every", "lanes"))
def traverse_pallas_lane8log(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    interpret: bool = False,
    return_stats: bool = False,
    round_every: int = 0,
    lanes: int = 1024,
) -> HitRecord:
    """Per-lane BVH8 traversal with completion-log output (v8).

    round_every > 0 runs leaf rounds on a fixed every-k-bodies cadence
    (pure scalar decision on the iteration counter) instead of the
    dynamic >=50%-pending vote, removing two full-lane vector->scalar
    reductions from every body. lanes widens the resident-lane count
    (per-op overhead amortization; VMEM-bounded)."""
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmax_arr = jnp.where(jnp.isfinite(tmax_arr), tmax_arr, jnp.float32(3e38))
    act = (
        jnp.ones((n,), jnp.float32)
        if active is None
        else jnp.asarray(active).astype(jnp.float32)
    )
    recs = []
    stats = None
    for s in range(0, n, L8_MAX_RAYS):
        e = min(n, s + L8_MAX_RAYS)
        rec, st = _lane8log_call(
            bvh, o[s:e], d[s:e], tmin[s:e], tmax_arr[s:e], act[s:e],
            any_hit, interpret, round_every, lanes)
        recs.append(rec)
        stats = st if stats is None else stats + st
    if len(recs) == 1:
        rec = recs[0]
    else:
        rec = HitRecord(
            t=jnp.concatenate([r.t for r in recs]),
            prim=jnp.concatenate([r.prim for r in recs]),
            u=jnp.concatenate([r.u for r in recs]),
            v=jnp.concatenate([r.v for r in recs]),
        )
    if bvh.lane8_leaf_bits != 16 and not any_hit \
            and bvh.tri_rows is not None:
        rec = refine_hit_record(bvh, o, d, rec)
    if return_stats:
        return rec, stats
    return rec


# ---------------------------------------------------------------------------
# v10 "lane8s": sublane-grouped per-lane BVH8 walks with static-strided
# windowed refill and a compressed one-entry-per-level stack.
#
# What changed vs lane8log (v8) and why — measured on v5e, 2026-08-18:
#   * lane8log's per-round refill chain (vector rank -> one-hot gather ->
#     completion-log DMA) serialized ~87 us/round, and every (1, LN) state
#     op ran at 1/8 sublane occupancy.
#   * v10 keeps EIGHT rays per lane-column (state arrays are (8, LN), one
#     ray per sublane) so all bookkeeping vector ops carry 8x the rays at
#     the same vreg traffic, and replaces the free-for-all pool with a
#     STATIC assignment: lane (g, l) owns ray  k*8*LN + g*LN + l  for
#     generations k = 0..n_gen-1. Refill = masked merge from a dynamic row
#     slice of the resident ray pool (no rank, no gather); output is
#     ordered by construction (no completion log, no unscramble scatter).
#     A scalar window base (min generation over lanes) bounds how far
#     ahead any lane may run; `window` generations are mergeable per round.
#   * The per-child stack (8 pushes of full-stack RMWs per visit in v8) is
#     replaced by ONE two-plane entry per visited node:
#         plane A = n_int | base_int << 4 | base_leaf << 18   (14b fields)
#         plane B = bitmask of not-yet-visited hit children
#     Pop re-derives the child ref from (A, lowest set bit of B) — no node
#     re-gather — and keeps the entry while B has bits left. Max live
#     entries = BVH8 depth (builder-measured, BVHData.lane8_depth), so the
#     stack shrinks from 64 rows to ~8 and per-body stack traffic drops
#     ~18x per ray. Siblings pop in child-slot order (the nearest child is
#     still always descended first); any-hit is order-insensitive.
#
# Reference parity note: this plays the role of the reference's persistent
# HW-traversal kernel (src/Device/includes/Intersect.h:129-142) for
# incoherent wavefronts; the 14-bit packed fields cap supported tables at
# 16384 BVH8 nodes / 16384 cluster leaves (~2M triangles) — larger scenes
# fall back to lane8log.
# ---------------------------------------------------------------------------

L8S_MAX_PACK = 16384  # 14-bit base_int field in plane A (nodes only;
#                       base_leaf carries 24 bits across planes A+B)


def _kernel_lane8s(nodes_ref, leaves_ref, rays_ref, out_ref, stats_ref,
                   cur_s, ptr_s, valid_s, pend_s, done_s, pw_s, gen_s,
                   ray_s, bt_s, bu_s, bv_s, bp_s,
                   stkA_s, stkB_s, sc_s,
                   *, leaf_bits: int, any_hit: bool, n_gen: int, m_nodes: int,
                   m_leaves: int, iter_cap: int, frame: tuple,
                   leaf_tris: int, round_every: int, lanes: int,
                   window: int, s_depth: int, probe: bool = False):
    LN = lanes
    G = 8
    R = G * LN
    S = s_depth

    f32 = jnp.float32
    i32 = jnp.int32

    # ---- one-time init ----
    # out rows default to a miss (t=inf, prim=-1, u=v=0): correct even if
    # iter_cap truncates before a generation is written.
    r4 = jax.lax.broadcasted_iota(i32, (n_gen * 4, G, LN), 0) % 4
    out_ref[:] = jnp.where(
        r4 == 0, jnp.float32(jnp.inf),
        jnp.where(r4 == 1, jnp.float32(-1.0), jnp.float32(0.0)))
    cur_s[:] = jnp.zeros((G, LN), i32)
    ptr_s[:] = jnp.zeros((G, LN), i32)
    valid_s[:] = jnp.zeros((G, LN), i32)
    pend_s[:] = jnp.zeros((G, LN), i32)
    done_s[:] = jnp.ones((G, LN), i32)   # waiting to load generation 0
    pw_s[:] = jnp.zeros((G, LN), i32)
    gen_s[:] = jnp.zeros((G, LN), i32)
    ray_s[:] = jnp.zeros((16, G, LN), f32)
    bt_s[:] = jnp.zeros((G, LN), f32)
    bu_s[:] = jnp.zeros((G, LN), f32)
    bv_s[:] = jnp.zeros((G, LN), f32)
    bp_s[:] = jnp.full((G, LN), -1, i32)
    stkA_s[:] = jnp.zeros((S, G, LN), i32)
    stkB_s[:] = jnp.zeros((S, G, LN), i32)
    for _si in range(8):
        stats_ref[0, _si] = jnp.int32(0)
    sc_s[0, 0] = jnp.int32(0)  # lanes past their last generation
    sc_s[0, 1] = jnp.int32(0)  # window base (min generation)

    slot_iota3 = jax.lax.broadcasted_iota(i32, (S, G, LN), 0)
    iota8 = jax.lax.broadcasted_iota(i32, (8, LN), 0)
    pow2_8 = jnp.exp2(iota8.astype(f32)).astype(i32)  # exact for 0..7
    Tc = leaf_tris
    iota_t = jax.lax.broadcasted_iota(i32, (Tc, LN), 0)
    iota_nc = jax.lax.broadcasted_iota(i32, (m_nodes, LN), 0)
    iota_lc = jax.lax.broadcasted_iota(i32, (m_leaves, LN), 0)
    SLOTM = jnp.int32(max(16, 1 << (Tc - 1).bit_length()) - 1)
    IMAX = jnp.int32(0x7FFFFFFF)

    def cond(c):
        it, ndone = c
        return (it < iter_cap) & (ndone < R)

    def body(c):
        it, _nd = c

        done = done_s[:]
        ptr = ptr_s[:]
        valid = valid_s[:]
        cur = cur_s[:]
        pend = pend_s[:]

        # ---- pop (two-plane compressed stack) ----
        # plane A: n_int | base_int << 4 | base_leaf_lo14 << 18
        # plane B: not-yet-visited child bitmask (bits 0..7)
        #          | base_leaf_hi10 << 8   (lifts the old 14-bit leaf cap
        #          — ~1.45M tris — to 2^24 refs; VERDICT r4 task 1)
        need_pop = (done == 0) & (valid == 0) & (ptr > 0)
        top = jnp.maximum(ptr - 1, 0)
        selT = slot_iota3 == top[None]
        A = jnp.sum(jnp.where(selT, stkA_s[:], 0), axis=0)
        B = jnp.sum(jnp.where(selT, stkB_s[:], 0), axis=0)
        Bm = B & 255
        lsb = Bm & (-Bm)
        # child slot = exponent of the (power-of-two) lsb
        cpop = (jax.lax.bitcast_convert_type(lsb.astype(f32), i32)
                >> 23) - 127
        newB = B ^ lsb
        n_int_p = A & 15
        base_int_p = (A >> 4) & 0x3FFF
        base_leaf_p = ((A >> 18) & 0x3FFF) | (((B >> 8) & 0x3FF) << 14)
        ref_p = jnp.where(cpop < n_int_p, base_int_p + cpop,
                          -(base_leaf_p + (cpop - n_int_p)) - 1)
        keep = need_pop & ((newB & 255) != 0)
        stkB_s[:] = jnp.where(selT & keep[None], newB[None], stkB_s[:])
        # pop-off test must look at the CHILD bits only — the high bits
        # carry base_leaf_hi and keep newB nonzero for leaf refs >= 16384
        ptr = jnp.where(need_pop & ((newB & 255) == 0), top, ptr)
        cur = jnp.where(need_pop, ref_p, cur)
        valid = jnp.where(need_pop, 1, valid)

        # ---- promote leaf cur -> pending bank ----
        promo = (valid > 0) & (cur < 0) & (pend == 0)
        pend = jnp.where(promo, -cur, pend)
        valid = jnp.where(promo, 0, valid)

        node_lane = (valid > 0) & (cur >= 0)
        # NOTE r5: an adaptive leaf cadence (occupancy-feedback gap) was
        # implemented and measured NEUTRAL-to-worse (ROUND5.md) — the pend
        # population self-limits at ~0.6 occupancy; fixed cadence stays.
        leaf_round = (it % round_every) == (round_every - 1)
        if probe:
            # occupancy diagnostics (probe builds only — adds per-iter
            # reductions): 5 = pending lanes summed over leaf rounds,
            # 6 = node-phase lanes per iter, 7 = busy (undone) lanes per iter
            stats_ref[0, 6] = stats_ref[0, 6] + jnp.sum(
                node_lane.astype(i32))
            stats_ref[0, 7] = stats_ref[0, 7] + jnp.sum(
                (done == 0).astype(i32))

            @pl.when(leaf_round)
            def _probe_pend():
                stats_ref[0, 5] = stats_ref[0, 5] + jnp.sum(
                    (pend > 0).astype(i32))

        # ---- node phase (per sublane group: one-hot MXU gather) ----
        rd = ray_s[:]
        btv = bt_s[:]
        curn_l, anyf_l, packA_l, mask_l = [], [], [], []
        for g in range(G):
            nl_g = node_lane[g:g + 1]
            node_idx = jnp.where(nl_g, cur[g:g + 1], -1)
            oh_n = (iota_nc == node_idx).astype(jnp.bfloat16)
            gg = jax.lax.dot_general(
                nodes_ref[:], oh_n, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            ox, oy, oz = rd[0, g:g + 1], rd[1, g:g + 1], rd[2, g:g + 1]
            ix, iy, iz = rd[9, g:g + 1], rd[10, g:g + 1], rd[11, g:g + 1]
            tx0 = (gg[0:8] - ox) * ix
            ty0 = (gg[8:16] - oy) * iy
            tz0 = (gg[16:24] - oz) * iz
            tx1 = (gg[24:32] - ox) * ix
            ty1 = (gg[32:40] - oy) * iy
            tz1 = (gg[40:48] - oz) * iz
            te = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), 0.0),
            )
            tx = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), btv[g:g + 1]),
            )
            hit8 = (te <= tx) & nl_g

            te_bits = jax.lax.bitcast_convert_type(te, i32)
            key8 = jnp.where(hit8, (te_bits & jnp.int32(~7)) | iota8, IMAX)
            kmin = jnp.min(key8, axis=0, keepdims=True)
            anyfound = jnp.max(hit8.astype(i32), axis=0, keepdims=True)
            c_near = kmin & 7

            base_int = (gg[48:49] + gg[49:50] * 256.0
                        + gg[50:51] * 65536.0).astype(i32)
            n_int = gg[51:52].astype(i32)
            base_leaf = (gg[52:53] + gg[53:54] * 256.0
                         + gg[54:55] * 65536.0).astype(i32)
            curn = jnp.where(c_near < n_int, base_int + c_near,
                             -(base_leaf + (c_near - n_int)) - 1)
            full_mask = jnp.sum(jnp.where(hit8, pow2_8, 0), axis=0,
                                keepdims=True)
            near_pow = jnp.sum(jnp.where(iota8 == c_near, pow2_8, 0),
                               axis=0, keepdims=True)
            # meaningful only when anyfound; base_leaf hi bits ride in the
            # mask plane's bits 8..17 (see pop above)
            maskg = (full_mask ^ near_pow) | ((base_leaf >> 14) << 8)
            packA = n_int | (base_int << 4) | ((base_leaf & 0x3FFF) << 18)
            curn_l.append(curn)
            anyf_l.append(anyfound)
            packA_l.append(packA)
            mask_l.append(maskg)
        curn_G = jnp.concatenate(curn_l, axis=0)
        anyf_G = jnp.concatenate(anyf_l, axis=0)
        packA_G = jnp.concatenate(packA_l, axis=0)
        mask_G = jnp.concatenate(mask_l, axis=0)

        found = anyf_G > 0
        cur = jnp.where(node_lane, jnp.where(found, curn_G, cur), cur)
        valid = jnp.where(node_lane, anyf_G, valid)
        # push only when unvisited-child bits remain (bits 0..7; the high
        # bits carry base_leaf_hi and must not trigger a push)
        push = node_lane & found & ((mask_G & 255) != 0)
        slot = jnp.minimum(ptr, S - 1)
        selP = (slot_iota3 == slot[None]) & push[None]
        stkA_s[:] = jnp.where(selP, packA_G[None], stkA_s[:])
        stkB_s[:] = jnp.where(selP, mask_G[None], stkB_s[:])
        ptr = ptr + push.astype(i32)

        cur_s[:] = cur
        ptr_s[:] = jnp.minimum(ptr, S)
        valid_s[:] = valid
        pend_s[:] = pend

        # ---- leaf round (per sublane group, int8 lattice leaves) ----
        @pl.when(leaf_round)
        def _leaf_round():
            pendv = pend_s[:]
            btv2 = bt_s[:]
            rd2 = ray_s[:]
            step = jnp.float32(frame[3])
            nt_l, np_l, nu_l, nv_l, nh_l = [], [], [], [], []
            for g in range(G):
                pl_g = pendv[g:g + 1] > 0
                lidx = jnp.where(pl_g, pendv[g:g + 1] - 1, -1)
                oh_l = (iota_lc == lidx).astype(jnp.int8)
                gl = jax.lax.dot_general(
                    leaves_ref[:], oh_l, (((0,), (0,)), ((), ())),
                    preferred_element_type=i32,
                )

                kx, ky, kz, qc, cnt, prim_base = _leaf_geo_decode(
                    gl, Tc, leaf_bits)

                ox, oy, oz = rd2[0, g:g + 1], rd2[1, g:g + 1], rd2[2, g:g + 1]
                dx, dy, dz = rd2[3, g:g + 1], rd2[4, g:g + 1], rd2[5, g:g + 1]
                t_min = rd2[6, g:g + 1]

                q0x, q0y, q0z = qc(0), qc(1), qc(2)
                v0x = jnp.float32(frame[0]) + (kx + q0x).astype(f32) * step
                v0y = jnp.float32(frame[1]) + (ky + q0y).astype(f32) * step
                v0z = jnp.float32(frame[2]) + (kz + q0z).astype(f32) * step
                e1x = (qc(3) - q0x).astype(f32) * step
                e1y = (qc(4) - q0y).astype(f32) * step
                e1z = (qc(5) - q0z).astype(f32) * step
                e2x = (qc(6) - q0x).astype(f32) * step
                e2y = (qc(7) - q0y).astype(f32) * step
                e2z = (qc(8) - q0z).astype(f32) * step
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
                tvx = ox - v0x
                tvy = oy - v0y
                tvz = oz - v0z
                u = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

                # winner prim POSITION = leaf base + slot (prim ids are
                # not stored; the wrapper remaps through bvh.lane8_order)
                prim12 = prim_base + iota_t
                bt_g = btv2[g:g + 1]
                hit12 = (
                    pl_g
                    & (iota_t < cnt)
                    & (jnp.abs(det) > TRI_EPS)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < bt_g)
                )
                t_bits = jax.lax.bitcast_convert_type(
                    jnp.where(hit12, t, jnp.float32(jnp.inf)), i32)
                key12 = jnp.where(hit12, (t_bits & ~SLOTM) | iota_t, IMAX)
                kmin12 = jnp.min(key12, axis=0, keepdims=True)
                newhit = jnp.max(hit12.astype(i32), axis=0, keepdims=True)
                win_t = jax.lax.bitcast_convert_type(kmin12 & ~SLOTM, f32)
                oh12 = (iota_t == (kmin12 & SLOTM)) & hit12
                win_p = jnp.sum(jnp.where(oh12, prim12, 0), axis=0,
                                keepdims=True)
                nt_l.append(win_t)
                np_l.append(win_p)
                nh_l.append(newhit)
                if not any_hit:
                    nu_l.append(jnp.sum(jnp.where(oh12, u, 0.0), axis=0,
                                        keepdims=True))
                    nv_l.append(jnp.sum(jnp.where(oh12, v, 0.0), axis=0,
                                        keepdims=True))
            nh = jnp.concatenate(nh_l, axis=0) > 0
            nbt = jnp.concatenate(nt_l, axis=0)
            nbp = jnp.concatenate(np_l, axis=0)
            bt_s[:] = jnp.where(nh, nbt, btv2)
            bp_s[:] = jnp.where(nh, nbp, bp_s[:])
            pend_s[:] = jnp.where(pendv > 0, 0, pendv)
            if any_hit:
                done_s[:] = jnp.where(nh, 1, done_s[:])
                ptr_s[:] = jnp.where(nh, 0, ptr_s[:])
                valid_s[:] = jnp.where(nh, 0, valid_s[:])
                pw_s[:] = jnp.where(nh, 1, pw_s[:])
            else:
                bu_s[:] = jnp.where(nh, jnp.concatenate(nu_l, axis=0),
                                    bu_s[:])
                bv_s[:] = jnp.where(nh, jnp.concatenate(nv_l, axis=0),
                                    bv_s[:])

        # ---- finish detection ----
        fin = ((done_s[:] == 0) & (valid_s[:] == 0) & (ptr_s[:] == 0)
               & (pend_s[:] == 0))
        done_s[:] = jnp.where(fin, 1, done_s[:])
        pw_s[:] = jnp.where(fin, 1, pw_s[:])

        # ---- write + advance + load (static-strided window) ----
        @pl.when(leaf_round)
        def _write_load():
            base = sc_s[0, 1]
            genv = gen_s[:]
            pwv = pw_s[:] > 0
            tvals = jnp.where(bp_s[:] >= 0, bt_s[:], jnp.float32(jnp.inf))
            pvals = bp_s[:].astype(f32)
            for w in range(window):
                krow = jnp.minimum(base + w, n_gen - 1)
                m = pwv & (genv == base + w)
                rows = out_ref[pl.ds(krow * 4, 4)]
                r0 = jnp.where(m, tvals, rows[0])[None]
                r1 = jnp.where(m, pvals, rows[1])[None]
                r2 = jnp.where(m, bu_s[:], rows[2])[None]
                r3 = jnp.where(m, bv_s[:], rows[3])[None]
                out_ref[pl.ds(krow * 4, 4)] = jnp.concatenate(
                    [r0, r1, r2, r3], axis=0)
            wrote = pwv & (genv >= base) & (genv < base + window)
            gen2 = genv + wrote.astype(i32)
            pw2 = jnp.where(wrote, 0, pwv.astype(i32))

            donev = done_s[:]
            seek = (donev > 0) & (pw2 == 0)
            rd3 = ray_s[:]
            comp = [rd3[c] for c in range(8)]
            loaded = jnp.zeros((G, LN), jnp.bool_)
            for w in range(window):
                kk = jnp.minimum(base + w, n_gen - 1)
                m = seek & (~loaded) & (gen2 == base + w) & (gen2 < n_gen)
                rows8 = rays_ref[pl.ds(kk * 8, 8)]
                act_w = rows8[7] > 0.0
                # dead generation (inactive/masked/padding ray): the out
                # rows are pre-initialized to miss, so the slot steps PAST
                # it without burning a load->write round — a mostly-dead
                # pool (late bounces, drained alpha marches) drains at up
                # to `window` generations per leaf round instead of 1
                gen2 = gen2 + (m & ~act_w).astype(i32)
                m_live = m & act_w
                for cc in range(8):
                    comp[cc] = jnp.where(m_live, rows8[cc], comp[cc])
                loaded = loaded | m_live

            def inv3(c_):
                return jnp.where(jnp.abs(c_) > 1e-12, 1.0 / c_,
                                 jnp.sign(c_) * 1e12 + 1e12)

            zeros = jnp.zeros((G, LN), f32)
            rows16 = comp + [zeros, inv3(comp[3]), inv3(comp[4]),
                             inv3(comp[5]), zeros, zeros, zeros, zeros]
            newray = jnp.concatenate([x[None] for x in rows16], axis=0)
            ray_s[:] = jnp.where(loaded[None], newray, rd3)
            bt_s[:] = jnp.where(loaded, comp[7], bt_s[:])
            bu_s[:] = jnp.where(loaded, 0.0, bu_s[:])
            bv_s[:] = jnp.where(loaded, 0.0, bv_s[:])
            bp_s[:] = jnp.where(loaded, -1, bp_s[:])
            cur_s[:] = jnp.where(loaded, 0, cur_s[:])
            ptr_s[:] = jnp.where(loaded, 0, ptr_s[:])
            valid_s[:] = jnp.where(loaded, 1, valid_s[:])
            pend_s[:] = jnp.where(loaded, 0, pend_s[:])
            done_s[:] = jnp.where(loaded, 0, done_s[:])
            pw_s[:] = pw2
            gen_s[:] = gen2

            sc_s[0, 1] = jnp.min(gen2)
            sc_s[0, 0] = jnp.sum((gen2 >= n_gen).astype(i32))
            stats_ref[0, 2] = stats_ref[0, 2] + jnp.sum(
                (done_s[:] == 0).astype(i32))
            stats_ref[0, 3] = stats_ref[0, 3] + 1

        return it + 1, sc_s[0, 0]

    it, ndone = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0)))
    stats_ref[0, 0] = it
    stats_ref[0, 1] = ndone
    stats_ref[0, 4] = sc_s[0, 1]  # final window base


def _lane8s_call(bvh: BVHData, o, d, tmin, tmax, act,
                 any_hit: bool, interpret: bool, round_every: int = 8,
                 lanes: int = 512, window: int = 8, probe: bool = False):
    """One pallas_call over <= L8_MAX_RAYS rays; output is ordered by
    construction (lane (g, l) owns ray k*8*lanes + g*lanes + l)."""
    n = o.shape[0]
    LN = lanes
    R = 8 * LN
    n_gen = max(1, -(-n // R))
    npad = n_gen * R

    def padto(x, fill=0.0):
        return jnp.pad(x, (0, npad - n), constant_values=fill)

    f7 = jnp.where(act > 0, tmax, -1.0)
    fields = jnp.stack([
        padto(o[:, 0]), padto(o[:, 1]), padto(o[:, 2]),
        padto(d[:, 0]), padto(d[:, 1]), padto(d[:, 2], fill=1.0),
        padto(tmin), padto(f7, fill=-1.0),
    ], axis=0)
    rays = fields.reshape(8, n_gen, 8, LN).transpose(1, 0, 2, 3).reshape(
        n_gen * 8, 8, LN)

    m_nodes = bvh.nodes_lane8.shape[0]
    m_leaves = bvh.leaves_lane8.shape[0]
    S = max(2, int(bvh.lane8_depth))
    iter_cap = 128 * n_gen + 4096

    out, stats = pl.pallas_call(
        partial(_kernel_lane8s, leaf_bits=bvh.lane8_leaf_bits,
                any_hit=any_hit, n_gen=n_gen,
                m_nodes=m_nodes, m_leaves=m_leaves, iter_cap=iter_cap,
                frame=bvh.lane8_frame, leaf_tris=bvh.lane8_leaf_tris,
                round_every=round_every, lanes=LN, window=window,
                s_depth=S, probe=probe),
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((n_gen * 4, 8, LN), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, LN), jnp.int32),     # cur_s
            pltpu.VMEM((8, LN), jnp.int32),     # ptr_s
            pltpu.VMEM((8, LN), jnp.int32),     # valid_s
            pltpu.VMEM((8, LN), jnp.int32),     # pend_s
            pltpu.VMEM((8, LN), jnp.int32),     # done_s
            pltpu.VMEM((8, LN), jnp.int32),     # pw_s
            pltpu.VMEM((8, LN), jnp.int32),     # gen_s
            pltpu.VMEM((16, 8, LN), jnp.float32),  # ray_s
            pltpu.VMEM((8, LN), jnp.float32),   # bt_s
            pltpu.VMEM((8, LN), jnp.float32),   # bu_s
            pltpu.VMEM((8, LN), jnp.float32),   # bv_s
            pltpu.VMEM((8, LN), jnp.int32),     # bp_s
            pltpu.VMEM((S, 8, LN), jnp.int32),  # stkA_s
            pltpu.VMEM((S, 8, LN), jnp.int32),  # stkB_s
            pltpu.SMEM((1, 4), jnp.int32),      # sc_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bvh.nodes_lane8, bvh.leaves_lane8, rays)

    blk = out.reshape(n_gen, 4, 8, LN).transpose(1, 0, 2, 3).reshape(4, npad)
    t = blk[0, :n]
    prim = blk[1, :n].astype(jnp.int32)  # exact for prim < 2^24
    u = blk[2, :n]
    v = blk[3, :n]
    miss = prim < 0
    # kernels return prim POSITIONS (leaf base + slot); remap to prim ids
    prim = jnp.where(
        miss, -1, bvh.lane8_order[jnp.clip(prim, 0,
                                           bvh.lane8_order.shape[0] - 1)])
    return HitRecord(
        t=jnp.where(miss, jnp.inf, t), prim=prim, u=u, v=v,
    ), stats


@partial(jax.jit, static_argnames=("any_hit", "interpret", "return_stats",
                                  "round_every", "lanes", "window", "probe",
                                  "refine"))
def traverse_pallas_lane8s(
    bvh: BVHData,
    o: jax.Array,
    d: jax.Array,
    t_min=1e-4,
    t_max=jnp.inf,
    active=None,
    any_hit: bool = False,
    interpret: bool = False,
    return_stats: bool = False,
    round_every: int = 8,
    lanes: int = 512,
    window: int = 8,
    probe: bool = False,
    refine: bool | None = None,
) -> HitRecord:
    """Sublane-grouped static-strided per-lane BVH8 traversal (v10).

    refine: exact winner re-intersection (refine_hit_record). None = auto:
    on for closest hits over 12-bit leaf tables (where quantized t/u/v
    would breach the rtol 1e-4 agreement bar), off otherwise."""
    n = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmax_arr = jnp.where(jnp.isfinite(tmax_arr), tmax_arr, jnp.float32(3e38))
    act = (
        jnp.ones((n,), jnp.float32)
        if active is None
        else jnp.asarray(active).astype(jnp.float32)
    )
    recs = []
    stats = None
    # per-call cap: stay inside VMEM after the leaf/node tables + one-hot
    # working set. The rays+out buffers cost 48 B/ray; budget at 64 B/ray
    # for headroom (scratch, relayouts).
    fixed = (bvh.leaves_lane8.size + bvh.nodes_lane8.size * 2
             + (bvh.leaves_lane8.shape[0] + bvh.nodes_lane8.shape[0])
             * lanes * 5)
    cap = max(1 << 17, min(L8S_MAX_RAYS,
                           max(L8S_VMEM_BUDGET - fixed, 1 << 22) // 64))
    cap = (cap // (8 * lanes)) * (8 * lanes) or (8 * lanes)
    for s in range(0, n, cap):
        e = min(n, s + cap)

        def _run(s=s, e=e):
            return _lane8s_call(
                bvh, o[s:e], d[s:e], tmin[s:e], tmax_arr[s:e], act[s:e],
                any_hit, interpret, round_every, lanes, window, probe)

        def _skip(s=s, e=e):
            return (empty_hit_record(e - s), jnp.zeros((1, 8), jnp.int32))

        # per-chunk empty-wave skip: with active-compacted wavefronts
        # (render/integrator.py) the dead tail chunks cost ~nothing instead
        # of a full pool sweep each
        rec, st = jax.lax.cond(jnp.any(act[s:e] > 0), _run, _skip)
        recs.append(rec)
        stats = st if stats is None else stats + st
    if len(recs) == 1:
        rec = recs[0]
    else:
        rec = HitRecord(
            t=jnp.concatenate([r.t for r in recs]),
            prim=jnp.concatenate([r.prim for r in recs]),
            u=jnp.concatenate([r.u for r in recs]),
            v=jnp.concatenate([r.v for r in recs]),
        )
    do_refine = (refine if refine is not None
                 else (bvh.lane8_leaf_bits != 16)) and not any_hit
    if do_refine and bvh.tri_rows is not None:
        rec = refine_hit_record(bvh, o, d, rec)
    if return_stats:
        return rec, stats
    return rec


def refine_hit_record(bvh: BVHData, o, d, rec: HitRecord) -> HitRecord:
    """Exact winner re-intersection (task-2 refinement, VERDICT r5).

    The lane8 kernels intersect LATTICE-QUANTIZED triangles
    (build._pack_lane8): with 16-bit leaves the t error is ~leaf_ext/65k
    (already up to 4e-3 relative on grazing hits — measured on a random
    soup 2026-08-21); with 12-bit leaves it is 16x that. Here the <=1
    winning triangle per ray is re-intersected in f32 against the exact
    mesh (bvh.tri_rows: v0, e1, e2) — ONE row gather at wavefront width,
    not a table stream — so the returned t/u/v are exact for every ray
    whose winner is exact-hit-consistent. Quantized winners that miss the
    exact triangle (edge-shaved, ~1e-4 of rays) keep their quantized
    values. Reference bar: exact HW triangle test,
    /root/reference/src/Device/includes/Intersect.h:129-142."""
    safe = jnp.maximum(rec.prim, 0)
    rT = bvh.tri_rows[safe].T  # (12, N)
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    v0x, v0y, v0z = rT[0], rT[1], rT[2]
    e1x, e1y, e1z = rT[3], rT[4], rT[5]
    e2x, e2y, e2z = rT[6], rT[7], rT[8]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    eps = 1e-4
    ok = ((rec.prim >= 0) & (jnp.abs(det) > TRI_EPS) & (t > 0.0)
          & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps))
    return HitRecord(
        t=jnp.where(ok, t, rec.t),
        prim=rec.prim,
        u=jnp.where(ok, jnp.clip(u, 0.0, 1.0), rec.u),
        v=jnp.where(ok, jnp.clip(v, 0.0, 1.0), rec.v),
    )


def lane8s_tables_ok(bvh: BVHData, n: int) -> bool:
    """v10 structural gate (backend-independent, also used by interpret-mode
    tests): lane8 tables present, packed refs fit (base_int 14 bits in
    plane A; base_leaf 24 bits split across planes A/B since r5 — the old
    14-bit leaf cap limited lane8s to ~1.45M tris), the leaf table + its
    one-hot working set fit VMEM, and the builder-measured cluster-BVH8
    depth bounds a small compressed stack."""
    if bvh.nodes_lane8 is None or bvh.lane8_frame is None:
        return False
    if bvh.leaves_lane8 is None:
        return False
    m_nodes = bvh.nodes_lane8.shape[0]
    m_leaves = bvh.leaves_lane8.shape[0]
    # VMEM budget: leaf table + iota_lc (m_leaves, 512) i32 + one-hot int8
    vmem_est = (bvh.leaves_lane8.size
                + m_leaves * 512 * 5 + m_nodes * 512 * 5)
    return (n >= 1 and m_nodes <= L8S_MAX_PACK
            and m_leaves < (1 << 24)
            and vmem_est <= 100 * 1024 * 1024
            and int(bvh.lane8_depth) <= 16)


def pallas_lane8s_supported(bvh: BVHData, n: int) -> bool:
    """Production routing gate: structural gate + a real TPU backend."""
    return jax.default_backend() == "tpu" and lane8s_tables_ok(bvh, n)



