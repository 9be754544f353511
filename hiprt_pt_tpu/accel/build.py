"""Host-side BVH builder — binned SAH BVH2 flattened to SoA arrays.

Role parity with HIPRT's ``hiprtBuildGeometry`` with
``hiprtBuildFlagBitPreferHighQualityBuild`` (reference:
src/HIPRT-Orochi/HIPRTScene.h:60-87): built once per scene on the host, then
traversed on-device. The reference gets a hardware BVH + RT cores; we build a
flat SoA BVH2 with ordered children and traverse it with a vectorized
stack-in-registers loop (ops/traverse.py) or a Pallas kernel.

Construction: top-down binned SAH (Wald 2007), 16 bins on the centroid extent's
dominant axis, leaf cutoff by SAH cost vs leaf size. Pure numpy, iterative
(explicit stack) so million-triangle scenes don't hit recursion limits.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

N_BINS = 16
MAX_LEAF = 4
TRAVERSAL_COST = 1.0
INTERSECT_COST = 1.5


@struct.dataclass
class BVHData:
    """Flat SoA BVH2. M nodes; children of an internal node are contiguous
    (left = node_left[i], right = node_left[i] + 1)."""

    nodes_min: jax.Array     # (M,3) f32 AABB min
    nodes_max: jax.Array     # (M,3) f32 AABB max
    node_left: jax.Array     # (M,) i32: internal → left child; leaf → first prim slot
    node_count: jax.Array    # (M,) i32: 0 internal, >0 = leaf prim count
    prim_indices: jax.Array  # (P,) i32 permutation of triangle ids (padded -1)
    # pre-gathered leaf triangle vertices in leaf-slot order, so traversal does
    # one contiguous gather per leaf instead of a double indirection
    leaf_v0: jax.Array       # (P,3) f32
    leaf_e1: jax.Array       # (P,3) f32  (v1 - v0)
    leaf_e2: jax.Array       # (P,3) f32  (v2 - v0)

    @property
    def num_nodes(self) -> int:
        return self.nodes_min.shape[0]


def build_bvh(
    vertices: np.ndarray, triangles: np.ndarray, max_leaf: int = MAX_LEAF
) -> BVHData:
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64)
    T = triangles.shape[0]

    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroids = (tri_min + tri_max) * 0.5

    order = np.arange(T)

    # node arrays, grown geometrically
    cap = max(2 * T, 16)
    n_min = np.zeros((cap, 3), np.float32)
    n_max = np.zeros((cap, 3), np.float32)
    n_left = np.zeros((cap,), np.int32)
    n_count = np.zeros((cap,), np.int32)
    num_nodes = 1

    # explicit build stack of (node_id, start, end) over the `order` array
    stack = [(0, 0, T)]
    while stack:
        node_id, start, end = stack.pop()
        idx = order[start:end]
        bmin = tri_min[idx].min(axis=0)
        bmax = tri_max[idx].max(axis=0)
        n_min[node_id] = bmin
        n_max[node_id] = bmax
        count = end - start
        if count <= max_leaf:
            n_left[node_id] = start
            n_count[node_id] = count
            continue

        # binned SAH on dominant centroid axis
        c = centroids[idx]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        if extent[axis] <= 1e-12:
            # degenerate: median split
            mid = start + count // 2
        else:
            scale = N_BINS / extent[axis]
            bins = np.minimum(
                ((c[:, axis] - cmin[axis]) * scale).astype(np.int32), N_BINS - 1
            )
            bin_counts = np.bincount(bins, minlength=N_BINS)
            # per-bin bounds
            bin_min = np.full((N_BINS, 3), np.inf, np.float32)
            bin_max = np.full((N_BINS, 3), -np.inf, np.float32)
            for b in range(N_BINS):
                sel = bins == b
                if bin_counts[b]:
                    bin_min[b] = tri_min[idx[sel]].min(axis=0)
                    bin_max[b] = tri_max[idx[sel]].max(axis=0)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])

            # prefix/suffix sweeps
            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(bin_counts)
            rcnt = np.cumsum(bin_counts[::-1])[::-1]
            costs = np.full((N_BINS - 1,), np.inf)
            for s in range(N_BINS - 1):
                if lcnt[s] == 0 or rcnt[s + 1] == 0:
                    continue
                costs[s] = area(lmin[s], lmax[s]) * lcnt[s] + area(
                    rmin[s + 1], rmax[s + 1]
                ) * rcnt[s + 1]
            best = int(np.argmin(costs))
            leaf_cost = INTERSECT_COST * count * area(bmin, bmax)
            split_cost = TRAVERSAL_COST * area(bmin, bmax) + INTERSECT_COST * costs[
                best
            ]
            if not np.isfinite(costs[best]):
                mid = start + count // 2
            else:
                go_left = bins <= best
                nleft = int(go_left.sum())
                if nleft == 0 or nleft == count:
                    mid = start + count // 2
                else:
                    # partition `order[start:end]` by go_left
                    order[start:end] = np.concatenate(
                        [idx[go_left], idx[~go_left]]
                    )
                    mid = start + nleft

        left_id = num_nodes
        num_nodes += 2
        if num_nodes > cap:
            grow = max(cap, num_nodes)
            n_min = np.concatenate([n_min, np.zeros((grow, 3), np.float32)])
            n_max = np.concatenate([n_max, np.zeros((grow, 3), np.float32)])
            n_left = np.concatenate([n_left, np.zeros((grow,), np.int32)])
            n_count = np.concatenate([n_count, np.zeros((grow,), np.int32)])
            cap += grow
        n_left[node_id] = left_id
        n_count[node_id] = 0
        stack.append((left_id, start, mid))
        stack.append((left_id + 1, mid, end))

    n_min = n_min[:num_nodes]
    n_max = n_max[:num_nodes]
    n_left = n_left[:num_nodes]
    n_count = n_count[:num_nodes]

    # pad prim slots so each leaf can be fetched as a fixed-size block: slots
    # are simply `order` (leaves reference [start, start+count)); pad tail so
    # fixed-width gathers of max_leaf never go out of bounds
    pad = max_leaf
    prim_slots = np.concatenate([order, np.full((pad,), -1, np.int64)])
    safe = np.where(prim_slots < 0, 0, prim_slots)
    leaf_v0 = vertices[triangles[safe, 0]]
    leaf_v1 = vertices[triangles[safe, 1]]
    leaf_v2 = vertices[triangles[safe, 2]]
    # degenerate padded slots: collapse to a point so they never hit
    dead = prim_slots < 0
    leaf_v0[dead] = np.nan

    return BVHData(
        nodes_min=jnp.asarray(n_min),
        nodes_max=jnp.asarray(n_max),
        node_left=jnp.asarray(n_left),
        node_count=jnp.asarray(n_count),
        prim_indices=jnp.asarray(prim_slots.astype(np.int32)),
        leaf_v0=jnp.asarray(leaf_v0),
        leaf_e1=jnp.asarray(leaf_v1 - leaf_v0),
        leaf_e2=jnp.asarray(leaf_v2 - leaf_v0),
    )
