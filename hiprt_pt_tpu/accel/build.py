"""Host-side BVH builder — binned SAH BVH2 packed into TPU "meganode" rows.

Role parity with HIPRT's ``hiprtBuildGeometry`` with
``hiprtBuildFlagBitPreferHighQualityBuild`` (reference:
src/HIPRT-Orochi/HIPRTScene.h:60-87): built once per scene on the host, then
traversed on-device (ops/traverse.py). The reference gets a hardware BVH + RT
cores; this layout is designed from measured TPU characteristics instead:

  * a gather over N ray-indices costs ~0.37 ms per 65k rays REGARDLESS of row
    width up to 128 floats (measured on v5e), while VPU math is ~1000x cheaper;
  * therefore the traversal must touch exactly ONE row per node visit.

Profiling the traversal loop shows it is HBM-bandwidth bound: the cost is
bytes-gathered-per-ray-per-iteration. The layout therefore splits node data
into a minimal 16-float internal row and a separate 40-float leaf row, and the
traversal (ops/traverse.py) alternates cheap descent steps with leaf steps:

  nodes  (M, 16) f32:
     [ 0:12] child AABBs: c0.min xyz, c0.max xyz, c1.min xyz, c1.max xyz
     [12]    c0_ref (bitcast int32)   [13] c1_ref (bitcast int32)
             ref >= 0  → internal child, value = its node id
             ref <  0  → leaf child, value = -(leaf_id + 1)
     [14:16] pad
  leaves (L, 40) f32:
     [ 0:36] 4 x [v0 xyz, e1 xyz, e2 xyz] (NaN padded — NaN tests auto-miss)
     [36:40] prim ids (bitcast int32, -1 padded)
  leaf 0 is reserved as an all-NaN empty block (used for degenerate scenes).

Construction: top-down binned SAH (Wald 2007), 16 bins on the dominant
centroid axis. Pure numpy, iterative (a C++ builder replaces this hot path for
million-triangle scenes later).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

N_BINS = 16
MAX_LEAF = 4
ROW_WIDTH = 128


@struct.dataclass
class BVHData:
    """Packed meganode BVH2. M internal nodes; root is node 0.

    Row layout (M, 128) f32:
      [ 0:12]  child AABBs: c0.min xyz, c0.max xyz, c1.min xyz, c1.max xyz
      [12:16]  child meta (bitcast int32): c0_ref, c0_count, c1_ref, c1_count
               count==0 -> internal child (ref = meganode id); count>0 -> leaf
               child EMBEDDED in this row; count<0 -> empty slot
      [16:52]  child-0 leaf triangles: 4 x [v0, e1, e2] xyz (NaN padded)
      [52:88]  child-1 leaf triangles
      [88:96]  leaf prim ids (bitcast int32, -1 padded), 4 per child
      [96:128] zero pad
    """

    nodes: jax.Array  # (M, 128) f32
    # per-primitive triangle row [v0 xyz, e1 xyz, e2 xyz, pad x3] — used to
    # reconstruct barycentrics AFTER traversal so u/v never ride in the hot
    # loop's carry (ops/traverse.py)
    tri_rows: jax.Array  # (T, 12) f32
    # --- compact split layout (big-scene Pallas path) -------------------
    # nodes16 (M,16): cols 0:16 of the meganode with leaf children
    #   re-encoded as ref = -(leaf_id + 1) into leaf_rows (count>0 still
    #   marks leaf-ness). VMEM-resident at ~64 B/row.
    # leaf_rows (L,128): [0:108] up to 12 tris [v0,e1,e2] (NaN padded),
    #   [108:120] prim ids (bitcast i32, -1 padded), [120] leaf flag = 1.0,
    #   [121] tri count as float. Row 0 is a reserved all-zero dummy (DMA
    #   target for non-leaf packets). HBM-resident, DMA'd per visit.
    nodes16: jax.Array | None = None  # (M, 16) f32
    leaf_rows: jax.Array | None = None  # (L, 128) f32
    # BVH4 collapse of nodes16 (see _collapse4) for the wide compact kernel
    nodes4: jax.Array | None = None  # (M4, 32) f32
    # BVH8 collapse (see _collapse8): boxes-only VMEM rows + SMEM refs table
    nodes8: jax.Array | None = None  # (M8, 64) f32
    refs8: jax.Array | None = None   # (M8, 8) i32
    # BVH8 linear collapse (see _collapse8_linear): consecutive-children
    # layout, refs packed into the node row — scales past the SMEM limit
    nodes8l: jax.Array | None = None    # (M8, 64) f32
    leaf_rows8: jax.Array | None = None  # (L, 128) f32, permuted leaf rows
    # Per-LANE traversal tables (ops/pallas_traverse._kernel_lane8): node rows
    # fetched by one-hot MXU matmul, so boxes are bf16 with DIRECTED rounding
    # (mins down, maxs up — conservative, never culls a true hit) and meta
    # rides as bf16-exact byte columns.
    # nodes_lane8 (M8, 64) bf16: [0:48] dilated child boxes (NaN = empty),
    #   [48:51] base_int bytes, [51] n_int, [52:55] base_leaf bytes.
    # leaves_lane8 (L, W) int8, W = roundup8(18*Tc + 13), Tc =
    # lane8_leaf_tris: leaf geometry QUANTIZED to one global power-of-2
    # lattice (origin/step in `lane8_frame`) so the gather runs on the
    # int8 MXU path at 2x bf16 throughput and 1/4 the VMEM. Vertex lattice
    # coords are stored uint16 relative to a per-leaf lattice origin:
    # every vertex lands on the SAME global lattice, so vertices shared
    # across leaves quantize identically (watertight) and the kernel's
    # e1 = v1 - v0 is lattice-exact. Rows (component-major, slot kk of
    # component j = vert*3+axis at row j*Tc+kk; every byte value x is
    # stored -128 encoded as int8 x-128): [0:9Tc] q hi byte, [9Tc:18Tc]
    # q lo byte (q = hi*256+lo in [0, 65535] after decode; vertex lattice
    # coord = k_axis + q), [18Tc] count, [18Tc+1:18Tc+10] leaf origin
    # lattice coords kx/ky/kz bytes b0/b1/b2 each, [18Tc+10:18Tc+13]
    # prim-order base bytes b0/b1/b2 (winner prim POSITION = base + slot,
    # remapped through lane8_order by the host wrapper), rest pad.
    nodes_lane8: jax.Array | None = None   # (M8, 64) bf16
    leaves_lane8: jax.Array | None = None  # (L, W) int8
    # (ox, oy, oz, step) of the global quantization lattice — static python
    # floats baked into the lane8 kernel (step is a power of 2)
    lane8_frame: tuple | None = struct.field(pytree_node=False, default=None)
    # prim-order remap: lane8 kernels return POSITIONS base+slot into this
    # concatenated per-leaf prim list (prim ids are not stored in the
    # leaf table — 14% less table stream per leaf round)
    lane8_order: jax.Array | None = None   # (total leaf refs,) i32
    # leaf coordinate precision of leaves_lane8: 16 (two byte rows per
    # coord) or 12 (hi row + shared nibble row; wrapper refines winners)
    lane8_leaf_bits: int = struct.field(pytree_node=False, default=16)
    # triangle-slot capacity Tc of a lane8 leaf row (12 on the python
    # fallback path; LANE8_LEAF_TRIS cluster leaves on the native path)
    lane8_leaf_tris: int = struct.field(pytree_node=False, default=12)
    # max node depth of the BVH8 (root = 1); static metadata, not traced
    depth8: int = struct.field(pytree_node=False, default=0)
    # max node depth of the BVH8 behind nodes_lane8/leaves_lane8 (the
    # cluster-leaf tree on the native path — NOT depth8, which describes
    # the main 12-tri-leaf BVH8). Bounds the per-level compressed stack of
    # the grouped static-strided kernel (_kernel_lane8s): entries are
    # pushed at most once per level along the current path.
    lane8_depth: int = struct.field(pytree_node=False, default=16)

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]


def _compact_split(rows: np.ndarray):
    """Meganode rows → (nodes16 (M,16), leaf_rows (L,128)) — the compact
    split layout for the big-scene Pallas path (see BVHData docstring).
    Vectorized host numpy; row 0 of leaf_rows is the reserved zero dummy."""
    M = rows.shape[0]
    meta = rows[:, 12:16].view(np.int32).copy()
    c0_cnt = meta[:, 1]
    c1_cnt = meta[:, 3]
    leaf0 = c0_cnt > 0
    leaf1 = c1_cnt > 0
    n0 = int(leaf0.sum())
    n1 = int(leaf1.sum())
    L = n0 + n1 + 1
    lrows = np.zeros((L, 128), np.float32)
    # child-0 leaves
    ids0 = np.zeros((M,), np.int64)
    ids0[leaf0] = 1 + np.arange(n0)
    ids1 = np.zeros((M,), np.int64)
    ids1[leaf1] = 1 + n0 + np.arange(n1)
    if n0:
        lrows[ids0[leaf0], 0:36] = rows[leaf0, 16:52]
        lrows[ids0[leaf0], 108:112] = rows[leaf0, 88:92]
        lrows[ids0[leaf0], 120] = 1.0
        lrows[ids0[leaf0], 121] = c0_cnt[leaf0].astype(np.float32)
    if n1:
        lrows[ids1[leaf1], 0:36] = rows[leaf1, 52:88]
        lrows[ids1[leaf1], 108:112] = rows[leaf1, 92:96]
        lrows[ids1[leaf1], 120] = 1.0
        lrows[ids1[leaf1], 121] = c1_cnt[leaf1].astype(np.float32)
    # unfilled prim-id slots must read -1 (bitcast), not 0
    neg1 = np.float32(np.asarray([-1], np.int32).view(np.float32)[0])
    for base in range(108, 120):
        tricount = lrows[:, 121]
        empty = (base - 108) >= tricount
        lrows[empty, base] = neg1
    lrows[0] = 0.0
    meta[leaf0, 0] = -(ids0[leaf0] + 1)
    meta[leaf1, 2] = -(ids1[leaf1] + 1)
    n16 = rows[:, :16].copy()
    n16[:, 12:16] = meta.view(np.float32)
    return n16, lrows


LEAF_TRIS_COMPACT = 12  # fat-leaf capacity of a compact leaf row


def _compact_from_raw(bounds, meta, order, vertices, triangles):
    """Raw BVH2 (fat leaves, max_leaf=12) → (nodes16, leaf_rows).

    Same layouts as _compact_split, but leaves carry up to 12 triangles
    each — a leaf visit in the compact kernels costs a full iteration plus a
    512-byte HBM DMA, so fat leaves cut the iteration count ~3x over
    repacked 4-tri meganode leaves."""
    M = bounds.shape[0]
    left = meta[:, 0]
    count = meta[:, 1]
    is_leaf = count > 0
    internal = np.nonzero(~is_leaf)[0]
    id_map = np.full((M,), -1, np.int64)
    id_map[internal] = np.arange(len(internal))
    leaf_nodes = np.nonzero(is_leaf)[0]
    leaf_id = np.full((M,), 0, np.int64)
    leaf_id[leaf_nodes] = 1 + np.arange(len(leaf_nodes))
    L = len(leaf_nodes) + 1

    # --- leaf rows ---
    lrows = np.zeros((L, 128), np.float32)
    neg1 = np.asarray([-1], np.int32).view(np.float32)[0]
    lrows[:, 108:120] = neg1
    lrows[0] = 0.0
    if len(leaf_nodes):
        cnt = count[leaf_nodes]
        # (Lf, 12) padded triangle indices into `order`
        offs = left[leaf_nodes][:, None] + np.arange(LEAF_TRIS_COMPACT)[None, :]
        valid = np.arange(LEAF_TRIS_COMPACT)[None, :] < cnt[:, None]
        tri_idx = order[np.clip(offs, 0, len(order) - 1)]
        v0 = vertices[triangles[tri_idx, 0]]
        e1 = vertices[triangles[tri_idx, 1]] - v0
        e2 = vertices[triangles[tri_idx, 2]] - v0
        tri9 = np.concatenate([v0, e1, e2], axis=-1)  # (Lf, 12, 9)
        tri9 = np.where(valid[..., None], tri9, np.nan)
        lrows[1:, 0:108] = tri9.reshape(len(leaf_nodes), 108)
        ids = np.where(valid, tri_idx, -1).astype(np.int32)
        lrows[1:, 108:120] = ids.view(np.float32)
        lrows[1:, 120] = 1.0
        lrows[1:, 121] = cnt.astype(np.float32)

    # --- internal 16-float rows ---
    Mi = max(len(internal), 1)
    n16 = np.zeros((Mi, 16), np.float32)
    refs = np.zeros((Mi, 2), np.int32)
    cnts = np.zeros((Mi, 2), np.int32)
    if len(internal):
        c0 = left[internal]
        c1 = c0 + 1
        n16[:, 0:6] = bounds[c0]
        n16[:, 6:12] = bounds[c1]
        for j, ch in enumerate((c0, c1)):
            ch_leaf = is_leaf[ch]
            refs[:, j] = np.where(
                ch_leaf, -(leaf_id[ch] + 1), id_map[ch]
            ).astype(np.int32)
            cnts[:, j] = np.where(ch_leaf, count[ch], 0).astype(np.int32)
    meta16 = np.stack(
        [refs[:, 0], cnts[:, 0], refs[:, 1], cnts[:, 1]], axis=1
    ).astype(np.int32)
    n16[:, 12:16] = meta16.view(np.float32)
    return n16, lrows


LANE8_LEAF_TRIS = 128  # cluster-leaf capacity of the lane8 tables
LANE8_LEAF_BITS = "auto"  # leaf coordinate precision: 16, 12, or "auto"
# "auto": 12-bit above this many triangles. Measured r5 (l8decomp): the
# leaf one-hot stream costs ~(table bytes) x lanes in MXU MACs per round,
# so -22% table bytes is noise at stress scale (7 MB table) but the
# dominant term at 1.6M tris (43 MB); 12-bit's quantization is repaired
# exactly for closest hits by winner refinement, while any-hit occlusion
# picks up ~1e-3 silhouette flips — a trade only worth making where the
# table stream dominates.
LEAF_BITS_AUTO_TRIS = 600_000


def _cluster_from_raw(bounds, meta, order, leaf_tris: int):
    """Raw BVH2 (max_leaf=leaf_tris) → (n16, prims (L, Tc) i64, counts (L,)).

    Same n16 node/meta conventions as _compact_from_raw, but leaves carry
    only padded prim-id lists — the lane8 packer re-derives coordinates
    from the mesh. Dummy leaf row 0 kept. A root-is-leaf scene gets a
    synthesized internal root (leaf as child 0, child 1 empty) so
    _collapse8_linear never needs its degenerate path."""
    M = bounds.shape[0]
    left = meta[:, 0]
    count = meta[:, 1]
    is_leaf = count > 0
    internal = np.nonzero(~is_leaf)[0]
    leaf_nodes = np.nonzero(is_leaf)[0]
    Tc = leaf_tris
    L = len(leaf_nodes) + 1
    prims = np.full((L, Tc), -1, np.int64)
    counts = np.zeros((L,), np.int64)
    if len(leaf_nodes):
        cnt = count[leaf_nodes]
        offs = left[leaf_nodes][:, None] + np.arange(Tc)[None, :]
        valid = np.arange(Tc)[None, :] < cnt[:, None]
        tri_idx = order[np.clip(offs, 0, len(order) - 1)]
        prims[1:] = np.where(valid, tri_idx, -1)
        counts[1:] = cnt
    if not len(internal):
        n16 = np.zeros((1, 16), np.float32)
        if M:
            n16[0, 0:6] = bounds[0]
        m16 = np.asarray(
            [[-2, int(count[0]) if M else 0, 0, -1]], np.int32)
        n16[:, 12:16] = m16.view(np.float32)
        return n16, prims, counts
    id_map = np.full((M,), -1, np.int64)
    id_map[internal] = np.arange(len(internal))
    leaf_id = np.zeros((M,), np.int64)
    leaf_id[leaf_nodes] = 1 + np.arange(len(leaf_nodes))
    n16 = np.zeros((len(internal), 16), np.float32)
    c0 = left[internal]
    c1 = c0 + 1
    n16[:, 0:6] = bounds[c0]
    n16[:, 6:12] = bounds[c1]
    refs = np.zeros((len(internal), 2), np.int32)
    cnts = np.zeros((len(internal), 2), np.int32)
    for j, ch in enumerate((c0, c1)):
        ch_leaf = is_leaf[ch]
        refs[:, j] = np.where(
            ch_leaf, -(leaf_id[ch] + 1), id_map[ch]).astype(np.int32)
        cnts[:, j] = np.where(ch_leaf, count[ch], 0).astype(np.int32)
    meta16 = np.stack(
        [refs[:, 0], cnts[:, 0], refs[:, 1], cnts[:, 1]], axis=1
    ).astype(np.int32)
    n16[:, 12:16] = meta16.view(np.float32)
    return n16, prims, counts


def _depth8_of(n8l: np.ndarray) -> int:
    """Max node depth (root = 1) of a linear BVH8 node table."""
    M = n8l.shape[0]
    wa = np.ascontiguousarray(n8l[:, 48]).view(np.int32)
    base = wa & ((1 << 26) - 1)
    n_int = wa >> 26
    depth = np.zeros((M,), np.int32)
    depth[0] = 1
    for r in np.nonzero(n_int)[0]:
        depth[base[r]:base[r] + n_int[r]] = depth[r] + 1
    return int(depth.max(initial=1))


def _lane8_cluster_tables(vertices, triangles,
                          leaf_tris: int = LANE8_LEAF_TRIS,
                          leaf_bits: int = LANE8_LEAF_BITS):
    """Build the lane8 tables over their OWN cluster-leaf BVH8.

    The lane8 leaf gather streams the whole leaf table through the MXU
    every round, so its cost scales with TOTAL table bytes per round —
    fat cluster leaves (~128 tris) cut the number of leaf rounds AND
    shrink the node table ~10x (node iterations drop with tree depth)
    while per-round cost stays roughly flat. Returns
    (nodes (M8, 64) bf16, leaves (L, W) int8, frame, leaf_tris) or None
    if the native builder is unavailable."""
    from .native import build_bvh_raw_native

    raw = build_bvh_raw_native(vertices, triangles, leaf_tris)
    if raw is None:
        return None
    n16c, primsc, countsc = _cluster_from_raw(*raw, leaf_tris)
    n8lc, _lr, src = _collapse8_linear(
        n16c, np.zeros((primsc.shape[0], 1), np.float32), return_src=True)
    prims_l = primsc[np.maximum(src, 0)]
    prims_l[src < 0] = -1
    counts_l = countsc[np.maximum(src, 0)]
    counts_l[src < 0] = 0
    nl8, ll8, fr8, l8o = _pack_lane8(
        n8lc, None, vertices, triangles,
        prims=prims_l, counts=counts_l, leaf_tris=leaf_tris,
        leaf_bits=leaf_bits)
    return nl8, ll8, fr8, l8o, leaf_tris, _depth8_of(n8lc)


def _collapse4(n16: np.ndarray):
    """BVH2 16-float rows → BVH4 32-float rows by pulling grandchildren up.

    Row layout (M4, 32) f32:
      [ 0:24]  4 child AABBs (min xyz, max xyz each; NaN for empty slots)
      [24:28]  child refs (bitcast i32): >=0 internal BVH4 row id,
               <0 leaf id into leaf_rows (-(id+1)), unchanged from BVH2
      [28:32]  pad (zeros)
    Internal node count roughly halves; VMEM bytes stay ~ the same while
    iteration counts drop ~2x (each visit tests 4 boxes).
    """
    M = n16.shape[0]
    meta = n16[:, 12:16].view(np.int32)
    boxes = n16[:, :12].reshape(M, 2, 6)
    refs2 = np.stack([meta[:, 0], meta[:, 2]], 1)
    cnts2 = np.stack([meta[:, 1], meta[:, 3]], 1)

    # children of node n in the BVH4: for each BVH2 child that is internal,
    # pull up ITS two children; leaves stay direct children
    kept = [0]
    new_id = {0: 0}
    rows_children = []  # list of list[(box(6,), ref2-encoded)]
    qi = 0
    while qi < len(kept):
        n = kept[qi]
        qi += 1
        ch = []
        for c in range(2):
            if cnts2[n, c] > 0 or refs2[n, c] < 0:
                # leaf child (count>0; ref already leaf-encoded)
                ch.append((boxes[n, c], ("leaf", refs2[n, c])))
            else:
                g = refs2[n, c]
                for gc in range(2):
                    if cnts2[g, gc] > 0 or refs2[g, gc] < 0:
                        ch.append((boxes[g, gc], ("leaf", refs2[g, gc])))
                    else:
                        t = refs2[g, gc]
                        if t not in new_id:
                            new_id[t] = len(new_id)
                            kept.append(t)
                        ch.append((boxes[g, gc], ("node", t)))
        rows_children.append((n, ch))

    M4 = len(rows_children)
    out = np.zeros((M4, 32), np.float32)
    out[:, 0:24] = np.nan
    refs4 = np.zeros((M4, 4), np.int32)
    for (n, ch) in rows_children:
        r = new_id[n]
        for ci, (box, (kind, ref)) in enumerate(ch[:4]):
            out[r, ci * 6:(ci + 1) * 6] = box
            refs4[r, ci] = new_id[ref] if kind == "node" else ref
    out[:, 24:28] = refs4.view(np.float32)
    return out


def _collapse8(n16: np.ndarray):
    """BVH2 16-float rows → BVH8 by pulling up to three levels of
    descendants into one node.

    Returns (nodes8 (M8, 64) f32, refs8 (M8, 8) i32):
      nodes8[:, 0:48]  8 child AABBs (min xyz, max xyz each; NaN = empty
                       slot — NaN slab tests auto-miss)
      nodes8[:, 48:64] zero pad (rows padded to a 64-float stride so a
                       scalar-indexed VMEM row fetch stays sublane-aligned)
      refs8[m, c]      >=0 internal BVH8 row id; <0 leaf id (-(id+1)),
                       unchanged encoding from the BVH2 compact layout.

    The refs ride OUTSIDE the node row, as an SMEM-resident table: the
    traversal kernel reads them with scalar loads, eliminating the
    per-child vector→scalar crossings that dominate the BVH4 kernels'
    iteration cost (see ops/pallas_traverse.py v5 notes).
    """
    M = n16.shape[0]
    meta = n16[:, 12:16].view(np.int32)
    boxes = n16[:, :12].reshape(M, 2, 6)
    refs2 = np.stack([meta[:, 0], meta[:, 2]], 1)
    cnts2 = np.stack([meta[:, 1], meta[:, 3]], 1)

    def is_leaf_child(n, c):
        return cnts2[n, c] > 0 or refs2[n, c] < 0

    kept = [0]
    new_id = {0: 0}
    rows_children = []
    qi = 0
    while qi < len(kept):
        n = kept[qi]
        qi += 1
        # full 3-level expansion: a leaf child occupies 1 slot, an internal
        # child up to 4 (its grandchildren) — total always <= 8
        ch = []
        for c in range(2):
            if is_leaf_child(n, c):
                ch.append((boxes[n, c], ("leaf", refs2[n, c])))
            else:
                g = refs2[n, c]
                for gc in range(2):
                    if is_leaf_child(g, gc):
                        ch.append((boxes[g, gc], ("leaf", refs2[g, gc])))
                    else:
                        gg = refs2[g, gc]
                        for ggc in range(2):
                            if is_leaf_child(gg, ggc):
                                ch.append(
                                    (boxes[gg, ggc], ("leaf", refs2[gg, ggc]))
                                )
                            else:
                                t = refs2[gg, ggc]
                                if t not in new_id:
                                    new_id[t] = len(new_id)
                                    kept.append(t)
                                ch.append((boxes[gg, ggc], ("node", t)))
        rows_children.append((n, ch))

    M8 = len(rows_children)
    out = np.zeros((M8, 64), np.float32)
    out[:, 0:48] = np.nan
    refs8 = np.zeros((M8, 8), np.int32)
    for (n, ch) in rows_children:
        r = new_id[n]
        for ci, (box, (kind, ref)) in enumerate(ch[:8]):
            out[r, ci * 6:(ci + 1) * 6] = box
            refs8[r, ci] = new_id[ref] if kind == "node" else ref
    return out, refs8


def build_bvh(
    vertices: np.ndarray,
    triangles: np.ndarray,
    max_leaf: int = MAX_LEAF,
    use_native: bool = True,
    leaf_bits=LANE8_LEAF_BITS,
    lane8_leaf_tris: int = LANE8_LEAF_TRIS,
) -> BVHData:
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int64)
    T = triangles.shape[0]
    if leaf_bits == "auto":
        leaf_bits = 12 if T > LEAF_BITS_AUTO_TRIS else 16

    tv0 = vertices[triangles[:, 0]]
    tri_rows = np.zeros((max(T, 1), 12), np.float32)
    if T:
        tri_rows[:, 0:3] = tv0
        tri_rows[:, 3:6] = vertices[triangles[:, 1]] - tv0
        tri_rows[:, 6:9] = vertices[triangles[:, 2]] - tv0

    if use_native:
        # C++ builder (role parity with HIPRT's native build); numpy fallback
        from .native import build_bvh_native

        rows_native = build_bvh_native(vertices, triangles, max_leaf)
        if rows_native is not None:
            from .native import build_bvh_raw_native

            raw = build_bvh_raw_native(
                vertices, triangles, LEAF_TRIS_COMPACT
            )
            if raw is not None:
                n16, lrows = _compact_from_raw(
                    raw[0], raw[1], raw[2], vertices, triangles
                )
            else:
                n16, lrows = _compact_split(rows_native)
            n8, r8 = _collapse8(n16)
            n8l, lr8 = _collapse8_linear(n16, lrows)
            d8 = _depth8_of(n8l)
            lc = _lane8_cluster_tables(vertices, triangles,
                                       leaf_tris=lane8_leaf_tris,
                                       leaf_bits=leaf_bits)
            if lc is not None:
                nl8, ll8, fr8, l8o, l8t, l8d = lc
            else:
                nl8, ll8, fr8, l8o = _pack_lane8(n8l, lr8, vertices,
                                                 triangles)
                l8t = 12
                l8d = _depth8_of(n8l)
            return BVHData(
                nodes=jnp.asarray(rows_native), tri_rows=jnp.asarray(tri_rows),
                nodes16=jnp.asarray(n16), leaf_rows=jnp.asarray(lrows),
                nodes4=jnp.asarray(_collapse4(n16)),
                nodes8=jnp.asarray(n8), refs8=jnp.asarray(r8),
                nodes8l=jnp.asarray(n8l), leaf_rows8=jnp.asarray(lr8),
                depth8=d8,
                nodes_lane8=jnp.asarray(nl8), leaves_lane8=jnp.asarray(ll8),
                lane8_frame=fr8, lane8_leaf_tris=l8t, lane8_depth=l8d,
                lane8_order=jnp.asarray(l8o),
                lane8_leaf_bits=(leaf_bits if lc is not None else 16),
            )

    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroids = (tri_min + tri_max) * 0.5

    order = np.arange(T)

    # Phase 1: classic BVH2 build
    cap = max(2 * T, 16)
    n_min = np.zeros((cap, 3), np.float32)
    n_max = np.zeros((cap, 3), np.float32)
    n_left = np.zeros((cap,), np.int32)
    n_count = np.zeros((cap,), np.int32)
    num_nodes = 1

    stack = [(0, 0, T)]
    while stack:
        node_id, start, end = stack.pop()
        idx = order[start:end]
        n_min[node_id] = tri_min[idx].min(axis=0)
        n_max[node_id] = tri_max[idx].max(axis=0)
        count = end - start
        if count <= max_leaf:
            n_left[node_id] = start
            n_count[node_id] = count
            continue

        c = centroids[idx]
        cmin, cmax = c.min(axis=0), c.max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        mid = None
        if extent[axis] > 1e-12:
            scale = N_BINS / extent[axis]
            bins = np.minimum(
                ((c[:, axis] - cmin[axis]) * scale).astype(np.int32), N_BINS - 1
            )
            bin_counts = np.bincount(bins, minlength=N_BINS)
            bin_min = np.full((N_BINS, 3), np.inf, np.float32)
            bin_max = np.full((N_BINS, 3), -np.inf, np.float32)
            for b in np.nonzero(bin_counts)[0]:
                sel = bins == b
                bin_min[b] = tri_min[idx[sel]].min(axis=0)
                bin_max[b] = tri_max[idx[sel]].max(axis=0)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return 2.0 * (
                    d[..., 0] * d[..., 1]
                    + d[..., 1] * d[..., 2]
                    + d[..., 2] * d[..., 0]
                )

            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(bin_counts)
            rcnt = np.cumsum(bin_counts[::-1])[::-1]
            costs = np.full((N_BINS - 1,), np.inf)
            for s in range(N_BINS - 1):
                if lcnt[s] and rcnt[s + 1]:
                    costs[s] = area(lmin[s], lmax[s]) * lcnt[s] + area(
                        rmin[s + 1], rmax[s + 1]
                    ) * rcnt[s + 1]
            best = int(np.argmin(costs))
            if np.isfinite(costs[best]):
                go_left = bins <= best
                nleft = int(go_left.sum())
                if 0 < nleft < count:
                    order[start:end] = np.concatenate([idx[go_left], idx[~go_left]])
                    mid = start + nleft
        if mid is None:
            mid = start + count // 2

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

    # Phase 2: pack meganodes — leaves embed in their parent row, one gather
    # serves a whole node visit (gather cost is ~2 cycles/index regardless of
    # row width up to 128 floats, so the wide row is free)
    internal_old = [i for i in range(num_nodes) if n_count[i] == 0]
    id_map = {old: new for new, old in enumerate(internal_old)}
    M = max(len(internal_old), 1)
    rows = np.zeros((M, ROW_WIDTH), np.float32)
    meta = np.zeros((M, 4), np.int32)

    def emit_leaf(row, ci, old_node):
        ids = order[n_left[old_node] : n_left[old_node] + n_count[old_node]]
        tris = np.full((36,), np.nan, dtype=np.float32)
        prims = np.full((4,), -1, dtype=np.int32)
        for k, t in enumerate(ids[:MAX_LEAF]):
            v0 = vertices[triangles[t, 0]]
            v1 = vertices[triangles[t, 1]]
            v2 = vertices[triangles[t, 2]]
            tris[k * 9 : k * 9 + 3] = v0
            tris[k * 9 + 3 : k * 9 + 6] = v1 - v0
            tris[k * 9 + 6 : k * 9 + 9] = v2 - v0
            prims[k] = t
        base = 16 + ci * 36
        rows[row, base : base + 36] = tris
        rows[row, 88 + ci * 4 : 92 + ci * 4] = prims.view(np.float32)
        return len(ids)

    if not internal_old:
        # degenerate: whole scene is one leaf — child1 gets count -1 ("empty",
        # neither leaf nor internal; an inverted-infinity AABB would NOT work:
        # the slab min/max swap turns it into an always-hit box)
        cnt = emit_leaf(0, 0, 0)
        rows[0, 0:3] = n_min[0]
        rows[0, 3:6] = n_max[0]
        meta[0] = [0, cnt, 0, -1]
    else:
        for old in internal_old:
            new = id_map[old]
            c0, c1 = n_left[old], n_left[old] + 1
            rows[new, 0:3] = n_min[c0]
            rows[new, 3:6] = n_max[c0]
            rows[new, 6:9] = n_min[c1]
            rows[new, 9:12] = n_max[c1]
            m = [0, 0, 0, 0]
            for ci, c in enumerate((c0, c1)):
                if n_count[c] > 0:
                    m[ci * 2] = 0
                    m[ci * 2 + 1] = emit_leaf(new, ci, c)
                else:
                    m[ci * 2] = id_map[c]
                    m[ci * 2 + 1] = 0
            meta[new] = m

    rows[:, 12:16] = meta.view(np.float32)
    n16, lrows = _compact_split(rows)
    n8, r8 = _collapse8(n16)
    n8l, lr8 = _collapse8_linear(n16, lrows)
    d8 = _depth8_of(n8l)
    nl8, ll8, fr8, l8o = _pack_lane8(n8l, lr8, vertices, triangles)
    return BVHData(
        nodes=jnp.asarray(rows), tri_rows=jnp.asarray(tri_rows),
        nodes16=jnp.asarray(n16), leaf_rows=jnp.asarray(lrows),
        nodes4=jnp.asarray(_collapse4(n16)),
        nodes8=jnp.asarray(n8), refs8=jnp.asarray(r8),
        nodes8l=jnp.asarray(n8l), leaf_rows8=jnp.asarray(lr8),
        depth8=d8,
        nodes_lane8=jnp.asarray(nl8), leaves_lane8=jnp.asarray(ll8),
        lane8_frame=fr8, lane8_depth=_depth8_of(n8l),
        lane8_order=jnp.asarray(l8o),
    )




def _pack_lane8(n8l: np.ndarray, lr8: np.ndarray,
                verts: np.ndarray | None = None,
                tris: np.ndarray | None = None,
                prims: np.ndarray | None = None,
                counts: np.ndarray | None = None,
                leaf_tris: int = 12,
                leaf_bits: int = 16):
    """Pack the linear BVH8 into the per-lane MXU-gather tables.

    See BVHData.nodes_lane8/leaves_lane8 for the layout. Boxes use directed
    bf16 rounding so the slab test can only FALSE-POSITIVE (extra visits),
    never cull a true hit; leaf triangle geometry is quantized to a single
    global power-of-2 lattice and stored int8 so the leaf gather runs on
    the int8 MXU path (~2x bf16 throughput, 1/4 the VMEM — measured 36 vs
    71 us/iter at 29.4k x 216 on v5e).

    Returns (nodes (M8, 64) bf16, leaves (L, W) int8,
             frame (ox, oy, oz, step), prim order (refs,) i32).
    """
    import ml_dtypes

    bf = ml_dtypes.bfloat16

    def _bf16_directed(x: np.ndarray, up: bool) -> np.ndarray:
        b = x.astype(bf)
        back = b.astype(np.float32)
        u = b.view(np.uint16).astype(np.int64)
        sign = (u & 0x8000) != 0
        inc = np.where(sign, -1, 1) if up else np.where(sign, 1, -1)
        nxt = u + inc
        # stepping off +-0 lands on the smallest subnormal of the target sign
        nxt = np.where((u & 0x7FFF) == 0, 0x0001 if up else 0x8001, nxt)
        stepped = nxt.astype(np.uint16).view(bf)
        need = (back < x) if up else (back > x)
        need &= np.isfinite(x)
        return np.where(need, stepped, b)

    M = n8l.shape[0]
    nodes = np.zeros((M, 64), bf)
    boxes = n8l[:, :48].reshape(M, 8, 6)
    nodes_boxes = np.empty((M, 8, 6), bf)
    nodes_boxes[:, :, 0:3] = _bf16_directed(boxes[:, :, 0:3], up=False)
    nodes_boxes[:, :, 3:6] = _bf16_directed(boxes[:, :, 3:6], up=True)
    # Empty children CANNOT stay NaN here: the one-hot matmul multiplies
    # every table entry (0 * NaN = NaN poisons the whole gather). A far
    # "point box" (all six coords = +bf16max) never passes the slab test:
    # all-positive inv -> t_entry = +inf; all-negative -> t_exit = -inf;
    # mixed signs -> entry +inf. (No finite scene reaches 3.4e38.)
    empty = ~np.isfinite(boxes)
    nodes_boxes[empty] = bf(3.38e38)  # bf16 max normal is ~3.39e38
    # COMPONENT-MAJOR: col k*8 + c (component k of child c) so the kernel
    # slabs all 8 children with (8, L) block ops instead of 48 row ops
    nodes[:, 0:48] = nodes_boxes.transpose(0, 2, 1).reshape(M, 48)
    wa = np.ascontiguousarray(n8l[:, 48]).view(np.int32).astype(np.int64)
    wb = np.ascontiguousarray(n8l[:, 49]).view(np.int32).astype(np.int64)
    base_int = wa & ((1 << 26) - 1)
    n_int = wa >> 26
    base_leaf = wb & ((1 << 20) - 1)
    nodes[:, 48] = (base_int & 255).astype(np.float32)
    nodes[:, 49] = ((base_int >> 8) & 255).astype(np.float32)
    nodes[:, 50] = ((base_int >> 16) & 255).astype(np.float32)
    nodes[:, 51] = n_int.astype(np.float32)
    nodes[:, 52] = (base_leaf & 255).astype(np.float32)
    nodes[:, 53] = ((base_leaf >> 8) & 255).astype(np.float32)
    nodes[:, 54] = ((base_leaf >> 16) & 255).astype(np.float32)

    if prims is None:
        prims = np.ascontiguousarray(
            lr8[:, 108:120]).view(np.int32).astype(np.int64)
        counts = lr8[:, 121].astype(np.int64)
    Tc = leaf_tris
    L = prims.shape[0]
    prim = prims
    vmask = prim >= 0  # (L, Tc)
    # Quantize VERTICES (v0, v1, v2), not (v0, e1, e2): per-triangle edge
    # rounding breaks shared edges (bisected: a grazing hit with exact
    # u = 2e-6 fell into a ~1e-5 crack between neighbors). Every vertex
    # lands on the SAME global lattice, so vertices shared across
    # triangles/leaves (incl. SBVH duplicates) quantize identically and
    # the quantized mesh stays watertight; the kernel derives e1 = v1 - v0
    # in f32 from lattice-exact coords.
    pv = np.where(vmask, prim, 0)
    tri_v = verts[tris[pv]].astype(np.float64)  # (L, Tc, 3v, 3a)
    tri_v = np.where(vmask[:, :, None, None], tri_v, 0.0)

    # ---- global power-of-2 lattice ----
    # Constraints: per-axis lattice coords fit [0, 2^24 - 2^17) so
    # (k + q) -> f32 is exact; every leaf's vertex spread fits 16 bits
    # relative to its own quantized min.
    LAT_SPAN = (1 << 24) - (1 << 17)
    # per-leaf relative span: 16-bit = two full byte rows per coord;
    # 12-bit = one hi-byte row + half a shared-nibble row (W -22%, the
    # leaf MXU stream shrinks by the same factor; quantization error grows
    # 16x and is repaired by the wrapper's exact winner re-intersection —
    # ops/pallas_traverse.traverse_pallas_lane8s(refine=...))
    REL_SPAN = 65000 if leaf_bits == 16 else 4050
    vm4 = vmask[:, :, None, None]
    used = vmask.any(axis=1)
    if used.any():
        leaf_min = np.where(vm4, tri_v, np.inf).min(axis=(1, 2))   # (L, 3)
        leaf_max = np.where(vm4, tri_v, -np.inf).max(axis=(1, 2))
        smin = leaf_min[used].min(axis=0)
        smax = leaf_max[used].max(axis=0)
        span = float((smax - smin).max())
        leaf_ext = float((leaf_max[used] - leaf_min[used]).max())
    else:
        smin = np.zeros(3)
        span = leaf_ext = 0.0
    need = max(span / LAT_SPAN, leaf_ext / REL_SPAN, 1e-30)
    step = float(2.0 ** np.ceil(np.log2(need)))
    origin = (smin - step).astype(np.float32).astype(np.float64)

    lat = np.rint((tri_v - origin) / step).astype(np.int64)  # (L,Tc,3,3)
    lat = np.clip(lat, 0, (1 << 24) - 1)
    k = np.where(vm4, lat, np.int64(1 << 30)).min(axis=(1, 2))  # (L, 3)
    k = np.where(used[:, None], k, 0)
    q = np.where(vm4, lat - k[:, None, None, :], 0)
    qmax = 65536 if leaf_bits == 16 else 4096
    assert q.min() >= 0 and q.max() < qmax, (q.min(), q.max())

    def enc(x):  # -128 encode byte values in [0, 255]
        return (x - 128).astype(np.int8)

    # Prim ids are NOT stored per slot (3 bytes/tri, 14% of the old table
    # stream): each leaf's valid slots 0..cnt-1 map to positions
    # base_l + slot of a concatenated prim-order array, and the kernels
    # return POSITIONS that the host wrapper remaps through lane8_order.
    # This shrinks every leaf-round MXU stream and its i32 materialization
    # by the same 14%.
    cnt_arr = np.asarray(counts, np.int64)
    bases = np.zeros((L,), np.int64)
    if L > 1:
        bases[1:] = np.cumsum(cnt_arr[:-1])
    order = np.where(vmask, prim, 0)[
        np.arange(Tc)[None, :] < cnt_arr[:, None]
    ].astype(np.int32)  # (total refs,) row-major = leaf-major, slot order
    if order.size == 0:
        order = np.zeros((1,), np.int32)
    assert bases[-1] + cnt_arr[-1] < (1 << 24)

    # COMPONENT-MAJOR: row j*Tc + kk (component j = vert*3 + axis of tri
    # slot kk) so the kernel runs Moller-Trumbore on (Tc, L8) blocks
    q_cm = q.transpose(0, 2, 3, 1).reshape(L, 9 * Tc)
    if leaf_bits == 16:
        HB = 18 * Tc
        W = -(-(HB + 14) // 8) * 8
        leaves = np.zeros((L, W), np.int8)
        leaves[:, 0:9 * Tc] = enc(q_cm >> 8)
        leaves[:, 9 * Tc:18 * Tc] = enc(q_cm & 255)
    else:
        # 12-bit: rows [0:9Tc] = q >> 4; rows [9Tc:14Tc) = shared nibble
        # rows, pair p packs coords (2p | 2p+1<<4); coord 8 rides p=4's
        # low nibble (see _kernel_lane8* leaf_bits==12 decode)
        HB = 14 * Tc
        W = -(-(HB + 14) // 8) * 8
        leaves = np.zeros((L, W), np.int8)
        leaves[:, 0:9 * Tc] = enc(q_cm >> 4)
        for pair in range(5):
            lo0 = q_cm[:, (2 * pair) * Tc:(2 * pair + 1) * Tc] & 15
            if 2 * pair + 1 < 9:
                lo1 = q_cm[:, (2 * pair + 1) * Tc:(2 * pair + 2) * Tc] & 15
            else:
                lo1 = 0
            leaves[:, 9 * Tc + pair * Tc:9 * Tc + (pair + 1) * Tc] = enc(
                lo0 | (lo1 << 4))
    # count is TWO bytes (lo at HB, hi at HB+13): one byte capped leaf
    # capacity at 255 tris and silently zeroed a FULL 256-tri leaf
    leaves[:, HB] = enc(cnt_arr & 255)
    for a in range(3):
        ka = k[:, a]
        leaves[:, HB + 1 + a * 3] = enc(ka & 255)
        leaves[:, HB + 2 + a * 3] = enc((ka >> 8) & 255)
        leaves[:, HB + 3 + a * 3] = enc((ka >> 16) & 255)
    leaves[:, HB + 10] = enc(bases & 255)
    leaves[:, HB + 11] = enc((bases >> 8) & 255)
    leaves[:, HB + 12] = enc((bases >> 16) & 255)
    leaves[:, HB + 13] = enc((cnt_arr >> 8) & 255)
    frame = (float(origin[0]), float(origin[1]), float(origin[2]), step)
    return nodes, leaves, frame, order


def _collapse8_linear(n16: np.ndarray, leaf_rows: np.ndarray,
                      return_src: bool = False):
    """BVH8 collapse with a CONSECUTIVE-CHILDREN layout (v6 kernel).

    The SMEM refs-table variant (_collapse8) cannot scale: SMEM allocates
    scalars at 64-byte granularity, so an (M8, 8) i32 table costs 64x its
    logical size and busts the 1 MB SMEM at ~2k nodes. Instead, children are
    laid out so ALL refs derive from two packed words fetched with the node
    row — the scalar side pays exactly 3 vector->scalar crossings per packet
    per iteration (hit word + 2 meta words), at any scene size:

      * each node's internal children occupy CONSECUTIVE node rows
        (BFS id assignment), and its leaf children occupy CONSECUTIVE
        leaf rows (leaf_rows is re-emitted in that order, dummy row 0 kept);
      * children are sorted internal-first within the node;
      * node row (M8, 64) f32: [0:48] 8 child AABBs in sorted order (NaN =
        empty), [48] word A (bitcast i32) = first_internal_child_row |
        n_internal << 26, [49] word B (bitcast i32) = first_leaf_row,
        [50:64] zero pad.
      * child c ref: c < n_int -> node row  A.base + c
                     c >= n_int (only reachable if hit) -> leaf id
                     B.base + (c - n_int), encoded -(id+1) like everywhere.

    Returns (nodes8l (M8, 64) f32, leaf_rows_l (L, 128) f32).
    """
    M = n16.shape[0]
    meta = n16[:, 12:16].view(np.int32)
    boxes = n16[:, :12].reshape(M, 2, 6)
    refs2 = np.stack([meta[:, 0], meta[:, 2]], 1)
    cnts2 = np.stack([meta[:, 1], meta[:, 3]], 1)

    def is_leaf_child(n, c):
        return cnts2[n, c] > 0 or refs2[n, c] < 0

    # subtree leaf-ref counts per BVH2 internal node (iterative post-order,
    # no child-ordering assumption) — drives the fullness-greedy collapse
    nleaf = np.full(M, -1, np.int64)

    def _subtree_leaves(root):
        stack = [root]
        while stack:
            n = stack[-1]
            if nleaf[n] >= 0:
                stack.pop()
                continue
            total = 0
            ready = True
            for c in range(2):
                if cnts2[n, c] < 0 or (cnts2[n, c] == 0
                                       and refs2[n, c] == 0):
                    continue
                if is_leaf_child(n, c):
                    total += 1
                elif nleaf[refs2[n, c]] < 0:
                    stack.append(refs2[n, c])
                    ready = False
                else:
                    total += nleaf[refs2[n, c]]
            if ready:
                nleaf[n] = total
                stack.pop()
        return nleaf[root]

    def children8(n):
        """Fullness-greedy collapse: start from the two BVH2 children, then
        keep expanding the internal entry with the SMALLEST subtree leaf
        count until the node holds 8 entries (or only leaves remain).

        Small subtrees get absorbed whole (no underfull descendant nodes);
        big subtrees stay as refs and fill their own nodes. The fixed
        3-level pull-up this replaces averaged fanout ~4.0 on the stress
        cluster tree (1000 nodes / 4022 refs) and area-greedy expansion
        barely improved it (938) — node visits per ray dominate traversal
        cost (benchmarks/l8decomp.py), and visits scale with node count.
        Returns (box, kind, bvh2_ref) entries, internal-first (the
        consecutive-children layout needs it)."""
        ch = []
        for c in range(2):
            if cnts2[n, c] < 0 or (cnts2[n, c] == 0 and refs2[n, c] == 0):
                # empty slot (count<0) or degenerate all-zero meta: node 0 is
                # the root and can never be a child, so ref==0 && count==0
                # only appears in single-leaf scenes — skip to keep BFS finite
                continue
            if is_leaf_child(n, c):
                ch.append((boxes[n, c], "leaf", refs2[n, c]))
            else:
                ch.append((boxes[n, c], "node", refs2[n, c]))
        while len(ch) < 8:
            # 1) absorb whole small subtrees when they fit in the free
            #    slots (no underfull descendant nodes, no depth growth);
            # 2) otherwise expand the largest-area internal entry (the
            #    balanced choice — keeps the tree shallow).
            best, best_n = -1, 1 << 60
            for i, (_box, kind, r) in enumerate(ch):
                if kind == "node":
                    s = _subtree_leaves(r)
                    if s < best_n and len(ch) - 1 + s <= 8:
                        best, best_n = i, s
            if best < 0:
                best_a = -1.0
                for i, (box, kind, _r) in enumerate(ch):
                    if kind == "node":
                        dx = max(float(box[3] - box[0]), 0.0)
                        dy = max(float(box[4] - box[1]), 0.0)
                        dz = max(float(box[5] - box[2]), 0.0)
                        a = dx * dy + dy * dz + dz * dx
                        if a > best_a:
                            best, best_a = i, a
            if best < 0:
                break
            _box, _kind, r = ch.pop(best)
            for c in range(2):
                if is_leaf_child(r, c):
                    ch.append((boxes[r, c], "leaf", refs2[r, c]))
                else:
                    ch.append((boxes[r, c], "node", refs2[r, c]))
        ch.sort(key=lambda e: 0 if e[1] == "node" else 1)
        return ch

    def _degenerate_children():
        """Single-leaf scene (_compact_from_raw emits an all-zero n16 row):
        synthesize one leaf child (row 1) with bounds from its triangles."""
        if leaf_rows.shape[0] < 2:
            return []
        tris = leaf_rows[1, 0:108].reshape(12, 9)
        v0, e1, e2 = tris[:, 0:3], tris[:, 3:6], tris[:, 6:9]
        pts = np.concatenate([v0, v0 + e1, v0 + e2])  # NaN-padded entries
        box = np.concatenate(
            [np.nanmin(pts, axis=0), np.nanmax(pts, axis=0)]
        ).astype(np.float32)
        return [(box, "leaf", np.int32(-2))]

    # BFS with consecutive id assignment
    rows_out = []          # per new node: (boxes_list, n_int, base_int, base_leaf)
    queue = [0]            # bvh2 refs, in NEW id order
    next_node = 1
    leaf_src = [0]         # old leaf-row index per new leaf id (0 = dummy)
    qi = 0
    while qi < len(queue):
        n = queue[qi]
        qi += 1
        ch = children8(n)
        if not ch and n == 0:
            ch = _degenerate_children()
        n_int = sum(1 for e in ch if e[1] == "node")
        base_int = next_node
        for e in ch:
            if e[1] == "node":
                queue.append(e[2])
        next_node += n_int
        base_leaf = len(leaf_src)
        for e in ch:
            if e[1] == "leaf":
                leaf_src.append(-e[2])  # old leaf id + 1 == -(ref)
        rows_out.append((ch, n_int, base_int, base_leaf))

    M8 = len(rows_out)
    out = np.zeros((M8, 64), np.float32)
    out[:, 0:48] = np.nan
    wa = np.zeros((M8,), np.int32)
    wb = np.zeros((M8,), np.int32)
    for r, (ch, n_int, base_int, base_leaf) in enumerate(rows_out):
        for ci, (box, _kind, _ref) in enumerate(ch):
            out[r, ci * 6:(ci + 1) * 6] = box
        wa[r] = base_int | (n_int << 26)
        wb[r] = base_leaf
    out[:, 48] = wa.view(np.float32)
    out[:, 49] = wb.view(np.float32)

    # Re-emit leaf rows in new-id order. Encoding: leaf ref r < 0 means old
    # row -r - 1 (ref = -(row + 1), row 1-based with dummy row 0); leaf_src
    # holds -ref = old_row + 1 per new id, so old_row = leaf_src - 1.
    src = np.asarray(leaf_src, np.int64) - 1  # -1 = dummy slot
    lr = leaf_rows[np.maximum(src, 0)]        # fancy index -> fresh copy
    lr[0] = 0.0
    if return_src:
        return out, np.ascontiguousarray(lr), src
    return out, np.ascontiguousarray(lr)
