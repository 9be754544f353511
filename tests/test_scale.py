"""Million-triangle scale: routing gates, table caps, and traversal
correctness at scale (VERDICT r2 #4; reference anchor: arbitrary-size BVH
build, src/HIPRT-Orochi/HIPRTScene.h:60-92).

The full 1.63M-tri exactness + throughput proof runs on the TPU
(benchmarks/scale_1p6m.py — results recorded in ROUND3.md); here the
CPU-affordable part: a ~470k-tri build must stay inside every lane8 cap,
its XLA traversal must match brute force on sampled rays, and the routing
gates must degrade in the designed order (lane8s -> lane8log ->
stream8l/XLA) as caps shrink."""

import numpy as np
import pytest

from hiprt_pt_tpu.accel.build import build_bvh


@pytest.fixture(scope="module")
def big_scene():
    from hiprt_pt_tpu.assets.stress import generate_stress_scene

    p = generate_stress_scene(tri_scale=3.0, texture_size=32)
    bvh = build_bvh(np.asarray(p.vertices), np.asarray(p.triangles))
    return p, bvh


def test_scale_caps_and_tables(big_scene):
    from hiprt_pt_tpu.ops import pallas_traverse as pt

    p, bvh = big_scene
    n_tris = p.triangles.shape[0]
    assert n_tris > 400_000
    # inside every lane8 cap at this scale
    assert bvh.nodes_lane8 is not None
    assert bvh.nodes_lane8.shape[0] <= pt.MAX_LANE8_NODES
    assert bvh.leaves_lane8.size <= pt.MAX_LANE8_LEAF_BYTES
    assert pt.lane8s_tables_ok(bvh, 1024)
    # r5: lane8s's old 14-bit packed-leaf-ref cap (16384 leaves, ~1.45M
    # tris) was lifted — base_leaf's high bits ride the stack mask plane —
    # so the 1.63M-tri config (tri_scale=11) now routes to lane8s ITSELF;
    # the remaining caps are the node count and a VMEM estimate
    est_leaves_1p6m = int(1_634_912 / (n_tris / bvh.leaves_lane8.shape[0]))
    assert est_leaves_1p6m > 16384  # past the OLD cap...
    import jax.numpy as jnp
    big = bvh.replace(leaves_lane8=jnp.zeros(
        (est_leaves_1p6m, 1808), jnp.int8))  # 12-bit W at auto scale
    assert pt.lane8s_tables_ok(big, 1024)  # ...still lane8s in r5
    assert est_leaves_1p6m * bvh.leaves_lane8.shape[1] \
        <= pt.MAX_LANE8_LEAF_BYTES  # lane8log also remains in cap


def test_scale_traversal_matches_bruteforce(big_scene):
    """XLA packet traversal vs O(N) brute force on 64 sampled rays at
    ~470k tris — the oracle anchor every Pallas kernel is tested against
    transfers to scale."""
    import jax.numpy as jnp

    from hiprt_pt_tpu.ops.intersect import brute_force_closest
    from hiprt_pt_tpu.ops.traverse import closest_hit_coherent

    p, bvh = big_scene
    rng = np.random.default_rng(5)
    # rays from inside the hall in random directions
    o = np.stack([
        rng.uniform(-8, 8, 64), rng.uniform(0.5, 5.0, 64),
        rng.uniform(-4, 4, 64),
    ], axis=-1).astype(np.float32)
    z = rng.uniform(-1, 1, 64).astype(np.float32)
    phi = rng.uniform(0, 2 * np.pi, 64).astype(np.float32)
    rxy = np.sqrt(np.maximum(1 - z * z, 0))
    d = np.stack([rxy * np.cos(phi), rxy * np.sin(phi), z], -1).astype(
        np.float32)
    rec = closest_hit_coherent(bvh, jnp.asarray(o), jnp.asarray(d),
                               t_min=0.0)
    # brute force in ray chunks — the (rays, 470k-tri) intermediates are
    # ~120 MB per chunk of 8
    t_chunks, p_chunks = [], []
    for s in range(0, 64, 8):
        t_c, p_c, _, _ = brute_force_closest(
            p.vertices, p.triangles, jnp.asarray(o[s:s + 8]),
            jnp.asarray(d[s:s + 8]), t_min=0.0)
        t_chunks.append(np.asarray(t_c))
        p_chunks.append(np.asarray(p_c))
    t_b = np.concatenate(t_chunks)
    prim_b = np.concatenate(p_chunks)
    assert np.array_equal(np.asarray(rec.prim), prim_b)
    m = prim_b >= 0
    assert np.allclose(np.asarray(rec.t)[m], t_b[m], rtol=1e-5)


def test_routing_gates_degrade_in_order(big_scene, monkeypatch):
    """Past each cap the dispatch must fall to the next designed backend,
    never error: lane8s (packed refs) -> lane8log (node/leaf caps) ->
    stream8l -> XLA."""
    from hiprt_pt_tpu.ops import pallas_traverse as pt

    _, bvh = big_scene
    # force a TPU-backend answer from the structural gates
    monkeypatch.setattr(pt.jax, "default_backend", lambda: "tpu")
    assert pt.pallas_lane8s_supported(bvh, 1024)
    assert pt.pallas_lane8_supported(bvh, 1024)

    # shrink the lane8s packed-ref cap below this scene: lane8s trips,
    # lane8log (different caps) still stands
    monkeypatch.setattr(pt, "L8S_MAX_PACK", 64)
    assert not pt.pallas_lane8s_supported(bvh, 1024)
    assert pt.pallas_lane8_supported(bvh, 1024)

    # shrink the lane8 node/leaf caps: lane8log trips too
    monkeypatch.setattr(pt, "MAX_LANE8_NODES", 8)
    monkeypatch.setattr(pt, "MAX_LANE8_LEAF_BYTES", 8)
    assert not pt.pallas_lane8_supported(bvh, 1024)
    # stream8l only needs the BVH8-linear tables
    assert bvh.nodes8l is not None


@pytest.mark.slow
def test_lane8s_beyond_old_leaf_cap():
    """r5 plane-B packed-leaf-ref regression: leaf refs >= 16384 park their
    high bits in the stack's mask plane; the pop-off test must ignore those
    bits (a bug here livelocked the walk into iter_cap truncation — caught
    as 0.78 prim agreement at 32k leaves)."""
    import jax.numpy as jnp

    from hiprt_pt_tpu.ops import pallas_traverse as pt
    from hiprt_pt_tpu.ops.traverse import closest_hit

    rng = np.random.default_rng(11)
    ntri = 70_000
    c = rng.uniform(-1, 1, (ntri, 3)).astype(np.float32)
    v = (c[:, None, :] + rng.uniform(-0.01, 0.01, (ntri, 3, 3))
         ).astype(np.float32)
    verts = v.reshape(-1, 3)
    tris = np.arange(ntri * 3).reshape(-1, 3).astype(np.int32)
    bvh = build_bvh(verts, tris, lane8_leaf_tris=4, leaf_bits=12)
    assert bvh.leaves_lane8.shape[0] > 16384, bvh.leaves_lane8.shape
    n = 2048
    o = jnp.asarray(rng.uniform(-1.1, 1.1, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    ref = closest_hit(bvh, o, d)
    rec, st = pt.traverse_pallas_lane8s(bvh, o, d, interpret=True,
                                        return_stats=True)
    st = np.asarray(st)
    assert int(st[0, 1]) == 4096  # every lane finished (no cap truncation)
    p1, p2 = np.asarray(rec.prim), np.asarray(ref.prim)
    assert np.mean(p1 == p2) > 0.99
    mm = (p2 >= 0) & (p1 == p2)
    assert np.allclose(np.asarray(rec.t)[mm], np.asarray(ref.t)[mm],
                       rtol=1e-4)
