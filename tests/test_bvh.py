"""BVH build + traversal vs the brute-force oracle (the reference's analog:
CPU octree BVH as second implementation, src/Renderer/BVH.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.accel.build import build_bvh
from hiprt_pt_tpu.ops.intersect import brute_force_closest
from hiprt_pt_tpu.ops.traverse import closest_hit, occluded


def random_tris(n, rng, spread=2.0):
    c = rng.uniform(-spread, spread, (n, 1, 3))
    tri = c + rng.normal(0, 0.3, (n, 3, 3))
    verts = tri.reshape(-1, 3).astype(np.float32)
    tris = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return verts, tris


@pytest.mark.parametrize("ntri", [1, 7, 100, 1000])
def test_traversal_matches_bruteforce(ntri, rng_np):
    verts, tris = random_tris(ntri, rng_np)
    bvh = build_bvh(verts, tris)
    nrays = 256
    o = rng_np.uniform(-4, 4, (nrays, 3)).astype(np.float32)
    d = rng_np.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0)
    bt, bp, _, _ = brute_force_closest(
        jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d),
        t_min=0.0,
    )
    t, p = np.asarray(rec.t), np.asarray(rec.prim)
    bt, bp = np.asarray(bt), np.asarray(bp)
    assert np.array_equal(p >= 0, bp >= 0)
    m = bp >= 0
    assert np.allclose(t[m], bt[m], rtol=1e-4, atol=1e-5)


def test_anyhit_consistent_with_closest(rng_np):
    verts, tris = random_tris(300, rng_np)
    bvh = build_bvh(verts, tris)
    nrays = 512
    o = rng_np.uniform(-4, 4, (nrays, 3)).astype(np.float32)
    d = rng_np.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0)
    occ = occluded(bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0)
    assert np.array_equal(np.asarray(occ), np.asarray(rec.prim) >= 0)


def test_tmax_respected(rng_np):
    verts, tris = random_tris(200, rng_np)
    bvh = build_bvh(verts, tris)
    o = rng_np.uniform(-4, 4, (128, 3)).astype(np.float32)
    d = rng_np.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rec_full = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0)
    t_full = np.asarray(rec_full.t)
    rec_lim = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0, t_max=1.0)
    t_lim = np.asarray(rec_lim.t)
    hits_lim = np.asarray(rec_lim.prim) >= 0
    assert np.all(t_lim[hits_lim] <= 1.0 + 1e-6)
    # every limited hit must exist in full trace with same t
    assert np.allclose(t_lim[hits_lim], t_full[hits_lim], rtol=1e-5)


def test_active_mask(rng_np):
    verts, tris = random_tris(50, rng_np)
    bvh = build_bvh(verts, tris)
    o = np.zeros((64, 3), np.float32)
    d = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (64, 1))
    active = np.zeros(64, bool)
    active[::2] = True
    rec = closest_hit(
        bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0, active=jnp.asarray(active)
    )
    assert np.all(np.asarray(rec.prim)[~active] == -1)


def test_cornell_traversal(cornell_scene):
    scene, camera = cornell_scene
    from hiprt_pt_tpu.core.camera import generate_camera_rays

    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    o, d = generate_camera_rays(camera, 24, 24)
    rec = closest_hit(bvh, o, d, t_min=0.0)
    bt, bp, _, _ = brute_force_closest(scene.vertices, scene.triangles, o, d, t_min=0.0)
    assert np.array_equal(np.asarray(rec.prim) >= 0, np.asarray(bp) >= 0)
    m = np.asarray(bp) >= 0
    assert np.allclose(np.asarray(rec.t)[m], np.asarray(bt)[m], rtol=1e-4)


def test_packet_traversal_matches_per_ray(cornell_scene):
    """Packet traversal must produce identical hits to per-ray traversal."""
    import jax.numpy as jnp
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.traverse import closest_hit_coherent, occluded, occluded_coherent

    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    o, d = generate_camera_rays(camera, 32, 16)  # 512 rays = 8 packets
    rec_p = closest_hit_coherent(bvh, o, d, t_min=0.0)
    rec_r = closest_hit(bvh, o, d, t_min=0.0)
    assert np.array_equal(np.asarray(rec_p.prim), np.asarray(rec_r.prim))
    m = np.asarray(rec_r.prim) >= 0
    assert np.allclose(np.asarray(rec_p.t)[m], np.asarray(rec_r.t)[m], rtol=1e-5)
    # any-hit consistency
    occ_p = occluded_coherent(bvh, o, d, t_min=0.0)
    occ_r = occluded(bvh, o, d, t_min=0.0)
    assert np.array_equal(np.asarray(occ_p), np.asarray(occ_r))


def test_packet_traversal_active_mask(cornell_scene):
    import jax.numpy as jnp
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.traverse import closest_hit_coherent

    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    o, d = generate_camera_rays(camera, 32, 16)
    active = np.zeros(512, bool); active[::3] = True
    rec = closest_hit_coherent(bvh, o, d, t_min=0.0, active=jnp.asarray(active))
    assert np.all(np.asarray(rec.prim)[~active] == -1)


def test_pallas_traversal_matches_xla(cornell_scene):
    """Experimental Pallas VMEM-resident traversal (interpreter mode) must
    produce identical hits to the XLA traversal."""
    import jax.numpy as jnp
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pallas_traverse import traverse_pallas

    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    o, d = generate_camera_rays(camera, 64, 32)  # 2048 rays = 2 programs
    rec_p = traverse_pallas(bvh, o, d, t_min=0.0, interpret=True)
    rec_r = closest_hit(bvh, o, d, t_min=0.0)
    assert np.array_equal(np.asarray(rec_p.prim), np.asarray(rec_r.prim))
    m = np.asarray(rec_r.prim) >= 0
    assert np.allclose(np.asarray(rec_p.t)[m], np.asarray(rec_r.t)[m], rtol=1e-5)
    # any-hit variant
    rec_a = traverse_pallas(bvh, o, d, t_min=0.0, any_hit=True, interpret=True)
    assert np.array_equal(np.asarray(rec_a.prim) >= 0, m)


def test_lane8log_traversal_matches_xla(cornell_scene):
    """Completion-log lane8 variant (v8): windowless refill, prefix-sum
    rank via log-step rolls, 8-row ray chunks with activity in sign(tmax).
    Must agree with XLA traversal; inactive rays must come back as misses;
    non-default `lanes` must produce identical results."""
    import jax.numpy as jnp
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pallas_traverse import traverse_pallas_lane8log
    from hiprt_pt_tpu.ops.traverse import occluded

    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    assert bvh.lane8_frame is not None
    o, d = generate_camera_rays(camera, 32, 16)  # 512 rays
    rec_r = closest_hit(bvh, o, d, t_min=0.0)
    p_r = np.asarray(rec_r.prim)
    m = p_r >= 0
    for lanes in (1024, 256):
        rec_p = traverse_pallas_lane8log(bvh, o, d, t_min=0.0,
                                         interpret=True, lanes=lanes)
        assert np.mean(p_r == np.asarray(rec_p.prim)) > 0.999
        assert np.allclose(np.asarray(rec_p.t)[m], np.asarray(rec_r.t)[m],
                           rtol=1e-4)
    occ_r = np.asarray(occluded(bvh, o, d, t_min=0.0))
    rec_a = traverse_pallas_lane8log(bvh, o, d, t_min=0.0, any_hit=True,
                                     interpret=True)
    assert np.array_equal(occ_r, np.asarray(rec_a.prim) >= 0)
    # inactive rays must be reported as misses
    active = np.zeros(512, bool); active[::5] = True
    rec_m = traverse_pallas_lane8log(bvh, o, d, t_min=0.0,
                                     active=jnp.asarray(active),
                                     interpret=True)
    pm = np.asarray(rec_m.prim)
    assert np.all(pm[~active] == -1)
    assert np.mean(pm[active] == p_r[active]) > 0.999


def test_lane8s_traversal_matches_xla(cornell_scene):
    """Sublane-grouped lane8 variant (v10): 8 rays per lane-column,
    static-strided windowed refill (no rank/completion log), compressed
    one-entry-per-level stack. Must agree with XLA traversal across lane
    widths; inactive rays must come back as misses."""
    import jax.numpy as jnp
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pallas_traverse import (
        lane8s_tables_ok, traverse_pallas_lane8s)
    from hiprt_pt_tpu.ops.traverse import occluded

    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    assert lane8s_tables_ok(bvh, 512)
    o, d = generate_camera_rays(camera, 32, 16)  # 512 rays
    rec_r = closest_hit(bvh, o, d, t_min=0.0)
    p_r = np.asarray(rec_r.prim)
    m = p_r >= 0
    for lanes in (512, 256):
        rec_p = traverse_pallas_lane8s(bvh, o, d, t_min=0.0,
                                       interpret=True, lanes=lanes)
        assert np.mean(p_r == np.asarray(rec_p.prim)) > 0.999
        assert np.allclose(np.asarray(rec_p.t)[m], np.asarray(rec_r.t)[m],
                           rtol=1e-4)
    occ_r = np.asarray(occluded(bvh, o, d, t_min=0.0))
    rec_a = traverse_pallas_lane8s(bvh, o, d, t_min=0.0, any_hit=True,
                                   interpret=True)
    assert np.array_equal(occ_r, np.asarray(rec_a.prim) >= 0)
    # inactive rays must be reported as misses
    active = np.zeros(512, bool); active[::5] = True
    rec_m = traverse_pallas_lane8s(bvh, o, d, t_min=0.0,
                                   active=jnp.asarray(active),
                                   interpret=True)
    pm = np.asarray(rec_m.prim)
    assert np.all(pm[~active] == -1)
    assert np.mean(pm[active] == p_r[active]) > 0.999


def test_lane8s_multi_generation(cornell_scene):
    """A wavefront larger than one resident-lane generation (n > 8*lanes)
    must round-trip through the static-strided refill windows exactly."""
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pallas_traverse import traverse_pallas_lane8s

    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    o, d = generate_camera_rays(camera, 96, 48)  # 4608 rays > 8*512
    rec_r = closest_hit(bvh, o, d, t_min=0.0)
    p_r = np.asarray(rec_r.prim)
    m = p_r >= 0
    rec_s = traverse_pallas_lane8s(bvh, o, d, t_min=0.0, interpret=True)
    assert np.mean(p_r == np.asarray(rec_s.prim)) > 0.999
    assert np.allclose(np.asarray(rec_s.t)[m], np.asarray(rec_r.t)[m],
                       rtol=1e-4)

