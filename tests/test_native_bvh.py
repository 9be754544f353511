"""Native C++ BVH builder vs numpy builder (reference: HIPRT native build)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.accel.build import build_bvh
from hiprt_pt_tpu.accel.native import build_bvh_native
from hiprt_pt_tpu.ops.intersect import brute_force_closest
from hiprt_pt_tpu.ops.traverse import closest_hit


def _random_tris(n, rng):
    c = rng.uniform(-2, 2, (n, 1, 3))
    tri = c + rng.normal(0, 0.3, (n, 3, 3))
    return tri.reshape(-1, 3).astype(np.float32), np.arange(3 * n, dtype=np.int32).reshape(n, 3)


def test_native_available_and_correct(rng_np):
    verts, tris = _random_tris(500, rng_np)
    rows = build_bvh_native(verts, tris)
    assert rows is not None, "native builder failed to compile/run"
    bvh = build_bvh(verts, tris)  # wrapper attaches tri_rows
    nrays = 256
    o = rng_np.uniform(-4, 4, (nrays, 3)).astype(np.float32)
    d = rng_np.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rec = closest_hit(bvh, jnp.asarray(o), jnp.asarray(d), t_min=0.0)
    bt, bp, _, _ = brute_force_closest(
        jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d), t_min=0.0
    )
    assert np.array_equal(np.asarray(rec.prim) >= 0, np.asarray(bp) >= 0)
    m = np.asarray(bp) >= 0
    assert np.allclose(np.asarray(rec.t)[m], np.asarray(bt)[m], rtol=1e-4)


def test_build_bvh_uses_native_by_default(cornell_scene, rng_np):
    scene, camera = cornell_scene
    bvh_native = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    bvh_py = build_bvh(
        np.asarray(scene.vertices), np.asarray(scene.triangles), use_native=False
    )
    # same traversal RESULTS (trees may differ in partition tie-breaks)
    from hiprt_pt_tpu.core.camera import generate_camera_rays

    o, d = generate_camera_rays(camera, 24, 24)
    r1 = closest_hit(bvh_native, o, d, t_min=0.0)
    r2 = closest_hit(bvh_py, o, d, t_min=0.0)
    assert np.array_equal(np.asarray(r1.prim) >= 0, np.asarray(r2.prim) >= 0)
    m = np.asarray(r2.prim) >= 0
    assert np.allclose(np.asarray(r1.t)[m], np.asarray(r2.t)[m], rtol=1e-4)


def test_native_speedup(rng_np):
    """The C++ builder should beat numpy comfortably on larger scenes."""
    import time

    verts, tris = _random_tris(100_000, rng_np)
    t0 = time.perf_counter()
    rows = build_bvh_native(verts, tris)
    t_native = time.perf_counter() - t0
    assert rows is not None
    t0 = time.perf_counter()
    build_bvh(verts, tris, use_native=False)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
