"""Stress-scene frame breakdown on the real TPU.

Answers "where do the stress frame's milliseconds go" with distinct-input
timing (the axon relay memoizes identical dispatches): camera / bounce /
shadow traversal wavefronts in isolation, then full render steps at
increasing bounce counts to price the direct-lighting + accumulation mass.

Usage: python benchmarks/profile_stress.py [--height 1080] [--bounces 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_varied(make_fn, variants):
    import jax

    out = make_fn(variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for v in variants[1:]:
        out = make_fn(v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (len(variants) - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.accel.build import build_bvh
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.ops.pixel_order import pixel_coords
    from hiprt_pt_tpu.render.renderer import Renderer

    H = args.height
    W = (H * 16 // 9 // 128) * 128  # pallas-divisible width
    N = W * H
    scene, camera = load_stress_scene(aspect=W / H)
    bvh = scene.bvh if hasattr(scene, "bvh") else None
    if bvh is None:
        bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    print(
        f"stress: {scene.triangles.shape[0]} tris, "
        f"bvh2 {bvh.nodes16.shape if bvh.nodes16 is not None else None} "
        f"bvh4 {bvh.nodes4.shape if bvh.nodes4 is not None else None}, "
        f"{W}x{H} = {N} rays", flush=True,
    )

    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=args.bounces,
    )
    from hiprt_pt_tpu.render.integrator import _make_tracers

    closest_coh, occluded_coh = _make_tracers(opts, coherent=True)
    closest_inc, occluded_inc = _make_tracers(opts, coherent=False)

    px, py = pixel_coords(W, H)
    jitter = jnp.full((N, 2), 0.5)
    o_cam, d_cam = generate_camera_rays(camera, W, H, jitter, px, py)

    def variants_for(o, k):
        return [o + 1e-5 * (i + 1) for i in range(k)]

    it = args.iters

    cam_f = jax.jit(lambda o: closest_coh(bvh, o, d_cam, t_min=0.0).t)
    dt = timeit_varied(cam_f, variants_for(o_cam, it + 1))
    print(f"camera closest (wide)  : {dt*1e3:8.1f} ms  {N/dt/1e6:6.2f} Mrays/s",
          flush=True)
    rec_t = cam_f(o_cam)
    p_hit = o_cam + d_cam * jnp.where(jnp.isfinite(rec_t), rec_t, 0.0)[:, None]

    k2 = jax.random.PRNGKey(7)
    d_diff = jax.random.normal(k2, (N, 3))
    d_diff = d_diff / jnp.linalg.norm(d_diff, axis=1, keepdims=True)

    bounce_f = jax.jit(
        lambda o: closest_inc(bvh, o, d_diff, t_min=1e-3).t
    )
    dt = timeit_varied(bounce_f, variants_for(p_hit, it + 1))
    print(f"bounce closest (stream): {dt*1e3:8.1f} ms  {N/dt/1e6:6.2f} Mrays/s",
          flush=True)

    # shadow rays toward random emitters (the RIS winner regime)
    ne = scene.emissive_tri_indices.shape[0]
    li = jax.random.randint(k2, (N,), 0, ne)
    tri = scene.triangles[scene.emissive_tri_indices[li]]
    lp = scene.vertices[tri[:, 0]]
    wi = lp - p_hit
    dist = jnp.linalg.norm(wi, axis=1, keepdims=True)
    wi = wi / jnp.maximum(dist, 1e-6)
    shadow_f = jax.jit(
        lambda o: occluded_inc(
            bvh, o, wi, t_min=1e-3, t_max=dist[:, 0] * 0.999
        )
    )
    dt = timeit_varied(shadow_f, variants_for(p_hit, it + 1))
    print(f"shadow anyhit (stream) : {dt*1e3:8.1f} ms  {N/dt/1e6:6.2f} Mrays/s",
          flush=True)

    # full frames at increasing bounce counts
    r = Renderer(scene, camera, W, H, options=opts, bvh=bvh)
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    prev = None
    for nb in range(0, args.bounces + 1):
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(nb), samples_per_frame=jnp.int32(1)
        )
        r.step(block=True)
        t0 = time.perf_counter()
        for _ in range(2):
            r.step()
        jax.block_until_ready(r.state.accum)
        dt = (time.perf_counter() - t0) / 2
        marginal = "" if prev is None else f"  (+{(dt-prev)*1e3:7.1f} ms)"
        print(f"full step nb_bounces={nb}: {dt*1e3:8.1f} ms{marginal}",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
