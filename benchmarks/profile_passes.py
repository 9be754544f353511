"""Per-pass timing breakdown on the real device (VERDICT round-1 Weak #8).

The reference times every kernel with GPU events (GPUKernel.cpp:180-189).
Here each pass is jitted separately and timed with block_until_ready deltas.

Usage: python benchmarks/profile_passes.py [--res 1024] [--scene path]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=3, warmup=1, **kw):
    import jax

    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument(
        "--scene", default="/root/reference/data/GLTFs/cornell_pbr.gltf"
    )
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--full-bsdf", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.assets.gltf import load_gltf
    from hiprt_pt_tpu.assets.scene import build_scene
    from hiprt_pt_tpu.accel.build import build_bvh
    from hiprt_pt_tpu.core.material import MaterialBank
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        BSDFOverride,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.ops.traverse import traverse, traverse_packets
    from hiprt_pt_tpu.render.renderer import Renderer

    W = H = args.res
    N = W * H
    parsed = load_gltf(args.scene, aspect_override=1.0)
    scene = build_scene(
        parsed.vertices, parsed.triangles, parsed.material_ids,
        MaterialBank.from_rows(parsed.material_rows),
        normals=parsed.normals, uvs=parsed.uvs,
    )
    bvh = build_bvh(np.asarray(parsed.vertices), np.asarray(parsed.triangles))
    print(f"scene: {parsed.triangles.shape[0]} tris, bvh {bvh.nodes.shape}")
    dev = jax.devices()[0]
    print(f"device: {dev}, N = {N} rays ({W}x{H})")

    key = jax.random.PRNGKey(0)

    # --- coherent camera-like rays (one origin, tile-coherent dirs) ---
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pixel_order import pixel_coords

    px, py = pixel_coords(W, H)
    jitter = jnp.full((N, 2), 0.5)
    o_cam, d_cam = generate_camera_rays(parsed.camera, W, H, jitter, px, py)

    dt, rec = timeit(
        lambda: traverse_packets(bvh, o_cam, d_cam, any_hit=False)
    )
    hitrate = float(jnp.mean((rec.prim >= 0).astype(jnp.float32)))
    print(f"camera packet traverse : {dt*1e3:8.2f} ms  "
          f"({N/dt/1e6:7.1f} Mrays/s, hit {hitrate:.2f})")

    # --- incoherent bounce-like rays: random origins inside the box, random
    # dirs (worst case for packet union walks) ---
    k1, k2 = jax.random.split(key)
    lo = jnp.min(bvh.nodes[0, 0:3], axis=0)
    o_inc = jax.random.uniform(k1, (N, 3), minval=-1.0, maxval=1.0)
    d_inc = jax.random.normal(k2, (N, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=1, keepdims=True)

    dt, _ = timeit(lambda: traverse_packets(bvh, o_inc, d_inc, any_hit=False))
    print(f"incoher packet traverse: {dt*1e3:8.2f} ms  ({N/dt/1e6:7.1f} Mrays/s)")

    # tile-coherent bounce rays (diffuse bounce from camera hits: same tile
    # origins, cosine dirs) — the realistic secondary-ray regime
    p_hit = o_cam + d_cam * jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)[:, None]
    d_diff = jax.random.normal(k2, (N, 3))
    d_diff = d_diff / jnp.linalg.norm(d_diff, axis=1, keepdims=True)
    dt, _ = timeit(
        lambda: traverse_packets(bvh, p_hit, d_diff, t_min=1e-3, any_hit=False)
    )
    print(f"diffuse packet traverse: {dt*1e3:8.2f} ms  ({N/dt/1e6:7.1f} Mrays/s)")

    # any-hit shadow rays toward one light point
    light_p = jnp.array([0.0, 1.9, 0.0])
    wi = light_p[None, :] - p_hit
    dist = jnp.linalg.norm(wi, axis=1, keepdims=True)
    wi = wi / jnp.maximum(dist, 1e-6)
    dt, _ = timeit(
        lambda: traverse_packets(
            bvh, p_hit, wi, t_min=1e-3, t_max=dist[:, 0] * 0.999, any_hit=True
        )
    )
    print(f"shadow any-hit traverse: {dt*1e3:8.2f} ms  ({N/dt/1e6:7.1f} Mrays/s)")

    # --- BSDF eval cost (no traversal) ---
    from hiprt_pt_tpu.models.dispatcher import bsdf_eval, bsdf_sample
    from hiprt_pt_tpu.core import rng as rng_mod

    opts_pbr = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=args.bounces,
    )
    opts_on = RenderOptions(
        bsdf_override=BSDFOverride.OREN_NAYAR,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=args.bounces,
    )
    mats = scene.materials.at_indices(jnp.zeros((N,), jnp.int32)).make_safe()
    ns = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (N, 1))
    wo = d_diff
    rng = rng_mod.seed(jnp.arange(N, dtype=jnp.uint32), 0, 42)

    f_on = jax.jit(lambda m, n, o_, w: bsdf_eval(opts_on, m, n, o_, w, None))
    dt, _ = timeit(f_on, mats, ns, wo, d_cam)
    print(f"bsdf eval (oren-nayar) : {dt*1e3:8.2f} ms")
    f_pbr = jax.jit(lambda m, n, o_, w: bsdf_eval(opts_pbr, m, n, o_, w, None))
    dt, _ = timeit(f_pbr, mats, ns, wo, d_cam)
    print(f"bsdf eval (principled) : {dt*1e3:8.2f} ms")
    s_pbr = jax.jit(lambda m, n, o_, r: bsdf_sample(opts_pbr, m, n, o_, r, None))
    dt, _ = timeit(s_pbr, mats, ns, wo, rng)
    print(f"bsdf sample (principl.): {dt*1e3:8.2f} ms")

    # --- full render step, oren-nayar and principled ---
    for label, o in (("oren-nayar", opts_on), ("principled", opts_pbr)):
        r = Renderer(scene, parsed.camera, W, H, options=o, bvh=bvh)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(args.bounces), samples_per_frame=jnp.int32(1)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        r.step(block=True)  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            r.step()
        jax.block_until_ready(r.state.accum)
        dt = (time.perf_counter() - t0) / 3
        rays = float(jax.device_get(r.state.rays_traced)) / (
            float(jax.device_get(r.state.sample_count))
        )
        print(f"full step ({label:10s}): {dt*1e3:8.2f} ms  "
              f"({rays/dt/1e6:7.1f} Mrays/s at {rays/N:.1f} rays/px)")


if __name__ == "__main__":
    main()
