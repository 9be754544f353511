"""Round-4 combined TPU probe: compaction-gather cost, lane8s on the
hybrid-collapse BVH, and the full-frame effect of greedy collapse +
active-compaction + per-chunk dead-wave skip.

Run ALONE on the TPU:  python benchmarks/r4probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hiprt_pt_tpu.utils.precompile import enable_persistent_cache


def main():
    enable_persistent_cache()
    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.accel.build import build_bvh
    from hiprt_pt_tpu.ops import pallas_traverse as pt

    # ---- 1. gather/scatter micro-bench at the 1080p wavefront size ----
    n = 1920 * 1080
    key = jax.random.PRNGKey(3)
    x3 = jax.random.normal(key, (n, 3), jnp.float32)
    act = jax.random.uniform(jax.random.PRNGKey(4), (n,)) < 0.4

    @jax.jit
    def compact_roundtrip(x3, act):
        a = act.astype(jnp.int32)
        ra = jnp.cumsum(a) - 1
        ri = jnp.cumsum(1 - a) - 1 + jnp.sum(a)
        pos = jnp.where(act, ra, ri).astype(jnp.int32)
        perm = jnp.zeros((n,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32))
        g = x3[perm]
        back = g[pos]
        return back

    r = compact_roundtrip(x3, act)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(5):
        r = compact_roundtrip(x3 + i * 1e-6, act)
        jax.block_until_ready(r)
    print(f"compact perm+gather3+scatter3 roundtrip @2.07M: "
          f"{(time.perf_counter() - t0) / 5 * 1e3:.2f} ms", flush=True)

    # ---- 2. lane8s on the hybrid-collapse BVH ----
    scene, cam = load_stress_scene(aspect=16 / 9)
    verts = np.asarray(scene.vertices)
    bvh = build_bvh(verts, np.asarray(scene.triangles))
    print(f"BVH: nodes_lane8 {bvh.nodes_lane8.shape} depth "
          f"{bvh.lane8_depth}", flush=True)
    nk = 256 * 1024
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    rays = []
    for k in jax.random.split(jax.random.PRNGKey(7), 4):
        k1, k2 = jax.random.split(k)
        o = jax.random.uniform(k1, (nk, 3), jnp.float32,
                               minval=jnp.asarray(lo * 0.8),
                               maxval=jnp.asarray(hi * 0.8))
        d = jax.random.normal(k2, (nk, 3), jnp.float32)
        rays.append((o, d / jnp.linalg.norm(d, axis=1, keepdims=True)))
    tmin = jnp.full((nk,), 1e-4, jnp.float32)
    tmax = jnp.full((nk,), jnp.inf, jnp.float32)
    one = jnp.ones((nk,), jnp.float32)
    for any_hit, kw in ((False, dict(window=16)), (True, dict(window=32))):
        recw, st = pt.traverse_pallas_lane8s(
            bvh, rays[0][0], rays[0][1], tmin, tmax, one, any_hit=any_hit,
            return_stats=True, **kw)
        jax.block_until_ready(recw.t)
        recw = pt.traverse_pallas_lane8s(
            bvh, rays[0][0], rays[0][1], tmin, tmax, one, any_hit=any_hit,
            **kw)
        jax.block_until_ready(recw.t)
        t0 = time.perf_counter()
        for i in range(1, 4):
            r2 = pt.traverse_pallas_lane8s(
                bvh, rays[i][0], rays[i][1], tmin, tmax, one,
                any_hit=any_hit, **kw)
            jax.block_until_ready(r2.t)
        dt = (time.perf_counter() - t0) / 3
        st = np.asarray(st)
        print(f"lane8s {'ah' if any_hit else 'cl'} hybrid-bvh: "
              f"{dt * 1e3:7.1f} ms ({nk / dt / 1e6:5.2f} Mrays/s) "
              f"iters={st[0, 0]} lr={st[0, 3]}", flush=True)

    # ---- 3. full-frame: stress 1080p RIS, 4 bounces (bench headline) ----
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, 1920, 1080, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(4)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE)))
    r.fuse_frame = True
    r.step(block=True)
    rays0 = float(jax.device_get(r.state.rays_traced))
    t0 = time.perf_counter()
    r.step(block=True)
    dt = time.perf_counter() - t0
    rays1 = float(jax.device_get(r.state.rays_traced))
    print(f"frame (4-sample fused): {dt * 1e3:.0f} ms  "
          f"{(rays1 - rays0) / dt / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
