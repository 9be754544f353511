"""A/B the RIS winner visibility ray's traversal backend now that light
candidates are tile-coherent: lane8s (incoherent default) vs the wide
packet kernel (coherent camera default) on REAL winner rays from the
stress G-buffer. Run ALONE on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    width, height = (1920, 1080) if len(sys.argv) < 3 else (
        int(sys.argv[1]), int(sys.argv[2]))
    n = width * height

    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core import rng as rng_mod
    from hiprt_pt_tpu.core.settings import (
        LightSamplingStrategy, RenderOptions)
    from hiprt_pt_tpu.render.renderer import Renderer
    from hiprt_pt_tpu.render.integrator import camera_rays_pass
    from hiprt_pt_tpu.lights.light_sampling import sample_emissive_triangle
    from hiprt_pt_tpu.ops.intersect import offset_ray_origin
    from hiprt_pt_tpu.ops import pallas_traverse as pt

    scene, cam = load_stress_scene(aspect=width / height)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, width, height, options=opts)
    bvh = r.bvh
    pix = jnp.arange(n, dtype=jnp.uint32)
    rngs0 = rng_mod.seed(pix, r.state.sample_count, r.state.seed)
    _, gb, pixel_active = jax.jit(
        lambda st, c, s, rg: camera_rays_pass(
            scene, bvh, c, s, st, width, height, st.sample_count, rg, opts)
    )(r.state, r.camera, r.settings, rngs0)
    jax.block_until_ready(gb.position)
    active = (gb.prim_index >= 0) & pixel_active

    # tile-coherent light target (the post-WRS winner is one of <=5 such
    # draws per tile; one draw is a fair coherence proxy)
    _, ls = jax.jit(lambda rg: sample_emissive_triangle(
        scene, gb.position, rg, tile_size=128))(rngs0)
    so = offset_ray_origin(gb.position, gb.geometric_normal, ls["wi"])
    wi, dist = ls["wi"], ls["dist"]
    jax.block_until_ready(so)

    def timeit(label, fn):
        out = fn(jnp.uint32(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for i in range(1, reps + 1):
            out = fn(jnp.uint32(i))
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:40s} {dt * 1e3:9.1f} ms", flush=True)
        return out

    tmax = dist * (1.0 - 1e-3)

    lane8s = jax.jit(lambda salt: pt.traverse_pallas_lane8s(
        bvh, so, wi,
        jnp.full((n,), 1e-4, jnp.float32) + 0.0 * salt.astype(jnp.float32),
        tmax, active, any_hit=True, lanes=512, window=16).prim >= 0)
    wide = jax.jit(lambda salt: pt.traverse_pallas_wide(
        bvh, so, wi,
        jnp.full((n,), 1e-4, jnp.float32) + 0.0 * salt.astype(jnp.float32),
        tmax, active, any_hit=True).prim >= 0)

    a = timeit("lane8s any-hit (tile-coherent shadow)", lane8s)
    b = timeit("wide packet any-hit (same rays)", wide)
    import numpy as np
    am, bm = np.asarray(a), np.asarray(b)
    print("agreement:", float(np.mean(am == bm)), flush=True)

    # --- bounce-1 shape: origins scattered by one cosine bounce, targets
    # still tile-coherent ---
    from hiprt_pt_tpu.ops.sampling import sample_cosine_hemisphere

    rngs1 = rngs0 + jnp.uint32(7)
    rngs1, u1 = rng_mod.next_float(rngs1)
    rngs1, u2 = rng_mod.next_float(rngs1)
    wb, _pdf = sample_cosine_hemisphere(gb.shading_normal, u1, u2)
    rec1 = jax.jit(lambda salt: pt.traverse_pallas_lane8s(
        bvh, offset_ray_origin(gb.position, gb.geometric_normal, wb), wb,
        jnp.full((n,), 1e-4, jnp.float32) + 0.0 * salt.astype(jnp.float32),
        jnp.full((n,), jnp.inf, jnp.float32), active, any_hit=False,
        lanes=512, window=16))(jnp.uint32(0))
    jax.block_until_ready(rec1.t)
    hit1 = rec1.prim >= 0
    p1 = (gb.position + wb
          * jnp.where(jnp.isfinite(rec1.t), rec1.t, 0.0)[:, None])
    act1 = active & hit1
    _, ls1 = jax.jit(lambda rg: sample_emissive_triangle(
        scene, p1, rg, tile_size=128))(rngs0 + jnp.uint32(13))
    so1 = offset_ray_origin(p1, gb.geometric_normal, ls1["wi"])
    wi1, tmax1 = ls1["wi"], ls1["dist"] * (1.0 - 1e-3)
    jax.block_until_ready(so1)

    lane8s_b1 = jax.jit(lambda salt: pt.traverse_pallas_lane8s(
        bvh, so1, wi1,
        jnp.full((n,), 1e-4, jnp.float32) + 0.0 * salt.astype(jnp.float32),
        tmax1, act1, any_hit=True, lanes=512, window=16).prim >= 0)
    wide_b1 = jax.jit(lambda salt: pt.traverse_pallas_wide(
        bvh, so1, wi1,
        jnp.full((n,), 1e-4, jnp.float32) + 0.0 * salt.astype(jnp.float32),
        tmax1, act1, any_hit=True).prim >= 0)
    a1 = timeit("lane8s any-hit (bounce-1 shadow)", lane8s_b1)
    b1 = timeit("wide packet any-hit (bounce-1 shadow)", wide_b1)
    print("agreement b1:",
          float(np.mean(np.asarray(a1) == np.asarray(b1))), flush=True)


if __name__ == "__main__":
    main()
