"""ReSTIR DI per-pass decomposition at the bench wavefront (VERDICT r3
task 3: find where the 3x ReSTIR-vs-RIS frame tax goes).

Times each pass as its own jit with big operands passed as ARGUMENTS (the
relay 413 rule) and distinct inputs per rep (memoization rule). Subtract
the ~26 ms relay dispatch floor per number (axon-relay-dispatch-floor).

Run ALONE on the TPU:  python benchmarks/restir_profile.py [w h]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


_FLOOR = [0.0]


def _null_floor(reps=6):
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    np.asarray(f(jnp.float32(0.5)))
    t0 = time.perf_counter()
    for i in range(reps):
        np.asarray(f(jnp.float32(i)))
    _FLOOR[0] = (time.perf_counter() - t0) / reps
    print(f"relay null floor: {_FLOOR[0] * 1e3:.1f} ms/rep", flush=True)


def _fetch(out):
    # block_until_ready intermittently lies under the axon relay
    # (r5probe2.py, 2026-08-21); a small value fetch is the reliable sync
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def timed(label, jit_fn, make_args, reps=3):
    out = jit_fn(*make_args(0))
    _fetch(out)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = jit_fn(*make_args(i))
        _fetch(out)
    dt = (time.perf_counter() - t0) / reps - _FLOOR[0]
    print(f"{label:46s} {dt * 1e3:9.1f} ms", flush=True)
    return out


def main():
    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()
    _null_floor()
    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core import rng as rng_mod
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.ops.texture import apply_textures
    from hiprt_pt_tpu.render.integrator import camera_rays_pass
    from hiprt_pt_tpu.render.renderer import Renderer
    from hiprt_pt_tpu.restir.di import (
        final_shading,
        initial_candidates,
        presample_lights,
        spatial_reuse_pass,
        temporal_reuse,
    )

    w, h = (1920, 1080) if len(sys.argv) < 3 else (
        int(sys.argv[1]), int(sys.argv[2]))
    n = w * h
    scene, cam = load_stress_scene(aspect=w / h)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RESTIR_DI,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, w, h, options=opts)
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE)))
    settings, bvh, state, world = r.settings, r.bvh, r.state, r.world
    print(f"wavefront {n}, emitters {scene.emissive_rows.shape[0]}",
          flush=True)

    pix = jnp.arange(n, dtype=jnp.uint32)
    rngs0 = rng_mod.seed(pix, state.sample_count, state.seed)
    rng_state, gbuf, active = jax.jit(
        lambda st, rg: camera_rays_pass(
            scene, bvh, r.camera, settings, st, w, h, st.sample_count, rg,
            opts)
    )(state, rngs0)
    jax.block_until_ready(gbuf.position)
    hit0 = gbuf.prim_index >= 0
    active0 = active & hit0
    mats0 = scene.materials.at_indices(
        jnp.maximum(gbuf.material_id, 0)).make_safe()
    mats0 = apply_textures(scene.textures, mats0, gbuf.uv)
    eta0 = jnp.where(
        ~gbuf.backface,
        jnp.maximum(mats0.ior, 1.0 + 1e-3),
        1.0 / jnp.maximum(mats0.ior, 1.0 + 1e-3),
    )
    tile_id = jnp.arange(n, dtype=jnp.int32) // 128

    def vary(i):
        return rngs0 + jnp.uint32(i + 1)

    pool = timed(
        "presample_lights (128x1024 pool)",
        jax.jit(lambda sn: presample_lights(scene, sn, opts)),
        lambda i: (jnp.uint32(i),))

    init_jit = jax.jit(lambda m_, g_, e_, a_, rg, pl_: initial_candidates(
        opts, scene, bvh, world, settings, m_, g_.position,
        g_.shading_normal, g_.geometric_normal, g_.view_direction,
        e_, a_, rg, pool=pl_, tile_id=tile_id))
    res, _ = timed("initial_candidates (4L+1B + init vis)",
                   init_jit,
                   lambda i: (mats0, gbuf, eta0, active0, vary(i), pool))

    temp_jit = jax.jit(lambda m_, g_, res_, e_, a_, rg: temporal_reuse(
        opts, settings, scene, m_, g_, state.prev_gbuffer, state.restir,
        res_, e_, a_, w, h, state.prev_view_proj, rg))
    res_t, _ = timed("temporal_reuse", temp_jit,
                     lambda i: (mats0, gbuf, res, eta0, active0, vary(i)))

    spat_jit = jax.jit(
        lambda m_, g_, res_, e_, a_, rg, last: spatial_reuse_pass(
            opts, settings, scene, m_, g_, res_, e_, a_, w, h, rg,
            bvh=bvh, is_last_pass=last))
    res_s, _ = timed("spatial_reuse_pass (not last, no vis)",
                     spat_jit,
                     lambda i: (mats0, gbuf, res_t, eta0, active0, vary(i),
                                False))
    res_s2, _ = timed("spatial_reuse_pass (last: +vis sweep)",
                      spat_jit,
                      lambda i: (mats0, gbuf, res_s, eta0, active0, vary(i),
                                 True))

    fin_jit = jax.jit(lambda m_, g_, res_, e_, a_, rg: final_shading(
        opts, scene, bvh, world, m_, g_, res_, e_, a_, rng_state=rg,
        settings=settings))
    timed("final_shading (+final vis sweep)", fin_jit,
          lambda i: (mats0, gbuf, res_s2, eta0, active0, vary(i)))


if __name__ == "__main__":
    main()
