"""Memoization-safe component microbench of the per-bounce shading cost at
the stress bench's wavefront (1080p = 2.07M lanes).

The axon relay memoizes repeated identical dispatches, so every timed rep
here folds a distinct counter into the RNG / perturbs one input — numbers
stay honest. Run ALONE on the TPU:
    python benchmarks/shading_profile.py [width height]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(label, jit_fn, make_args, reps=3):
    """jit_fn(*make_args(rep)) — make_args must vary with rep."""
    out = jit_fn(*make_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = jit_fn(*make_args(i))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:46s} {dt * 1e3:9.1f} ms", flush=True)
    return out


def main():
    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()
    width, height = (1920, 1080) if len(sys.argv) < 3 else (
        int(sys.argv[1]), int(sys.argv[2]))
    n = width * height

    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core import rng as rng_mod
    from hiprt_pt_tpu.core.settings import (
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer
    from hiprt_pt_tpu.render.integrator import (
        _interpolate_hit,
        camera_rays_pass,
    )
    from hiprt_pt_tpu.ops.texture import apply_normal_map, apply_textures
    from hiprt_pt_tpu.models.dispatcher import (
        bsdf_eval,
        bsdf_proxy_eval,
        bsdf_proxy_sample,
        bsdf_sample,
    )
    from hiprt_pt_tpu.lights.light_sampling import (
        closest_emissive_hit,
        sample_emissive_triangle,
    )
    from hiprt_pt_tpu.lights.ris import ris_direct_lighting

    scene, cam = load_stress_scene(aspect=width / height)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, width, height, options=opts)
    settings, bvh, state = r.settings, r.bvh, r.state
    print(f"wavefront {n} lanes, {scene.emissive_rows.shape[0]} emitters, "
          f"{r.scene.materials.num_materials} materials", flush=True)

    pix = jnp.arange(n, dtype=jnp.uint32)
    rngs0 = rng_mod.seed(pix, state.sample_count, state.seed)
    rng_state, gb, pixel_active = jax.jit(
        lambda st, c, s, rg: camera_rays_pass(
            scene, bvh, c, s, st, width, height, st.sample_count, rg, opts)
    )(state, r.camera, settings, rngs0)
    jax.block_until_ready(gb.position)

    p, ns, ng, wo, uv = (gb.position, gb.shading_normal,
                         gb.geometric_normal, gb.view_direction, gb.uv)
    active = (gb.prim_index >= 0) & pixel_active
    mat_id = jnp.maximum(gb.material_id, 0)
    prim = gb.prim_index

    def vary_rng(i):
        return rngs0 + jnp.uint32(i + 1)

    # 1. material gather (one-hot vs dynamic-gather)
    import hiprt_pt_tpu.core.material as mat_mod

    gather_jit = jax.jit(
        lambda ids: scene.materials.at_indices(ids).roughness)
    timed("at_indices (one-hot matmul path)", gather_jit,
          lambda i: (jnp.where(active, mat_id + 0 * i, i % 7),))
    saved = mat_mod._ONEHOT_GATHER_MAX_MATERIALS
    mat_mod._ONEHOT_GATHER_MAX_MATERIALS = 0
    gather_jit2 = jax.jit(
        lambda ids: scene.materials.at_indices(ids).roughness)
    timed("at_indices (dynamic gather path)", gather_jit2,
          lambda i: (jnp.where(active, mat_id + 0 * i, i % 7),))
    mat_mod._ONEHOT_GATHER_MAX_MATERIALS = saved

    # NOTE: every big per-lane operand (mats/p/ns/wo/...) is passed as a jit
    # ARGUMENT — closing over them embeds 2M-lane constants in the HLO and
    # trips the relay's remote_compile HTTP 413 body cap.
    mats = jax.jit(lambda ids, uv_: apply_textures(
        scene.textures, scene.materials.at_indices(ids).make_safe(), uv_
    ))(mat_id, uv)
    jax.block_until_ready(mats.roughness)
    timed("apply_textures (on gathered mats)",
          jax.jit(lambda m_, uv_: apply_textures(scene.textures, m_, uv_)),
          lambda i: (mats, uv + i * 1e-7))

    aux = {"eta_rel": jnp.full((n,), 1.5, jnp.float32)}
    _, ls = jax.jit(lambda p_, rg: sample_emissive_triangle(scene, p_, rg)
                    )(p, rngs0)
    wi = ls["wi"]
    jax.block_until_ready(wi)

    timed("sample_emissive_triangle",
          jax.jit(lambda p_, rg: sample_emissive_triangle(scene, p_, rg)),
          lambda i: (p, vary_rng(i)))
    timed("bsdf_proxy_eval",
          jax.jit(lambda m_, ns_, wo_, w: bsdf_proxy_eval(
              opts, m_, ns_, wo_, w, aux)),
          lambda i: (mats, ns, wo, wi + i * 1e-7))
    timed("bsdf_eval (full principled)",
          jax.jit(lambda m_, ns_, wo_, w: bsdf_eval(
              opts, m_, ns_, wo_, w, aux)),
          lambda i: (mats, ns, wo, wi + i * 1e-7))
    timed("bsdf_proxy_sample",
          jax.jit(lambda m_, ns_, wo_, rg: bsdf_proxy_sample(
              opts, m_, ns_, wo_, rg, aux)),
          lambda i: (mats, ns, wo, vary_rng(i)))
    timed("bsdf_sample (full principled)",
          jax.jit(lambda m_, ns_, wo_, rg: bsdf_sample(
              opts, m_, ns_, wo_, rg, aux)),
          lambda i: (mats, ns, wo, vary_rng(i)))
    timed("closest_emissive_hit (dense emissive sweep)",
          jax.jit(lambda p_, w, a_: closest_emissive_hit(
              scene, p_, w, active=a_)),
          lambda i: (p, wi + i * 1e-7, active))
    uu = jnp.full((n,), 0.3, jnp.float32)

    def interp_nm(prim_, w):
        ns2, _ng2, uv2, mid2, tan2 = _interpolate_hit(
            scene, prim_, uu, uu, w)
        m2 = scene.materials.at_indices(jnp.maximum(mid2, 0))
        return apply_normal_map(scene.textures, m2, uv2, ns2, tan2)

    timed("_interpolate_hit + mats + normal map", jax.jit(interp_nm),
          lambda i: (prim, wi + i * 1e-7))
    timed("ris_direct_lighting (whole, incl shadow ray)",
          jax.jit(lambda m_, p_, ns_, ng_, wo_, rg: ris_direct_lighting(
              opts, scene, bvh, settings, m_, p_, ns_, ng_, wo_, rg,
              active, aux["eta_rel"])),
          lambda i: (mats, p, ns, ng, wo, vary_rng(i)))


if __name__ == "__main__":
    main()
