"""Component microbench of the per-iteration dense shading machinery at the
stress bench's wavefront size (1080p = 2.07M lanes). Run ALONE on the TPU.

Times each jitted component at the real primary-hit G-buffer so the numbers
add up to (roughly) one bounce-loop iteration of the headline bench frame.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from hiprt_pt_tpu.assets.stress import load_stress_scene  # noqa: E402
from hiprt_pt_tpu.accel.build import build_bvh  # noqa: E402
from hiprt_pt_tpu.core import rng as rng_mod  # noqa: E402
from hiprt_pt_tpu.core.settings import (  # noqa: E402
    LightSamplingStrategy,
    RenderOptions,
)
from hiprt_pt_tpu.render.renderer import Renderer  # noqa: E402
from hiprt_pt_tpu.render.integrator import (  # noqa: E402
    _make_tracers,
    camera_rays_pass,
)

import numpy as np  # noqa: E402


def timeit(label, fn, *args, reps=2, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt * 1e3:9.1f} ms")
    return out


def main():
    width, height = (1920, 1080) if len(sys.argv) < 2 else (
        int(sys.argv[1]), int(sys.argv[2]))
    n = width * height
    scene, cam = load_stress_scene(aspect=width / height)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, width, height, options=opts)
    settings = r.settings
    bvh = r.bvh
    state = r.state
    print(f"wavefront: {n} rays; emissive_rows: "
          f"{scene.emissive_rows.shape[0]}; has_alpha: "
          f"{scene.textures is not None and scene.textures.has_alpha}")

    pix = jnp.arange(n, dtype=jnp.uint32)
    rngs = rng_mod.seed(pix, state.sample_count, state.seed)

    cam_jit = jax.jit(lambda st, c, s, rg: camera_rays_pass(
        scene, bvh, c, s, st, width, height, st.sample_count, rg, opts))
    rng_state, gb, pixel_active = timeit(
        "camera pass (gen + primary closest)", cam_jit,
        state, r.camera, settings, rngs)

    p = gb.position
    ns = gb.shading_normal
    ng = gb.geometric_normal
    wo = gb.view_direction
    uv = gb.uv
    active = (gb.prim_index >= 0) & pixel_active
    mat_id = jnp.maximum(gb.material_id, 0)
    print(f"active primary hits: "
          f"{float(jnp.mean(active.astype(jnp.float32))):.3f}")

    from hiprt_pt_tpu.ops.texture import apply_textures
    from hiprt_pt_tpu.models.dispatcher import (
        bsdf_eval, bsdf_proxy_eval, bsdf_proxy_sample, bsdf_sample,
    )
    from hiprt_pt_tpu.lights.light_sampling import (
        closest_emissive_hit, sample_emissive_triangle,
    )
    from hiprt_pt_tpu.lights.ris import ris_direct_lighting
    from hiprt_pt_tpu.ops.traverse import occluded_alpha

    mats_fn = jax.jit(lambda ids, uv_: apply_textures(
        scene.textures, scene.materials.at_indices(ids).make_safe(), uv_))
    mats = timeit("mats gather + apply_textures", mats_fn, mat_id, uv)

    aux = {"eta_rel": jnp.full((n,), 1.5, jnp.float32)}

    set_fn = jax.jit(lambda rg: sample_emissive_triangle(scene, p, rg))
    _, ls = timeit("sample_emissive_triangle", set_fn, rng_state)
    wi = ls["wi"]

    timeit("bsdf_proxy_eval", jax.jit(
        lambda: bsdf_proxy_eval(opts, mats, ns, wo, wi, aux)))
    timeit("bsdf_eval (full principled)", jax.jit(
        lambda: bsdf_eval(opts, mats, ns, wo, wi, aux)))
    timeit("bsdf_proxy_sample", jax.jit(
        lambda rg: bsdf_proxy_sample(opts, mats, ns, wo, rg, aux)),
        rng_state)
    timeit("bsdf_sample (full principled)", jax.jit(
        lambda rg: bsdf_sample(opts, mats, ns, wo, rg, aux)), rng_state)

    timeit("closest_emissive_hit (dense sweep)", jax.jit(
        lambda: closest_emissive_hit(scene, p, wi, active=active)))

    closest, occl = _make_tracers(opts)
    act_f = active
    act_none = jnp.zeros((n,), jnp.bool_)
    timeit("occluded any-hit (all active)", jax.jit(
        lambda a: occl(bvh, p, wi, t_max=ls["dist"] * 0.999, active=a)),
        act_f)
    timeit("occluded any-hit (all INACTIVE)", jax.jit(
        lambda a: occl(bvh, p, wi, t_max=ls["dist"] * 0.999, active=a)),
        act_none)
    timeit("closest (all active)", jax.jit(
        lambda a: closest(bvh, p, wi, active=a)), act_f)
    timeit("closest (all INACTIVE)", jax.jit(
        lambda a: closest(bvh, p, wi, active=a)), act_none)

    timeit("occluded_alpha (full march)", jax.jit(
        lambda rg, a: occluded_alpha(
            bvh, scene, opts, settings, p, wi, rg,
            t_max=ls["dist"] * 0.999, active=a, closest_fn=closest)),
        rng_state, act_f)

    timeit("ris_direct_lighting (whole)", jax.jit(
        lambda rg, a: ris_direct_lighting(
            opts, scene, bvh, settings, mats, p, ns, ng, wo, rg, a,
            aux["eta_rel"])), rng_state, act_f)
    timeit("ris_direct_lighting (all INACTIVE)", jax.jit(
        lambda rg, a: ris_direct_lighting(
            opts, scene, bvh, settings, mats, p, ns, ng, wo, rg, a,
            aux["eta_rel"])), rng_state, act_none)


if __name__ == "__main__":
    main()
