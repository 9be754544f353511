"""Staged benchmark configs (BASELINE.json) — one JSON line per config.

The configurations map 1:1 onto the build-plan milestones (SURVEY.md §7.1)
plus the round-3 million-triangle scale config:
  1. Cornell GLTF 256x256, diffuse (Oren-Nayar) + uniform-light MIS, 4 bounces
  2. Glass + dispersion + envmap CDF-inversion sampling
  3. Full principled BSDF + alias-table envmap MIS
  4. RIS+WRS many-light on the Bistro-class stress interior
     (assets/stress.py: 259k tris, 120 emitters, 18 textures)
  5. ReSTIR DI spatiotemporal + light presampling + adaptive sampling +
     denoised AOVs

Usage: python benchmarks/run_configs.py [--frames N] [--scale S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hiprt_pt_tpu.utils.precompile import enable_persistent_cache  # noqa: E402

enable_persistent_cache()  # shader-cache analog: reruns skip compiles

CORNELL = "/root/reference/data/GLTFs/cornell_pbr.gltf"
DISPERSION = "/root/reference/data/GLTFs/multi-dispersion.gltf"


def run_config(name, scene_path, res, options_kw, settings_kw, world_kw,
               frames, envmap_kind=None, force_dispersion=False):
    """scene_path "stress" loads the procedural Bistro-class interior."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hiprt_pt_tpu.assets.envmap import build_envmap, make_test_envmap
    from hiprt_pt_tpu.assets.loader import load_scene_file
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    envmap = (
        build_envmap(make_test_envmap(64, 128, envmap_kind))
        if envmap_kind
        else None
    )
    if scene_path == "stress":
        from hiprt_pt_tpu.assets.stress import load_stress_scene

        scene, camera = load_stress_scene(aspect=res[0] / res[1])
    elif scene_path == "stress-1p6m":
        from hiprt_pt_tpu.assets.stress import load_stress_scene

        scene, camera = load_stress_scene(
            aspect=res[0] / res[1], tri_scale=11.0)
    else:
        scene, camera = load_scene_file(
            scene_path, aspect=res[0] / res[1], envmap=envmap
        )
    if force_dispersion:
        trans = np.asarray(scene.materials.specular_transmission) > 0
        scene = scene.replace(
            materials=scene.materials.replace(
                dispersion_scale=jnp.asarray(
                    np.where(trans, 1.0, 0.0).astype(np.float32)
                )
            )
        )
    options = RenderOptions(**options_kw)
    r = Renderer(scene, camera, res[0], res[1], options=options)
    r.settings = r.settings.replace(
        **{k: v for k, v in settings_kw.items()}
    )
    if world_kw:
        r.world = r.world.replace(**world_kw)
    elif envmap is None:
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
    else:
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.ENVMAP))
        )

    r.step(block=True)  # compile
    rays0 = float(jax.device_get(r.state.rays_traced))
    t0 = time.perf_counter()
    for _ in range(frames):
        r.step()
    jax.block_until_ready(r.state.accum)
    dt = time.perf_counter() - t0
    rays1 = float(jax.device_get(r.state.rays_traced))
    img = r.hdr_image()
    print(
        json.dumps(
            {
                "config": name,
                "resolution": list(res),
                "ms_per_sample": round(dt / frames * 1000, 1),
                "mrays_per_s": round((rays1 - rays0) / dt / 1e6, 2),
                "mean_radiance": round(float(np.mean(img)), 5),
                "finite": bool(np.isfinite(img).all()),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument(
        "--scale", type=float, default=1.0,
        help="resolution scale on each config's native size "
             "(e.g. 0.25 for a quick CPU smoke run)",
    )
    args = ap.parse_args()

    def res(w, h):
        return (max(16, int(w * args.scale)), max(16, int(h * args.scale)))

    import jax.numpy as jnp

    from hiprt_pt_tpu.core.settings import (
        BSDFOverride,
        EnvmapSamplingStrategy,
        LightSamplingStrategy,
    )

    f = args.frames
    # 1 — cornell diffuse MIS 256², 4 bounces
    run_config(
        "1-cornell-diffuse-mis",
        CORNELL,
        res(256, 256),
        dict(
            bsdf_override=BSDFOverride.OREN_NAYAR,
            direct_light_sampling=LightSamplingStrategy.MIS,
            max_bounces_static=4,
        ),
        dict(nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)),
        None,
        f,
    )
    # 2 — glass + dispersion + envmap CDF sampling
    run_config(
        "2-glass-dispersion-envmap-cdf",
        DISPERSION,
        res(256, 256),
        dict(
            direct_light_sampling=LightSamplingStrategy.MIS,
            envmap_sampling=EnvmapSamplingStrategy.CDF_BINARY,
            max_bounces_static=6,
        ),
        dict(nb_bounces=jnp.int32(6), samples_per_frame=jnp.int32(1)),
        {},
        f,
        envmap_kind="sky",
        force_dispersion=True,
    )
    # 3 — full principled + alias-table envmap MIS
    run_config(
        "3-principled-alias-envmap",
        CORNELL,
        res(256, 256),
        dict(
            direct_light_sampling=LightSamplingStrategy.MIS,
            envmap_sampling=EnvmapSamplingStrategy.ALIAS_TABLE,
            max_bounces_static=6,
        ),
        dict(nb_bounces=jnp.int32(6), samples_per_frame=jnp.int32(1)),
        {},
        f,
        envmap_kind="sky",
    )
    # 4 — RIS + WRS many-light on the stress interior
    run_config(
        "4-ris-wrs-stress",
        "stress",
        res(512, 512),
        dict(
            direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
            max_bounces_static=4,
        ),
        dict(nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)),
        None,
        f,
    )
    # 5 — ReSTIR DI + presampling + adaptive + denoise-ready AOVs
    run_config(
        "5-restir-di-adaptive-stress",
        "stress",
        res(512, 512),
        dict(
            direct_light_sampling=LightSamplingStrategy.RESTIR_DI,
            max_bounces_static=4,
        ),
        dict(
            nb_bounces=jnp.int32(4),
            samples_per_frame=jnp.int32(1),
            enable_adaptive_sampling=jnp.bool_(True),
        ),
        None,
        f,
    )
    # 6 — million-triangle scale (VERDICT r2 #4; full proof incl. traversal
    # exactness in benchmarks/scale_1p6m.py)
    run_config(
        "6-scale-1p6m-ris",
        "stress-1p6m",
        res(1920, 1080),
        dict(
            direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
            max_bounces_static=4,
        ),
        dict(nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)),
        None,
        f,
    )


if __name__ == "__main__":
    main()
