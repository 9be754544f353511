"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.md): Mrays/s/chip at 1080p. Until a Bistro-class asset is
importable, the workload is the reference repo's cornell_pbr.gltf at 1920x1080
with MIS NEE + 4 bounces (BASELINE config-1 shape, scaled to 1080p).
Target: >= 150 Mrays/s/chip (BASELINE.json, v5p).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.assets.gltf import load_gltf
    from hiprt_pt_tpu.assets.scene import build_scene
    from hiprt_pt_tpu.core.material import MaterialBank
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        BSDFOverride,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    width, height = 1920, 1080
    scene_path = "/root/reference/data/GLTFs/cornell_pbr.gltf"
    parsed = load_gltf(scene_path, aspect_override=width / height)
    scene = build_scene(
        parsed.vertices,
        parsed.triangles,
        parsed.material_ids,
        MaterialBank.from_rows(parsed.material_rows),
        normals=parsed.normals,
        uvs=parsed.uvs,
    )

    opts = RenderOptions(
        bsdf_override=BSDFOverride.OREN_NAYAR,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=4,
    )
    r = Renderer(scene, parsed.camera, width, height, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )

    # warm-up / compile
    r.step(block=True)
    rays0 = float(jax.device_get(r.state.rays_traced))

    n_frames = 8
    t0 = time.perf_counter()
    for _ in range(n_frames):
        r.step()
    jax.block_until_ready(r.state.accum)
    dt = time.perf_counter() - t0
    rays1 = float(jax.device_get(r.state.rays_traced))

    mrays_per_s = (rays1 - rays0) / dt / 1e6
    spp_per_s = n_frames / dt

    baseline_target = 150.0  # Mrays/s/chip (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip (cornell_pbr 1080p, MIS NEE, 4 bounces)",
                "value": round(mrays_per_s, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays_per_s / baseline_target, 4),
                "extra": {
                    "spp_per_s_1080p": round(spp_per_s, 3),
                    "device": str(jax.devices()[0]),
                    "frames": n_frames,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
