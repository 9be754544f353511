"""Per-pass profile of the headline stress bench frame (run on TPU, alone).

Usage: python benchmarks/stress_profile.py [width height]
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from hiprt_pt_tpu.assets.stress import load_stress_scene  # noqa: E402
from hiprt_pt_tpu.core.settings import (  # noqa: E402
    AmbientLightType,
    LightSamplingStrategy,
    RenderOptions,
)
from hiprt_pt_tpu.render.renderer import Renderer  # noqa: E402


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    scene, cam = load_stress_scene(aspect=width / height)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, width, height, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)  # one real step so rays_traced/sample_count are live
    prof = r.profile(frames=2)
    prof["n_pixels"] = width * height
    rays = float(jax.device_get(r.state.rays_traced))
    sc = float(jax.device_get(r.state.sample_count))
    prof["rays_per_spp"] = rays / max(sc, 1)
    prof["mrays_per_s"] = (
        rays / max(sc, 1) / prof["full_frame_ms"] / 1e3
    )
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in prof.items()}))


if __name__ == "__main__":
    main()
