"""Denoiser quality curve (round-2 verdict "What's missing" #4).

The reference ships Intel OIDN (a learned denoiser,
src/Renderer/OpenImageDenoiser.cpp:114-140); this repo's replacement is the
AOV-guided a-trous wavelet filter prescribed by SURVEY.md §2.4. This script
quantifies the gap the verdict asked about: RMSE vs a converged reference
at each spp, raw vs denoised — the "denoised-RMSE-vs-spp curve".

Workload: cornell_pbr (full principled, MIS) at 256x256, reference =
1024 spp accumulation of the SAME renderer (independent seed). Prints a
markdown table for ROUND3.md. RMSE is contention-insensitive, so this may
run while CPU jobs are active; only wall-times would be corrupted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()

    from hiprt_pt_tpu.assets.loader import load_scene_file
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.denoise import denoise
    from hiprt_pt_tpu.render.renderer import Renderer

    res = 256
    scene, cam = load_scene_file(
        "/root/reference/data/GLTFs/cornell_pbr.gltf", aspect=1.0
    )
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=4,
    )

    def make(seed):
        r = Renderer(scene, cam, res, res, options=opts, seed=seed)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        return r

    # converged reference (independent seed)
    ref_r = make(seed=7)
    ref_r.fuse_frame = True
    ref_r.settings = ref_r.settings.replace(
        samples_per_frame=jnp.int32(256))
    for _ in range(4):  # 1024 spp
        ref_r.step(block=True)
    ref = np.clip(np.asarray(ref_r.hdr_image()), 0, 10.0)
    print(f"reference at {int(jax.device_get(ref_r.state.sample_count))} "
          f"spp", flush=True)

    def rmse(img):
        a = np.clip(img, 0, 10.0)
        return float(np.sqrt(np.mean((a - ref) ** 2))) / max(
            float(ref.mean()), 1e-9)

    r = make(seed=3)
    rows = []
    spp_done = 0
    for spp in (1, 2, 4, 8, 16, 32, 64):
        while spp_done < spp:
            r.step(block=True)
            spp_done += 1
        raw = np.asarray(r.hdr_image())
        den = denoise(r)
        rows.append((spp, rmse(raw), rmse(den)))
        print(f"spp={spp}: raw relRMSE {rows[-1][1]:.4f}  "
              f"denoised {rows[-1][2]:.4f}", flush=True)

    print("\n| spp | raw rel RMSE | denoised rel RMSE |")
    print("|---|---|---|")
    for spp, a, b in rows:
        print(f"| {spp} | {a:.4f} | {b:.4f} |")


if __name__ == "__main__":
    main()
