"""Precompile warm-up sweep (reference: GPURenderer background permutation
compiles, GPURenderer.cpp:773-897)."""

import jax.numpy as jnp

from hiprt_pt_tpu.core.settings import LightSamplingStrategy, RenderOptions
from hiprt_pt_tpu.utils.precompile import Precompiler, common_permutations


def test_permutation_set():
    perms = common_permutations(RenderOptions())
    assert len(perms) == 6
    assert len({p for p in perms}) == 6  # hashable + distinct


def test_warm_compiles(cornell_scene):
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=1,
    )
    r = Renderer(scene, camera, 16, 16, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(1), samples_per_frame=jnp.int32(1)
    )
    pc = Precompiler(max_workers=2)
    perms = [
        opts.replace(direct_light_sampling=LightSamplingStrategy.UNIFORM_ONE),
        opts.replace(direct_light_sampling=LightSamplingStrategy.BSDF_ONLY),
    ]
    pc.warm(r, perms)
    pc.wait(timeout=300)
    assert pc.compiled == 2 and pc.failed == 0
    pc.shutdown()
