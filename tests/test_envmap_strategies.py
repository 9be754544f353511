"""Envmap sampling strategies must agree (CDF binary-search vs alias table vs
BSDF-only), and MIS must hold with a bright-sun envmap (reference: Envmap.h
strategies + MIS)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.assets.envmap import build_envmap, make_test_envmap
from hiprt_pt_tpu.core.settings import (
    AmbientLightType,
    BSDFOverride,
    EnvmapSamplingStrategy,
    LightSamplingStrategy,
    RenderOptions,
)
from hiprt_pt_tpu.render.renderer import Renderer


@pytest.fixture(scope="module")
def env_scene(cornell_scene):
    scene, camera = cornell_scene
    envmap = build_envmap(make_test_envmap(32, 64, "sky"))
    # non-emissive materials: isolate envmap lighting
    mats = scene.materials.replace(
        emission_strength=jnp.zeros_like(scene.materials.emission_strength)
    )
    return scene.replace(envmap=envmap, materials=mats,
                         num_emissives=jnp.int32(0),
                         emissive_tri_indices=jnp.full((1,), -1, jnp.int32)), camera


def _render(env_scene, strategy, spp=48, seed=42, mis=True):
    scene, camera = env_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.MIS,
        envmap_sampling=strategy,
        envmap_bsdf_mis=mis,
        max_bounces_static=2,
    )
    r = Renderer(scene, camera, 32, 32, options=opts, seed=seed)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(2), samples_per_frame=jnp.int32(spp)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.ENVMAP))
    )
    r.step(block=True)
    return r.hdr_image()


def test_envmap_strategies_agree(env_scene):
    img_alias = _render(env_scene, EnvmapSamplingStrategy.ALIAS_TABLE)
    img_cdf = _render(env_scene, EnvmapSamplingStrategy.CDF_BINARY, seed=7)
    img_none = _render(env_scene, EnvmapSamplingStrategy.NO_SAMPLING, spp=160,
                       seed=13)
    a = img_alias[4:-4, 4:-4].mean()
    c = img_cdf[4:-4, 4:-4].mean()
    n = img_none[4:-4, 4:-4].mean()
    assert abs(a - c) / max(a, 1e-6) < 0.08, (a, c)
    assert abs(a - n) / max(a, 1e-6) < 0.3, (a, n)  # sun makes no-NEE noisy
    for img in (img_alias, img_cdf, img_none):
        assert np.all(np.isfinite(img))
