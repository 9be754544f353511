"""Dispersion: Cauchy IOR, spectral weights, and the dispersion scene
(reference: Dispersion.h; BASELINE config 2)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.models.dispersion import (
    LAMBDA_MAX,
    LAMBDA_MIN,
    ior_at_wavelength,
    wavelength_rgb_weight,
)


def test_cauchy_abbe_consistency():
    """n(486.1) - n(656.3) must equal (n_d - 1)/V by the Abbe definition."""
    ior_d, abbe = jnp.float32(1.5), jnp.float32(30.0)
    nf = float(ior_at_wavelength(ior_d, abbe, jnp.float32(1.0), jnp.float32(486.1)))
    nc = float(ior_at_wavelength(ior_d, abbe, jnp.float32(1.0), jnp.float32(656.3)))
    nd = float(ior_at_wavelength(ior_d, abbe, jnp.float32(1.0), jnp.float32(589.3)))
    assert abs((nf - nc) - (1.5 - 1.0) / 30.0) < 1e-4
    assert abs(nd - 1.5) < 1e-3
    assert nf > nd > nc  # blue bends more


def test_dispersion_scale_zero_is_constant():
    lams = jnp.linspace(LAMBDA_MIN, LAMBDA_MAX, 16)
    n = ior_at_wavelength(jnp.float32(1.5), jnp.float32(20.0), jnp.float32(0.0), lams)
    assert np.allclose(np.asarray(n), 1.5, atol=1e-4)


def test_spectral_weights_reconstruct_white():
    """Mean RGB weight over uniformly sampled wavelengths ~ (1,1,1):
    a flat spectrum must stay white through the hero-wavelength estimator."""
    lams = jnp.linspace(LAMBDA_MIN, LAMBDA_MAX, 4096)
    w = np.asarray(wavelength_rgb_weight(lams))
    mean = w.mean(axis=0)
    assert np.all(np.abs(mean - 1.0) < 0.01), mean
    assert np.all(w >= 0.0)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/GLTFs/multi-dispersion.gltf"),
    reason="scene unavailable",
)
def test_dispersion_scene_renders():
    """multi-dispersion.gltf end to end: glass with dispersion produces
    finite, colorful output."""
    from hiprt_pt_tpu.assets.loader import load_scene_file
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = load_scene_file(
        "/root/reference/data/GLTFs/multi-dispersion.gltf", aspect=1.0
    )
    # force dispersion on the transmissive materials
    trans = np.asarray(scene.materials.specular_transmission) > 0
    disp = np.where(trans, 1.0, 0.0).astype(np.float32)
    scene = scene.replace(
        materials=scene.materials.replace(
            dispersion_scale=jnp.asarray(disp),
            dispersion_abbe_number=jnp.full_like(
                scene.materials.dispersion_abbe_number, 15.0
            ),
        )
    )
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.MIS, max_bounces_static=6
    )
    r = Renderer(scene, camera, 32, 32, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(6), samples_per_frame=jnp.int32(16)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.UNIFORM)),
        uniform_light_color=jnp.ones(3, jnp.float32),
    )
    r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01
