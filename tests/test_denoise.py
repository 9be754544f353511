"""Denoiser: noise reduction with edge preservation (reference: OIDN wrapper
role, src/Renderer/OpenImageDenoiser.cpp)."""

import numpy as np
import jax.numpy as jnp

from hiprt_pt_tpu.render.denoise import atrous_denoise


def test_reduces_noise_preserves_edges():
    g = np.random.default_rng(0)
    h = w = 64
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = [1.0, 0.2, 0.2]
    clean[:, w // 2 :] = [0.2, 0.2, 1.0]
    albedo = clean.copy()
    normal = np.tile([0.0, 0.0, 1.0], (h, w, 1)).astype(np.float32)
    noisy = clean + g.normal(0, 0.25, clean.shape).astype(np.float32)
    out = np.asarray(
        atrous_denoise(jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal))
    )
    # noise reduced
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < 0.4 * err_in, (err_in, err_out)
    # the albedo edge survives: means of the two halves stay distinct
    assert out[:, : w // 2 - 2, 0].mean() > 0.7
    assert out[:, w // 2 + 2 :, 0].mean() < 0.4


def test_denoiser_on_render(cornell_scene):
    import jax.numpy as jnp
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer
    from hiprt_pt_tpu.render.denoise import denoise

    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=2,
    )
    r = Renderer(scene, camera, 32, 32, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(2), samples_per_frame=jnp.int32(8)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)
    raw = r.hdr_image()
    out = denoise(r)
    assert out.shape == raw.shape
    assert np.all(np.isfinite(out))
    tv_raw = np.abs(np.diff(np.clip(raw, 0, 1), axis=0)).mean()
    tv_dn = np.abs(np.diff(np.clip(out, 0, 1), axis=0)).mean()
    assert tv_dn < tv_raw
