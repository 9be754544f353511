"""End-to-end integrator tests on the cornell scene (reference: CPU renderer
as test harness, SURVEY.md §4.1; BASELINE config 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.core.settings import (
    AmbientLightType,
    BSDFOverride,
    LightSamplingStrategy,
    RenderOptions,
)
from hiprt_pt_tpu.render.renderer import Renderer

RES = 32
SPP = 16


def _make_renderer(cornell_scene, strategy, spp=SPP, seed=42):
    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=strategy,
        max_bounces_static=3,
    )
    r = Renderer(scene, camera, RES, RES, options=opts, seed=seed)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(3), samples_per_frame=jnp.int32(spp)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    return r


@pytest.fixture(scope="module")
def mis_image(cornell_scene):
    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=64)
    r.step(block=True)
    return r.hdr_image()


def test_render_finite_nonzero(mis_image):
    assert np.all(np.isfinite(mis_image))
    assert np.all(mis_image >= 0)
    assert mis_image.mean() > 0.01


def test_deterministic(cornell_scene):
    r1 = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=4)
    r2 = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=4)
    r1.step(block=True)
    r2.step(block=True)
    assert np.array_equal(r1.hdr_image(), r2.hdr_image())


def test_fused_frame_bit_exact(cornell_scene):
    """One fused dispatch (render_step n_samples=spf, fori_loop over the
    sample body) must be bit-identical to the sequential per-sample host
    loop — the per-sample seed is the carried sample_count either way."""
    r_seq = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=4)
    r_fus = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=4)
    r_fus.fuse_frame = True
    r_seq.step(block=True)
    r_fus.step(block=True)
    assert int(jax.device_get(r_fus.state.sample_count)) == 4
    assert np.array_equal(r_seq.hdr_image(), r_fus.hdr_image())


def test_strategies_agree(cornell_scene, mis_image):
    """Unbiasedness cross-check: NEE-MIS and BSDF-only sampling must converge
    to the same radiance (within MC noise)."""
    r_bsdf = _make_renderer(
        cornell_scene, LightSamplingStrategy.BSDF_ONLY, spp=192, seed=7
    )
    r_bsdf.step(block=True)
    img_b = r_bsdf.hdr_image()
    # compare smoothed means (BSDF-only is noisy) over interior region
    a = mis_image[4:-4, 4:-4].mean()
    b = img_b[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.15, (a, b)


def test_uniform_one_light_agrees(cornell_scene, mis_image):
    r_u = _make_renderer(
        cornell_scene, LightSamplingStrategy.UNIFORM_ONE, spp=64, seed=3
    )
    r_u.step(block=True)
    img_u = r_u.hdr_image()
    a = mis_image[4:-4, 4:-4].mean()
    u = img_u[4:-4, 4:-4].mean()
    assert abs(a - u) / max(a, 1e-6) < 0.12, (a, u)


def test_accumulation_reduces_variance(cornell_scene):
    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=4)
    r.step(block=True)
    img4 = r.hdr_image()
    for _ in range(15):
        r.step(block=True)
    img64 = r.hdr_image()
    # high-sample image should be smoother: compare total variation on the
    # clipped (display) image so HDR fireflies don't dominate the metric
    c4 = np.clip(img4, 0, 1)
    c64 = np.clip(img64, 0, 1)
    tv4 = np.abs(np.diff(c4, axis=0)).mean()
    tv64 = np.abs(np.diff(c64, axis=0)).mean()
    assert tv64 < tv4


def test_reset(cornell_scene):
    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=4)
    r.step(block=True)
    img1 = r.hdr_image()
    r.reset()
    r.step(block=True)
    img2 = r.hdr_image()
    assert np.array_equal(img1, img2)
    assert int(r.state.sample_count) == 4


def test_envmap_furnace(cornell_scene):
    """White-furnace test (§4.3): pure-white uniform ambient + fully white
    lambertian scene with no emissives → every pixel must equal 1."""
    scene, camera = cornell_scene
    white = scene.materials.replace(
        base_color=jnp.ones_like(scene.materials.base_color),
        emission=jnp.zeros_like(scene.materials.emission),
        emission_strength=jnp.zeros_like(scene.materials.emission_strength),
    )
    # rebuild without emissive list
    scene_w = scene.replace(
        materials=white,
        num_emissives=jnp.int32(0),
        emissive_tri_indices=jnp.full((1,), -1, jnp.int32),
    )
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.BSDF_ONLY,
        max_bounces_static=16,
    )
    r = Renderer(scene_w, camera, 16, 16, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(16),
        samples_per_frame=jnp.int32(128),
        do_russian_roulette=jnp.bool_(False),
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.UNIFORM)),
        uniform_light_color=jnp.ones(3, jnp.float32),
    )
    r.step(block=True)
    img = r.hdr_image()
    # energy must never be gained; truncation at 16 bounces loses a little in
    # deep corners (paths still alive contribute 0), so the lower bound is loose
    assert np.all(img <= 1.0 + 1e-3), img.max()
    assert img.mean() > 0.85, img.mean()
    assert np.all(img > 0.5), img.min()


def test_ris_agrees_with_mis(cornell_scene, mis_image):
    """RIS+WRS direct lighting must converge to the same radiance as MIS NEE
    (unbiasedness cross-check; reference: RIS.h)."""
    r = _make_renderer(
        cornell_scene, LightSamplingStrategy.RIS_BSDF_LIGHT, spp=64, seed=11
    )
    r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    a = mis_image[4:-4, 4:-4].mean()
    b = img[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.12, (a, b)


@pytest.mark.slow
def test_ris_proxy_target_agrees_with_exact(cornell_scene):
    """Proxy-target RIS (cheap candidate weighting + exact winner shading,
    models/proxy.py) must converge to the same radiance as exact-target RIS
    on full principled materials — the proxy changes variance, never the
    estimator's expectation."""
    scene, camera = cornell_scene

    def render(use_proxy, seed):
        opts = RenderOptions(
            direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
            max_bounces_static=3,
            ris_proxy_target=use_proxy,
        )
        r = Renderer(scene, camera, RES, RES, options=opts, seed=seed)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(3), samples_per_frame=jnp.int32(64)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        r.step(block=True)
        return r.hdr_image()

    img_proxy = render(True, seed=3)
    img_exact = render(False, seed=4)
    assert np.all(np.isfinite(img_proxy))
    a = img_exact[4:-4, 4:-4].mean()
    b = img_proxy[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.10, (a, b)


def test_ris_tile_candidates_agree_with_per_ray(cornell_scene):
    """Tile-coherent light candidates (one alias draw per 128-lane tile,
    triangle shared, point-on-triangle per ray) must converge to the same
    radiance as per-ray draws — the per-ray marginal density is unchanged,
    only intra-tile correlation differs."""
    scene, camera = cornell_scene

    def render(tile, seed):
        opts = RenderOptions(
            direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
            max_bounces_static=3,
            bsdf_override=BSDFOverride.LAMBERTIAN,
            ris_tile_light_candidates=tile,
        )
        r = Renderer(scene, camera, RES, RES, options=opts, seed=seed)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(3), samples_per_frame=jnp.int32(64)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        r.step(block=True)
        return r.hdr_image()

    img_tile = render(128, seed=21)
    img_ray = render(0, seed=22)
    assert np.all(np.isfinite(img_tile))
    a = img_ray[4:-4, 4:-4].mean()
    b = img_tile[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.10, (a, b)


def test_restir_di_agrees_with_mis(cornell_scene, mis_image):
    """ReSTIR DI (initial + temporal + spatial + final visibility) must match
    MIS NEE radiance on a static camera (reference: ReSTIR DI pipeline)."""
    r = _make_renderer(
        cornell_scene, LightSamplingStrategy.RESTIR_DI, spp=8, seed=5
    )
    # accumulate over frames so temporal reuse actually engages
    for _ in range(8):
        r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01
    a = mis_image[4:-4, 4:-4].mean()
    b = img[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.15, (a, b)


def test_restir_di_biased_mode_runs(cornell_scene):
    from hiprt_pt_tpu.core.settings import ReSTIRBiasCorrection

    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.RESTIR_DI,
        restir_di_bias_correction=ReSTIRBiasCorrection.M_WEIGHT_1_OVER_M,
        max_bounces_static=2,
    )
    r = Renderer(scene, camera, RES, RES, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(2), samples_per_frame=jnp.int32(4)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img)) and img.mean() > 0.01


def test_restir_pairwise_defensive_agrees(cornell_scene, mis_image):
    """Pairwise-MIS-defensive spatial reuse (the reference default bias
    correction) stays unbiased vs MIS NEE."""
    from hiprt_pt_tpu.core.settings import ReSTIRBiasCorrection

    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.RESTIR_DI,
        restir_di_bias_correction=ReSTIRBiasCorrection.PAIRWISE_MIS_DEFENSIVE,
        max_bounces_static=3,
    )
    r = Renderer(scene, camera, RES, RES, options=opts, seed=17)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(3), samples_per_frame=jnp.int32(8)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    for _ in range(8):
        r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    a = mis_image[4:-4, 4:-4].mean()
    b = img[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.15, (a, b)


def test_white_furnace_mode_option(cornell_scene):
    """options.white_furnace_mode: uniform white env, emissives off — the
    rendered image IS the energy-conservation view (reference: white furnace
    mode + threshold display)."""
    scene, camera = cornell_scene
    white = scene.materials.replace(
        base_color=jnp.ones_like(scene.materials.base_color),
    )
    scene_w = scene.replace(materials=white)
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.BSDF_ONLY,
        white_furnace_mode=True,
        max_bounces_static=16,
    )
    r = Renderer(scene_w, camera, 16, 16, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(16),
        samples_per_frame=jnp.int32(64),
        do_russian_roulette=jnp.bool_(False),
    )
    # world deliberately NOT configured — furnace mode must override it
    r.step(block=True)
    img = r.hdr_image()
    assert np.all(img <= 1.0 + 1e-3)
    assert img.mean() > 0.85


def test_debug_pixel(cornell_scene):
    from hiprt_pt_tpu.render.debug import debug_pixel

    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=1)
    r.step(block=True)
    info = debug_pixel(r, RES // 2, RES // 2, neighborhood=1)
    assert info["prim"] >= 0
    assert np.isfinite(info["radiance"]).all()
    assert info["neighborhood"].shape == (3, 3, 3)
    assert np.isfinite(info["t"])


def test_nan_view(cornell_scene):
    from hiprt_pt_tpu.render.debug import nan_view

    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=2)
    r.step(block=True)
    img = nan_view(r)
    assert img.shape == (RES, RES, 3)
    # clean render: no pink marks
    assert not np.any(np.all(img == [1.0, 0.0, 1.0], axis=-1))


def test_restir_fused_spatiotemporal_agrees(cornell_scene, mis_image):
    """Fused spatiotemporal pass (reference: FusedSpatiotemporalReuse.h)
    stays unbiased vs MIS NEE."""
    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.RESTIR_DI,
        restir_di_fused_spatiotemporal=True,
        max_bounces_static=3,
    )
    r = Renderer(scene, camera, RES, RES, options=opts, seed=23)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(3), samples_per_frame=jnp.int32(8)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    for _ in range(8):
        r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    a = mis_image[4:-4, 4:-4].mean()
    b = img[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.15, (a, b)


def test_restir_1overz_agrees(cornell_scene, mis_image):
    """The replayed-Z unbiased normalization must also match MIS."""
    from hiprt_pt_tpu.core.settings import ReSTIRBiasCorrection

    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.RESTIR_DI,
        restir_di_bias_correction=ReSTIRBiasCorrection.M_WEIGHT_1_OVER_Z,
        max_bounces_static=3,
    )
    r = Renderer(scene, camera, RES, RES, options=opts, seed=29)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(3), samples_per_frame=jnp.int32(8)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    for _ in range(8):
        r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    a = mis_image[4:-4, 4:-4].mean()
    b = img[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-6) < 0.15, (a, b)


def test_low_res_interaction_mode(cornell_scene):
    """Low-res preview traces one pixel per scale^2 block
    (reference: CameraRays.h:60-76)."""
    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=2)
    r.settings = r.settings.replace(
        render_low_resolution=jnp.bool_(True),
        low_resolution_scale=jnp.int32(4),
    )
    r.step(block=True)
    counts = np.asarray(jax.device_get(r.state.pixel_sample_count))
    frac = (counts > 0).mean()
    assert abs(frac - 1.0 / 16.0) < 0.02, frac


def test_no_accumulate_mode(cornell_scene):
    """accumulate=False overwrites instead of summing (interactive preview,
    reference: RenderSettings.accumulate)."""
    r = _make_renderer(cornell_scene, LightSamplingStrategy.MIS, spp=1)
    # freeze_random pins the per-pixel streams → every sample is identical,
    # so overwrite (non-accumulate) keeps accum EXACTLY equal while
    # accumulation would double it (reference: freeze_random debugging)
    r.settings = r.settings.replace(
        accumulate=jnp.bool_(False), freeze_random=jnp.bool_(True)
    )
    r.step(block=True)
    a1 = np.asarray(jax.device_get(r.state.accum)).copy()
    r.step(block=True)
    a2 = np.asarray(jax.device_get(r.state.accum))
    assert np.array_equal(a1, a2)
    assert int(jax.device_get(r.state.sample_count)) == 2
