"""Ground-truth validation against the independent brute-force oracle
(VERDICT round-1 Missing #6 / task 4).

The repo's renderer (BVH + wavefront + TPU-idiom code) is compared to
tests/oracle_pt.py — a separate plain-numpy implementation sharing no code —
at equal spp on the reference cornell scene. RMSE must sit at the Monte
Carlo noise floor. The generated table is kept in GROUND_TRUTH.md by
benchmarks/ground_truth.py; this test gates a smaller configuration in CI.
"""

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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_pt import render_oracle  # noqa: E402

# CI configuration: direct lighting (1 bounce) at small res — the strongest
# cheap signal (camera mapping, visibility, NEE pdfs, MIS weights). The
# multi-bounce comparison table lives in benchmarks/ground_truth.py →
# GROUND_TRUTH.md (oracle renders at useful spp take minutes).
RES = 32
SPP = 8
BOUNCES = 1


def _scene_np(scene, camera):
    mats = scene.materials
    emission = np.asarray(mats.emission) * np.asarray(
        mats.emission_strength
    )[:, None]
    return dict(
        vertices=np.asarray(scene.vertices),
        triangles=np.asarray(scene.triangles),
        material_ids=np.asarray(scene.material_ids),
        albedo=np.asarray(mats.base_color),
        emission=emission,
        cam_pos=np.asarray(camera.position),
        cam_rot=np.asarray(camera.view_inv)[:3, :3],
        proj_inv=np.asarray(camera.proj_inv),
    )


@pytest.fixture(scope="module")
def oracle_and_render(cornell_scene):
    scene, camera = cornell_scene
    ref = render_oracle(
        _scene_np(scene, camera), RES, RES, spp=SPP, bounces=BOUNCES, seed=3
    )

    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=BOUNCES,
    )
    r = Renderer(scene, camera, RES, RES, options=opts, seed=99)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(BOUNCES), samples_per_frame=jnp.int32(SPP)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)
    img = r.hdr_image()[::-1]  # undo top-row flip: oracle is bottom-up
    return np.asarray(ref), np.asarray(img)


def test_mean_brightness_matches_oracle(oracle_and_render):
    ref, img = oracle_and_render
    # clip kills the direct-light pixels (radiance ~100) whose jittered
    # coverage differences would otherwise dominate the mean
    a = np.clip(ref, 0, 4.0)[4:-4, 4:-4].mean()
    b = np.clip(img, 0, 4.0)[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-9) < 0.08, (a, b)


def test_rmse_at_noise_floor(oracle_and_render):
    ref, img = oracle_and_render
    # clip fireflies identically before comparing
    a = np.clip(ref, 0, 4.0)
    b = np.clip(img, 0, 4.0)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    rel = rmse / max(float(a.mean()), 1e-9)
    # Two INDEPENDENT 8-spp direct-light estimators differ by sqrt(2) x the
    # per-pixel MC sigma, which on this bright-light scene is ~1.3 relative
    # even after clipping. This bound is the noise floor x ~1.4 — it catches
    # gross errors (doubled radiance, broken visibility) in CI; the tight
    # RMSE table at converged spp lives in GROUND_TRUTH.md.
    assert rel < 1.9, rel


def test_spatial_structure_matches(oracle_and_render):
    """Downsampled images must correlate strongly (catches flips, wrong
    camera mapping, shadow inversions that the mean test would miss)."""
    ref, img = oracle_and_render
    def ds(x):
        return np.clip(x, 0, 4.0).reshape(
            RES // 8, 8, RES // 8, 8, 3).mean((1, 3)).ravel()
    a, b = ds(ref), ds(img)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


# --------------------------------------------------------------------------
# RIS/WRS estimator agreement (VERDICT r4 weak #7): the oracle implements
# its OWN weighted-reservoir-sampling light RIS (oracle_pt.render_oracle
# nee_mode="ris") — nothing shared with lights/ris.py or models/proxy.py —
# so a correlated bug in the framework's shared proxy/candidate machinery
# cannot cancel out of this comparison.
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def oracle_and_render_ris(cornell_scene):
    from hiprt_pt_tpu.core.settings import RISSettings

    scene, camera = cornell_scene
    ref = render_oracle(
        _scene_np(scene, camera), RES, RES, spp=SPP, bounces=BOUNCES,
        seed=5, nee_mode="ris", ris_m=4,
    )

    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=BOUNCES,
    )
    r = Renderer(scene, camera, RES, RES, options=opts, seed=77)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(BOUNCES),
        samples_per_frame=jnp.int32(SPP),
        ris=RISSettings(
            number_of_light_candidates=jnp.int32(4),
            number_of_bsdf_candidates=jnp.int32(0),
        ),
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)
    img = r.hdr_image()[::-1]
    return np.asarray(ref), np.asarray(img)


def test_ris_mean_brightness_matches_oracle(oracle_and_render_ris):
    ref, img = oracle_and_render_ris
    a = np.clip(ref, 0, 4.0)[4:-4, 4:-4].mean()
    b = np.clip(img, 0, 4.0)[4:-4, 4:-4].mean()
    assert abs(a - b) / max(a, 1e-9) < 0.10, (a, b)


def test_ris_spatial_structure_matches(oracle_and_render_ris):
    ref, img = oracle_and_render_ris

    def ds(x):
        return np.clip(x, 0, 4.0).reshape(
            RES // 8, 8, RES // 8, 8, 3).mean((1, 3)).ravel()

    a, b = ds(ref), ds(img)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr
