"""Ground truth for BASELINE configs 2-3 against the independent PBR oracle
(VERDICT r2 #6): smooth glass (+ dispersion) and a GGX-metal principled
subset, both rendered on a procedural cornell-with-sphere scene by the
framework (full principled path, NO BSDF override) and by
tests/oracle_pt.py::render_oracle_pbr (plain numpy, nothing shared).

Gates target a wrong pdf, not just gross breakage: interior means must
agree to <=5 % rel at the test spp (a mis-normalized lobe shifts energy
10-30 %), plus downsampled spatial correlation. The longer-converged table
rows live in GROUND_TRUTH.md (benchmarks/ground_truth.py --pbr).

Reference anchor: the headless CPU renderer's oracle role,
src/Renderer/CPURenderer.cpp:264-296."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.assets.scene import build_scene
from hiprt_pt_tpu.core.camera import camera_from_lookat
from hiprt_pt_tpu.core.material import MaterialBank
from hiprt_pt_tpu.core.settings import (
    AmbientLightType,
    LightSamplingStrategy,
    RenderOptions,
)
from hiprt_pt_tpu.render.renderer import Renderer

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_pt import (  # noqa: E402
    KIND_GLASS,
    KIND_LAMBERT,
    KIND_METAL,
    render_oracle_pbr,
)

RES = 16


def _quad(vs, fs, mids, corners, mat):
    base = sum(len(v) for v in vs)
    vs.append(np.asarray(corners, np.float32))
    fs.append(np.asarray([[0, 1, 2], [0, 2, 3]], np.int64) + base)
    mids += [mat, mat]


def _icosphere(subdiv):
    from hiprt_pt_tpu.assets.stress import _icosphere as ico

    return ico(subdiv)


def build_box_sphere(sphere_mat_row, sphere_kind):
    """Cornell-ish box (Lambert walls, one area light) + centered sphere.
    Returns (framework SceneData, oracle scene_np, Camera)."""
    vs, fs, mids = [], [], []
    # mats: 0 white wall, 1 red, 2 green, 3 light, 4 sphere
    rows = [
        dict(base_color=[0.73, 0.73, 0.73], roughness=1.0, specular=0.0,
             oren_nayar_sigma=0.0),
        dict(base_color=[0.65, 0.05, 0.05], roughness=1.0, specular=0.0,
             oren_nayar_sigma=0.0),
        dict(base_color=[0.12, 0.45, 0.15], roughness=1.0, specular=0.0,
             oren_nayar_sigma=0.0),
        dict(base_color=[0, 0, 0], emission=[1.0, 0.9, 0.75],
             emission_strength=22.0, specular=0.0, oren_nayar_sigma=0.0),
        sphere_mat_row,
    ]
    s = 1.0
    _quad(vs, fs, mids, [[-s, 0, -s], [s, 0, -s], [s, 0, s], [-s, 0, s]], 0)
    _quad(vs, fs, mids,
          [[-s, 2 * s, -s], [-s, 2 * s, s], [s, 2 * s, s], [s, 2 * s, -s]], 0)
    _quad(vs, fs, mids,
          [[-s, 0, -s], [-s, 2 * s, -s], [s, 2 * s, -s], [s, 0, -s]], 0)
    _quad(vs, fs, mids,
          [[-s, 0, -s], [-s, 0, s], [-s, 2 * s, s], [-s, 2 * s, -s]], 1)
    _quad(vs, fs, mids,
          [[s, 0, -s], [s, 2 * s, -s], [s, 2 * s, s], [s, 0, s]], 2)
    # light panel just under the ceiling, facing down
    h = 2 * s - 0.01
    _quad(vs, fs, mids,
          [[-0.3, h, -0.3], [0.3, h, -0.3], [0.3, h, 0.3], [-0.3, h, 0.3]],
          3)
    # sphere
    sv, sf = _icosphere(3)
    base = sum(len(v) for v in vs)
    vs.append((sv * 0.45 + np.asarray([0.0, 0.7, 0.0])).astype(np.float32))
    fs.append(np.asarray(sf, np.int64) + base)
    mids += [4] * len(sf)

    verts = np.concatenate(vs, 0)
    tris = np.concatenate(fs, 0).astype(np.int64)
    mat_ids = np.asarray(mids, np.int32)
    bank = MaterialBank.from_rows(rows)
    scene = build_scene(verts, tris, mat_ids, bank)

    cam = camera_from_lookat(
        eye=[0.0, 1.0, 3.4], target=[0.0, 0.9, 0.0], vfov_deg=40.0,
        aspect=1.0,
    )

    kind = np.asarray([KIND_LAMBERT] * 4 + [sphere_kind], np.int32)
    row = sphere_mat_row
    scene_np = dict(
        vertices=verts.astype(np.float64),
        triangles=tris,
        material_ids=mat_ids.astype(np.int64),
        albedo=np.asarray([r.get("base_color", [1, 1, 1]) for r in rows],
                          np.float64),
        emission=np.asarray(
            [np.asarray(r.get("emission", [0, 0, 0]), np.float64)
             * r.get("emission_strength", 1.0) for r in rows]),
        kind=kind,
        roughness=np.asarray([r.get("roughness", 0.3) for r in rows]),
        ior=np.asarray([r.get("ior", 1.4) for r in rows]),
        abbe=np.asarray(
            [r.get("dispersion_abbe_number", 20.0) for r in rows]),
        dispersion_scale=np.asarray(
            [r.get("dispersion_scale", 0.0) for r in rows]),
        cam_pos=np.asarray(cam.position, np.float64),
        cam_rot=np.asarray(cam.view_inv)[:3, :3].astype(np.float64),
        proj_inv=np.asarray(cam.proj_inv, np.float64),
    )
    return scene, scene_np, cam


def _framework_render(scene, cam, spp, bounces):
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=bounces,
        do_energy_compensation=False,  # oracle is single-scattering GGX
    )
    r = Renderer(scene, cam, RES, RES, options=opts, seed=101)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(bounces), samples_per_frame=jnp.int32(spp)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)
    return np.asarray(r.hdr_image()[::-1])  # oracle rows are bottom-up


def _compare(ref, img, clip=6.0, mean_tol=0.05, corr_tol=0.97):
    a = np.clip(ref, 0, clip)
    b = np.clip(img, 0, clip)
    ma, mb = float(a.mean()), float(b.mean())
    rel = abs(ma - mb) / max(ma, 1e-9)
    def ds(x):
        return x.reshape(RES // 4, 4, RES // 4, 4, 3).mean((1, 3)).ravel()
    corr = float(np.corrcoef(ds(a), ds(b))[0, 1])
    assert rel < mean_tol, (ma, mb, rel)
    assert corr > corr_tol, corr
    return ma, mb, rel, corr


@pytest.mark.parametrize(
    "config",
    [pytest.param("glass", marks=pytest.mark.slow),
     pytest.param("dispersion", marks=pytest.mark.slow),
     "metal"],
)
def test_pbr_oracle(config):
    if config == "glass":
        row = dict(base_color=[1.0, 1.0, 1.0], roughness=0.0,
                   specular_transmission=1.0, ior=1.5)
        kind, bounces, spp_o, spp_f = KIND_GLASS, 8, 96, 256
    elif config == "dispersion":
        row = dict(base_color=[1.0, 1.0, 1.0], roughness=0.0,
                   specular_transmission=1.0, ior=1.5,
                   dispersion_scale=1.0, dispersion_abbe_number=25.0)
        kind, bounces, spp_o, spp_f = KIND_GLASS, 8, 96, 256
    else:
        row = dict(base_color=[0.95, 0.64, 0.35], roughness=0.3,
                   metallic=1.0)
        kind, bounces, spp_o, spp_f = KIND_METAL, 3, 128, 256

    scene, scene_np, cam = build_box_sphere(row, kind)
    ref = render_oracle_pbr(scene_np, RES, RES, spp=spp_o, bounces=bounces,
                            seed=11)
    img = _framework_render(scene, cam, spp_f, bounces)
    _compare(ref, img)
