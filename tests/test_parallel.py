"""Multi-chip sharding (SURVEY.md §2.5/§5.8): pixel-DP over a device mesh must
produce IDENTICAL results to single-device execution, with collectives
handling the global counters. Runs on 8 virtual CPU devices (conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.core.settings import (
    AmbientLightType,
    BSDFOverride,
    LightSamplingStrategy,
    RenderOptions,
    RenderSettings,
    WorldSettings,
)
from hiprt_pt_tpu.core.state import init_render_state
from hiprt_pt_tpu.parallel.mesh import (
    distributed_render,
    init_sharded_render_state,
    make_mesh,
)
from hiprt_pt_tpu.render.renderer import render_step
from hiprt_pt_tpu.accel.build import build_bvh


W, H = 32, 16


def _setup(cornell_scene):
    scene, camera = cornell_scene
    bvh = build_bvh(np.asarray(scene.vertices), np.asarray(scene.triangles))
    options = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=2,
    )
    settings = RenderSettings(
        nb_bounces=jnp.int32(2), samples_per_frame=jnp.int32(1),
        enable_adaptive_sampling=jnp.bool_(True),
        adaptive_sampling_min_samples=jnp.int32(1),
        adaptive_sampling_noise_threshold=jnp.float32(10.0),
        stop_noise_threshold=jnp.float32(0.1),
    )
    world = WorldSettings(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    return scene, bvh, camera, options, settings, world


def test_sharded_matches_single_device(cornell_scene):
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    scene, bvh, camera, options, settings, world = _setup(cornell_scene)

    # single device
    state1 = init_render_state(W, H)
    out1 = render_step(options, W, H, (scene, bvh), state1, camera, settings, world)
    out1 = render_step(options, W, H, (scene, bvh), out1, camera, settings, world)

    # 8-way pixel sharding
    mesh = make_mesh(jax.devices()[:8])
    state8 = init_sharded_render_state(W, H, mesh)
    out8 = distributed_render(
        options, W, H, scene, bvh, camera, settings, world, mesh, state8
    )
    out8 = distributed_render(
        options, W, H, scene, bvh, camera, settings, world, mesh, out8
    )

    a1 = np.asarray(jax.device_get(out1.accum))
    a8 = np.asarray(jax.device_get(out8.accum))
    assert np.allclose(a1, a8, rtol=1e-5, atol=1e-6)
    # global reduction (converged counter) agrees — this is the psum path
    assert int(jax.device_get(out1.nb_pixels_converged)) == int(
        jax.device_get(out8.nb_pixels_converged)
    )
    assert np.isclose(
        float(jax.device_get(out1.rays_traced)),
        float(jax.device_get(out8.rays_traced)),
    )


def test_sample_dp_matches_sequential_seeds(cornell_scene):
    """Sample-axis DP (SURVEY §2.5): 8 chips render the full image with
    decorrelated seeds; the psum-merged mean must equal the mean of 8
    sequential single-device runs with the same per-chip seeds."""
    from hiprt_pt_tpu.parallel.mesh import (
        _SAMPLE_DP_SEED_STRIDE,
        init_sample_dp_state,
        make_sample_mesh,
        merge_sample_dp,
        sample_dp_render,
    )

    scene, bvh, camera, options, settings, world = _setup(cornell_scene)
    mesh = make_sample_mesh(jax.devices()[:8])
    state = init_sample_dp_state(W, H, mesh, seed=42)
    state = sample_dp_render(
        options, W, H, scene, bvh, camera, settings, world, mesh, state
    )
    merged, total = merge_sample_dp(state)
    merged = np.asarray(jax.device_get(merged))
    assert int(jax.device_get(total)) == 8

    accums = []
    for k in range(8):
        st = init_render_state(W, H, seed=42 + _SAMPLE_DP_SEED_STRIDE * k)
        st = render_step(options, W, H, (scene, bvh), st, camera, settings,
                         world)
        accums.append(np.asarray(jax.device_get(st.accum)))
    ref = np.mean(accums, axis=0)
    assert np.allclose(merged, ref, rtol=1e-5, atol=1e-6)
    # decorrelation sanity: per-chip accumulations actually differ
    a = np.asarray(jax.device_get(state.accum))
    assert not np.allclose(a[0], a[1])


def test_sharding_layout(cornell_scene):
    mesh = make_mesh(jax.devices()[:8])
    state = init_sharded_render_state(W, H, mesh)
    shardings = {
        len(d.addressable_shards) for d in [state.accum, state.pixel_converged]
    }
    assert shardings == {8}  # actually split over 8 devices
    assert (W * H) % 8 == 0


def test_frame_assignment_partition():
    from hiprt_pt_tpu.parallel.frames import frame_assignment

    all_frames = set()
    for p in range(4):
        mine = frame_assignment(10, p, 4)
        assert all_frames.isdisjoint(mine)
        all_frames.update(mine)
    assert all_frames == set(range(10))


def test_distributed_sequence_matches_frames(cornell_scene, tmp_path):
    """Two 'processes' rendering their shares produce the same frames a single
    process would (deterministic animation advance)."""
    import jax.numpy as jnp
    import imageio.v3 as iio
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.parallel.frames import render_distributed_sequence
    from hiprt_pt_tpu.render.animation import CameraOrbitAnimation
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene

    def fresh():
        r = Renderer(
            scene, camera, 32, 32,
            options=RenderOptions(
                bsdf_override=BSDFOverride.LAMBERTIAN, max_bounces_static=1,
                direct_light_sampling=LightSamplingStrategy.MIS,
            ),
        )
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(1), samples_per_frame=jnp.int32(2)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        return r

    anim = CameraOrbitAnimation(target=(0, 1, 0), degrees_per_frame=20)
    p0 = render_distributed_sequence(
        fresh(), 4, 2, str(tmp_path / "p0"), camera_animation=anim,
        process_index=0, process_count=2,
    )
    p1 = render_distributed_sequence(
        fresh(), 4, 2, str(tmp_path / "p1"), camera_animation=anim,
        process_index=1, process_count=2,
    )
    single = render_distributed_sequence(
        fresh(), 4, 2, str(tmp_path / "all"), camera_animation=anim,
        process_index=0, process_count=1,
    )
    assert len(p0) == 2 and len(p1) == 2 and len(single) == 4
    import os
    for path in p0 + p1:
        f = os.path.basename(path)
        a = iio.imread(path)
        b = iio.imread(str(tmp_path / "all" / f))
        assert np.array_equal(a, b), f
