"""Interactive-loop demonstration (VERDICT r2 #9).

Measures the real interactive loop on the stress interior at 540p: apply
the viewer's "fastest" performance preset (low-res interaction scale 0.5,
1 bounce, auto spp — reference: ImGuiSettingsWindow::
apply_performance_preset + the interaction low-res mode CameraRays.h:60-76),
then time a stream of camera-rotate + frame iterations exactly as the
viewer's render loop runs them (each rotate resets accumulation like
RenderWindow::reset_render). Then switch to the high_quality preset and
report full-res accumulation throughput. Run ALONE on the TPU; prints one
JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp

    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()

    from hiprt_pt_tpu.app.viewer import ViewerServer
    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core.camera import camera_rotate
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    width, height = 960, 540
    t0 = time.perf_counter()
    scene, cam = load_stress_scene(aspect=width / height)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, width, height, options=opts)
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    srv = ViewerServer(r, port=0)  # preset/stat machinery; loop driven here
    print(f"scene+renderer up after {time.perf_counter() - t0:.0f}s",
          flush=True)

    assert srv._apply_performance_preset("fastest")
    r = srv.renderer  # presets swap in the true low-res renderer (r5)
    t0 = time.perf_counter()
    r.step(block=True)  # tier-3 recompile of the interactive program
    print(f"interactive program compiled in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    times = []
    for _ in range(40):
        t0 = time.perf_counter()
        r.set_camera(camera_rotate(r.camera, 0.02, 0.0))
        r.step(block=True)
        times.append(time.perf_counter() - t0)
    times.sort()
    med_ms = times[len(times) // 2] * 1000.0
    fps = 1000.0 / med_ms

    assert srv._apply_performance_preset("high_quality")
    r = srv.renderer
    r.reset()
    t0 = time.perf_counter()
    r.step(block=True)  # recompile (4 bounces, full res)
    print(f"high-quality program compiled in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 20.0:
        r.step(block=True)
        n += 1
    import jax

    sps = float(jax.device_get(r.state.sample_count)) / (
        time.perf_counter() - t0)
    print(json.dumps({
        "metric": "interactive loop (stress 540p)",
        "interactive_fps_median": round(fps, 2),
        "interactive_frame_ms_median": round(med_ms, 1),
        "interactive_frames_timed": len(times),
        "hq_samples_per_s": round(sps, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
