"""Interactive-loop demonstration (VERDICT r2 #9).

Drives the real HTTP viewer end-to-end on the stress interior at 540p:
apply the "fastest" performance preset (low-res interaction scale 0.5,
1 bounce — reference: ImGuiSettingsWindow::apply_performance_preset +
the interaction low-res mode, CameraRays.h:60-76), issue a stream of
camera-rotate interactions, and report the achieved interactive frame
rate from the viewer's own /stats; then switch to high_quality and report
steady accumulation. Run ALONE on the TPU; prints one JSON line.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PORT = 8799


def _get(path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}{path}", timeout=900
    ) as r:
        return r.read().decode()


def main():
    import jax.numpy as jnp

    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()

    from hiprt_pt_tpu.app.viewer import ViewerServer
    from hiprt_pt_tpu.assets.stress import load_stress_scene
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
    srv = ViewerServer(r, port=PORT)
    srv.auto_samples_per_frame = True
    srv.serve(blocking=False)
    _get("/stats")
    print(f"viewer up after {time.perf_counter() - t0:.0f}s", flush=True)

    # interactive phase: fastest preset (low-res 0.5 + 1 bounce recompile)
    _get("/control?cmd=preset&value=fastest")
    t_compile = time.perf_counter()
    last = json.loads(_get("/stats"))
    while True:
        time.sleep(2.0)
        cur = json.loads(_get("/stats"))
        if (cur["samples"] != last["samples"] and cur["frame_ms_avg"] > 0) \
                or time.perf_counter() - t_compile > 600:
            break
        last = cur
    print(f"interactive program live after "
          f"{time.perf_counter() - t_compile:.0f}s", flush=True)

    t_int = time.perf_counter()
    while time.perf_counter() - t_int < 30.0:
        _get("/control?cmd=rotate&yaw=0.02&pitch=0.0")
        time.sleep(0.05)
    stats_i = json.loads(_get("/stats"))
    interactive_fps = 1000.0 / max(stats_i["frame_ms_avg"], 1e-3)

    # convergence phase: high_quality preset, full-res accumulation
    _get("/control?cmd=preset&value=high_quality")
    _get("/control?cmd=reset")
    t_hq = time.perf_counter()
    while True:
        time.sleep(2.0)
        cur = json.loads(_get("/stats"))
        if cur["samples"] > 2 or time.perf_counter() - t_hq > 600:
            break
    time.sleep(30)
    stats_q = json.loads(_get("/stats"))
    print(json.dumps({
        "metric": "interactive loop (stress 540p, viewer /stats)",
        "interactive_fps": round(interactive_fps, 2),
        "interactive_frame_ms": stats_i["frame_ms_avg"],
        "hq_samples_per_s": stats_q["samples_per_s"],
        "hq_samples_accumulated": stats_q["samples"],
    }), flush=True)
    srv.stop()


if __name__ == "__main__":
    main()
