"""App shell: CLI, screenshots, checkpoint/resume, animation, viewer
(reference: main.cpp + CommandlineArguments + Screenshoter +
RendererAnimationState + RenderWindow loop)."""

import os
import json
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_cli_headless_render(tmp_path):
    from hiprt_pt_tpu.app.cli import main

    out = tmp_path / "render.png"
    ck = tmp_path / "state.npz"
    rc = main([
        "/root/reference/data/GLTFs/cornell_pbr.gltf",
        "--samples=4", "--bounces=2", "--w=64", "--h=64",
        "--spp-per-frame=2", f"--out={out}", f"--checkpoint={ck}",
        "--strategy=mis", "--cpu",
    ])
    assert rc == 0
    assert out.exists()
    import imageio.v3 as iio

    img = iio.imread(out)
    assert img.shape == (64, 64, 3)
    assert img.mean() > 1
    assert ck.with_suffix(".npz").exists() or ck.exists()


def test_checkpoint_roundtrip(cornell_scene, tmp_path):
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.checkpoint import load_checkpoint, save_checkpoint
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene
    opts = RenderOptions(
        bsdf_override=BSDFOverride.LAMBERTIAN,
        direct_light_sampling=LightSamplingStrategy.MIS,
        max_bounces_static=2,
    )
    def fresh():
        r = Renderer(scene, camera, 32, 32, options=opts)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(2), samples_per_frame=jnp.int32(2)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        return r

    r1 = fresh()
    r1.step(block=True)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, r1.state)
    r1.step(block=True)
    ref = r1.hdr_image()

    r2 = fresh()
    r2.state = load_checkpoint(path, r2.state)
    assert int(jax.device_get(r2.state.sample_count)) == 2
    r2.step(block=True)
    assert np.allclose(r2.hdr_image(), ref, atol=1e-6)


def test_screenshot_auto_name(cornell_scene, tmp_path, monkeypatch):
    from hiprt_pt_tpu.app.screenshot import auto_filename, screenshot
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    name = auto_filename("scene/foo.gltf", 12, 640, 360, out_dir=str(tmp_path))
    assert "foo_" in name and "12sp@640x360.png" in name

    scene, camera = cornell_scene
    r = Renderer(
        scene, camera, 32, 32,
        options=RenderOptions(
            bsdf_override=BSDFOverride.LAMBERTIAN, max_bounces_static=1,
            direct_light_sampling=LightSamplingStrategy.MIS,
        ),
    )
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(1), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.step(block=True)
    path = screenshot(r, str(tmp_path / "shot.png"))
    assert os.path.exists(path)


def test_animation_sequence(cornell_scene, tmp_path):
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.animation import (
        CameraOrbitAnimation, render_frame_sequence,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene
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
    paths = render_frame_sequence(
        r, num_frames=3, samples_per_frame_image=2,
        out_dir=str(tmp_path / "anim"),
        camera_animation=CameraOrbitAnimation(target=(0, 1, 0),
                                              degrees_per_frame=15),
    )
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)
    import imageio.v3 as iio

    a = iio.imread(paths[0]).astype(float)
    b = iio.imread(paths[2]).astype(float)
    assert np.abs(a - b).mean() > 0.5  # camera moved → frames differ


def test_viewer_server(cornell_scene):
    from hiprt_pt_tpu.app.viewer import ViewerServer
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene
    r = Renderer(
        scene, camera, 32, 32,
        options=RenderOptions(
            bsdf_override=BSDFOverride.LAMBERTIAN, max_bounces_static=1,
            direct_light_sampling=LightSamplingStrategy.MIS,
        ),
    )
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(1), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.max_sample_count = 4
    srv = ViewerServer(r, port=18731)
    srv.serve(blocking=False)
    try:
        import time
        time.sleep(2.0)
        html = urllib.request.urlopen(
            "http://127.0.0.1:18731/", timeout=10
        ).read()
        assert b"viewer" in html
        stats = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/stats", timeout=10
        ).read())
        assert stats["resolution"] == [32, 32]
        png = urllib.request.urlopen(
            "http://127.0.0.1:18731/image?view=beauty", timeout=30
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        png2 = urllib.request.urlopen(
            "http://127.0.0.1:18731/image?view=heatmap", timeout=30
        ).read()
        assert png2[:8] == b"\x89PNG\r\n\x1a\n"
        # round-2 display-view parity (reference: 9 views,
        # DisplayViewSystem.cpp:28-74)
        for view in ("boolmap", "furnace", "nan", "denoise_blend"):
            p = urllib.request.urlopen(
                f"http://127.0.0.1:18731/image?view={view}", timeout=240
            ).read()
            assert p[:8] == b"\x89PNG\r\n\x1a\n", view
        # parameter panels (reference: ImGuiSettingsWindow +
        # ImGuiObjectsWindow material editor)
        settings = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/settings", timeout=10
        ).read())
        assert "rr_min_depth" in settings and "nb_bounces" in settings
        mats = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/materials", timeout=10
        ).read())
        assert len(mats) >= 1 and "roughness" in mats[0]
        # performance panel (reference: ImGuiSettingsWindow perf plots +
        # per-kernel event times)
        perf = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/perf", timeout=30
        ).read())
        assert "series" in perf
        perf2 = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/perf?passes=1", timeout=300
        ).read())
        assert "passes_ms" in perf2 and len(perf2["passes_ms"]) >= 2
        # live material edit + generic settings edit
        urllib.request.urlopen(
            "http://127.0.0.1:18731/control?cmd=material&index=0"
            "&key=roughness&value=0.77", timeout=10
        ).read()
        mats2 = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/materials", timeout=10
        ).read())
        assert abs(mats2[0]["roughness"] - 0.77) < 1e-5
        urllib.request.urlopen(
            "http://127.0.0.1:18731/control?cmd=set&key=rr_min_depth&value=5",
            timeout=10,
        ).read()
        s2 = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/settings", timeout=10
        ).read())
        assert s2["rr_min_depth"] == 5
        # camera interactors: rotate (left drag) + pan (middle drag)
        # (reference: mouse interactors, RenderWindowKeyboardInteractor)
        for url in ("control?cmd=rotate&yaw=0.1&pitch=0.05",
                    "control?cmd=pan&dx=0.1&dy=-0.1"):
            resp = json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:18731/{url}", timeout=10
            ).read())
            assert resp.get("ok"), url
        # application perf knobs (reference: auto_sample_per_frame +
        # target_GPU_framerate, RenderWindow.cpp:798-805; GPU stall,
        # RenderWindow.cpp:660-671; benchmark button,
        # ImGuiSettingsWindow.cpp:2062)
        for key, val in (("auto_samples_per_frame", "1"),
                         ("target_framerate", "2.5"),
                         ("stall_percentage", "10")):
            urllib.request.urlopen(
                f"http://127.0.0.1:18731/control?cmd=set&key={key}&value={val}",
                timeout=10,
            ).read()
        s3 = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/settings", timeout=10
        ).read())
        assert s3["auto_samples_per_frame"] is True
        assert s3["target_framerate"] == 2.5
        assert s3["stall_percentage"] == 10.0
        # the auto-tuner picks spf = samples_per_s / target_fps from the
        # last frame time once one frame has been measured
        if not srv.renderer.metrics.values("frame_ms"):
            srv.renderer.step(block=True)
        srv._post_frame_tuning()
        assert int(jax.device_get(
            srv.renderer.settings.samples_per_frame)) >= 1
        resp = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/control?cmd=benchmark", timeout=30
        ).read())
        assert resp["ok"]
        s4 = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/settings", timeout=10
        ).read())
        assert s4["freeze_random"] is True
        assert s4["samples_per_frame"] == 1
        assert s4["auto_samples_per_frame"] is False
        # performance presets (reference: apply_performance_preset,
        # ImGuiSettingsWindow.cpp:498-580); "fast" keeps the current RIS
        # strategy out of it on this renderer (MIS -> RIS recompile)
        resp = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/control?cmd=preset&value=fast",
            timeout=600,
        ).read())
        assert resp["ok"]
        s5 = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/settings", timeout=10
        ).read())
        assert s5["nb_bounces"] == 2
        from hiprt_pt_tpu.core.settings import (
            LightSamplingStrategy as _LSS,
        )
        assert (srv.renderer.options.direct_light_sampling
                == _LSS.RIS_BSDF_LIGHT)
        resp = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/control?cmd=preset&value=bogus",
            timeout=10,
        ).read())
        assert resp["ok"] is False
        # baking window parity (reference: ImGuiBakingWindow): launch a tiny
        # conductor bake, poll to completion
        b = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/bake?what=conductor&res=4&samples=256",
            timeout=30,
        ).read())
        assert b["state"] == "running"
        deadline = time.time() + 240
        while time.time() < deadline:
            b = json.loads(urllib.request.urlopen(
                "http://127.0.0.1:18731/bake", timeout=10
            ).read())
            if b["state"] != "running":
                break
            time.sleep(0.5)
        assert b["state"] == "done" and b["shape"] == [4, 4], b
    finally:
        srv.stop()


def test_viewer_animation_endpoint(cornell_scene, tmp_path):
    """Animation window parity (reference: ImGuiAnimationWindow frame-
    sequence rendering): /animate renders N frames to disk while the
    progressive loop yields."""
    from hiprt_pt_tpu.app.viewer import ViewerServer
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer
    import time

    scene, camera = cornell_scene
    r = Renderer(
        scene, camera, 16, 16,
        options=RenderOptions(
            bsdf_override=BSDFOverride.LAMBERTIAN, max_bounces_static=1,
            direct_light_sampling=LightSamplingStrategy.MIS,
        ),
    )
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(1), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    srv = ViewerServer(r, port=18732)
    srv.serve(blocking=False)
    try:
        out = str(tmp_path / "anim")
        a = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18732/animate?frames=2&spp=2&orbit_deg=10"
            f"&out={out}", timeout=30
        ).read())
        assert a["state"] == "running"
        deadline = time.time() + 300
        while time.time() < deadline:
            a = json.loads(urllib.request.urlopen(
                "http://127.0.0.1:18732/animate", timeout=10
            ).read())
            if a["state"] != "running":
                break
            time.sleep(0.5)
        assert a["state"] == "done" and a["frames"] == 2, a
        import os
        assert os.path.exists(os.path.join(out, "frame_0001.png"))
    finally:
        srv.stop()


def test_loader_fallback_chain(tmp_path):
    """Scene-parse-failure fallback (reference: SceneParser.cpp:26-41)."""
    from hiprt_pt_tpu.assets.loader import load_scene_file

    bad = tmp_path / "broken.gltf"
    bad.write_text("{not valid json")
    scene, camera = load_scene_file(str(bad))
    assert scene.num_triangles == 12  # procedural default cornell
    assert int(scene.num_emissives) == 2


def test_loader_parallel_pipeline():
    """Keyed-thread pipelined load (reference: ThreadManager DAG,
    main.cpp:55-67): texture/BVH/scene stages overlap and agree with the
    serial path."""
    from hiprt_pt_tpu.assets.loader import load_scene_file

    path = "/root/reference/data/GLTFs/cornell_pbr.gltf"
    s1, c1 = load_scene_file(path)
    s2, c2, bvh = load_scene_file(path, parallel=True, with_bvh=True)
    assert s1.num_triangles == s2.num_triangles
    assert bvh.nodes.shape[0] > 0


def test_thread_manager_dag():
    from hiprt_pt_tpu.utils.threads import ThreadManager
    import time as _t

    tm = ThreadManager()
    order = []
    tm.add_dependency("b", "a")
    tm.start_thread("a", lambda: (_t.sleep(0.1), order.append("a")))
    tm.start_thread("b", lambda: order.append("b"))
    tm.join_threads("b")
    assert order == ["a", "b"]
    # monothread mode runs inline
    tm2 = ThreadManager(monothread=True)
    tm2.start_thread("x", lambda: order.append("x"))
    assert order[-1] == "x"
    # errors surface at join
    tm.start_thread("err", lambda: 1 / 0)
    import pytest as _pytest
    with _pytest.raises(ZeroDivisionError):
        tm.join_threads("err")


def test_renderer_profile(cornell_scene):
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene
    r = Renderer(
        scene, camera, 32, 32,
        options=RenderOptions(
            bsdf_override=BSDFOverride.LAMBERTIAN, max_bounces_static=2,
            direct_light_sampling=LightSamplingStrategy.MIS,
        ),
    )
    r.settings = r.settings.replace(nb_bounces=jnp.int32(2))
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    prof = r.profile(frames=1)
    assert prof["camera_pass_ms"] > 0
    assert prof["full_frame_ms"] >= prof["camera_plus_overhead_ms"] * 0.5
    assert r.metrics.get_average("per_bounce_ms") >= 0.0


def test_viewer_tier3_panels(cornell_scene):
    """Tier-3 per-option editing, kernel introspection, and the live ReSTIR
    bias-status explainer (reference: ImGui settings window macro editing +
    the "Shader kernels" panel ImGuiSettingsWindow.cpp:2206 + the bias
    explainer :1639)."""
    import urllib.request

    from hiprt_pt_tpu.app.viewer import ViewerServer
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, BSDFOverride, LightSamplingStrategy, RenderOptions,
        ReSTIRBiasCorrection,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = cornell_scene
    r = Renderer(
        scene, camera, 32, 32,
        options=RenderOptions(
            bsdf_override=BSDFOverride.LAMBERTIAN, max_bounces_static=1,
            direct_light_sampling=LightSamplingStrategy.MIS,
        ),
    )
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(1), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    r.max_sample_count = 2
    srv = ViewerServer(r, port=18733)
    srv.serve(blocking=False)

    def get(path):
        return urllib.request.urlopen(
            f"http://127.0.0.1:18733{path}", timeout=120
        ).read()

    try:
        # /options lists every tier-3 field with enum choices
        opts = json.loads(get("/options"))
        assert opts["direct_light_sampling"]["value"] == "MIS"
        assert "RESTIR_DI" in opts["direct_light_sampling"]["choices"]
        assert opts["max_bounces_static"]["value"] == 1

        # per-option edit triggers a tier-3 recompile (strategy swap)
        res = json.loads(get(
            "/control?cmd=option&key=direct_light_sampling&value=RESTIR_DI"))
        assert res.get("ok", True), res
        opts = json.loads(get("/options"))
        assert opts["direct_light_sampling"]["value"] == "RESTIR_DI"
        # unknown option rejected cleanly
        res = json.loads(get("/control?cmd=option&key=nope&value=1"))
        assert res["ok"] is False

        # bias explainer: the default ReSTIR config carries the
        # visibility-reuse reason; switching to 1/M adds the 1/M reason;
        # non-ReSTIR strategies report inactive
        bias = json.loads(get("/bias"))
        assert bias["active"] and bias["biased"]
        titles = [x["title"] for x in bias["reasons"]]
        assert any("Visibility reuse" in t for t in titles)
        get("/control?cmd=option&key=restir_di_bias_correction"
            "&value=M_WEIGHT_1_OVER_M")
        bias = json.loads(get("/bias"))
        assert any("1/M" in x["title"] for x in bias["reasons"])
        get("/control?cmd=option&key=direct_light_sampling&value=MIS")
        bias = json.loads(get("/bias"))
        assert bias["active"] is False

        # kernel introspection: AOT stats for the live executable
        stats = json.loads(get("/kernels"))
        assert stats["kernel"] == "render_step"
        assert ("generated_code_size_in_bytes" in stats
                or "cost" in stats), stats
    finally:
        srv.stop()
