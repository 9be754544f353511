"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): Mrays/s/chip at 1080p on a Bistro-class workload
with the FULL principled BSDF — here the procedural stress interior
(hiprt_pt_tpu/assets/stress.py: 259k tris, 120 area emitters, 18 textures,
all BSDF lobes; the reference's Bistro-class assets are not importable —
white-room .bin missing upstream). Target: >= 150 Mrays/s/chip
(BASELINE.json, v5p; this host is v5e — see BASELINE.md for the modeled
v5e->v5p scaling row).

Robustness contract with the driver (the round-2 record was rc=124 with no
output at all):
- The headline JSON line is printed, flushed, the MOMENT the stress scene
  is measured. Extras (cornell MIS, ReSTIR DI, 1.5M-tri scale) each re-print
  the full line with the extras dict grown — whichever line is last when the
  driver's timeout lands carries the headline plus every extra measured so
  far. A timeout can only lose extras, never the headline.
- An internal wall-clock budget (BENCH_BUDGET_S, default 400 s) skips
  remaining extras so a normal run exits 0 well inside the driver's window.
- The persistent XLA cache (.xla_cache) plays the reference's shader-cache
  role (GPUKernelCompiler.cpp:250-308): the first run at a given code state
  pays relay-side compiles (~4 min per 1080p program on the axon relay);
  warm reruns skip them.
- Frame timing uses one fused n_samples=FRAMES dispatch (lax.fori_loop over
  samples, bit-exact vs the sequential chain — tests/test_integrator.py) so
  the measurement carries ONE relay dispatch+readback noise (30-400 ms
  observed) over the whole batch instead of one per frame.
"""

import json
import os
import sys
import time

_T0 = time.perf_counter()
# 700 s: a fully-warm four-row run measured 498 s wall (r5); 400 s lost
# the restir row at the gate. The driver's recorded runs have tolerated
# >1200 s (BENCH_r05 warm-up run this round), so 700 keeps every evidence
# row with margin while staying far inside the external window.
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "700"))


def _elapsed():
    return time.perf_counter() - _T0


def _emit(headline_mrays, extra):
    baseline_target = 150.0  # Mrays/s/chip (BASELINE.json)
    print(
        json.dumps(
            {
                "metric": (
                    "Mrays/s/chip (stress interior 259k tris/120 lights, "
                    "1080p, full principled BSDF, RIS, 4 bounces)"
                ),
                "value": round(headline_mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(headline_mrays / baseline_target, 4),
                "extra": extra,
            }
        ),
        flush=True,
    )


def _bench_renderer(r, n_frames=4):
    """Mrays/s and spp/s over one fused n_frames-sample dispatch.

    The warm-up runs the full n_frames program once (its sample count is
    static in the fused path); with the persistent XLA cache warm, each
    config costs ~2x its device frame time inside the 400 s budget."""
    import jax
    import jax.numpy as jnp

    r.fuse_frame = True
    r.settings = r.settings.replace(samples_per_frame=jnp.int32(n_frames))
    # warm-up MUST run the n_frames program: the fused path's sample count
    # is STATIC (render_step n_samples), so a 1-sample warm-up compiles a
    # different executable and the timed run pays the real compile (the
    # r5 first-draft "cheap warm" measured 0.34 Mrays/s for exactly that
    # reason)
    r.step(block=True)
    rays0 = float(jax.device_get(r.state.rays_traced))
    t0 = time.perf_counter()
    r.step(block=True)
    # the value fetch is INSIDE the timing: block_until_ready can return
    # early under the axon relay (benchmarks/r5probe2.py, 2026-08-21), so
    # only the device_get reliably bounds the device work; its ~30 ms
    # relay floor is noise on a multi-second measurement
    rays1 = float(jax.device_get(r.state.rays_traced))
    dt = time.perf_counter() - t0
    return (rays1 - rays0) / dt / 1e6, n_frames / dt


def main():
    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()  # shader-cache analog: reruns skip compiles

    from hiprt_pt_tpu.assets.loader import load_scene_file
    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    width, height = 1920, 1080
    extra = {"device": None}

    def make_renderer(scene, cam, strategy, **opt_kw):
        opts = RenderOptions(
            direct_light_sampling=strategy, max_bounces_static=4, **opt_kw
        )
        r = Renderer(scene, cam, width, height, options=opts)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        return r

    # --- headline: stress interior, full principled BSDF, RIS many-light ---
    scene_s, cam_s = load_stress_scene(aspect=width / height)
    rs = make_renderer(scene_s, cam_s, LightSamplingStrategy.RIS_BSDF_LIGHT)
    extra["device"] = str(jax.devices()[0])
    stress_mrays, stress_spp = _bench_renderer(rs)
    extra["stress_spp_per_s_1080p"] = round(stress_spp, 3)
    _emit(stress_mrays, extra)  # headline lands NOW, extras grow below
    del rs

    # --- extra: million-triangle scale proof (config 6; VERDICT r2 #4) ---
    # 1.63M-tri stress variant — runs FIRST among extras (r4's bench lost
    # this row and cornell's to the 400 s budget; ReSTIR now goes last).
    # lane8s's old 14-bit packed-ref cap was lifted in r5 (plane-B
    # packing), so production routing at this scale is lane8s itself.
    if _elapsed() < _BUDGET_S:
        try:
            scene_l, cam_l = load_stress_scene(
                aspect=width / height, tri_scale=11.0
            )
            rl = make_renderer(scene_l, cam_l,
                               LightSamplingStrategy.RIS_BSDF_LIGHT)
            scale_mrays, _ = _bench_renderer(rl, n_frames=2)
            extra["scale_1p6m_tris"] = int(scene_l.triangles.shape[0])
            extra["scale_1p6m_mrays_per_s"] = round(scale_mrays, 2)
            del rl
            _emit(stress_mrays, extra)
        except Exception as e:
            extra["scale_error"] = repr(e)[:200]
            _emit(stress_mrays, extra)

    # --- extra: cornell, full principled BSDF, MIS NEE (config-1 @1080p) ---
    if _elapsed() < _BUDGET_S:
        try:
            scene_c, cam_c = load_scene_file(
                "/root/reference/data/GLTFs/cornell_pbr.gltf",
                aspect=width / height,
            )
            rc = make_renderer(scene_c, cam_c, LightSamplingStrategy.MIS)
            cornell_mrays, cornell_spp = _bench_renderer(rc)
            extra["cornell_full_bsdf_mrays_per_s"] = round(cornell_mrays, 2)
            extra["cornell_spp_per_s_1080p"] = round(cornell_spp, 3)
            del rc
            _emit(stress_mrays, extra)
        except Exception as e:
            extra["cornell_error"] = repr(e)[:200]
            _emit(stress_mrays, extra)

    # --- extra: ReSTIR DI fused spatiotemporal on the stress scene (the
    # reference's flagship interactive mode, ReSTIRDIRenderPass.cpp:475-506)
    if _elapsed() < _BUDGET_S:
        try:
            rr = make_renderer(scene_s, cam_s, LightSamplingStrategy.RESTIR_DI)
            restir_mrays, restir_spp = _bench_renderer(rr)
            extra["restir_mrays_per_s"] = round(restir_mrays, 2)
            extra["restir_spp_per_s_1080p"] = round(restir_spp, 3)
            del rr
            _emit(stress_mrays, extra)
        except Exception as e:  # an extra must never kill the headline
            extra["restir_error"] = repr(e)[:200]
            _emit(stress_mrays, extra)

    extra["bench_wall_s"] = round(_elapsed(), 1)
    _emit(stress_mrays, extra)


if __name__ == "__main__":
    main()
