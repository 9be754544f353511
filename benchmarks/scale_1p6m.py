"""Million-triangle scale proof (VERDICT r2 #4).

Builds a 1.63M-triangle variant of the stress interior (tri_scale=11 —
inside the lane8 caps: 5,034 BVH8 nodes / 42.4 MB leaf table), then on the
real TPU:
  1. exactness: lane8s + wide-packet traversal vs the XLA packet walk on a
     64k-ray sampled wavefront (camera rays AND scattered bounce rays);
  2. throughput: full render_step at 1080p, RIS + full principled BSDF —
     the same shape as the headline bench (reference anchor: arbitrary-size
     HW BVH build, src/HIPRT-Orochi/HIPRTScene.h:60-92).

Run ALONE on the TPU. Prints one JSON line at the end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()

    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core import rng as rng_mod
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.ops import pallas_traverse as pt
    from hiprt_pt_tpu.ops.traverse import closest_hit_coherent
    from hiprt_pt_tpu.render.renderer import Renderer

    width, height = 1920, 1080
    t0 = time.perf_counter()
    scene, cam = load_stress_scene(aspect=width / height, tri_scale=11.0)
    n_tris = int(scene.triangles.shape[0])
    print(f"scene: {n_tris} tris, built in {time.perf_counter() - t0:.1f}s",
          flush=True)

    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=4,
    )
    r = Renderer(scene, cam, width, height, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )
    bvh = r.bvh
    # production routing at this scale: lane8s up to m_leaves<=16384
    # (~1.45M tris), then the lane8log fallback (packed-ref cap), then the
    # stream8l/XLA cliff past MAX_LANE8_* — report which route is active
    lane8s_ok = pt.pallas_lane8s_supported(bvh, 65536)
    lane8log_ok = pt.pallas_lane8_supported(bvh, 65536)
    wide_ok = pt.pallas_wide_supported(bvh, 65536)
    incoherent_route = ("lane8s" if lane8s_ok
                        else "lane8log" if lane8log_ok else "stream8l/xla")
    print(f"routes: incoherent={incoherent_route} wide={wide_ok} "
          f"(m_nodes={bvh.nodes_lane8.shape[0]}, "
          f"m_leaves={bvh.leaves_lane8.shape[0]})", flush=True)
    assert lane8log_ok and wide_ok, "1.6M tris should be inside lane8 caps"

    # --- 1. exactness on a 64k sampled wavefront -------------------------
    from hiprt_pt_tpu.core.camera import generate_camera_rays

    o_cam, d_cam = generate_camera_rays(cam, 512, 128)  # 64k rays
    # bvh rides as a traced jit ARGUMENT (a closure would embed the 42 MB
    # tables as HLO constants and blow the relay's remote-compile body cap)
    rec_x = jax.jit(
        lambda b, o, d: closest_hit_coherent(b, o, d, t_min=0.0)
    )(bvh, o_cam, d_cam)
    jax.block_until_ready(rec_x.t)
    rec_w = jax.jit(
        lambda b, o, d: pt.traverse_pallas_wide(b, o, d, t_min=0.0)
    )(bvh, o_cam, d_cam)
    if lane8s_ok:
        lane_trace = lambda b, o, d, act=None: pt.traverse_pallas_lane8s(
            b, o, d, t_min=0.0, active=act, lanes=512, window=16)
    else:
        lane_trace = lambda b, o, d, act=None: pt.traverse_pallas_lane8log(
            b, o, d, t_min=0.0, active=act, round_every=8, lanes=512)
    rec_s = jax.jit(lambda b, o, d: lane_trace(b, o, d))(bvh, o_cam, d_cam)
    px = np.asarray(rec_x.prim)
    agree_w = float(np.mean(px == np.asarray(rec_w.prim)))
    agree_s = float(np.mean(px == np.asarray(rec_s.prim)))
    m = px >= 0
    dt_s = float(np.max(np.abs(
        np.asarray(rec_s.t)[m] - np.asarray(rec_x.t)[m]
    ) / np.maximum(np.asarray(rec_x.t)[m], 1e-3)))
    print(f"camera agreement: wide {agree_w:.5f} {incoherent_route} "
          f"{agree_s:.5f} (max rel t err {dt_s:.2e})", flush=True)

    # scattered (incoherent) wavefront from the hit points
    rngs = rng_mod.seed(jnp.arange(65536, dtype=jnp.uint32),
                        jnp.int32(0), jnp.uint32(3))
    from hiprt_pt_tpu.ops.sampling import sample_cosine_hemisphere
    from hiprt_pt_tpu.ops.intersect import offset_ray_origin

    rngs, u1 = rng_mod.next_float(rngs)
    rngs, u2 = rng_mod.next_float(rngs)
    # random sphere directions (fully incoherent)
    z = u1 * 2.0 - 1.0
    phi = u2 * 2.0 * jnp.pi
    rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    d_inc = jnp.stack([rxy * jnp.cos(phi), rxy * jnp.sin(phi), z], axis=-1)
    p_hit = o_cam + d_cam * jnp.where(
        jnp.isfinite(rec_x.t), rec_x.t, 0.0)[:, None]
    o_inc = p_hit + d_inc * 1e-3
    act = jnp.asarray(m)
    rec_xi = jax.jit(lambda b, o, d: closest_hit_coherent(
        b, o, d, t_min=0.0, active=act))(bvh, o_inc, d_inc)
    rec_si = jax.jit(lambda b, o, d: lane_trace(b, o, d, act))(
        bvh, o_inc, d_inc)
    pxi = np.asarray(rec_xi.prim)[m]
    agree_i = float(np.mean(pxi == np.asarray(rec_si.prim)[m]))
    print(f"incoherent agreement: {incoherent_route} {agree_i:.5f}", flush=True)

    # --- 2. full-frame throughput at 1080p -------------------------------
    r.fuse_frame = True
    r.settings = r.settings.replace(samples_per_frame=jnp.int32(2))
    r.step(block=True)  # compile + warm
    rays0 = float(jax.device_get(r.state.rays_traced))
    t0 = time.perf_counter()
    r.step(block=True)
    dt = time.perf_counter() - t0
    rays1 = float(jax.device_get(r.state.rays_traced))
    mrays = (rays1 - rays0) / dt / 1e6
    print(json.dumps({
        "metric": "scale proof (stress interior tri_scale=11)",
        "tris": n_tris,
        "mrays_per_s": round(mrays, 2),
        "agreement_camera_wide": round(agree_w, 5),
        "incoherent_route": incoherent_route,
        "agreement_camera_lane": round(agree_s, 5),
        "agreement_incoherent_lane": round(agree_i, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
