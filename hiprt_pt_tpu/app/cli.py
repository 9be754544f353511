"""Command-line renderer — the framework's headless entry point.

Role parity with the reference's ``main()`` + ``CommandlineArguments``
(src/main.cpp:28-104, src/Utils/CommandlineArguments.h:11-27 — bare scene
path, --sky=<envmap>, --samples=N, --bounces=N, --w/--h) plus the GPU_RENDER=0
headless render-to-PNG mode (main.cpp:77-101). Extended with strategy/denoise/
checkpoint flags covering the tier-3 option matrix.

Usage:
    python -m hiprt_pt_tpu.app.cli scene.gltf --samples=64 --bounces=8 \
        --w=1280 --h=720 --sky=env.hdr --out=render.png
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hiprt_pt_tpu",
        description="TPU-native physically-based path tracer",
    )
    p.add_argument("scene", help="GLTF scene file")
    p.add_argument("--sky", default=None, help="equirectangular HDR envmap")
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--w", type=int, default=1280)
    p.add_argument("--h", type=int, default=720)
    p.add_argument("--out", default=None, help="output PNG (auto-named if omitted)")
    p.add_argument("--hdr-out", default=None, help="also write a .hdr")
    p.add_argument(
        "--strategy",
        choices=["nee", "mis", "bsdf", "ris", "restir"],
        default="mis",
        help="direct light sampling strategy",
    )
    p.add_argument("--denoise", action="store_true")
    p.add_argument("--exposure", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=2.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--spp-per-frame", type=int, default=4)
    p.add_argument("--adaptive", action="store_true", help="adaptive sampling")
    p.add_argument(
        "--clamp", type=float, default=0.0,
        help="per-sample contribution clamp (0=off, unbiased; reference: "
             "direct/indirect contribution clamps)",
    )
    p.add_argument("--checkpoint", default=None, help="save render state here")
    p.add_argument("--resume", default=None, help="resume render state from here")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--max-time", type=float, default=None, help="seconds")
    return p


_STRATEGY = {
    "nee": "UNIFORM_ONE",
    "mis": "MIS",
    "bsdf": "BSDF_ONLY",
    "ris": "RIS_BSDF_LIGHT",
    "restir": "RESTIR_DI",
}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ..assets.envmap import load_envmap
    from ..assets.image_io import write_hdr, write_png
    from ..assets.loader import load_scene_file
    from ..core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from ..render.renderer import Renderer
    from ..utils.logger import get_logger
    from .screenshot import auto_filename

    log = get_logger()
    t0 = time.perf_counter()
    envmap = load_envmap(args.sky) if args.sky else None
    scene, camera = load_scene_file(
        args.scene, aspect=args.w / args.h, envmap=envmap
    )
    log.info(
        f"scene loaded: {scene.num_triangles} triangles, "
        f"{scene.materials.num_materials} materials "
        f"({time.perf_counter() - t0:.1f}s)"
    )

    options = RenderOptions(
        direct_light_sampling=LightSamplingStrategy[_STRATEGY[args.strategy]],
        max_bounces_static=args.bounces,
    )
    r = Renderer(scene, camera, args.w, args.h, options=options, seed=args.seed)
    log.info(f"BVH built in {r.bvh_build_time:.2f}s")
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(args.bounces),
        samples_per_frame=jnp.int32(args.spp_per_frame),
        enable_adaptive_sampling=jnp.bool_(args.adaptive),
        direct_contribution_clamp=jnp.float32(args.clamp),
        indirect_contribution_clamp=jnp.float32(args.clamp),
        envmap_contribution_clamp=jnp.float32(args.clamp),
    )
    if envmap is not None:
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.ENVMAP))
        )
    if args.resume:
        from ..render.checkpoint import load_checkpoint

        r.state = load_checkpoint(args.resume, r.state)
        sc = int(jax.device_get(r.state.sample_count))
        r._sc_host = sc  # keep the renderer's host mirror in sync
        log.info(f"resumed from {args.resume} at sample {sc}")
    r.max_sample_count = args.samples
    r.max_render_time = args.max_time

    t0 = time.perf_counter()
    last_log = 0.0
    while not r.is_rendering_done():
        r.step(block=True)
        now = time.perf_counter()
        if now - last_log > 2.0:
            sc = int(jax.device_get(r.state.sample_count))
            sps = r.metrics.get_average("samples_per_s")
            log.update_line(
                "render", f"[render] {sc}/{args.samples} spp  "
                f"{sps:.2f} spp/s  {now - t0:.0f}s"
            )
            last_log = now
    log.end_line("render")
    dt = time.perf_counter() - t0
    sc = int(jax.device_get(r.state.sample_count))
    rays = float(jax.device_get(r.state.rays_traced))
    log.info(
        f"rendered {sc} spp in {dt:.1f}s "
        f"({rays / max(dt, 1e-9) / 1e6:.1f} Mrays/s)"
    )

    if args.denoise:
        from ..render.denoise import denoise

        hdr = denoise(r)
    else:
        hdr = r.hdr_image()

    out = args.out or auto_filename(args.scene, sc, args.w, args.h)
    from ..ops.tonemap import tonemap_gamma
    import numpy as np

    ldr = np.asarray(tonemap_gamma(jnp.asarray(hdr), args.exposure, args.gamma))
    write_png(out, ldr, gamma_encode=False)
    log.info(f"wrote {out}")
    if args.hdr_out:
        write_hdr(args.hdr_out, hdr)
        log.info(f"wrote {args.hdr_out}")
    if args.checkpoint:
        from ..render.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, r.state)
        log.info(f"checkpoint saved to {args.checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
