"""Marginal per-bounce frame cost on the stress scene (relay-safe pattern).

The axon relay memoizes repeated identical dispatches, so the delta-timed
Renderer.profile() pattern (same executable re-run on a copied state) reads
fake sub-millisecond numbers through the tunnel. This probe instead times
CHAINED renderer.step frames (state advances every dispatch — distinct
inputs) at each nb_bounces value; the differences give honest marginal
bounce costs. Usage:  python benchmarks/bounce_profile.py [--res 1920x1080]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--max-bounces", type=int, default=4)
    args = ap.parse_args()
    w, h = (int(x) for x in args.res.split("x"))

    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, cam = load_stress_scene(aspect=w / h)
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.RIS_BSDF_LIGHT,
        max_bounces_static=args.max_bounces,
    )
    r = Renderer(scene, cam, w, h, options=opts)
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
    )

    out = {}
    prev = None
    for nb in range(args.max_bounces + 1):
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(nb), samples_per_frame=jnp.int32(1)
        )
        r.step(block=True)  # warm-up/compile for this nb (same executable)
        t0 = time.perf_counter()
        for _ in range(args.frames):
            r.step()
        jax.block_until_ready(r.state.accum)
        ms = (time.perf_counter() - t0) / args.frames * 1000.0
        out[f"frame_ms_nb{nb}"] = round(ms, 1)
        if prev is not None:
            out[f"marginal_ms_bounce{nb}"] = round(ms - prev, 1)
        prev = ms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
