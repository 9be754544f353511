"""A/B the BVH8+SMEM-refs streaming kernel vs the BVH4 streaming kernel.

Correctness: closest-hit t/prim must match the XLA reference traversal
exactly (same BVH policy decisions do not apply across different trees, so
matching is vs brute-force-style agreement: same t within 1e-4 and both-hit
agreement, not bitwise prim equality — different trees can order equal-t
duplicates differently).

Run on the real TPU: python benchmarks/exp_stream8.py [--stress]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit_varied(make_fn, variants):
    import jax

    out = make_fn(variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for v in variants[1:]:
        out = make_fn(v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (len(variants) - 1), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", action="store_true")
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.accel.build import build_bvh
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pixel_order import pixel_coords
    from hiprt_pt_tpu.ops.pallas_traverse import (
        traverse_pallas_stream,
        traverse_pallas_stream8,
    )

    if args.stress:
        from hiprt_pt_tpu.assets.stress import load_stress_scene

        scene, camera = load_stress_scene(aspect=1.0)
        verts, tris = np.asarray(scene.vertices), np.asarray(scene.triangles)
    else:
        from hiprt_pt_tpu.assets.gltf import load_gltf

        parsed = load_gltf(
            "/root/reference/data/GLTFs/cornell_pbr.gltf", aspect_override=1.0
        )
        verts, tris = np.asarray(parsed.vertices), np.asarray(parsed.triangles)
        camera = parsed.camera

    bvh = build_bvh(verts, tris)
    print(
        f"tris {tris.shape[0]}  nodes4 {bvh.nodes4.shape}  "
        f"nodes8 {bvh.nodes8.shape}  refs8 SMEM "
        f"{bvh.refs8.size*4/1024:.0f} KB", flush=True,
    )

    N = args.n
    W = H = int(np.sqrt(N))
    px, py = pixel_coords(W, H)
    jitter = jnp.full((W * H, 2), 0.5)
    o_cam, d_cam = generate_camera_rays(camera, W, H, jitter, px, py)

    rec4 = traverse_pallas_stream(bvh, o_cam, d_cam, t_min=0.0)
    jax.block_until_ready(rec4.t)
    rec8 = traverse_pallas_stream8(bvh, o_cam, d_cam, t_min=0.0)
    jax.block_until_ready(rec8.t)
    t4 = np.asarray(rec4.t)
    t8 = np.asarray(rec8.t)
    hit_agree = float(np.mean((t4 < np.inf) == (t8 < np.inf)))
    both = (t4 < np.inf) & (t8 < np.inf)
    dt_max = float(np.max(np.abs(t4[both] - t8[both]))) if both.any() else 0.0
    print(f"camera correctness: hit-agree {hit_agree:.6f}  max|dt| {dt_max:.2e}",
          flush=True)
    assert hit_agree > 0.9999 and dt_max < 1e-3, "stream8 disagrees"

    p_hit = o_cam + d_cam * np.where(np.isfinite(t4), t4, 0.0)[:, None]
    k2 = jax.random.PRNGKey(7)
    d_diff = jax.random.normal(k2, (W * H, 3))
    d_diff = d_diff / jnp.linalg.norm(d_diff, axis=1, keepdims=True)
    p_hit = jnp.asarray(p_hit)

    r4 = traverse_pallas_stream(bvh, p_hit, d_diff, t_min=1e-3)
    r8 = traverse_pallas_stream8(bvh, p_hit, d_diff, t_min=1e-3)
    t4b, t8b = np.asarray(r4.t), np.asarray(r8.t)
    agree = float(np.mean((t4b < np.inf) == (t8b < np.inf)))
    bothb = (t4b < np.inf) & (t8b < np.inf)
    dmax = float(np.max(np.abs(t4b[bothb] - t8b[bothb]))) if bothb.any() else 0.0
    print(f"bounce correctness: hit-agree {agree:.6f}  max|dt| {dmax:.2e}",
          flush=True)

    def variants_for(o, k):
        return [o + 1e-5 * (i + 1) for i in range(k)]

    for label, o, d, tmin, ah in (
        ("camera", o_cam, d_cam, 0.0, False),
        ("bounce", p_hit, d_diff, 1e-3, False),
        ("shadow", p_hit, d_diff, 1e-3, True),
    ):
        dt4, _ = timeit_varied(
            lambda oo: traverse_pallas_stream(
                bvh, oo, d, t_min=tmin, any_hit=ah
            ).t,
            variants_for(o, args.iters + 1),
        )
        dt8, _ = timeit_varied(
            lambda oo: traverse_pallas_stream8(
                bvh, oo, d, t_min=tmin, any_hit=ah
            ).t,
            variants_for(o, args.iters + 1),
        )
        print(
            f"{label}: bvh4 {dt4*1e3:7.1f} ms ({N/dt4/1e6:6.2f} Mr/s)   "
            f"bvh8 {dt8*1e3:7.1f} ms ({N/dt8/1e6:6.2f} Mr/s)   "
            f"speedup {dt4/dt8:4.2f}x", flush=True,
        )


if __name__ == "__main__":
    main()
