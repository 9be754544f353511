"""Traversal experiments: N-scaling, chunked lax.map variant, octant sorting.

IMPORTANT: the axon relay memoizes repeated identical dispatches, so every
timed call uses a DISTINCT input (per-iteration origin jitter).

Data source for the round-2 traversal redesign; run on the real TPU.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 4


def timeit_varied(make_fn, variants):
    """make_fn(variant) -> out. Times over distinct variants (compile excluded
    by a warmup on variants[0])."""
    import jax

    out = make_fn(variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for v in variants[1:]:
        out = make_fn(v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (len(variants) - 1)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from hiprt_pt_tpu.assets.gltf import load_gltf
    from hiprt_pt_tpu.accel.build import build_bvh
    from hiprt_pt_tpu.core.camera import generate_camera_rays
    from hiprt_pt_tpu.ops.pixel_order import pixel_coords
    from hiprt_pt_tpu.ops.traverse import traverse_packets

    W = H = 1024
    N = W * H
    parsed = load_gltf(
        "/root/reference/data/GLTFs/cornell_pbr.gltf", aspect_override=1.0
    )
    bvh = build_bvh(np.asarray(parsed.vertices), np.asarray(parsed.triangles))

    px, py = pixel_coords(W, H)
    jitter = jnp.full((N, 2), 0.5)
    o_cam, d_cam = generate_camera_rays(parsed.camera, W, H, jitter, px, py)
    rec = traverse_packets(bvh, o_cam, d_cam)
    jax.block_until_ready(rec.t)
    p_hit = o_cam + d_cam * jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)[:, None]
    k2 = jax.random.PRNGKey(7)
    d_diff = jax.random.normal(k2, (N, 3))
    d_diff = d_diff / jnp.linalg.norm(d_diff, axis=1, keepdims=True)

    def variants_for(o, k=ITERS + 1):
        # tiny origin perturbation — distinct inputs, same traversal shape
        return [o + 1e-5 * (i + 1) for i in range(k)]

    # ---- N scaling (diffuse rays) ----
    print("== N scaling, packet traversal, diffuse rays ==", flush=True)
    for n in (8192, 32768, 131072, 1048576):
        d_s = d_diff[:n]
        dt = timeit_varied(
            lambda o_s: traverse_packets(bvh, o_s, d_s, t_min=1e-3),
            variants_for(p_hit[:n]),
        )
        print(f"  N={n:8d}: {dt*1e3:8.2f} ms   {n/dt/1e6:7.1f} Mrays/s",
              flush=True)

    # camera rays for comparison
    dt = timeit_varied(
        lambda o_s: traverse_packets(bvh, o_s, d_cam), variants_for(o_cam)
    )
    print(f"  camera 1M: {dt*1e3:8.2f} ms   {N/dt/1e6:7.1f} Mrays/s", flush=True)

    # ---- chunked lax.map variant ----
    print("== chunked lax.map (each chunk stops at its own max iters) ==",
          flush=True)

    @partial(jax.jit, static_argnames=("chunk",))
    def traverse_chunked(o, d, chunk):
        n = o.shape[0]
        c = n // chunk

        def body(args):
            o_c, d_c = args
            r = traverse_packets(bvh, o_c, d_c, t_min=1e-3)
            return (r.t, r.prim)

        t, prim = jax.lax.map(
            body, (o.reshape(c, chunk, 3), d.reshape(c, chunk, 3))
        )
        return t.reshape(n), prim.reshape(n)

    for chunk in (2048, 8192, 32768, 131072):
        dt = timeit_varied(
            lambda o_s, chunk=chunk: traverse_chunked(o_s, d_diff, chunk),
            variants_for(p_hit),
        )
        print(f"  chunk={chunk:7d}: {dt*1e3:8.2f} ms   {N/dt/1e6:7.1f} Mrays/s",
              flush=True)

    # ---- chunked + direction-octant sort ----
    print("== chunked + direction-octant sort ==", flush=True)

    @partial(jax.jit, static_argnames=("chunk",))
    def traverse_sorted_chunked(o, d, chunk):
        n = o.shape[0]
        key = (
            (d[:, 0] > 0).astype(jnp.int32) * 4
            + (d[:, 1] > 0).astype(jnp.int32) * 2
            + (d[:, 2] > 0).astype(jnp.int32)
        )
        perm = jnp.argsort(key, stable=True)
        o_s, d_s = o[perm], d[perm]
        c = n // chunk

        def body(args):
            o_c, d_c = args
            r = traverse_packets(bvh, o_c, d_c, t_min=1e-3)
            return (r.t, r.prim)

        t, prim = jax.lax.map(
            body, (o_s.reshape(c, chunk, 3), d_s.reshape(c, chunk, 3))
        )
        inv = jnp.argsort(perm)
        return t.reshape(n)[inv], prim.reshape(n)[inv]

    for chunk in (8192, 32768):
        dt = timeit_varied(
            lambda o_s, chunk=chunk: traverse_sorted_chunked(o_s, d_diff, chunk),
            variants_for(p_hit),
        )
        print(f"  chunk={chunk:7d}: {dt*1e3:8.2f} ms   {N/dt/1e6:7.1f} Mrays/s",
              flush=True)

    # ---- half-dead wavefront: does chunking + activity sort compact? ----
    print("== 25%-active wavefront (bounce-3-like), chunk=8192 ==", flush=True)
    act = (jnp.arange(N) % 4) == 0  # scattered active rays

    @partial(jax.jit, static_argnames=("chunk", "do_sort"))
    def traverse_active(o, d, active, chunk, do_sort):
        n = o.shape[0]
        if do_sort:
            perm = jnp.argsort(~active, stable=True)  # active first
        else:
            perm = jnp.arange(n)
        o_s, d_s, a_s = o[perm], d[perm], active[perm]
        c = n // chunk

        def body(args):
            o_c, d_c, a_c = args
            r = traverse_packets(bvh, o_c, d_c, t_min=1e-3, active=a_c)
            return (r.t, r.prim)

        t, prim = jax.lax.map(
            body,
            (o_s.reshape(c, chunk, 3), d_s.reshape(c, chunk, 3),
             a_s.reshape(c, chunk)),
        )
        inv = jnp.argsort(perm)
        return t.reshape(n)[inv], prim.reshape(n)[inv]

    for do_sort in (False, True):
        dt = timeit_varied(
            lambda o_s, s=do_sort: traverse_active(o_s, d_diff, act, 8192, s),
            variants_for(p_hit),
        )
        print(f"  sort={str(do_sort):5s}: {dt*1e3:8.2f} ms "
              f"  ({N/4/dt/1e6:7.1f} Mrays/s on active rays)", flush=True)


if __name__ == "__main__":
    main()
