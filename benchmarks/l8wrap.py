"""Measure the lane8s WRAPPER overhead vs the bare kernel, and XLA gather
costs at wavefront sizes (the compaction probe read 104 ms for a 2M
perm+gather roundtrip — if that generalizes, host-side gathers around the
kernels and in shading are a major hidden tax).

Run ALONE on the TPU:  python benchmarks/l8wrap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hiprt_pt_tpu.utils.precompile import enable_persistent_cache


def timed(label, fn, mk, reps=5):
    out = fn(*mk(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = fn(*mk(i))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    enable_persistent_cache()
    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.accel.build import build_bvh
    from hiprt_pt_tpu.ops import pallas_traverse as pt

    scene, cam = load_stress_scene(aspect=16 / 9)
    verts = np.asarray(scene.vertices)
    bvh = build_bvh(verts, np.asarray(scene.triangles))
    n = 256 * 1024
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    o = jax.random.uniform(k1, (n, 3), jnp.float32,
                           minval=jnp.asarray(lo * 0.8),
                           maxval=jnp.asarray(hi * 0.8))
    d = jax.random.normal(k2, (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    one = jnp.ones((n,), jnp.float32)

    # full wrapper
    timed("full traverse_pallas_lane8s cl",
          jax.jit(lambda o_, d_: pt.traverse_pallas_lane8s(
              bvh, o_, d_, tmin, tmax, one).t),
          lambda i: (o + i * 1e-6, d))

    # input-prep only (stack + reshape/transpose to (n_gen*8, 8, LN))
    LN = 512
    R = 8 * LN
    n_gen = n // R

    @jax.jit
    def prep(o_, d_):
        f7 = jnp.where(one > 0, tmax, -1.0)
        fields = jnp.stack([
            o_[:, 0], o_[:, 1], o_[:, 2], d_[:, 0], d_[:, 1], d_[:, 2],
            tmin, f7], axis=0)
        return fields.reshape(8, n_gen, 8, LN).transpose(
            1, 0, 2, 3).reshape(n_gen * 8, 8, LN)

    timed("input prep (stack+reshape+transpose)", prep,
          lambda i: (o + i * 1e-6, d))

    # output postprocess only (reshape/transpose + lane8_order gather)
    out_fake = jax.random.uniform(jax.random.PRNGKey(1),
                                  (n_gen * 4, 8, LN), jnp.float32)

    @jax.jit
    def post(out):
        blk = out.reshape(n_gen, 4, 8, LN).transpose(1, 0, 2, 3).reshape(
            4, n)
        prim = blk[1].astype(jnp.int32)
        miss = prim < 0
        prim = jnp.where(miss, -1,
                         bvh.lane8_order[jnp.clip(
                             prim, 0, bvh.lane8_order.shape[0] - 1)])
        return prim, blk[0]

    timed("output post (reshape + order gather)", post,
          lambda i: (out_fake + i * 1e-6,))

    @jax.jit
    def post_nogather(out):
        blk = out.reshape(n_gen, 4, 8, LN).transpose(1, 0, 2, 3).reshape(
            4, n)
        return blk[1].astype(jnp.int32), blk[0]

    timed("output post (reshape only)", post_nogather,
          lambda i: (out_fake + i * 1e-6,))

    # plain gathers at wavefront sizes
    order = bvh.lane8_order
    idx256 = jax.random.randint(jax.random.PRNGKey(2), (n,), 0,
                                order.shape[0])
    timed("gather order[idx] @256k", jax.jit(lambda ix: order[ix]),
          lambda i: ((idx256 + i) % order.shape[0],))

    n2 = 1920 * 1080
    tri_data = scene.tri_data
    idx2m = jax.random.randint(jax.random.PRNGKey(3), (n2,), 0,
                               tri_data.shape[0])
    timed("gather tri_data[(2.07M,)] (N,32) rows",
          jax.jit(lambda ix: tri_data[ix]),
          lambda i: ((idx2m + i) % tri_data.shape[0],))
    timed("gather tri_data[(256k,)] rows",
          jax.jit(lambda ix: tri_data[ix]),
          lambda i: ((idx256 + i) % tri_data.shape[0],))
    v = scene.vertices
    timed("gather vertices[(2.07M,)] (V,3) rows",
          jax.jit(lambda ix: v[ix % v.shape[0]]),
          lambda i: (idx2m + i,))


if __name__ == "__main__":
    main()
