"""lane8s per-phase cost decomposition via table-padding A/B.

The one-hot matmul gathers cost (table rows x row bytes x lanes) per
fetch REGARDLESS of how many lanes need service. Padding a table with
never-referenced rows leaves the walk bit-identical but scales that
phase's gather cost by the pad factor — the timing delta is an exact
in-situ measurement of that phase's share. Occupancy stats (probe=True
kernel build) decompose the rest.

Run ALONE on the TPU:  python benchmarks/l8decomp.py [nrays_k] [reps]
Each rep uses a distinct ray set (relay memoizes identical dispatches).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hiprt_pt_tpu.assets.stress import load_stress_scene
from hiprt_pt_tpu.accel.build import build_bvh
from hiprt_pt_tpu.ops import pallas_traverse as pt


_NULL_FLOOR = [0.0]


def measure_null_floor(reps=6):
    """Per-rep relay dispatch+fetch floor: a trivial jitted op, distinct
    args per rep (the relay memoizes identical dispatches)."""
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    np.asarray(f(jnp.float32(0.5)))
    t0 = time.perf_counter()
    for i in range(reps):
        np.asarray(f(jnp.float32(i)))
    _NULL_FLOOR[0] = (time.perf_counter() - t0) / reps
    print(f"relay null floor: {_NULL_FLOOR[0] * 1e3:.1f} ms/rep",
          flush=True)


def make_rays(key, n, lo, hi):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), jnp.float32,
                           minval=jnp.asarray(lo * 0.8),
                           maxval=jnp.asarray(hi * 0.8))
    d = jax.random.normal(k2, (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def bench(label, bvh, rays, any_hit, reps, **kw):
    n = rays[0][0].shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), jnp.float32)
    # occupancy stats on ray set 0 — probe=True ONLY here: the per-iter
    # SMEM stat accumulates serialize the kernel (~100x slower), so timed
    # reps below run the production probe=False build
    rec, st = pt.traverse_pallas_lane8s(
        bvh, rays[0][0], rays[0][1], tmin, tmax, act,
        any_hit=any_hit, return_stats=True, probe=True, **kw)
    jax.block_until_ready(rec.t)
    st = np.asarray(st)
    # warm-up the production executable
    rec = pt.traverse_pallas_lane8s(
        bvh, rays[0][0], rays[0][1], tmin, tmax, act,
        any_hit=any_hit, **kw)
    np.asarray(rec.t[:8])
    # timed: distinct ray sets per rep (sets 1..reps). block_until_ready
    # intermittently returns early under the axon relay (r5probe2.py note,
    # 2026-08-21) — a small VALUE FETCH per rep is the only reliable sync;
    # it adds the ~26 ms relay floor per rep, which is measured by the
    # caller via null_floor() and subtracted here.
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        rec2 = pt.traverse_pallas_lane8s(
            bvh, rays[i][0], rays[i][1], tmin, tmax, act,
            any_hit=any_hit, **kw)
        np.asarray(rec2.t[:8])
    dt = (time.perf_counter() - t0) / reps - _NULL_FLOOR[0]
    iters, ndone, lr = st[0, 0], st[0, 1], st[0, 3]
    pend_occ = st[0, 5] / max(lr * 4096, 1)
    node_occ = st[0, 6] / max(iters * 4096, 1)
    busy_occ = st[0, 7] / max(iters * 4096, 1)
    print(f"{label:34s} {dt * 1e3:8.1f} ms ({n / dt / 1e6:6.2f} Mrays/s) "
          f"iters={iters} leaf_rounds={lr} "
          f"pend_occ={pend_occ:.3f} node_occ={node_occ:.3f} "
          f"busy={busy_occ:.3f}", flush=True)
    return dt, rec


def main():
    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()
    measure_null_floor()
    nk = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = nk * 1024
    scene, cam = load_stress_scene(aspect=16 / 9)
    verts = np.asarray(scene.vertices)
    tris = np.asarray(scene.triangles)
    leaf_bits = int(os.environ.get("LEAF_BITS", "16"))
    leaf_tc = int(os.environ.get("LEAF_TC", "128"))
    bvh = build_bvh(verts, tris, leaf_bits=leaf_bits,
                    lane8_leaf_tris=leaf_tc)
    mn = bvh.nodes_lane8.shape
    ml = bvh.leaves_lane8.shape
    print(f"stress {tris.shape[0]} tris (leaf_bits={leaf_bits}); nodes_lane8 {mn} "
          f"({np.prod(mn) * 2 / 1e6:.2f} MB bf16), leaves_lane8 {ml} "
          f"({np.prod(ml) / 1e6:.2f} MB int8), depth {bvh.lane8_depth}, "
          f"Tc={bvh.lane8_leaf_tris}", flush=True)

    lo, hi = verts.min(axis=0), verts.max(axis=0)
    keys = jax.random.split(jax.random.PRNGKey(7), reps + 1)
    rays = [make_rays(k, n, lo, hi) for k in keys]
    rays = [(jax.device_put(o), jax.device_put(d)) for o, d in rays]

    # padded-table variants (never-referenced rows -> walk bit-identical)
    bvh_n2 = bvh.replace(nodes_lane8=jnp.concatenate(
        [bvh.nodes_lane8, jnp.zeros_like(bvh.nodes_lane8)], axis=0))
    bvh_l2 = bvh.replace(leaves_lane8=jnp.concatenate(
        [bvh.leaves_lane8, jnp.zeros_like(bvh.leaves_lane8)], axis=0))

    mode = os.environ.get("L8_MODE", "both")
    for any_hit, tag in ((False, "cl"), (True, "ah")):
        t_base, rec0 = bench(f"lane8s {tag} base", bvh, rays, any_hit, reps)
        if mode == "base":
            continue
        t_n2, rec_n = bench(f"lane8s {tag} nodes x2", bvh_n2, rays,
                            any_hit, reps)
        t_l2, rec_l = bench(f"lane8s {tag} leaves x2", bvh_l2, rays,
                            any_hit, reps)
        same_n = bool(jnp.all(rec0.prim == rec_n.prim))
        same_l = bool(jnp.all(rec0.prim == rec_l.prim))
        print(f"  -> node-gather share ~{(t_n2 - t_base) * 1e3:7.1f} ms, "
              f"leaf-gather share ~{(t_l2 - t_base) * 1e3:7.1f} ms, "
              f"other ~{(2 * t_base - t_n2 - t_l2 + t_base) * 1e3:7.1f} ms "
              f"(exact: n={same_n} l={same_l})", flush=True)


if __name__ == "__main__":
    main()
