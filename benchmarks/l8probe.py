"""On-device lane8 diagnostic: which traversal path does the stress scene
take, and what does raw incoherent traversal cost right now?

Usage: python benchmarks/l8probe.py [nrays_k]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hiprt_pt_tpu.assets.stress import load_stress_scene
from hiprt_pt_tpu.accel.build import build_bvh
from hiprt_pt_tpu.ops import pallas_traverse as pt


def main():
    nk = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = nk * 1024
    scene, cam = load_stress_scene(aspect=16 / 9)
    tris = np.asarray(scene.triangles)
    verts = np.asarray(scene.vertices)
    print(f"stress: {tris.shape[0]} tris")
    t0 = time.perf_counter()
    bvh = build_bvh(verts, tris)
    print(f"build_bvh: {time.perf_counter() - t0:.1f}s")
    print("nodes_lane8:", None if bvh.nodes_lane8 is None else
          bvh.nodes_lane8.shape, bvh.nodes_lane8.dtype
          if bvh.nodes_lane8 is not None else "")
    print("leaves_lane8:", None if bvh.leaves_lane8 is None else
          bvh.leaves_lane8.shape,
          f"{bvh.leaves_lane8.size / 1e6:.1f} MB"
          if bvh.leaves_lane8 is not None else "")
    print("lane8_leaf_tris:", bvh.lane8_leaf_tris)
    print("pallas_supported:", pt.pallas_supported(bvh, n))
    print("pallas_wide_supported:", pt.pallas_wide_supported(bvh, n))
    print("pallas_lane8_supported:", pt.pallas_lane8_supported(bvh, n))
    print("pallas_stream8l_supported:", pt.pallas_stream8l_supported(bvh, n))

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    lo = np.min(verts, axis=0)
    hi = np.max(verts, axis=0)
    o = jax.random.uniform(k1, (n, 3), jnp.float32,
                           minval=jnp.asarray(lo * 0.8),
                           maxval=jnp.asarray(hi * 0.8))
    d = jax.random.normal(k2, (n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), jnp.float32)

    import os
    lanes_list = [int(x) for x in os.environ.get(
        "L8_LANES", "1024").split(",")]
    re_list = [int(x) for x in os.environ.get("L8_RE", "6").split(",")]
    cases = []
    for ln in lanes_list:
        for re_ in re_list:
            if os.environ.get("L8_LOG", "1") == "1":
                cases.append((f"lane8log ah re{re_} ln{ln}",
                              pt.traverse_pallas_lane8log,
                              dict(any_hit=True, round_every=re_, lanes=ln)))
                if os.environ.get("L8_CLOSEST", "1") == "1":
                    cases.append((f"lane8log cl re{re_} ln{ln}",
                                  pt.traverse_pallas_lane8log,
                                  dict(any_hit=False, round_every=re_,
                                       lanes=ln)))
    if os.environ.get("L8_S", "0") == "1":
        print("pallas_lane8s_supported:", pt.pallas_lane8s_supported(bvh, n),
              "lane8_depth:", bvh.lane8_depth)
        s_lanes = [int(x) for x in os.environ.get(
            "L8S_LANES", "512").split(",")]
        s_win = [int(x) for x in os.environ.get("L8S_WIN", "8").split(",")]
        for ln in s_lanes:
            for w in s_win:
                cases.append((f"lane8s ah ln{ln} w{w}",
                              pt.traverse_pallas_lane8s,
                              dict(any_hit=True, lanes=ln, window=w)))
                if os.environ.get("L8_CLOSEST", "1") == "1":
                    cases.append((f"lane8s cl ln{ln} w{w}",
                                  pt.traverse_pallas_lane8s,
                                  dict(any_hit=False, lanes=ln, window=w)))
    for name, fn, kw in cases:
        try:
            rec, st = fn(bvh, o, d, tmin, tmax, act,
                         return_stats=True, **kw)
            jax.block_until_ready(rec.t)
            rec = fn(bvh, o, d, tmin, tmax, act, **kw)
            jax.block_until_ready(rec.t)
            t0 = time.perf_counter()
            for _ in range(3):
                rec = fn(bvh, o, d, tmin, tmax, act, **kw)
                jax.block_until_ready(rec.t)
            dt = (time.perf_counter() - t0) / 3
            st = np.asarray(st)
            print(f"{name}: {dt * 1e3:.1f} ms "
                  f"({n / dt / 1e6:.2f} Mrays/s) "
                  f"iters={st[0, 0]} done={st[0, 1]} "
                  f"leaf_rounds={st[0, 3]} log_blocks={st[0, 4]}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
