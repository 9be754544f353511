"""lane8s parameter sweep (lanes / window / round_every) on the stress BVH
with incoherent rays. Distinct ray sets per timed rep (relay memoizes).

Run ALONE on the TPU:  python benchmarks/l8sweep.py [nrays_k] [reps]
Configs via env L8SWEEP="ln,win,re;ln,win,re;..." (default sweep below).
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
from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

DEFAULT = "512,16,8;512,32,8;512,48,8;1024,16,8;1024,32,8;512,16,12;1024,32,12"


def main():
    enable_persistent_cache()
    nk = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = nk * 1024
    scene, cam = load_stress_scene(aspect=16 / 9)
    verts = np.asarray(scene.vertices)
    bvh = build_bvh(verts, np.asarray(scene.triangles))

    lo, hi = verts.min(axis=0), verts.max(axis=0)
    keys = jax.random.split(jax.random.PRNGKey(7), reps + 1)
    rays = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        o = jax.random.uniform(k1, (n, 3), jnp.float32,
                               minval=jnp.asarray(lo * 0.8),
                               maxval=jnp.asarray(hi * 0.8))
        d = jax.random.normal(k2, (n, 3), jnp.float32)
        rays.append((jax.device_put(o),
                     jax.device_put(d / jnp.linalg.norm(d, axis=1,
                                                        keepdims=True))))
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    act = jnp.ones((n,), jnp.float32)

    cfgs = [tuple(int(x) for x in c.split(","))
            for c in os.environ.get("L8SWEEP", DEFAULT).split(";")]
    ref_prim = {}
    for ln, win, re_ in cfgs:
        for any_hit, tag in ((False, "cl"), (True, "ah")):
            try:
                kw = dict(any_hit=any_hit, lanes=ln, window=win,
                          round_every=re_)
                rec = pt.traverse_pallas_lane8s(
                    bvh, rays[0][0], rays[0][1], tmin, tmax, act, **kw)
                jax.block_until_ready(rec.t)
                t0 = time.perf_counter()
                for i in range(1, reps + 1):
                    r2 = pt.traverse_pallas_lane8s(
                        bvh, rays[i][0], rays[i][1], tmin, tmax, act, **kw)
                    jax.block_until_ready(r2.t)
                dt = (time.perf_counter() - t0) / reps
                if tag not in ref_prim:
                    ref_prim[tag] = rec.prim
                ok = bool(jnp.mean(
                    (rec.prim == ref_prim[tag]).astype(jnp.float32)) > 0.999)
                print(f"{tag} ln{ln} w{win} re{re_}: {dt * 1e3:7.1f} ms "
                      f"({n / dt / 1e6:5.2f} Mrays/s) agree={ok}",
                      flush=True)
            except Exception as e:
                print(f"{tag} ln{ln} w{win} re{re_}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
