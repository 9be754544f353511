"""v10 (lane8s) vs v11 (lane8u) A/B on the stress BVH, incoherent rays.

Run ALONE on the TPU:  python benchmarks/l8u_ab.py [nrays_k] [reps]
Distinct ray sets per timed rep (relay memoizes identical dispatches).
Configs via env L8U="unroll,window,re;..." (default below).
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

DEFAULT = "4,32,2;2,16,4;6,48,2;4,32,3"


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
    ahf_mixed = jnp.asarray((np.arange(n) % 2).astype(np.float32))

    def run(label, fn, kw, ref=None):
        rec, st = fn(bvh, rays[0][0], rays[0][1], tmin, tmax, act,
                     return_stats=True, **kw)
        jax.block_until_ready(rec.t)
        # warm the stats-free executable the timed loop actually runs
        rec_w = fn(bvh, rays[0][0], rays[0][1], tmin, tmax, act, **kw)
        jax.block_until_ready(rec_w.t)
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            r2 = fn(bvh, rays[i][0], rays[i][1], tmin, tmax, act, **kw)
            jax.block_until_ready(r2.t)
        dt = (time.perf_counter() - t0) / reps
        st = np.asarray(st)
        ok = ""
        if ref is not None:
            ok = (f" agree="
                  f"{float(jnp.mean((rec.prim == ref).astype(jnp.float32))):.4f}")
        print(f"{label:30s} {dt * 1e3:7.1f} ms ({n / dt / 1e6:5.2f} Mrays/s)"
              f" iters={st[0, 0]} lr={st[0, 3]}{ok}", flush=True)
        return dt, rec.prim

    # v10 baselines
    _, p_cl = run("v10 cl ln512 w16 re8", pt.traverse_pallas_lane8s,
                  dict(any_hit=False, lanes=512, window=16, round_every=8))
    _, p_ah = run("v10 ah ln512 w32 re8", pt.traverse_pallas_lane8s,
                  dict(any_hit=True, lanes=512, window=32, round_every=8))
    occ_ref = p_ah >= 0

    cfgs = [tuple(int(x) for x in c.split(","))
            for c in os.environ.get("L8U", DEFAULT).split(";")]
    for u, w, re_ in cfgs:
        kw = dict(lanes=512, window=w, round_every=re_, unroll=u)
        run(f"v11 cl u{u} w{w} re{re_}", pt.traverse_pallas_lane8u,
            dict(any_hit=False, **kw), ref=p_cl)
        run(f"v11 ah u{u} w{w} re{re_}", pt.traverse_pallas_lane8u,
            dict(any_hit=True, **kw))
        run(f"v11 mixed u{u} w{w} re{re_}", pt.traverse_pallas_lane8u,
            dict(ah_flags=ahf_mixed, **kw))


if __name__ == "__main__":
    main()
