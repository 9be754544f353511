"""Train the learned denoiser (render/denoise_nn.py) on this renderer's own
output and report the rel-RMSE-vs-spp curve against the à-trous+SVGF filter
(the ROUND3.md curve it must beat — VERDICT r3 task 6).

Data: cornell_pbr (MIS) + the stress interior (RIS, textured many-light) at
256x256. Per scene: a 1024-spp converged reference (seed 7), plus
(noisy, atrous, albedo, normal, var, spp) snapshots at spp in
{1,2,4,8,16,32,64} for train seed 3 and val seed 5 — collected through
render.denoise.collect_aovs, so training inputs match inference exactly.

Training: Adam on L1 in log1p space over random 96^2 crops.

Run ALONE on the TPU:
    python benchmarks/train_denoiser.py [--steps 1500] [--no-save]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

SPPS = (1, 2, 4, 8, 16, 32, 64)
RES = 256
CROP = 96


def build_dataset():
    from hiprt_pt_tpu.assets.loader import load_scene_file
    from hiprt_pt_tpu.assets.stress import load_stress_scene
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.denoise import atrous_denoise, collect_aovs
    from hiprt_pt_tpu.render.renderer import Renderer

    scenes = []
    sc, cam = load_scene_file(
        "/root/reference/data/GLTFs/cornell_pbr.gltf", aspect=1.0)
    scenes.append(("cornell", sc, cam, LightSamplingStrategy.MIS, False))
    sc2, cam2 = load_stress_scene(aspect=1.0)
    scenes.append(("stress", sc2, cam2, LightSamplingStrategy.RIS_BSDF_LIGHT,
                   False))
    # HELD-OUT scene (VERDICT r4 task 7): dispersion glass — transport the
    # training scenes never see; snapshots go to val ONLY
    sc3, cam3 = load_scene_file(
        "/root/reference/data/GLTFs/multi-dispersion.gltf", aspect=1.0)
    # multi-dispersion has no emissive geometry — it is lit by a uniform
    # ambient dome (the first run rendered it BLACK under ambient NONE and
    # the held-out rows were garbage)
    scenes.append(("dispersion*", sc3, cam3, LightSamplingStrategy.MIS,
                   True))

    def make(scene, cam, strat, seed, name):
        opts = RenderOptions(direct_light_sampling=strat,
                             max_bounces_static=4)
        r = Renderer(scene, cam, RES, RES, options=opts, seed=seed)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(4), samples_per_frame=jnp.int32(1))
        amb = (AmbientLightType.UNIFORM if name.startswith("dispersion")
               else AmbientLightType.NONE)
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(amb)))
        r.fuse_frame = True
        return r

    cache_dir = "/tmp/denoiser_ds_v3"
    os.makedirs(cache_dir, exist_ok=True)

    data = {"train": [], "val": []}
    refs = {}
    for name, scene, cam, strat, heldout in scenes:
        tag = name.rstrip("*")
        cpath = os.path.join(cache_dir, f"{tag}.npz")
        if os.path.exists(cpath):
            z = np.load(cpath, allow_pickle=True)
            for item in z["items"]:
                data[item["split"]].append(item)
            print(f"{name}: dataset from cache", flush=True)
            continue
        ref_r = make(scene, cam, strat, 7, name)
        ref_r.settings = ref_r.settings.replace(
            samples_per_frame=jnp.int32(256))
        for _ in range(4):
            ref_r.step(block=True)
        ref = np.asarray(ref_r.hdr_image())
        refs[name] = ref
        print(f"{name}: reference done (mean {ref.mean():.3f})", flush=True)
        del ref_r
        splits = ((("val", 5),) if heldout
                  else (("train", 3), ("val", 5)))
        items = []
        for split, seed in splits:
            r = make(scene, cam, strat, seed, name)
            done = 0
            for spp in SPPS:
                r.settings = r.settings.replace(
                    samples_per_frame=jnp.int32(spp - done))
                r.step(block=True)
                done = spp
                hdr, alb, nrm, var, sppm = collect_aovs(r)
                atr = atrous_denoise(
                    hdr, jnp.asarray(alb.copy()), jnp.asarray(nrm.copy()),
                    variance=var, spp_map=sppm)
                items.append(dict(
                    scene=name, spp=spp, split=split,
                    noisy=np.asarray(hdr), atrous=np.asarray(atr),
                    albedo=np.asarray(alb), normal=np.asarray(nrm),
                    var=np.asarray(var), sppm=np.asarray(sppm),
                    target=refs[name]))
        np.savez_compressed(cpath, items=np.asarray(items, dtype=object))
        for item in items:
            data[item["split"]].append(item)
        print(f"{name}: {len(items)} snapshots", flush=True)
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args()

    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()
    from hiprt_pt_tpu.render import denoise_nn

    data = build_dataset()
    train = data["train"]

    # stack training snapshots into one tensor bank for random cropping
    def field(split, key):
        return jnp.asarray(np.stack([d[key] for d in split], 0))

    tr = {k: field(train, k) for k in
          ("noisy", "atrous", "albedo", "normal", "var", "sppm", "target")}
    n_snap = tr["noisy"].shape[0]

    params = denoise_nn.init_params(jax.random.PRNGKey(0))
    opt_m = jax.tree.map(jnp.zeros_like, params)
    opt_v = jax.tree.map(jnp.zeros_like, params)

    def loss_fn(params, batch):
        def one(noisy, atr, alb, nrm, var, sppm, tgt):
            out = denoise_nn.apply(params, noisy, atr, alb, nrm, var, sppm)
            return jnp.mean(jnp.abs(jnp.log1p(out) - jnp.log1p(tgt)))

        return jnp.mean(jax.vmap(one)(*batch))

    @jax.jit
    def step(params, opt_m, opt_v, i, key):
        ks, kx, ky, kflip = jax.random.split(key, 4)
        si = jax.random.randint(ks, (args.batch,), 0, n_snap)
        x0 = jax.random.randint(kx, (args.batch,), 0, RES - CROP)
        y0 = jax.random.randint(ky, (args.batch,), 0, RES - CROP)

        def crop(a, s, y, x):
            return jax.lax.dynamic_slice(
                a[s], (y, x) + (0,) * (a.ndim - 3),
                (CROP, CROP) + a.shape[3:])

        batch = tuple(
            jax.vmap(crop, in_axes=(None, 0, 0, 0))(tr[k], si, y0, x0)
            for k in ("noisy", "atrous", "albedo", "normal", "var", "sppm",
                      "target"))
        # augmentation: random H/V flips. A spatial flip mirrors the view,
        # so the tangential normal component along the flipped axis must be
        # negated to keep (normal, image) pairs physically consistent.
        # Flip keys come from a FRESH split (kflip) — reusing ks would
        # correlate them with the snapshot-index draws.
        kf1, kf2 = jax.random.split(kflip)
        fh = jax.random.bernoulli(kf1, 0.5, (args.batch,))
        fv = jax.random.bernoulli(kf2, 0.5, (args.batch,))

        def flip(a, neg_h=None, neg_v=None):
            fh_b = fh[(...,) + (None,) * (a.ndim - 1)]
            fv_b = fv[(...,) + (None,) * (a.ndim - 1)]
            ah = jnp.flip(a, axis=1)
            if neg_h is not None:
                ah = ah * neg_h
            a = jnp.where(fh_b, ah, a)
            av = jnp.flip(a, axis=2)
            if neg_v is not None:
                av = av * neg_v
            return jnp.where(fv_b, av, a)

        # axis=1 is y (vertical flip of rows -> negate normal y), axis=2 is
        # x (horizontal -> negate normal x); normal channels are (x, y, z)
        neg_y = jnp.asarray([1.0, -1.0, 1.0])
        neg_x = jnp.asarray([-1.0, 1.0, 1.0])
        batch = tuple(
            flip(b, neg_h=neg_y, neg_v=neg_x) if k == "normal" else flip(b)
            for k, b in zip(("noisy", "atrous", "albedo", "normal", "var",
                             "sppm", "target"), batch))
        l, g = jax.value_and_grad(loss_fn)(params, batch)
        lr = 2e-3 * (0.5 * (1 + jnp.cos(jnp.pi * i / args.steps))) + 1e-4
        opt_m = jax.tree.map(lambda m, gg: 0.9 * m + 0.1 * gg, opt_m, g)
        opt_v = jax.tree.map(lambda v, gg: 0.999 * v + 0.001 * gg * gg,
                             opt_v, g)
        params = jax.tree.map(
            lambda p, m, v: p - lr * m / (jnp.sqrt(v) + 1e-8),
            params, opt_m, opt_v)
        return params, opt_m, opt_v, l

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(42)
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_m, opt_v, l = step(
            params, opt_m, opt_v, jnp.float32(i), k)
        if i % 200 == 0:
            print(f"step {i}: loss {float(l):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # ---- evaluation: full-image rel RMSE vs the à-trous column ----
    def rel_rmse(img, ref):
        a = np.clip(np.asarray(img), 0, 10.0)
        r = np.clip(np.asarray(ref), 0, 10.0)
        return float(np.sqrt(np.mean((a - r) ** 2))) / max(
            float(r.mean()), 1e-9)

    print("\n| scene | spp | atrous | nn |\n|---|---|---|---|", flush=True)
    wins = 0
    total = 0
    for d in data["val"]:
        out = denoise_nn.apply_jit(
            params, jnp.asarray(d["noisy"]), jnp.asarray(d["atrous"]),
            jnp.asarray(d["albedo"]), jnp.asarray(d["normal"]),
            jnp.asarray(d["var"]), jnp.asarray(d["sppm"]))
        e_a = rel_rmse(d["atrous"], d["target"])
        e_n = rel_rmse(out, d["target"])
        wins += e_n < e_a
        total += 1
        print(f"| {d['scene']} | {d['spp']} | {e_a:.3f} | {e_n:.3f} |",
              flush=True)
    print(f"\nnn beats atrous on {wins}/{total} val snapshots", flush=True)
    if not args.no_save and wins >= total * 0.7:
        denoise_nn.save_params(params)
        print(f"saved weights -> {denoise_nn.WEIGHTS_PATH}", flush=True)
    elif not args.no_save:
        print("NOT saving weights (did not beat the filter broadly)",
              flush=True)


if __name__ == "__main__":
    main()
