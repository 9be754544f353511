"""Renderer — host-side orchestration around the jitted render step.

Role parity with ``GPURenderer`` (src/Renderer/GPURenderer.h:35-508): owns the
scene + acceleration structure + camera + settings, advances the accumulation
state by ``samples_per_frame`` each frame, tracks per-pass timings and stop
conditions (reference: RenderWindow::is_rendering_done,
src/UI/RenderWindow.cpp:582-616).

TPU-first: there is exactly ONE compiled artifact per RenderOptions combination
— a pure function ``(state, scene, bvh, camera, settings, world) → state`` with
the state donated. No buffer reallocation / pointer rebinding per frame
(reference: GPURenderer::update, GPURenderer.cpp:236-261 + 980-1039); resizing
or toggling a tier-3 option simply compiles a new specialization, served by the
persistent XLA compile cache (≡ the reference's shader cache).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.build import BVHData, build_bvh
from ..assets.scene import SceneData
from ..core import rng as rng_mod
from ..core.camera import Camera
from ..core.settings import LightSamplingStrategy, RenderOptions, RenderSettings, WorldSettings
from ..core.state import RenderState, init_render_state
from ..ops.pixel_order import unscramble
from ..ops.tonemap import luminance, resolve_accumulation, tonemap_gamma
from ..utils.perf import PerformanceMetrics
from .integrator import camera_rays_pass, render_sample


@partial(
    jax.jit,
    static_argnames=("options", "width", "height", "n_samples"),
    donate_argnums=(4,),
)
def render_step(
    options: RenderOptions,
    width: int,
    height: int,
    scene_and_bvh,
    state: RenderState,
    camera: Camera,
    settings: RenderSettings,
    world: WorldSettings,
    n_samples: int = 1,
) -> RenderState:
    """Advance the render state by ``n_samples`` samples.

    At ``n_samples=1`` (the default) one compiled program per sample keeps
    the XLA program a single camera-pass + bounce-loop pipeline; the host
    queues ``samples_per_frame`` of these asynchronously per frame, exactly
    like the reference queues N sample iterations on its stream
    (GPURenderer.cpp:424-453). ``n_samples>1`` wraps the sample body in a
    ``fori_loop`` so one dispatch carries the whole frame — bit-identical to
    the sequential chain (the per-sample seed is ``state.sample_count``,
    which advances inside the loop) while amortizing dispatch and letting
    XLA overlap inter-sample scheduling.
    """
    scene, bvh = scene_and_bvh

    def one_sample(s, state: RenderState):
        sample_number = jnp.where(
            settings.freeze_random, jnp.int32(0), state.sample_count + s
        )
        n = width * height
        pix = jnp.arange(n, dtype=jnp.uint32)
        rng_state = rng_mod.seed(pix, sample_number, state.seed)

        rng_state, gbuf, active = camera_rays_pass(
            scene, bvh, camera, settings, state, width, height, sample_number,
            rng_state, options,
        )

        # --- ReSTIR DI pipeline for the camera vertex (reference:
        # ReSTIRDIRenderPass::launch, 5 kernels; here pure reservoir passes
        # fused by XLA into the same program) ---
        direct0 = None
        new_restir = state.restir
        restir_rays = jnp.float32(0.0)
        if (
            options.direct_light_sampling == LightSamplingStrategy.RESTIR_DI
            and state.restir is not None
        ):
            from ..restir.di import (
                final_shading,
                fused_spatiotemporal_reuse,
                initial_candidates,
                presample_lights,
                spatial_reuse_pass,
                temporal_reuse,
            )

            hit0 = gbuf.prim_index >= 0
            active0 = active & hit0
            mats0 = scene.materials.at_indices(
                jnp.maximum(gbuf.material_id, 0)
            ).make_safe()
            if scene.textures is not None:
                from ..ops.texture import apply_textures

                # candidate targets AND the exact winner re-eval in
                # final_shading see the textured surface (not gated on
                # has_alpha — that flag only gates alpha shadow marching)
                mats0 = apply_textures(scene.textures, mats0, gbuf.uv)
            eta0 = jnp.where(
                ~gbuf.backface,
                jnp.maximum(mats0.ior, 1.0 + 1e-3),
                1.0 / jnp.maximum(mats0.ior, 1.0 + 1e-3),
            )
            pool = (
                presample_lights(scene, sample_number, options)
                if options.restir_do_light_presampling
                else None
            )
            tile_id = jnp.arange(width * height, dtype=jnp.int32) // 128
            res, rng_state = initial_candidates(
                options, scene, bvh, world, settings, mats0,
                gbuf.position, gbuf.shading_normal, gbuf.geometric_normal,
                gbuf.view_direction, eta0, active0, rng_state,
                pool=pool, tile_id=tile_id,
            )
            if options.restir_di_fused_spatiotemporal:
                # single fused pass (reference: FusedSpatiotemporalReuse.h)
                res, rng_state = fused_spatiotemporal_reuse(
                    options, settings, scene, mats0, gbuf,
                    state.prev_gbuffer, state.restir, res, eta0, active0,
                    width, height, state.prev_view_proj, rng_state,
                )
            else:
                res, rng_state = temporal_reuse(
                    options, settings, scene, mats0, gbuf, state.prev_gbuffer,
                    state.restir, res, eta0, active0, width, height,
                    state.prev_view_proj, rng_state,
                )

                n_spatial = jnp.where(
                    settings.restir_di.spatial_enabled,
                    settings.restir_di.num_spatial_passes,
                    0,
                )

                def spatial_body(i, carry):
                    res, rng_state = carry
                    return spatial_reuse_pass(
                        options, settings, scene, mats0, gbuf, res, eta0,
                        active0, width, height, rng_state,
                        bvh=bvh, is_last_pass=(i == n_spatial - 1),
                    )
                res, rng_state = jax.lax.fori_loop(
                    0, n_spatial, spatial_body, (res, rng_state)
                )
            direct0, restir_rays, rng_state = final_shading(
                options, scene, bvh, world, mats0, gbuf, res, eta0, active0,
                rng_state=rng_state, settings=settings,
            )
            new_restir = res

        rng_state, radiance, aov_albedo, aov_normal, path_rays = render_sample(
            options, scene, bvh, world, settings, gbuf, active, rng_state,
            direct0=direct0,
        )
        total_rays = (
            state.rays_traced
            + path_rays
            + restir_rays
            + jnp.sum(active.astype(jnp.float32))  # camera rays
        )

        # --- accumulation (reference: FullPathTracer.h:296-326) ---
        accum = jnp.where(
            settings.accumulate, state.accum + jnp.where(active[..., None], radiance, 0.0),
            jnp.where(active[..., None], radiance, state.accum),
        )
        lum = luminance(radiance)
        accum_sq = jnp.where(
            settings.accumulate & active,
            state.accum_sq_luminance + lum * lum,
            state.accum_sq_luminance,
        )
        pix_count = state.pixel_sample_count + active.astype(jnp.int32)

        # --- adaptive-sampling convergence test (reference:
        # AdaptiveSampling.h:11-104 — 95% confidence interval) ---
        nf = jnp.maximum(pix_count.astype(jnp.float32), 1.0)
        mean_lum = luminance(accum) / nf
        var = jnp.maximum(
            (accum_sq - (luminance(accum) ** 2) / nf) / jnp.maximum(nf - 1.0, 1.0),
            0.0,
        )
        ci = 1.96 * jnp.sqrt(var / nf)
        thresh = jnp.maximum(
            settings.adaptive_sampling_noise_threshold * mean_lum, 1e-6
        )
        converged = (
            (pix_count >= settings.adaptive_sampling_min_samples) & (ci < thresh)
        )
        converged = jnp.where(
            settings.enable_adaptive_sampling | (settings.stop_noise_threshold > 0.0),
            converged,
            False,
        )

        new_gbuffer = gbuf
        return state.replace(
            accum=accum,
            sample_count=state.sample_count + 1,
            accum_sq_luminance=accum_sq,
            pixel_sample_count=pix_count,
            pixel_converged=converged,
            nb_pixels_converged=jnp.sum(converged.astype(jnp.int32)),
            denoiser_albedo=state.denoiser_albedo
            + jnp.where(active[..., None], aov_albedo, 0.0),
            denoiser_normal=state.denoiser_normal
            + jnp.where(active[..., None], aov_normal, 0.0),
            prev_gbuffer=state.gbuffer,
            gbuffer=new_gbuffer,
            rays_traced=total_rays,
            restir=new_restir,
            prev_view_proj=camera.proj @ camera.view,
        )

    if n_samples == 1:
        return one_sample(jnp.int32(0), state)
    # sample_count advances inside the carried state, so each iteration
    # seeds exactly like the next call of the sequential host loop would
    return jax.lax.fori_loop(
        0, n_samples, lambda i, st: one_sample(jnp.int32(0), st), state
    )


class Renderer:
    """Host-side renderer: the TPU analog of GPURenderer + the headless parts
    of RenderWindow."""

    def __init__(
        self,
        scene: SceneData,
        camera: Camera,
        width: int,
        height: int,
        options: RenderOptions = RenderOptions(),
        settings: Optional[RenderSettings] = None,
        world: Optional[WorldSettings] = None,
        bvh: Optional[BVHData] = None,
        seed: int = 42,
    ):
        self.scene = scene
        self.camera = camera
        self.width = width
        self.height = height
        self.options = options
        self.settings = settings or RenderSettings()
        self.world = world or WorldSettings()
        if bvh is None:
            t0 = time.perf_counter()
            bvh = build_bvh(
                np.asarray(scene.vertices), np.asarray(scene.triangles)
            )
            self.bvh_build_time = time.perf_counter() - t0
        self.bvh = bvh
        self.seed = seed
        self.state = init_render_state(
            width, height, seed,
            with_restir=options.direct_light_sampling
            == LightSamplingStrategy.RESTIR_DI,
        )
        self.metrics = PerformanceMetrics()
        # fuse a whole samples_per_frame batch into one dispatch (fori_loop
        # over samples); off by default — per-sample dispatch keeps the
        # first-frame latency low and matches the reference's stream model
        self.fuse_frame = False
        self._render_start_time: Optional[float] = None
        self.max_sample_count: Optional[int] = None
        self._sc_host = 0  # host mirror of state.sample_count (step/reset)
        self.max_render_time: Optional[float] = None

    def recompile(self, options: RenderOptions):
        """Swap the tier-3 static options (reference: an ImGui macro edit →
        GPURenderer::recompile_kernels, GPURenderer.cpp:726-749). Changing a
        static arg re-specializes the jit on the next step (the persistent
        XLA cache plays the shader cache's role); like the reference, the
        render is reset because accumulated samples were produced under the
        old kernel configuration."""
        self.options = options
        self.state = init_render_state(
            self.width, self.height, self.seed,
            with_restir=options.direct_light_sampling
            == LightSamplingStrategy.RESTIR_DI,
        )
        self._render_start_time = None


    # --- settings: host-mirrored scalars ----------------------------------
    # The interactive loop used to pay one relay roundtrip PER FRAME fetching
    # samples_per_frame (plus 2-3 more in the stop checks) — each device_get
    # is a ~26 ms relay floor (ROUND5.md). The setter snapshots the loop-hot
    # scalars once per settings assignment instead.

    @property
    def settings(self):
        return self._settings

    @settings.setter
    def settings(self, value):
        self._settings = value
        import numpy as _np
        self._spf_host = max(int(_np.asarray(value.samples_per_frame)), 1)
        self._stop_noise_host = float(
            _np.asarray(value.stop_noise_threshold))
        self._stop_pct_host = float(
            _np.asarray(value.stop_pixel_percentage_converged))

    # --- frame loop ---

    def step(self, block: bool = False) -> RenderState:
        """Queue one frame of ``samples_per_frame`` samples (async dispatch —
        the analog of the reference's non-blocking stream submission,
        GPURenderer.cpp:408-464)."""
        if self._render_start_time is None:
            self._render_start_time = time.perf_counter()
        t0 = time.perf_counter()
        spf = self._spf_host
        self._sc_host += spf
        if self.fuse_frame and spf > 1:
            # whole frame in one dispatch (fori_loop over samples) —
            # bit-identical to the sequential chain below
            self.state = render_step(
                self.options, self.width, self.height,
                (self.scene, self.bvh), self.state, self.camera,
                self.settings, self.world, n_samples=spf,
            )
        else:
            for _ in range(spf):
                self.state = render_step(
                    self.options,
                    self.width,
                    self.height,
                    (self.scene, self.bvh),
                    self.state,
                    self.camera,
                    self.settings,
                    self.world,
                )
        if block:
            jax.block_until_ready(self.state.accum)
            dt = time.perf_counter() - t0
            self.metrics.add("frame_ms", dt * 1000.0)
            self.metrics.add(
                "samples_per_s", spf / dt if dt > 0 else 0.0
            )
        return self.state

    def profile(self, frames: int = 2) -> dict:
        """Per-pass timing breakdown in milliseconds (reference: per-kernel
        GPU event timing, GPUKernel.cpp:180-189 + the performance panel).

        One fused XLA program has no internal kernel boundaries, so passes
        are delta-timed: the camera pass is jitted alone, and the bounce loop
        cost comes from stepping at nb_bounces = 0 vs the configured count
        (same executable — nb_bounces is a traced setting). Results are also
        pushed into self.metrics for the windowed stats / viewer plots."""
        import jax as _jax
        import jax.numpy as _jnp

        from .integrator import camera_rays_pass
        from ..core import rng as rng_mod

        n = self.width * self.height

        def cam_only(state, camera, settings):
            pix = _jnp.arange(n, dtype=_jnp.uint32)
            rngs = rng_mod.seed(pix, state.sample_count, state.seed)
            return camera_rays_pass(
                self.scene, self.bvh, camera, settings, state,
                self.width, self.height, state.sample_count, rngs,
                self.options,
            )[1].position

        cam_jit = _jax.jit(cam_only)
        out = cam_jit(self.state, self.camera, self.settings)
        _jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(frames):
            out = cam_jit(self.state, self.camera, self.settings)
        _jax.block_until_ready(out)
        cam_ms = (time.perf_counter() - t0) / frames * 1000.0

        def step_ms(nb):
            settings = self.settings.replace(
                nb_bounces=_jnp.int32(nb), samples_per_frame=_jnp.int32(1)
            )
            # render_step donates its state argument — work on a copy so the
            # renderer's live state survives profiling
            st = _jax.tree.map(_jnp.copy, self.state)
            st = render_step(
                self.options, self.width, self.height,
                (self.scene, self.bvh), st, self.camera, settings,
                self.world,
            )
            _jax.block_until_ready(st.accum)
            t0 = time.perf_counter()
            for _ in range(frames):
                st = render_step(
                    self.options, self.width, self.height,
                    (self.scene, self.bvh), st, self.camera, settings,
                    self.world,
                )
            _jax.block_until_ready(st.accum)
            return (time.perf_counter() - t0) / frames * 1000.0

        nb = int(jax.device_get(self.settings.nb_bounces))
        base_ms = step_ms(0)
        full_ms = step_ms(nb)
        per_bounce = (full_ms - base_ms) / max(nb, 1)
        result = {
            "camera_pass_ms": cam_ms,
            "camera_plus_overhead_ms": base_ms,
            "direct_and_accum_ms": max(base_ms - cam_ms, 0.0),
            "per_bounce_ms": per_bounce,
            "bounce_loop_ms": max(full_ms - base_ms, 0.0),
            "full_frame_ms": full_ms,
            "nb_bounces": nb,
        }
        for k, v in result.items():
            if k.endswith("_ms"):
                self.metrics.add(k, float(v))
        return result

    def frame_render_done(self) -> bool:
        """Non-blocking poll — analog of oroStreamQuery
        (GPURenderer.cpp:497-510)."""
        try:
            return self.state.accum.is_ready()
        except AttributeError:  # older jax fallback
            return True

    def render(self, total_samples: int, log_every: int = 0):
        """Headless render loop to a target sample count (reference:
        main.cpp GPU_RENDER=0 CPU headless path)."""
        while self._sc_host < total_samples:
            self.step(block=True)
            if log_every:
                sc = int(jax.device_get(self.state.sample_count))
                if sc % log_every == 0:
                    print(f"[render] {sc}/{total_samples} samples")
            if self.is_rendering_done():
                break
        jax.block_until_ready(self.state.accum)
        return self.state

    def is_rendering_done(self) -> bool:
        """Stop conditions (reference: RenderWindow.cpp:582-616): max samples,
        max time, percentage of pixels converged."""
        sc = self._sc_host
        if self.max_sample_count is not None and sc >= self.max_sample_count:
            return True
        if (
            self.max_render_time is not None
            and self._render_start_time is not None
            and time.perf_counter() - self._render_start_time
            >= self.max_render_time
        ):
            return True
        if self._stop_noise_host > 0.0:
            frac = float(
                jax.device_get(self.state.nb_pixels_converged)
            ) / float(self.width * self.height)
            if frac >= self._stop_pct_host:
                return True
        return False

    def kernel_stats(self) -> dict:
        """Compiled-executable introspection for the current configuration —
        the TPU analog of the reference's "Shader kernels" panel
        (per-kernel register/shared-mem counts, GPUKernelCompiler.cpp:111-117
        + ImGuiSettingsWindow.cpp:2206). AOT-lowers the render step for the
        live option set (a cache hit when the step has already run) and
        reports XLA's cost and memory analyses."""
        lowered = render_step.lower(
            self.options, self.width, self.height, (self.scene, self.bvh),
            self.state, self.camera, self.settings, self.world,
        )
        compiled = lowered.compile()
        out = {"kernel": "render_step",
               "options": str(self.options)}
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            out["cost"] = {
                k: float(v) for k, v in cost.items()
                if k in ("flops", "transcendentals", "bytes accessed",
                         "optimal_seconds", "utilization operand 0 {}")
                and isinstance(v, (int, float))
            }
        except Exception as e:  # some backends don't expose analyses
            out["cost_error"] = repr(e)[:120]
        try:
            mem = compiled.memory_analysis()
            for attr in (
                "argument_size_in_bytes", "output_size_in_bytes",
                "temp_size_in_bytes", "generated_code_size_in_bytes",
                "alias_size_in_bytes",
            ):
                v = getattr(mem, attr, None)
                if v is not None:
                    out[attr] = int(v)
        except Exception as e:
            out["memory_error"] = repr(e)[:120]
        return out

    # --- output ---

    def hdr_image(self) -> np.ndarray:
        """(H, W, 3) mean radiance (row 0 = top; buffers live in the canonical
        tile-major order, unscrambled here at host readout)."""
        img = resolve_accumulation(self.state.accum, self.state.sample_count)
        img = unscramble(jax.device_get(img), self.width, self.height)
        return img[::-1]  # flip: row 0 is bottom in NDC

    def ldr_image(self, exposure: float = 1.0, gamma: float = 2.2) -> np.ndarray:
        hdr = resolve_accumulation(self.state.accum, self.state.sample_count)
        ldr = tonemap_gamma(hdr, exposure, gamma)
        img = unscramble(jax.device_get(ldr), self.width, self.height)
        return img[::-1]

    def aov_images(self):
        n = jnp.maximum(self.state.pixel_sample_count.astype(jnp.float32), 1.0)
        alb = unscramble(
            jax.device_get(self.state.denoiser_albedo / n[:, None]),
            self.width, self.height,
        )[::-1]
        nrm = unscramble(
            jax.device_get(self.state.denoiser_normal / n[:, None]),
            self.width, self.height,
        )[::-1]
        return alb, nrm

    def reset(self):
        """Restart accumulation (reference: GPURenderer::reset,
        GPURenderer.cpp:953-973 — re-seeds to the fixed seed)."""
        self.state = init_render_state(
            self.width, self.height, self.seed,
            with_restir=self.options.direct_light_sampling
            == LightSamplingStrategy.RESTIR_DI,
        )
        self._render_start_time = None
        self._sc_host = 0

    def set_camera(self, camera: Camera):
        self.camera = camera
        self.reset()
