"""Render state — the whole mutable state of the renderer as one pytree.

Replaces the reference's buffer zoo owned by ``GPURenderer`` (framebuffer,
squared-luminance + adaptive-sampling buffers, two G-buffers, status buffers:
src/Renderer/GPURenderer.h:35-508 and ``update_render_data()`` pointer rebinding
at GPURenderer.cpp:980-1039). Here there are no pointers to rebind: the state is
an immutable pytree threaded through ``render_step`` with buffer donation, and a
"reset" is just constructing a fresh state (reference: GPURenderer::reset,
GPURenderer.cpp:953-973).

Checkpoint/resume (SURVEY.md §5.4) falls out for free: the pytree can be saved
and restored with orbax/np.savez.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GBuffer:
    """First-hit geometry buffer written by the camera-ray pass and consumed by
    the path-trace pass (reference: src/Device/includes/GBuffer.h, filled by
    CameraRays.h:46-179)."""

    position: jax.Array        # (N,3) world-space first hit
    shading_normal: jax.Array  # (N,3)
    geometric_normal: jax.Array  # (N,3)
    view_direction: jax.Array  # (N,3) surface → camera
    material_id: jax.Array     # (N,) i32, -1 = miss
    prim_index: jax.Array      # (N,) i32, -1 = miss
    uv: jax.Array              # (N,2) interpolated texture coords
    t: jax.Array               # (N,) hit distance (inf = miss)
    ray_dir: jax.Array         # (N,3) primary ray direction (for miss shading)
    backface: jax.Array        # (N,) bool — ray hit the back of the authored
                               # surface (drives enter/exit IOR for glass)

    @classmethod
    def empty(cls, n: int) -> "GBuffer":
        return cls(
            position=jnp.zeros((n, 3), jnp.float32),
            shading_normal=jnp.zeros((n, 3), jnp.float32),
            geometric_normal=jnp.zeros((n, 3), jnp.float32),
            view_direction=jnp.zeros((n, 3), jnp.float32),
            material_id=jnp.full((n,), -1, jnp.int32),
            prim_index=jnp.full((n,), -1, jnp.int32),
            uv=jnp.zeros((n, 2), jnp.float32),
            t=jnp.full((n,), jnp.inf, jnp.float32),
            ray_dir=jnp.zeros((n, 3), jnp.float32),
            backface=jnp.zeros((n,), jnp.bool_),
        )


@struct.dataclass
class RenderState:
    """All cross-frame render state. N = width*height (flat pixel order, row
    major from bottom-left)."""

    # accumulation (reference: m_framebuffer + sample_number)
    accum: jax.Array              # (N,3) running radiance sum
    sample_count: jax.Array       # scalar i32 — samples accumulated so far
    # adaptive sampling (reference: squared-luminance + per-pixel sample count
    # + converged flags, AdaptiveSampling.h)
    accum_sq_luminance: jax.Array  # (N,)
    pixel_sample_count: jax.Array  # (N,) i32 — per-pixel (adaptive skips some)
    pixel_converged: jax.Array     # (N,) bool
    # status "buffers" (reference: still_one_ray_active / converged counter,
    # RenderData.h:102-113) — scalars, psum-reduced under sharding
    nb_pixels_converged: jax.Array  # scalar i32
    # denoiser AOV running averages (reference: FullPathTracer.h:296-326)
    denoiser_albedo: jax.Array     # (N,3)
    denoiser_normal: jax.Array     # (N,3)
    # G-buffers: current + previous frame (reference: two GBuffers in
    # HIPRTRenderData for ReSTIR temporal reprojection)
    gbuffer: GBuffer
    prev_gbuffer: GBuffer
    # total rays traced (primary + bounce + shadow) — feeds the Mrays/s metric
    # (reference: samples/s stat, RenderWindow.cpp:643-658)
    rays_traced: jax.Array         # scalar f32
    # frame-global RNG seed (reference: m_rng re-seeded to 42 on reset)
    seed: jax.Array                # scalar u32
    # previous frame's view-projection for ReSTIR temporal back-projection
    prev_view_proj: jax.Array = struct.field(
        default_factory=lambda: jnp.eye(4, dtype=jnp.float32)
    )
    # ReSTIR DI reservoir state (None unless the ReSTIR strategy is enabled —
    # presence is static per RenderOptions, so jit sees a stable structure)
    restir: Optional["jax.Array | object"] = None

    @property
    def num_pixels(self) -> int:
        return self.accum.shape[0]


def init_render_state(
    width: int, height: int, seed: int = 42, with_restir: bool = False
) -> RenderState:
    n = width * height
    restir = None
    if with_restir:
        from ..restir.reservoir import Reservoir

        restir = Reservoir.empty(n)
    return RenderState(
        restir=restir,
        accum=jnp.zeros((n, 3), jnp.float32),
        sample_count=jnp.int32(0),
        accum_sq_luminance=jnp.zeros((n,), jnp.float32),
        pixel_sample_count=jnp.zeros((n,), jnp.int32),
        pixel_converged=jnp.zeros((n,), jnp.bool_),
        nb_pixels_converged=jnp.int32(0),
        denoiser_albedo=jnp.zeros((n, 3), jnp.float32),
        denoiser_normal=jnp.zeros((n, 3), jnp.float32),
        gbuffer=GBuffer.empty(n),
        prev_gbuffer=GBuffer.empty(n),
        rays_traced=jnp.float32(0.0),
        seed=jnp.uint32(seed),
    )
