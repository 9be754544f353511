"""Debug tools — single-pixel debugging and invariant views.

Role parity with the reference's purpose-built debug harness (SURVEY.md §4):
``DEBUG_PIXEL``/``DEBUG_RENDER_NEIGHBORHOOD`` in CPURenderer
(src/Renderer/CPURenderer.cpp:24-66, 317-390 — render one interesting pixel
first, then its neighborhood, so breakpoints land in the right thread) and the
bright-pink NaN visualization (FullPathTracer.h:29-97, display_NaNs toggle).

In a functional renderer, "debugging one pixel" is slicing: the helpers below
run the REAL integrator on a tiny wavefront holding just the pixel (and
optionally its neighborhood) so intermediate values can be printed/inspected
under `jax.disable_jit()` if needed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import rng as rng_mod
from ..core.camera import generate_camera_rays
from ..render.integrator import render_sample


def debug_pixel(
    renderer,
    x: int,
    y: int,
    neighborhood: int = 0,
    sample_number: int = 0,
    disable_jit: bool = False,
):
    """Trace the paths of pixel (x, y) (row-major from the top-left, display
    convention) and optionally its (2k+1)^2 neighborhood.

    Returns a dict with the pixel's radiance, first-hit info and the
    neighborhood image — the functional analog of DEBUG_PIXEL +
    DEBUG_RENDER_NEIGHBORHOOD.
    """
    import contextlib

    r = renderer
    w, h = r.width, r.height
    # display row y (top) → NDC row (bottom-up)
    py0 = h - 1 - y
    k = neighborhood
    xs = np.clip(np.arange(x - k, x + k + 1), 0, w - 1)
    ys = np.clip(np.arange(py0 - k, py0 + k + 1), 0, h - 1)
    gx, gy = np.meshgrid(xs, ys)
    px = jnp.asarray(gx.ravel().astype(np.int32))
    py = jnp.asarray(gy.ravel().astype(np.int32))
    n = px.shape[0]

    ctx = jax.disable_jit() if disable_jit else contextlib.nullcontext()
    with ctx:
        pix_id = (py * w + px).astype(jnp.uint32)
        rng_state = rng_mod.seed(pix_id, sample_number, r.state.seed)
        rng_state, jx = rng_mod.next_float(rng_state)
        rng_state, jy = rng_mod.next_float(rng_state)
        o, d = generate_camera_rays(
            r.camera, w, h, jnp.stack([jx, jy], axis=-1), px, py
        )
        from ..ops.traverse import closest_hit
        from ..render.integrator import _interpolate_hit, _face_forward
        from ..core.state import GBuffer

        rec = closest_hit(r.bvh, o, d, t_min=0.0)
        hit = rec.prim >= 0
        ns, ng, uv, mat_id, tan = _interpolate_hit(
            r.scene, rec.prim, rec.u, rec.v, d
        )
        pos = o + d * jnp.where(jnp.isfinite(rec.t), rec.t, 0.0)[:, None]
        gbuf = GBuffer(
            position=pos,
            shading_normal=jnp.where(hit[:, None], _face_forward(ns, d), 0.0),
            geometric_normal=jnp.where(hit[:, None], _face_forward(ng, d), 0.0),
            view_direction=-d,
            material_id=jnp.where(hit, mat_id, -1),
            prim_index=rec.prim,
            uv=uv,
            t=rec.t,
            ray_dir=d,
            backface=jnp.sum(ns * d, axis=-1) > 0.0,
        )
        rng_state, radiance, albedo, normal, rays = render_sample(
            r.options, r.scene, r.bvh, r.world, r.settings, gbuf,
            jnp.ones((n,), jnp.bool_), rng_state,
        )

    center = n // 2
    side = 2 * k + 1
    return {
        "radiance": np.asarray(jax.device_get(radiance))[center],
        "prim": int(jax.device_get(rec.prim)[center]),
        "t": float(jax.device_get(rec.t)[center]),
        "material_id": int(jax.device_get(gbuf.material_id)[center]),
        "position": np.asarray(jax.device_get(pos))[center],
        "normal": np.asarray(jax.device_get(gbuf.shading_normal))[center],
        "uv": np.asarray(jax.device_get(gbuf.uv))[center],
        "neighborhood": np.asarray(jax.device_get(radiance)).reshape(
            side, side, 3
        ),
    }


def nan_view(renderer, mark_color=(1.0, 0.0, 1.0)) -> np.ndarray:
    """Display image with non-finite / negative accumulation marked bright
    pink (reference: display_NaNs + NaN sanity visualization)."""
    from ..ops.pixel_order import unscramble

    accum = np.asarray(jax.device_get(renderer.state.accum))
    bad = ~np.isfinite(accum).all(axis=-1) | (accum < 0).any(axis=-1)
    img = renderer.ldr_image().copy()
    bad_img = unscramble(bad, renderer.width, renderer.height)[::-1]
    img[bad_img] = mark_color
    return img
