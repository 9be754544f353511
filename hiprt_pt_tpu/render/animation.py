"""Animation — camera orbits, envmap rotation, frame-sequence rendering.

Role parity with the reference's ``CameraAnimation`` (rotate-around-point,
src/Scene/CameraAnimation.h:16-41), ``RendererEnvmap`` rotation animation
(src/Renderer/RendererEnvmap.cpp:54-103 yaw/pitch/roll per frame) and the
frame-sequence output of ``RendererAnimationState`` (auto-created output
folder, write-frame-on-converged: src/UI/RenderWindow.cpp:843-863).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.camera import Camera, camera_from_lookat


@dataclass
class CameraOrbitAnimation:
    """Rotate the camera around a target point by `degrees_per_frame`."""

    target: tuple = (0.0, 0.0, 0.0)
    degrees_per_frame: float = 1.0
    up: tuple = (0.0, 1.0, 0.0)

    def step(self, camera: Camera, frame: int = 1) -> Camera:
        eye = np.asarray(jax.device_get(camera.position), np.float32)
        tgt = np.asarray(self.target, np.float32)
        ang = np.deg2rad(self.degrees_per_frame * frame)
        rel = eye - tgt
        c, s = np.cos(ang), np.sin(ang)
        rot = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        new_eye = tgt + rot @ rel
        vfov = float(jax.device_get(camera.vfov))
        # recover aspect from the projection matrix
        proj = np.asarray(jax.device_get(camera.proj))
        aspect = proj[1, 1] / proj[0, 0]
        return camera_from_lookat(
            new_eye, tgt, self.up, np.rad2deg(vfov), float(aspect)
        )


@dataclass
class EnvmapRotationAnimation:
    """Animate the envmap yaw per frame (reference: RendererEnvmap yaw/pitch/
    roll animation)."""

    yaw_degrees_per_frame: float = 1.0

    def step(self, world, frame: int = 1):
        ang = np.deg2rad(self.yaw_degrees_per_frame * frame)
        c, s = np.cos(ang), np.sin(ang)
        rot = np.asarray([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]], np.float32)
        base = np.asarray(jax.device_get(world.envmap_to_world))
        m = rot @ base
        return world.replace(
            envmap_to_world=jnp.asarray(m),
            world_to_envmap=jnp.asarray(m.T),
        )


def render_frame_sequence(
    renderer,
    num_frames: int,
    samples_per_frame_image: int,
    out_dir: str,
    camera_animation: Optional[CameraOrbitAnimation] = None,
    envmap_animation: Optional[EnvmapRotationAnimation] = None,
    denoise_frames: bool = False,
    log=None,
):
    """Render an animation: each frame accumulates to the target spp, is
    written as frame_%04d.png, then animations advance and accumulation resets
    (reference: frame-sequence dump in RenderWindow.cpp:843-863)."""
    os.makedirs(out_dir, exist_ok=True)
    from ..assets.image_io import write_png

    paths = []
    for f in range(num_frames):
        renderer.max_sample_count = samples_per_frame_image
        renderer._render_start_time = None
        while not renderer.is_rendering_done():
            renderer.step(block=True)
        if denoise_frames:
            from .denoise import denoise
            from ..ops.tonemap import tonemap_gamma

            img = np.asarray(tonemap_gamma(jnp.asarray(denoise(renderer))))
        else:
            img = renderer.ldr_image()
        path = os.path.join(out_dir, f"frame_{f:04d}.png")
        write_png(path, img, gamma_encode=False)
        paths.append(path)
        if log:
            log.info(f"[anim] frame {f + 1}/{num_frames} -> {path}")
        if camera_animation is not None:
            renderer.set_camera(camera_animation.step(renderer.camera))
        if envmap_animation is not None:
            renderer.world = envmap_animation.step(renderer.world)
            renderer.reset()
        else:
            renderer.reset()
    return paths
