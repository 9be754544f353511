"""Multi-host frame distribution — DCN-level parallelism for animations.

SURVEY.md §2.5: the TPU scaling story uses ICI for intra-frame pixel DP and
**DCN only for multi-host asset broadcast and frame-sequence sharding**. This
module implements the frame-sequence side: each host process renders its
round-robin share of an animation independently (frames are embarrassingly
parallel), with deterministic per-frame seeds so the result is identical to a
single-host render of all frames.

Run under ``jax.distributed`` (one process per host) or standalone with
explicit (process_index, process_count).
"""

from __future__ import annotations

import os
from typing import Optional


def frame_assignment(
    num_frames: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list[int]:
    """Round-robin frame indices owned by this process."""
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        except Exception:
            process_index, process_count = 0, 1
    return list(range(process_index, num_frames, max(process_count, 1)))


def render_distributed_sequence(
    renderer,
    num_frames: int,
    samples_per_frame_image: int,
    out_dir: str,
    camera_animation=None,
    envmap_animation=None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    log=None,
):
    """Render this process's share of the animation. Frames advance the
    animations deterministically from frame 0, so any process produces exactly
    the frames a single host would."""
    os.makedirs(out_dir, exist_ok=True)
    mine = set(
        frame_assignment(num_frames, process_index, process_count)
    )
    from ..assets.image_io import write_png

    paths = []
    cam0 = renderer.camera
    world0 = renderer.world
    for f in range(num_frames):
        # advance animation state deterministically for every frame
        cam_f = (
            camera_animation.step(cam0, frame=f) if camera_animation else cam0
        )
        world_f = (
            envmap_animation.step(world0, frame=f)
            if envmap_animation
            else world0
        )
        if f not in mine:
            continue
        renderer.camera = cam_f
        renderer.world = world_f
        renderer.reset()
        renderer.max_sample_count = samples_per_frame_image
        renderer._render_start_time = None
        while not renderer.is_rendering_done():
            renderer.step(block=True)
        path = os.path.join(out_dir, f"frame_{f:04d}.png")
        write_png(path, renderer.ldr_image(), gamma_encode=False)
        paths.append(path)
        if log:
            log.info(f"[anim:p{process_index or 0}] frame {f} -> {path}")
    return paths
