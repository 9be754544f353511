"""Multi-chip scaling — pixel-tile data parallelism over a device mesh.

The reference is a single-process, single-GPU application (SURVEY.md §2.5:
device index 0 hard-coded, no communication backend). This module is the
rebuild's headroom: Monte-Carlo pixels are embarrassingly parallel, so the
flat pixel axis is sharded across a 1-D ``jax.sharding.Mesh`` ("pixels") and
the jitted render step runs SPMD — XLA inserts the only collectives needed
(all-reduce over ICI for the converged-pixel counter and any global stats).

Scene data (BVH + materials + envmap tables) is replicated per chip, exactly
as the survey prescribes. A second axis ("samples") supports sample-axis DP:
every chip renders the full image with decorrelated seeds and accumulations
are psum-merged — useful when the image is too small to saturate many chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import RenderState, init_render_state


def make_mesh(devices=None, axis_name: str = "pixels") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_render_state(state: RenderState, mesh: Mesh) -> RenderState:
    """Place per-pixel arrays sharded on the pixel axis, scalars replicated."""
    n = state.accum.shape[0]

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == n:
            spec = P("pixels", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, state)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (scene, bvh, camera, settings) across the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())), tree
    )


def init_sharded_render_state(
    width: int, height: int, mesh: Mesh, seed: int = 42
) -> RenderState:
    if (width * height) % mesh.size != 0:
        raise ValueError(
            f"width*height ({width*height}) must divide evenly across "
            f"{mesh.size} devices"
        )
    return shard_render_state(init_render_state(width, height, seed), mesh)


def make_sample_mesh(devices=None) -> Mesh:
    """1-D mesh over the sample axis (sample-axis DP: every chip renders
    the FULL image with decorrelated seeds; accumulations merge by mean)."""
    return make_mesh(devices, axis_name="samples")


# deterministic per-chip seed decorrelation stride (any odd constant)
_SAMPLE_DP_SEED_STRIDE = 9176


def init_sample_dp_state(
    width: int, height: int, mesh: Mesh, seed: int = 42,
    with_restir: bool = False,
):
    """Stack mesh.size decorrelated full-image render states on a leading
    'samples' axis, sharded one-per-chip."""
    S = mesh.size
    states = [
        init_render_state(
            width, height, seed + _SAMPLE_DP_SEED_STRIDE * k,
            with_restir=with_restir,
        )
        for k in range(S)
    ]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *states)

    def place(x):
        return jax.device_put(
            x,
            NamedSharding(mesh, P("samples", *([None] * (x.ndim - 1)))),
        )

    return jax.tree_util.tree_map(place, stacked)


def sample_dp_render(
    options,
    width: int,
    height: int,
    scene,
    bvh,
    camera,
    settings,
    world,
    mesh: Mesh,
    state,
):
    """One render step per chip over the 'samples' mesh axis: same scene and
    camera (replicated), per-chip decorrelated seeds — sample-axis DP
    (SURVEY.md §2.5: "optional sample-axis DP (same pixel, different seeds,
    mean over ICI)"). Useful when the image is too small to saturate many
    chips with pixel-DP. Accumulation stays chip-local; merge_sample_dp
    reduces over ICI."""
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    from ..render.renderer import render_step

    def one(state_slice):
        st = jax.tree_util.tree_map(lambda x: x[0], state_slice)
        st = render_step(
            options, width, height, (scene, bvh), st, camera, settings, world
        )
        return jax.tree_util.tree_map(lambda x: x[None], st)

    fn = shard_map(
        one,
        mesh=mesh,
        in_specs=(P("samples"),),
        out_specs=P("samples"),
        check_vma=False,
    )
    return fn(state)


def merge_sample_dp(state):
    """Merged beauty accumulation (mean over chips — all chips advance in
    lockstep) + the total sample count across the mesh. Lowers to an ICI
    all-reduce when jitted over sharded inputs."""
    accum = jnp.mean(state.accum, axis=0)
    total = jnp.sum(state.sample_count)
    return accum, total


def distributed_render(
    options,
    width: int,
    height: int,
    scene,
    bvh,
    camera,
    settings,
    world,
    mesh: Mesh,
    state: RenderState | None = None,
):
    """Run one sharded render step; returns the (still sharded) new state.

    The same ``render_step`` executable as single-chip — sharding is carried by
    the input placements (GSPMD): per-pixel math stays local to each chip's
    pixel shard; the converged-pixel ``sum`` lowers to an ICI all-reduce.
    """
    from ..render.renderer import render_step

    if state is None:
        state = init_sharded_render_state(width, height, mesh, 42)
    scene_r = replicate(scene, mesh)
    bvh_r = replicate(bvh, mesh)
    camera_r = replicate(camera, mesh)
    settings_r = replicate(settings, mesh)
    world_r = replicate(world, mesh)
    return render_step(
        options, width, height, (scene_r, bvh_r), state, camera_r, settings_r,
        world_r,
    )
