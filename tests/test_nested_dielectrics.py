"""Nested-dielectric interior stack (reference: NestedDielectrics.h,
Schmidt 2002 priorities)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.models import nested_dielectrics as nd


def test_push_top_remove():
    sm, sp = nd.empty_stack(4, 3)
    mask = jnp.asarray([True, True, False, True])
    sm, sp = nd.push(sm, sp, jnp.full((4,), 5), jnp.full((4,), 2), mask)
    assert np.array_equal(np.asarray(nd.top_material(sm, sp)), [5, 5, -1, 5])
    assert np.array_equal(np.asarray(nd.top_priority(sp)), [2, 2, -1, 2])
    # push a higher-priority medium on ray 0 only
    m2 = jnp.full((4,), 9)
    sm, sp = nd.push(sm, sp, m2, jnp.full((4,), 7), jnp.asarray([True, False, False, False]))
    assert int(nd.top_material(sm, sp)[0]) == 9
    assert int(nd.top_material(sm, sp)[1]) == 5
    # excluding material 9 on ray 0 → 5 visible again
    em, ep = nd.top_excluding(sm, sp, jnp.full((4,), 9))
    assert int(em[0]) == 5 and int(ep[0]) == 2
    # remove 9
    sm, sp = nd.remove(sm, sp, jnp.full((4,), 9), jnp.asarray([True, False, False, False]))
    assert int(nd.top_material(sm, sp)[0]) == 5


def test_overflow_drops():
    sm, sp = nd.empty_stack(1, 2)
    t = jnp.asarray([True])
    for mat, pri in [(1, 1), (2, 2), (3, 3)]:
        sm, sp = nd.push(sm, sp, jnp.asarray([mat]), jnp.asarray([pri]), t)
    # third push dropped (stack size 2)
    assert int(nd.top_priority(sp)[0]) == 2
    assert np.asarray(sp >= 0).sum() == 2


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/GLTFs/nested-dielectrics.gltf"),
    reason="scene unavailable",
)
def test_nested_dielectrics_scene_renders():
    from hiprt_pt_tpu.assets.loader import load_scene_file
    from hiprt_pt_tpu.core.settings import (
        AmbientLightType, LightSamplingStrategy, RenderOptions,
    )
    from hiprt_pt_tpu.render.renderer import Renderer

    scene, camera = load_scene_file(
        "/root/reference/data/GLTFs/nested-dielectrics.gltf", aspect=1.0
    )
    opts = RenderOptions(
        direct_light_sampling=LightSamplingStrategy.MIS, max_bounces_static=6
    )
    r = Renderer(scene, camera, 32, 32, options=opts)
    r.settings = r.settings.replace(
        nb_bounces=jnp.int32(6), samples_per_frame=jnp.int32(8)
    )
    r.world = r.world.replace(
        ambient_light_type=jnp.int32(int(AmbientLightType.UNIFORM)),
        uniform_light_color=jnp.ones(3, jnp.float32),
    )
    r.step(block=True)
    img = r.hdr_image()
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01
