"""Camera interaction ops (reference: Camera.h zoom/rotate/translate)."""

import numpy as np
import jax

from hiprt_pt_tpu.core.camera import (
    auto_camera_speed,
    camera_from_lookat,
    camera_rotate,
    camera_translate,
    camera_zoom,
)


def test_translate_moves_position():
    c = camera_from_lookat([0, 0, 5], [0, 0, 0])
    c2 = camera_translate(c, 1.0, 2.0, 0.0)
    p = np.asarray(jax.device_get(c2.position))
    assert np.allclose(p, [1.0, 2.0, 5.0], atol=1e-5)


def test_zoom_moves_forward():
    c = camera_from_lookat([0, 0, 5], [0, 0, 0])
    c2 = camera_zoom(c, 2.0)
    p = np.asarray(jax.device_get(c2.position))
    assert np.allclose(p, [0, 0, 3.0], atol=1e-5)


def test_rotate_preserves_position_and_orthonormality():
    c = camera_from_lookat([1, 2, 5], [0, 0, 0])
    c2 = camera_rotate(c, 0.3, 0.1)
    p1 = np.asarray(jax.device_get(c.position))
    p2 = np.asarray(jax.device_get(c2.position))
    assert np.allclose(p1, p2, atol=1e-5)
    R = np.asarray(jax.device_get(c2.view_inv))[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_auto_speed():
    assert abs(auto_camera_speed([0, 0, 0], [100, 0, 0]) - 1.0) < 1e-6
