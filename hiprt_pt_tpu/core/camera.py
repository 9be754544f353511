"""Camera model: view/projection state + batched primary-ray generation.

Capability parity with the reference's ``Camera`` (src/Scene/Camera.h:27-87 —
quaternion+translation state, view/projection matrices, zoom/rotate/translate)
and ``HIPRTCamera`` ray generation (src/HostDeviceCommon/HIPRTCamera.h:16-49 —
inverse-view/inverse-projection NDC unprojection with sub-pixel jitter).

TPU-first: ray generation is a single vectorized transform over all pixels of a
wavefront (two 4x4 matrix applies fused by XLA), not a per-thread computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def perspective_matrix(vfov_rad: float, aspect: float, near: float, far: float):
    """Right-handed OpenGL-style projection (matches GLTF camera conventions)."""
    f = 1.0 / np.tan(vfov_rad / 2.0)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) / (near - far)
    m[2, 3] = (2.0 * far * near) / (near - far)
    m[3, 2] = -1.0
    return m


def quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """Unit quaternion (x, y, z, w) → 3x3 rotation (GLTF component order)."""
    x, y, z, w = [float(v) for v in q]
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


@struct.dataclass
class Camera:
    """Pytree camera. ``view_inv``/``proj_inv`` are what ray-gen consumes; the
    forward matrices are kept for reprojection (ReSTIR temporal reuse)."""

    view: jax.Array       # (4,4) world→camera
    view_inv: jax.Array   # (4,4) camera→world
    proj: jax.Array       # (4,4)
    proj_inv: jax.Array   # (4,4)
    position: jax.Array   # (3,)
    vfov: jax.Array       # scalar, radians
    near: jax.Array
    far: jax.Array
    do_jitter: jax.Array  # bool: sub-pixel AA jitter

    @classmethod
    def create(
        cls,
        view: np.ndarray,
        vfov_rad: float,
        aspect: float,
        near: float = 0.1,
        far: float = 100.0,
        do_jitter: bool = True,
    ) -> "Camera":
        proj = perspective_matrix(vfov_rad, aspect, near, far)
        view = np.asarray(view, dtype=np.float32)
        view_inv = np.linalg.inv(view)
        return cls(
            view=jnp.asarray(view),
            view_inv=jnp.asarray(view_inv),
            proj=jnp.asarray(proj),
            proj_inv=jnp.asarray(np.linalg.inv(proj)),
            position=jnp.asarray(view_inv[:3, 3]),
            vfov=jnp.float32(vfov_rad),
            near=jnp.float32(near),
            far=jnp.float32(far),
            do_jitter=jnp.bool_(do_jitter),
        )


def camera_from_lookat(
    eye, target, up=(0.0, 1.0, 0.0), vfov_deg=45.0, aspect=1.0
) -> Camera:
    eye = np.asarray(eye, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    up = np.asarray(up, dtype=np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    # camera looks down -Z in view space (GL convention)
    view_inv = np.eye(4, dtype=np.float32)
    view_inv[:3, 0] = right
    view_inv[:3, 1] = true_up
    view_inv[:3, 2] = -fwd
    view_inv[:3, 3] = eye
    view = np.linalg.inv(view_inv)
    return Camera.create(view, np.deg2rad(vfov_deg), aspect)


def camera_from_gltf_node(
    translation, rotation, yfov: float, aspect: float, near=0.1, far=100.0
) -> Camera:
    """GLTF camera node → Camera. GLTF cameras look down -Z of the node frame
    (reference scene parsing: src/Scene/SceneParser.cpp:222-276)."""
    R = quat_to_matrix(np.asarray(rotation, dtype=np.float32))
    t = np.asarray(translation, dtype=np.float32)
    view_inv = np.eye(4, dtype=np.float32)
    view_inv[:3, :3] = R
    view_inv[:3, 3] = t
    view = np.linalg.inv(view_inv)
    return Camera.create(view, yfov, aspect, near, far)


def generate_camera_rays(
    camera: Camera,
    width: int,
    height: int,
    jitter: jax.Array | None = None,
    px: jax.Array | None = None,
    py: jax.Array | None = None,
):
    """Primary rays for every pixel.

    Returns (origins (H*W,3), directions (H*W,3)). Pixel (0,0) is the *bottom
    left* (NDC convention, matching the reference's HIPRTCamera.h:27-49 which
    maps (x+0.5)/w → [-1,1] NDC).

    jitter: optional (H*W, 2) in [0,1) sub-pixel offsets; defaults to 0.5.
    px/py: optional explicit pixel coordinates (the integrator passes the
    tile-major canonical order, ops/pixel_order.py); default row-major.
    """
    if px is None or py is None:
        idx = jnp.arange(width * height, dtype=jnp.int32)
        px, py = idx % width, idx // width
    n = px.shape[0]  # may be a sub-wavefront (debug_pixel slices)
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[:, 0], jitter[:, 1]
        jx = jnp.where(camera.do_jitter, jx, 0.5)
        jy = jnp.where(camera.do_jitter, jy, 0.5)
    ndc_x = (px + jx) / width * 2.0 - 1.0
    ndc_y = (py + jy) / height * 2.0 - 1.0
    # unproject NDC point on the near plane to view space
    ndc = jnp.stack(
        [ndc_x, ndc_y, -jnp.ones_like(ndc_x), jnp.ones_like(ndc_x)], axis=-1
    )
    view_pt = ndc @ camera.proj_inv.T
    view_pt = view_pt[:, :3] / view_pt[:, 3:4]
    # Direction from the view_inv frame alone (rotation applied to the
    # near-plane offset); the ray origin is camera.position. Keeping the two
    # independent makes `camera.replace(position=...)` a consistent rigid
    # translation instead of skewing rays toward a stale near plane.
    dirs = view_pt @ camera.view_inv[:3, :3].T
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(camera.position, (n, 3))
    return origins, dirs


# --- interactive camera operations (reference: Camera zoom/rotate/translate,
# src/Scene/Camera.h:27-87 + mouse/keyboard interactors) ---


def _decompose(camera: Camera):
    vi = np.array(jax.device_get(camera.view_inv))  # writable copy
    proj = np.asarray(jax.device_get(camera.proj))
    aspect = proj[1, 1] / proj[0, 0]
    return vi, float(jax.device_get(camera.vfov)), float(aspect), \
        float(jax.device_get(camera.near)), float(jax.device_get(camera.far))


def _recompose(vi, vfov, aspect, near, far) -> Camera:
    return Camera.create(np.linalg.inv(vi), vfov, aspect, near, far)


def camera_rotate(camera: Camera, yaw_rad: float, pitch_rad: float) -> Camera:
    """First-person look rotation (reference: mouse-drag rotation)."""
    vi, vfov, aspect, near, far = _decompose(camera)
    cy, sy = np.cos(yaw_rad), np.sin(yaw_rad)
    cp, sp = np.cos(pitch_rad), np.sin(pitch_rad)
    yaw = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
    right = vi[:3, 0]
    # pitch about the camera's right axis (Rodrigues)
    k = right / np.linalg.norm(right)
    K = np.asarray(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float32
    )
    pitch = np.eye(3, dtype=np.float32) + sp * K + (1 - cp) * (K @ K)
    vi[:3, :3] = yaw @ pitch @ vi[:3, :3]
    return _recompose(vi, vfov, aspect, near, far)


def camera_translate(camera: Camera, dx: float, dy: float, dz: float) -> Camera:
    """Walk in camera space: +x right, +y up, -z forward (reference: WASD +
    QZ/space/shift keyboard walk, RenderWindowKeyboardInteractor.cpp:29-52)."""
    vi, vfov, aspect, near, far = _decompose(camera)
    vi[:3, 3] += vi[:3, 0] * dx + vi[:3, 1] * dy + vi[:3, 2] * dz
    return _recompose(vi, vfov, aspect, near, far)


def camera_zoom(camera: Camera, amount: float) -> Camera:
    """Dolly along the view direction (reference: scroll zoom)."""
    return camera_translate(camera, 0.0, 0.0, -amount)


def auto_camera_speed(scene_min, scene_max) -> float:
    """Movement speed from the scene bounding box (reference:
    SceneParser.cpp:206 camera auto speed)."""
    import numpy as _np

    extent = _np.linalg.norm(_np.asarray(scene_max) - _np.asarray(scene_min))
    return float(extent) / 100.0
