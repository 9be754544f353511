"""Environment-map importance-sampling tables: luminance CDF + Vose alias table.

Role parity with the reference's ``Image32Bit::compute_cdf`` /
``compute_alias_table`` (src/Image/Image.cpp:553-660, O(N) Vose construction)
feeding the two envmap sampling strategies (src/Device/includes/Envmap.h:77-218).

Built host-side in numpy at load (like the reference building them on the CPU
before upload), consumed device-side by ops/envmap sampling.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .image_io import luminance, read_hdr
from .scene import EnvmapData


def sin_weighted_luminance(texels: np.ndarray) -> np.ndarray:
    """Per-texel importance = luminance × sin(theta) (solid-angle weight of an
    equirectangular row)."""
    h, w, _ = texels.shape
    lum = luminance(texels)
    theta = (np.arange(h, dtype=np.float64) + 0.5) / h * np.pi
    return (lum * np.sin(theta)[:, None]).astype(np.float64)


def compute_cdf(texels: np.ndarray) -> np.ndarray:
    """Flat inclusive CDF over all texels (reference: Image.cpp:553-574)."""
    imp = sin_weighted_luminance(texels).ravel()
    cdf = np.cumsum(imp)
    total = cdf[-1]
    if total <= 0.0:
        return np.linspace(1.0 / imp.size, 1.0, imp.size).astype(np.float32)
    return (cdf / total).astype(np.float32)


def compute_alias_table(texels: np.ndarray):
    """Vose O(N) alias method (reference: Image.cpp:576-660).

    Returns (probas f32 (N,), aliases i32 (N,)): sample a uniform texel index i
    and a uniform u; pick i if u < probas[i] else aliases[i].
    """
    imp = sin_weighted_luminance(texels).ravel()
    n = imp.size
    total = imp.sum()
    if total <= 0.0:
        return np.ones(n, dtype=np.float32), np.arange(n, dtype=np.int32)
    p = imp * (n / total)
    probas = np.zeros(n, dtype=np.float32)
    aliases = np.arange(n, dtype=np.int32)
    small = list(np.nonzero(p < 1.0)[0])
    large = list(np.nonzero(p >= 1.0)[0])
    p = p.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        probas[s] = p[s]
        aliases[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    for rest in small + large:
        probas[rest] = 1.0
    return probas, aliases


def build_envmap(texels: np.ndarray, intensity: float = 1.0) -> EnvmapData:
    """Assemble device-side EnvmapData from an (H, W, 3) linear radiance map."""
    texels = np.ascontiguousarray(np.asarray(texels, dtype=np.float32)[..., :3])
    cdf = compute_cdf(texels)
    probas, aliases = compute_alias_table(texels)
    total_lum = float(sin_weighted_luminance(texels).sum())
    return EnvmapData(
        texels=jnp.asarray(texels),
        cdf=jnp.asarray(cdf),
        alias_probas=jnp.asarray(probas),
        alias_indices=jnp.asarray(aliases),
        total_luminance=jnp.float32(total_lum),
    )


def load_envmap(path: str, intensity: float = 1.0) -> EnvmapData:
    return build_envmap(read_hdr(path), intensity)


def make_test_envmap(h: int = 64, w: int = 128, kind: str = "sky") -> np.ndarray:
    """Procedural envmaps for tests/demos (no HDR assets ship with the repo)."""
    theta = (np.arange(h) + 0.5) / h * np.pi
    phi = (np.arange(w) + 0.5) / w * 2 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    if kind == "white":
        return np.ones((h, w, 3), dtype=np.float32)
    if kind == "sun":
        img = np.full((h, w, 3), 0.05, dtype=np.float32)
        img[h // 4, w // 3] = [5000.0, 4500.0, 4000.0]
        return img
    # simple sky gradient + sun disk
    sky = np.stack(
        [
            0.2 + 0.3 * np.cos(t),
            0.35 + 0.35 * np.cos(t),
            0.65 + 0.3 * np.cos(t),
        ],
        axis=-1,
    ).astype(np.float32)
    sun_dir = (np.pi / 3.0, np.pi / 4.0)
    ang = np.arccos(
        np.clip(
            np.sin(t) * np.sin(sun_dir[0]) * np.cos(p - sun_dir[1])
            + np.cos(t) * np.cos(sun_dir[0]),
            -1,
            1,
        )
    )
    sky += (np.exp(-(ang**2) / 0.005)[..., None] * np.array([50.0, 45.0, 35.0])).astype(
        np.float32
    )
    return np.clip(sky, 0.0, None)
