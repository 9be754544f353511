"""Learned denoiser — a small residual CNN over the same AOVs OIDN consumes.

Role parity with the reference's Intel OIDN "RT" filter
(src/Renderer/OpenImageDenoiser.cpp:114-140: learned denoise of beauty +
albedo/normal auxiliary images). OIDN has no TPU build; this is a compact
TPU-native network trained on this renderer's own output
(benchmarks/train_denoiser.py), designed to beat the à-trous+SVGF filter
(render/denoise.py) at interactive sample counts.

Architecture (plain JAX, NHWC, ~50k params, bf16-friendly):
  input  = [log1p(noisy), log1p(atrous), albedo, normal,
            log1p(rel-variance), log(spp)/8]           (14 channels)
  conv3x3(32) relu -> conv3x3(32) relu -> conv3x3(32, dilation 2) relu
  -> conv3x3(32, dilation 4) relu -> conv3x3(3)
  output = expm1( log1p(atrous) + delta )  clamped >= 0
The residual-over-à-trous formulation means an untrained/zero network
degrades exactly to the existing filter — and the long-range smoothing the
small receptive field cannot provide is inherited from the à-trous input.

Weights ship at hiprt_pt_tpu/bake/data_denoiser.npz; `load_params()`
returns None when absent and callers fall back to the à-trous filter.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "bake", "data_denoiser.npz"
)

_LAYERS = ((14, 32, 1), (32, 32, 1), (32, 32, 2), (32, 32, 4), (32, 3, 1))


def init_params(key, scale=0.1):
    """He-ish init; final layer zero so the untrained net is the identity
    residual (output == à-trous input)."""
    params = []
    keys = jax.random.split(key, len(_LAYERS))
    for k, (cin, cout, _d) in zip(keys, _LAYERS):
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
        w = w * scale / np.sqrt(9 * cin)
        params.append({"w": w, "b": jnp.zeros((cout,), jnp.float32)})
    params[-1]["w"] = jnp.zeros_like(params[-1]["w"])
    return params


def _conv(x, p, dilation):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def apply(params, noisy, atrous, albedo, normal, variance=None, spp=None):
    """Denoise (H, W, 3) HDR images (batched internally). variance: (H, W)
    luminance variance of the mean; spp: (H, W) per-pixel sample counts."""
    H, W, _ = noisy.shape
    if variance is None:
        variance = jnp.zeros((H, W), jnp.float32)
    if spp is None:
        spp = jnp.ones((H, W), jnp.float32)
    ln = jnp.log1p(jnp.maximum(noisy, 0.0))
    la = jnp.log1p(jnp.maximum(atrous, 0.0))
    rel_v = jnp.log1p(variance / jnp.maximum(
        jnp.mean(jnp.maximum(noisy, 0.0), axis=-1) ** 2 + 1e-4, 1e-4))
    x = jnp.concatenate(
        [ln, la, albedo, normal, rel_v[..., None],
         (jnp.log2(jnp.maximum(spp, 1.0)) / 8.0)[..., None]],
        axis=-1,
    )[None]
    for p, (_ci, _co, d) in zip(params[:-1], _LAYERS[:-1]):
        x = jax.nn.relu(_conv(x, p, d))
    delta = _conv(x, params[-1], _LAYERS[-1][2])[0]
    return jnp.maximum(jnp.expm1(la + delta), 0.0)


apply_jit = jax.jit(apply)


def load_params():
    """Load shipped weights; None if absent (callers fall back to à-trous)."""
    if not os.path.exists(WEIGHTS_PATH):
        return None
    data = np.load(WEIGHTS_PATH)
    n = len(_LAYERS)
    return [
        {"w": jnp.asarray(data[f"w{i}"]), "b": jnp.asarray(data[f"b{i}"])}
        for i in range(n)
    ]


def save_params(params, path=WEIGHTS_PATH):
    np.savez(
        path,
        **{f"w{i}": np.asarray(p["w"]) for i, p in enumerate(params)},
        **{f"b{i}": np.asarray(p["b"]) for i, p in enumerate(params)},
    )
