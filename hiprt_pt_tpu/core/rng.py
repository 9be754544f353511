"""Deterministic counter-based per-ray RNG.

Role parity with the reference's per-pixel ``wang_hash`` seeding + ``Xorshift32``
stream (src/HostDeviceCommon/Xorshift.h:14-66, seeding at
src/Device/kernels/FullPathTracer.h:124-129): every (pixel, sample, frame-seed)
triple yields an independent, reproducible random stream, which enables
``freeze_random`` debugging and exact regression renders.

TPU-first: the generator state is a flat ``uint32`` array (one lane per ray) and
every step is pure VPU integer math — far cheaper inside the bounce ``scan``
than full ``jax.random`` threefry key splitting per bounce. We use the PCG
output hash (Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT 2020 —
public domain) for seeding and an LCG+PCG-XSH step for the stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PCG_MULT = jnp.uint32(747796405)
_PCG_INC = jnp.uint32(2891336453)


def pcg_hash(x: jax.Array) -> jax.Array:
    """PCG output permutation of a uint32 word."""
    x = x.astype(jnp.uint32)
    state = x * _PCG_MULT + _PCG_INC
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(
        277803737
    )
    return (word >> jnp.uint32(22)) ^ word


def seed(pixel_index: jax.Array, sample_number: jax.Array, global_seed) -> jax.Array:
    """Per-ray uint32 RNG state from (pixel, sample, seed)."""
    pixel_index = jnp.asarray(pixel_index, dtype=jnp.uint32)
    s = pcg_hash(pixel_index + jnp.uint32(1))
    s = pcg_hash(s ^ (jnp.asarray(sample_number, jnp.uint32) * jnp.uint32(0x9E3779B9)))
    s = pcg_hash(s ^ jnp.asarray(global_seed, jnp.uint32))
    return s


def next_uint(state: jax.Array):
    """Advance: LCG step + PCG permutation. Returns (new_state, uint32 draw)."""
    new_state = state * _PCG_MULT + _PCG_INC
    return new_state, pcg_hash(new_state)


def next_float(state: jax.Array):
    """Uniform float32 in [0, 1). Returns (new_state, floats)."""
    new_state, bits = next_uint(state)
    # top 24 bits → [0,1) with full float32 mantissa coverage
    return new_state, (bits >> jnp.uint32(8)).astype(jnp.float32) * (1.0 / 16777216.0)


def next_float2(state: jax.Array):
    state, a = next_float(state)
    state, b = next_float(state)
    return state, a, b


def next_float3(state: jax.Array):
    state, a = next_float(state)
    state, b = next_float(state)
    state, c = next_float(state)
    return state, a, b, c
