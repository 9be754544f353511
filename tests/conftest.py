"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md §2.5 — the CPU jit backend is the
reference implementation, replicating the reference's CPU/GPU single-source
test strategy, SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS; re-point selection at CPU before any backend init.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated by
# recompiling the same render-step/test jits every run (the reference's
# shader cache plays the same role, GPUKernelCompiler.cpp:250-308). First
# run populates .pytest_xla_cache/; later runs skip virtually all compiles.
_cache_dir = os.path.join(os.path.dirname(__file__), ".pytest_xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cornell_scene():
    """The reference repo's cornell_pbr.gltf if readable, else a procedural
    cornell box."""
    from hiprt_pt_tpu.assets.gltf import load_gltf
    from hiprt_pt_tpu.assets.scene import build_scene
    from hiprt_pt_tpu.core.material import MaterialBank

    path = "/root/reference/data/GLTFs/cornell_pbr.gltf"
    if os.path.exists(path):
        parsed = load_gltf(path, aspect_override=1.0)
        scene = build_scene(
            parsed.vertices,
            parsed.triangles,
            parsed.material_ids,
            MaterialBank.from_rows(parsed.material_rows),
            normals=parsed.normals,
            uvs=parsed.uvs,
        )
        return scene, parsed.camera
    pytest.skip("reference cornell scene unavailable")


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
