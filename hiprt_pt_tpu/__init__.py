"""hiprt_pt_tpu — a TPU-native (JAX/XLA/Pallas) physically-based path-tracing framework.

Re-designed from scratch with the capabilities of the HIPRT-Path-Tracer reference
(an interactive C++/HIP unidirectional backwards Monte Carlo GPU path tracer), but
built TPU-first:

- a pure-functional render step ``render_step(state, scene, settings, key) -> state``
  compiled once under ``jax.jit`` (reference: GPURenderer::render,
  src/Renderer/GPURenderer.cpp:408-464 re-launches kernels per frame),
- wavefront path tracing over flat SoA ray arrays instead of a divergent per-pixel
  megakernel (reference: src/Device/kernels/FullPathTracer.h:100-327),
- compile-time feature specialization via hashable static options instead of ``-D``
  macro recompiles (reference: src/HostDeviceCommon/KernelOptions.h),
- multi-chip scaling via ``jax.sharding``/``shard_map`` pixel-tile data parallelism
  (the reference is single-GPU; see SURVEY.md §2.5).

Layout:
  core/     — pytree data model: materials, settings, camera, render state, RNG
  models/   — BSDF model families (lambert/oren-nayar/microfacet/principled/...)
  assets/   — scene ingestion (GLTF), image IO, envmap sampling tables
  accel/    — BVH build (host) + flat SoA node arrays
  ops/      — compute kernels: traversal, sampling, tonemap, texture fetch, pallas
  lights/   — NEE / MIS / RIS light sampling
  restir/   — ReSTIR DI reservoirs and reuse passes
  render/   — integrator, renderer orchestration, adaptive sampling, denoiser
  parallel/ — device-mesh sharding of the render step
  bake/     — BRDF energy-compensation LUT baker
  app/      — CLI renderer and interactive viewer
  utils/    — logging, perf metrics, config
"""

__version__ = "0.1.0"
