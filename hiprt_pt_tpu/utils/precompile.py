"""Background precompilation of render-option permutations.

Role parity with the reference's kernel-permutation precompile sweep
(src/Renderer/GPURenderer.cpp:773-897: background threads compile common
-D macro combinations into the shader cache, with main-thread priority
handoff at GPUKernelCompiler.cpp:21-73).

TPU mapping (SURVEY.md §5.6): each ``RenderOptions`` combination is one XLA
executable; warming it = calling ``render_step.lower(...).compile()`` on a
worker thread. The persistent XLA compilation cache plays the shader-cache
role, so warmed executables survive across processes when
``jax_compilation_cache_dir`` is set.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import itertools
import threading
from typing import Iterable, Optional

from ..core.settings import (
    EnvmapSamplingStrategy,
    LightSamplingStrategy,
    RenderOptions,
)


def common_permutations(base: RenderOptions) -> list[RenderOptions]:
    """The sweep set mirroring the reference's: direct-light strategies x
    envmap strategies (GPURenderer.cpp:807-845) + ReSTIR bias options
    (:847-884)."""
    out = []
    for dls, ess in itertools.product(
        (
            LightSamplingStrategy.MIS,
            LightSamplingStrategy.RIS_BSDF_LIGHT,
            LightSamplingStrategy.RESTIR_DI,
        ),
        (EnvmapSamplingStrategy.CDF_BINARY, EnvmapSamplingStrategy.ALIAS_TABLE),
    ):
        out.append(
            dataclasses.replace(
                base, direct_light_sampling=dls, envmap_sampling=ess
            )
        )
    return out


class Precompiler:
    """Warm RenderOptions permutations on worker threads. Compilation requests
    from the renderer's main path automatically win (XLA serializes compiles;
    our workers just keep the queue full — the analog of the reference's
    priority condvar)."""

    def __init__(self, max_workers: int = 2):
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=max_workers, thread_name_prefix="precompile"
        )
        self._futures = []
        self._lock = threading.Lock()
        self.compiled = 0
        self.failed = 0

    def warm(
        self,
        renderer,
        permutations: Optional[Iterable[RenderOptions]] = None,
        log=None,
    ):
        """Queue AOT compiles of the render step for each option set, using
        the renderer's current scene/state shapes."""
        from ..render.renderer import render_step

        perms = list(
            permutations
            if permutations is not None
            else common_permutations(renderer.options)
        )
        total = len(perms)

        def job(opts, idx):
            try:
                from ..core.state import init_render_state

                state = init_render_state(
                    renderer.width,
                    renderer.height,
                    renderer.seed,
                    with_restir=opts.direct_light_sampling
                    == LightSamplingStrategy.RESTIR_DI,
                )
                lowered = render_step.lower(
                    opts,
                    renderer.width,
                    renderer.height,
                    (renderer.scene, renderer.bvh),
                    state,
                    renderer.camera,
                    renderer.settings,
                    renderer.world,
                )
                lowered.compile()
                with self._lock:
                    self.compiled += 1
            except Exception:
                with self._lock:
                    self.failed += 1
            if log:
                log.update_line(
                    "precompile",
                    f"Precompiling option permutations... "
                    f"[{self.compiled + self.failed}/{total}]",
                )

        for i, opts in enumerate(perms):
            self._futures.append(self._pool.submit(job, opts, i))
        return self._futures

    def wait(self, timeout=None):
        concurrent.futures.wait(self._futures, timeout=timeout)

    def shutdown(self):
        self._pool.shutdown(wait=False, cancel_futures=True)


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a repo-local directory
    (the reference's shader cache, GPUKernelCompiler.cpp:250-308). Safe to
    call before or after backend init; idempotent."""
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
