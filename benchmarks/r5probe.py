"""Round-5 probes: where do the leaf-round milliseconds actually go?

Three questions, each measured with in-jit rep loops (lax.scan / fori) so
the ~26 ms relay dispatch floor (ROUND4.md) amortizes away:

  P1  MXU efficiency of the leaf one-hot matmul SHAPE itself:
      (W, L) x (L, 4096) int8->i32 at stress-scale L/W, plus variants
      (12-bit width 14*Tc, one fused matmul vs 8 group matmuls, bf16).
      Theoretical int8 v5e: 394 TOPS.
  P2  i32 gather-output materialization cost: same matmul with the
      consumer reading 1 row vs all rows (does the (W, 4096) i32
      write/read dominate the gap?).
  P3  Scalar-addressed DMA staging throughput: a Pallas kernel that
      reads K pend indices from SMEM-resident scratch and issues K row
      DMAs HBM->VMEM per round. Cost per service sets the viability of a
      working-set-proportional leaf fetch at 1.6M+ tris.

Run ALONE on the TPU:  python benchmarks/r5probe.py
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hiprt_pt_tpu.utils.precompile import enable_persistent_cache


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


# --------------------------------------------------------------- P1 / P2
def _mm_kernel(tab_ref, idx_ref, out_ref, *, rounds, L, W, NL, groups,
               out_rows):
    i32 = jnp.int32
    iota_l = jax.lax.broadcasted_iota(i32, (L, NL // groups), 0)

    def body(r, acc):
        parts = []
        for g in range(groups):
            sl = idx_ref[r % 8, g * (NL // groups):(g + 1) * (NL // groups)]
            oh = (iota_l == sl[None, :]).astype(tab_ref.dtype)
            gl = jax.lax.dot_general(
                tab_ref[:], oh, (((0,), (0,)), ((), ())),
                preferred_element_type=i32 if tab_ref.dtype == jnp.int8
                else jnp.float32,
            )
            parts.append(gl)
        gl_all = jnp.concatenate(parts, axis=1) if groups > 1 else parts[0]
        # consume out_rows rows (out_rows=W models the real kernel's full
        # decode; out_rows=8 models a fused consumer that never
        # materializes the gather)
        return acc + jnp.sum(gl_all[:out_rows].astype(jnp.float32))

    acc = jax.lax.fori_loop(0, rounds, body, jnp.float32(0.0))
    out_ref[0, 0] = acc


def mm_probe(L, W, NL, rounds, dtype=jnp.int8, groups=1, out_rows=None):
    out_rows = W if out_rows is None else out_rows
    tab = jnp.ones((L, W), dtype)
    idx = jnp.arange(8 * NL, dtype=jnp.int32).reshape(8, NL) % L

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            partial(_mm_kernel, rounds=rounds, L=L, W=W, NL=NL,
                    groups=groups, out_rows=out_rows),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(tab, idx)

    dt = timeit(run, tab, idx)
    macs = L * W * NL * rounds
    per_round_us = dt / rounds * 1e6
    eff = macs / dt / 394e12 if dtype == jnp.int8 else macs / dt / 197e12
    print(f"  L={L:6d} W={W:5d} NL={NL} {np.dtype(dtype).name:8s} "
          f"g={groups} out={out_rows:5d}: {per_round_us:8.1f} us/round "
          f"eff={eff * 100:5.1f}%", flush=True)
    return per_round_us


# ------------------------------------------------------------------- P3
def _dma_kernel(idx_hbm, tab_hbm, out_ref, stage, sem, idx_s, csem,
                *, rounds, K, W):
    # bring the indices into SMEM once
    cp = pltpu.make_async_copy(idx_hbm, idx_s, csem)
    cp.start()
    cp.wait()

    def body(r, acc):
        def inner(k, _):
            row = idx_s[(r + k) % 8, k % idx_s.shape[1]]
            d = pltpu.make_async_copy(
                tab_hbm.at[row], stage.at[k % 16], sem.at[k % 16])
            d.start()
            d.wait()
            return 0

        jax.lax.fori_loop(0, K, inner, 0)
        return acc + stage[0, 0].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, rounds, body, jnp.float32(0.0))
    out_ref[0, 0] = acc


def dma_probe(M, W, K, rounds):
    """K row-DMAs (tab[idx] -> VMEM stage) per round, serial wait."""
    tab = jnp.ones((M, W), jnp.int8)
    idx = (jnp.arange(8 * K, dtype=jnp.int32).reshape(8, K) * 9973) % M

    @jax.jit
    def run(idx, tab):
        return pl.pallas_call(
            partial(_dma_kernel, rounds=rounds, K=K, W=W),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((16, W), jnp.int8),
                pltpu.SemaphoreType.DMA((16,)),
                pltpu.SMEM((8, K), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tab)

    dt = timeit(run, idx, tab)
    per_dma_ns = dt / rounds / K * 1e9
    bw = K * W * rounds / dt / 1e9
    print(f"  M={M} W={W} K={K}: {dt / rounds * 1e6:8.1f} us/round "
          f"{per_dma_ns:7.1f} ns/dma  {bw:6.1f} GB/s", flush=True)
    return per_dma_ns


def _dma_pipe_kernel(idx_hbm, tab_hbm, out_ref, stage, sem, idx_s, csem,
                     *, rounds, K, W, depth):
    cp = pltpu.make_async_copy(idx_hbm, idx_s, csem)
    cp.start()
    cp.wait()

    def body(r, acc):
        def get(k):
            row = idx_s[(r + k) % 8, k % idx_s.shape[1]]
            return pltpu.make_async_copy(
                tab_hbm.at[row], stage.at[k % depth], sem.at[k % depth])

        for k in range(min(depth, K)):
            get(k).start()

        def inner(k, _):
            get(k).wait()

            @pl.when(k + depth < K)
            def _():
                get(k + depth).start()

            return 0

        jax.lax.fori_loop(0, K, inner, 0)
        return acc + stage[0, 0].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, rounds, body, jnp.float32(0.0))
    out_ref[0, 0] = acc


def dma_pipe_probe(M, W, K, rounds, depth=8):
    """Same as dma_probe but with `depth` DMAs in flight."""
    tab = jnp.ones((M, W), jnp.int8)
    idx = (jnp.arange(8 * K, dtype=jnp.int32).reshape(8, K) * 9973) % M

    @jax.jit
    def run(idx, tab):
        return pl.pallas_call(
            partial(_dma_pipe_kernel, rounds=rounds, K=K, W=W, depth=depth),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((depth, W), jnp.int8),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SMEM((8, K), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, tab)

    dt = timeit(run, idx, tab)
    per_dma_ns = dt / rounds / K * 1e9
    bw = K * W * rounds / dt / 1e9
    print(f"  M={M} W={W} K={K} d={depth}: {dt / rounds * 1e6:8.1f} us/round"
          f" {per_dma_ns:7.1f} ns/dma  {bw:6.1f} GB/s", flush=True)
    return per_dma_ns


# ------------------------------------------------------------------- P4
def _dg_kernel(tab_ref, idx_ref, out_ref, *, rounds):
    def body(r, acc):
        idx = (idx_ref[:] + r) % tab_ref.shape[0]
        g = jnp.take_along_axis(tab_ref[:], idx, axis=0)
        return acc + jnp.sum(g[0:1].astype(jnp.float32))

    out_ref[0, 0] = jax.lax.fori_loop(0, rounds, body, jnp.float32(0.0))


def dg_probe(S, L, rounds, dtype=jnp.float32):
    """Mosaic tpu.dynamic_gather: out[s,l] = tab[idx[s,l], l] on (S, L)."""
    tab = jnp.ones((S, L), dtype)
    idx = ((jnp.arange(S)[:, None] * 9973 + jnp.arange(L)[None, :]) % S
           ).astype(jnp.int32)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            partial(_dg_kernel, rounds=rounds),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(tab, idx)

    try:
        dt = timeit(run, tab, idx)
    except Exception as e:
        print(f"  S={S} L={L} {np.dtype(dtype).name}: FAILED "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        return None
    per_row_ns = dt / rounds / S * 1e9
    print(f"  S={S:6d} L={L} {np.dtype(dtype).name:8s}: "
          f"{dt / rounds * 1e6:8.1f} us/round  {per_row_ns:6.2f} ns/row "
          f"({S * L * 4 * rounds / dt / 1e9:6.1f} GB/s)", flush=True)
    return per_row_ns


# ------------------------------------------------------------------- P5
def xla_gather_probe(M, C, N, label="", sort=False):
    tab = jnp.ones((M, C), jnp.float32)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, M, jnp.int32)
    if sort:
        idx = jnp.sort(idx)

    @jax.jit
    def run(tab, idx):
        # fold 8 gathers into one dispatch to amortize the relay floor
        acc = jnp.zeros((N, C), jnp.float32)
        for r in range(8):
            acc = acc + tab[(idx + r) % M]
        return acc.sum(axis=1)

    dt = timeit(run, tab, idx) / 8
    print(f"  XLA{label} M={M} C={C} N={N} sort={sort}: {dt * 1e3:7.2f} ms "
          f"({N * C * 4 / dt / 1e9:6.1f} GB/s)", flush=True)
    return dt


def main():
    enable_persistent_cache()
    Tc = 128
    W16 = -(-(18 * Tc + 13) // 8) * 8      # current 16-bit layout: 2320
    W12 = -(-(14 * Tc + 13) // 8) * 8      # 12-bit layout: 1808
    W8 = -(-(9 * Tc + 16) // 8) * 8        # 8-bit layout: 1168
    L_stress = 2731                        # ~259k tris / 128-tri leaves

    print("P1: leaf one-hot matmul shape (us/round, 4096 lanes)")
    mm_probe(L_stress, W16, 4096, rounds=64, groups=1)
    mm_probe(L_stress, W16, 4096, rounds=64, groups=8)
    mm_probe(L_stress, W12, 4096, rounds=64, groups=1)
    mm_probe(L_stress, W8, 4096, rounds=64, groups=1)
    mm_probe(L_stress, W16, 4096, rounds=64, dtype=jnp.bfloat16, groups=1)

    print("P2: consumer width (i32 materialization share)")
    mm_probe(L_stress, W16, 4096, rounds=64, groups=1, out_rows=8)
    mm_probe(L_stress, W16, 4096, rounds=64, groups=8, out_rows=8)

    print("P1b: scale-size table (1.63M tris -> L~12.7k)")
    mm_probe(12700, W16, 4096, rounds=16, groups=1)

    print("P3: DMA staging (serial)")
    dma_probe(12700, W16, K=256, rounds=16)
    print("P3b: DMA staging (pipelined)")
    for depth in (4, 8, 16):
        dma_pipe_probe(12700, W16, K=256, rounds=16, depth=depth)
    dma_pipe_probe(12700, W16, K=1024, rounds=8, depth=16)

    print("P4: Mosaic tpu.dynamic_gather (sublane-axis row gather)")
    dg_probe(512, 128, rounds=256)
    dg_probe(4096, 128, rounds=64)
    dg_probe(16384, 128, rounds=16)
    dg_probe(4096, 128, rounds=64, dtype=jnp.int32)

    print("P5: XLA row-gather baselines at wavefront width")
    xla_gather_probe(259200, 16, 2 ** 21)
    xla_gather_probe(259200, 16, 2 ** 21, sort=True)
    xla_gather_probe(259200, 32, 2 ** 21)
    xla_gather_probe(2731, 16, 2 ** 21)


if __name__ == "__main__":
    main()
