"""Round-5 probe, corrected: r5probe.py's P1/P2 consumer was
sum(dot(tab, onehot)) which XLA rewrites algebraically into two row-sum
reductions (measured "efficiency" 4500%+ = the matmul never ran). Here the
consumer is a per-lane MAX of the gather output accumulated across rounds —
no algebraic shortcut exists, every gl element must be materialized.

Questions:
  Q1  true us/round of the leaf one-hot matmul at stress shape, fused
      (one (L,W)x(L,4096)) vs per-group (8x (L,W)x(L,512)) — the real
      kernel does per-group; fusing streams the table ONCE per round.
  Q2  W scaling: 16-bit (2320) vs 12-bit (1808) vs 8-bit (1168) layouts.
  Q3  L scaling (paged matmul): P rows instead of L rows — does cost drop
      proportionally (MXU-bound) or flatline (overhead-bound)?
  Q4  scale-size table (12.7k leaves): the 1.6M-tri case.

Run ALONE on the TPU:  python benchmarks/r5probe2.py
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
    """args[-1] must be a list of per-rep variants: the axon relay MEMOIZES
    identical dispatches (l8decomp.py), so every rep needs distinct args —
    this invalidated r5probe.py's P1/P2 rows (eff >> 100%). Additionally,
    block_until_ready intermittently returns WITHOUT waiting under the
    relay (measured 2026-08-21: a 200 ms gather chain "blocked" in 0.07 ms;
    the value fetch afterwards paid the real time) — only a device_get of
    the result reliably forces completion, so each rep fetches a value and
    the per-rep ~26 ms relay floor is reported alongside."""
    variants = args[-1]
    args = args[:-1]

    def fetch(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return np.asarray(leaf).ravel()[0]

    fetch(fn(*args, variants[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        fetch(fn(*args, variants[1 + i % (len(variants) - 1)]))
    return (time.perf_counter() - t0) / reps


def _mm_kernel(tab_ref, idx_ref, out_ref, *, rounds, L, W, NL, groups):
    i32 = jnp.int32
    GW = NL // groups
    iota_l = jax.lax.broadcasted_iota(i32, (L, GW), 0)
    acc_t = (i32 if tab_ref.dtype == jnp.int8 else jnp.float32)

    def body(r, acc):
        m = jnp.float32(0.0)
        for g in range(groups):
            sl = (idx_ref[r % 8, g * GW:(g + 1) * GW] + r) % L
            oh = (iota_l == sl[None, :]).astype(tab_ref.dtype)
            gl = jax.lax.dot_general(
                tab_ref[:], oh, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )
            # per-lane max over the W axis: no algebraic elimination
            m = m + jnp.sum(jnp.max(gl.astype(jnp.float32), axis=0))
        return acc + m

    acc = jax.lax.fori_loop(0, rounds, body, jnp.float32(0.0))
    out_ref[0, 0] = acc


def mm_probe(L, W, NL, rounds, dtype=jnp.int8, groups=1, label=""):
    tab = (jnp.arange(L * W, dtype=jnp.int32) % 255 - 127).astype(
        dtype if dtype == jnp.int8 else jnp.float32).astype(dtype)
    tab = tab.reshape(L, W)
    idxs = [jnp.arange(8 * NL, dtype=jnp.int32).reshape(8, NL)
            * (9973 + 2 * v) % L for v in range(5)]

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            partial(_mm_kernel, rounds=rounds, L=L, W=W, NL=NL,
                    groups=groups),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(tab, idx)

    dt = timeit(run, tab, idxs)
    macs = L * W * NL * rounds
    per_round_us = dt / rounds * 1e6
    peak = 394e12 if dtype == jnp.int8 else 197e12
    eff = macs / dt / peak
    print(f"  {label:14s} L={L:6d} W={W:5d} NL={NL} "
          f"{np.dtype(dtype).name:8s} g={groups}: {per_round_us:8.1f} "
          f"us/round eff={eff * 100:5.1f}%", flush=True)
    return per_round_us


def _dg_kernel(tab_ref, idx_ref, out_ref, *, rounds, S, tiles):
    def body(r, acc):
        idx = (idx_ref[:] + r) % S
        m = jnp.float32(0.0)
        for c in range(tiles):
            g = jnp.take_along_axis(tab_ref[:, c * 128:(c + 1) * 128],
                                    idx, axis=0)
            m = m + jnp.sum(jnp.max(g, axis=0))
        return acc + m

    out_ref[0, 0] = jax.lax.fori_loop(0, rounds, body, jnp.float32(0.0))


def dg_probe(S, tiles, rounds, dtype=jnp.float32):
    """Mosaic tpu.dynamic_gather row-fetch trick: idx broadcast along lanes
    -> out[s, :] = tab[row_s, :] per 128-col tile. tiles x (S,128)."""
    tab = jnp.ones((S, tiles * 128), dtype)
    idxs = [jnp.broadcast_to(
        ((jnp.arange(S) * (9973 + 2 * v)) % S).astype(jnp.int32)[:, None],
        (S, 128)) for v in range(5)]

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            partial(_dg_kernel, rounds=rounds, S=S, tiles=tiles),
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(tab, idx)

    try:
        dt = timeit(run, tab, idxs)
    except Exception as e:
        print(f"  S={S} tiles={tiles} {np.dtype(dtype).name}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    per_round_us = dt / rounds * 1e6
    ns_row_tile = dt / rounds / S / tiles * 1e9
    print(f"  S={S:6d} tiles={tiles} {np.dtype(dtype).name:8s}: "
          f"{per_round_us:8.1f} us/round  {ns_row_tile:6.2f} ns/row/tile",
          flush=True)
    return per_round_us


def xla_gather_probe(M, C, N, label="", sort=False):
    tab = jnp.ones((M, C), jnp.float32)
    idxs = []
    for v in range(5):
        idx = jax.random.randint(jax.random.PRNGKey(v), (N,), 0, M,
                                 jnp.int32)
        idxs.append(jnp.sort(idx) if sort else idx)

    @jax.jit
    def run(tab, idx):
        acc = jnp.zeros((N, C), jnp.float32)
        for r in range(16):
            acc = acc + tab[(idx + r) % M]
        # scalar result: the timing fetch transfers 4 bytes, not 8 MB
        return acc.sum()

    dt = timeit(run, tab, idxs) / 16
    print(f"  XLA{label} M={M} C={C} N={N} sort={sort}: {dt * 1e3:7.2f} ms "
          f"({N * C * 4 / dt / 1e9:6.1f} GB/s)", flush=True)
    return dt


def main():
    enable_persistent_cache()
    Tc = 128
    W16 = -(-(18 * Tc + 13) // 8) * 8      # 2320
    W12 = -(-(14 * Tc + 13) // 8) * 8      # 1808
    W8 = -(-(9 * Tc + 16) // 8) * 8        # 1168
    L_stress = 2731

    print("Q1: corrected one-hot matmul cost (max-consumer; in-kernel "
          "ground truth for g=8/W2320 is 164 us/round)")
    mm_probe(L_stress, W16, 4096, rounds=32, groups=8, label="per-group(now)")
    mm_probe(L_stress, W16, 4096, rounds=32, groups=1, label="fused")
    mm_probe(L_stress, W12, 4096, rounds=32, groups=1, label="12-bit")
    mm_probe(L_stress, W8, 4096, rounds=32, groups=1, label="8-bit")
    mm_probe(L_stress, W16, 4096, rounds=32, dtype=jnp.bfloat16,
             label="bf16")

    print("Q2: Mosaic dynamic_gather row-fetch (table-size-locked)")
    dg_probe(4096, 4, rounds=32)
    dg_probe(4096, 19, rounds=32)

    print("Q3: XLA row-gather baselines at wavefront width")
    xla_gather_probe(259200, 32, 2 ** 21)
    xla_gather_probe(259200, 32, 2 ** 21, sort=True)
    xla_gather_probe(259200, 4, 2 ** 21)


if __name__ == "__main__":
    main()
