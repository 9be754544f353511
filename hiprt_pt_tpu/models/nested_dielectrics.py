"""Nested dielectrics — fixed-size per-ray interior stack with priorities.

Role parity with src/Device/includes/NestedDielectrics.h (290 LoC):
``InteriorStackImpl<ISS_WITH_PRIORITIES>`` (Schmidt & Budge 2002, "Simple
Nested Dielectrics in Ray Traced Images") and the automatic strategy (RT Gems
2019) as the equal-priority special case. The stack size is a compile-time
option (reference: NestedDielectricsStackSize macro ≡
RenderOptions.nested_dielectrics_stack_size static arg).

TPU-first: the stack is a pair of (N, K) arrays updated with compare-selects
over the (small, static) K axis; all queries (top priority, top excluding a
material) are masked reductions — no per-ray control flow.

Boundary rules at a transmissive surface of material m:
  entering: if priority(m) < current max priority → FALSE interface (ray
            passes through with no optical event, m is still pushed);
            else true interface, eta = n_m / n_top.
  exiting:  m is removed; if m was not the top-priority medium → false
            interface; else true interface, eta = n_next / n_m.
"""

from __future__ import annotations

import jax.numpy as jnp

EMPTY = -1


def empty_stack(n: int, k: int):
    """(mat (N,K) i32 = -1, priority (N,K) i32 = -1)."""
    return (
        jnp.full((n, k), EMPTY, jnp.int32),
        jnp.full((n, k), EMPTY, jnp.int32),
    )


def top_priority(stack_pri):
    """(N,) max priority among occupied slots (-1 if empty)."""
    return jnp.max(stack_pri, axis=1)


def top_material(stack_mat, stack_pri):
    """(N,) material id of the highest-priority entry (latest wins ties);
    -1 if the stack is empty."""
    best = top_priority(stack_pri)
    # pick the LAST slot matching the max priority (most recently pushed)
    k = stack_pri.shape[1]
    out = jnp.full((stack_mat.shape[0],), EMPTY, jnp.int32)
    for j in range(k):
        hit = (stack_pri[:, j] == best) & (stack_pri[:, j] >= 0)
        out = jnp.where(hit, stack_mat[:, j], out)
    return out


def top_excluding(stack_mat, stack_pri, excl_mat):
    """Highest-priority entry ignoring ONE instance of excl_mat.
    Returns (mat (N,), priority (N,)).

    Column-functional (no .at[] scatters — TPU scatters on (N,K) arrays cost
    ~10 ms/1M rays each; where-selects fuse for free)."""
    k = stack_pri.shape[1]
    # mask out the last occurrence of excl_mat
    excl_done = jnp.zeros((stack_mat.shape[0],), jnp.bool_)
    keep_cols = [None] * k
    for j in reversed(range(k)):
        is_excl = (stack_mat[:, j] == excl_mat) & (stack_pri[:, j] >= 0) & ~excl_done
        keep_cols[j] = ~is_excl
        excl_done = excl_done | is_excl
    keep = jnp.stack(keep_cols, axis=1)
    pri_masked = jnp.where(keep, stack_pri, EMPTY)
    best = jnp.max(pri_masked, axis=1)
    out = jnp.full((stack_mat.shape[0],), EMPTY, jnp.int32)
    for j in range(k):
        hit = (pri_masked[:, j] == best) & (pri_masked[:, j] >= 0)
        out = jnp.where(hit, stack_mat[:, j], out)
    return out, best


def contains(stack_mat, stack_pri, mat):
    """(N,) bool — is material ``mat`` present in any occupied slot?
    (Used by the automatic strategy's parity test, reference:
    InteriorStackImpl<ISS_AUTOMATIC>::push odd-parity scan,
    NestedDielectrics.h:33-60.)"""
    return jnp.any((stack_mat == mat[:, None]) & (stack_pri >= 0), axis=1)


def push(stack_mat, stack_pri, mat, pri, mask):
    """Insert (mat, pri) into the first empty slot where mask (overflow drops
    the entry, matching the reference's fixed-size stack)."""
    k = stack_pri.shape[1]
    placed = ~mask
    cols_m, cols_p = [], []
    for j in range(k):
        slot_free = stack_pri[:, j] < 0
        do = mask & slot_free & ~placed
        cols_m.append(jnp.where(do, mat, stack_mat[:, j]))
        cols_p.append(jnp.where(do, pri, stack_pri[:, j]))
        placed = placed | do
    return jnp.stack(cols_m, axis=1), jnp.stack(cols_p, axis=1)


def remove(stack_mat, stack_pri, mat, mask):
    """Remove the LAST occurrence of mat where mask."""
    k = stack_pri.shape[1]
    done = ~mask
    cols_m, cols_p = [None] * k, [None] * k
    for j in reversed(range(k)):
        hit = (stack_mat[:, j] == mat) & (stack_pri[:, j] >= 0) & ~done
        cols_m[j] = jnp.where(hit, EMPTY, stack_mat[:, j])
        cols_p[j] = jnp.where(hit, EMPTY, stack_pri[:, j])
        done = done | hit
    return jnp.stack(cols_m, axis=1), jnp.stack(cols_p, axis=1)
