"""ReSTIR DI reservoirs — functional weighted-reservoir-sampling state.

Role parity with src/Device/includes/ReSTIR/DI/Reservoir.h:37-170
(``combine_with``/``end``/``end_with_normalization`` + sanity checks) and the
per-pixel reservoir buffers of ReSTIRDIRenderPass.

TPU-first: a reservoir is a struct-of-(N,)-arrays pytree; every update/combine
is a masked select across the whole wavefront. The ping-pong buffer dance of
the reference (ReSTIRDIRenderPass.cpp:233-264) disappears — passes are pure
functions Reservoir → Reservoir.

The stored sample is a *light point* (world position + normal + radiance +
an envmap direction flag), exactly the reference's ReSTIRDISample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng as rng_mod


@struct.dataclass
class Reservoir:
    """Per-pixel ReSTIR DI reservoirs over N pixels."""

    # WRS state
    weight_sum: jax.Array    # (N,) Σ w
    M: jax.Array             # (N,) f32 confidence (sample count, m-capped)
    W: jax.Array             # (N,) unbiased contribution weight (UCW)
    # the winning sample
    light_point: jax.Array   # (N,3) point on light (or direction if envmap)
    light_normal: jax.Array  # (N,3)
    radiance: jax.Array      # (N,3) emitted radiance of the sample
    target: jax.Array        # (N,) p_hat at THIS pixel's surface
    is_envmap: jax.Array     # (N,) bool — light_point is a direction

    @classmethod
    def empty(cls, n: int) -> "Reservoir":
        return cls(
            weight_sum=jnp.zeros((n,), jnp.float32),
            M=jnp.zeros((n,), jnp.float32),
            W=jnp.zeros((n,), jnp.float32),
            light_point=jnp.zeros((n, 3), jnp.float32),
            light_normal=jnp.zeros((n, 3), jnp.float32),
            radiance=jnp.zeros((n, 3), jnp.float32),
            target=jnp.zeros((n,), jnp.float32),
            is_envmap=jnp.zeros((n,), jnp.bool_),
        )

    def update_tracked(self, rng_state, w, light_point, light_normal,
                       radiance, target, is_envmap, valid):
        """Stream one candidate into each reservoir (masked).
        Returns (reservoir, rng_state, take (N,) bool — did the candidate
        become the winner?)."""
        w = jnp.where(valid & jnp.isfinite(w) & (w >= 0.0), w, 0.0)
        new_sum = self.weight_sum + w
        new_M = self.M + jnp.where(valid, 1.0, 0.0)
        rng_state, u = rng_mod.next_float(rng_state)
        take = (u * new_sum < w) & (w > 0.0)
        res = Reservoir(
            weight_sum=new_sum,
            M=new_M,
            W=self.W,
            light_point=jnp.where(take[:, None], light_point, self.light_point),
            light_normal=jnp.where(
                take[:, None], light_normal, self.light_normal
            ),
            radiance=jnp.where(take[:, None], radiance, self.radiance),
            target=jnp.where(take, target, self.target),
            is_envmap=jnp.where(take, is_envmap, self.is_envmap),
        )
        return res, rng_state, take

    def update(self, rng_state, w, light_point, light_normal, radiance,
               target, is_envmap, valid):
        """Stream one candidate into each reservoir (masked).
        Returns (reservoir, rng_state)."""
        res, rng_state, _ = self.update_tracked(
            rng_state, w, light_point, light_normal, radiance, target,
            is_envmap, valid,
        )
        return res, rng_state

    def combine_tracked(self, rng_state, other: "Reservoir", target_here,
                        m_weight, valid):
        """Merge another reservoir's winning sample into this one
        (reference: Reservoir.h combine_with).

        target_here: (N,) p_hat of other's sample evaluated at THIS pixel.
        m_weight: (N,) MIS/confidence weight for the incoming sample
        (e.g. other.M for confidence weights, or a pairwise-MIS weight).
        Returns (reservoir, rng_state, take (N,) bool).
        """
        w = m_weight * target_here * other.W
        w = jnp.where(valid & jnp.isfinite(w) & (w > 0.0), w, 0.0)
        new_sum = self.weight_sum + w
        new_M = self.M + jnp.where(valid, other.M, 0.0)
        rng_state, u = rng_mod.next_float(rng_state)
        take = (u * new_sum < w) & (w > 0.0)
        res = Reservoir(
            weight_sum=new_sum,
            M=new_M,
            W=self.W,
            light_point=jnp.where(
                take[:, None], other.light_point, self.light_point
            ),
            light_normal=jnp.where(
                take[:, None], other.light_normal, self.light_normal
            ),
            radiance=jnp.where(take[:, None], other.radiance, self.radiance),
            target=jnp.where(take, target_here, self.target),
            is_envmap=jnp.where(take, other.is_envmap, self.is_envmap),
        )
        return res, rng_state, take

    def combine(self, rng_state, other: "Reservoir", target_here, m_weight,
                valid):
        """combine_tracked without the winner flag."""
        res, rng_state, _ = self.combine_tracked(
            rng_state, other, target_here, m_weight, valid
        )
        return res, rng_state

    def finalize(self, normalization=None):
        """Compute the UCW: W = w_sum / (normalization · p_hat(y))
        (reference: Reservoir.h end / end_with_normalization).
        Default normalization = M (the 1/M estimator)."""
        norm = self.M if normalization is None else normalization
        W = self.weight_sum / jnp.maximum(norm * self.target, 1e-12)
        W = jnp.where(
            (self.target > 0.0) & (norm > 0.0) & jnp.isfinite(W), W, 0.0
        )
        return self.replace(W=W)

    def m_capped(self, m_cap):
        """Clamp confidence (reference: m-cap, ReSTIRDISettings.h)."""
        cap = jnp.asarray(m_cap, jnp.float32)
        return self.replace(M=jnp.where(cap > 0, jnp.minimum(self.M, cap), self.M))

    def gather(self, idx):
        """Reservoirs at pixel indices idx (neighbor taps)."""
        return jax.tree_util.tree_map(lambda a: a[idx], self)

    # --- packed-row neighbor reads -------------------------------------
    # An XLA row gather at wavefront width is per-ROW rate bound and
    # column-count-free up to 128 columns (ROUND5.md): gathering the 9
    # reservoir fields separately costs 9x one packed gather. Passes pack
    # once, gather once per neighbor tap, and slice columns.

    N_COLS = 14

    def pack_columns(self) -> jax.Array:
        """(N, 14) f32: [weight_sum, M, W, light_point, light_normal,
        radiance, target, is_envmap]."""
        return jnp.concatenate([
            self.weight_sum[:, None], self.M[:, None], self.W[:, None],
            self.light_point, self.light_normal, self.radiance,
            self.target[:, None],
            self.is_envmap.astype(jnp.float32)[:, None],
        ], axis=1)

    @classmethod
    def from_columns(cls, cols: jax.Array) -> "Reservoir":
        """Inverse of pack_columns (cols (N, 14))."""
        return cls(
            weight_sum=cols[:, 0], M=cols[:, 1], W=cols[:, 2],
            light_point=cols[:, 3:6], light_normal=cols[:, 6:9],
            radiance=cols[:, 9:12], target=cols[:, 12],
            is_envmap=cols[:, 13] > 0.5,
        )

    def sanity_mask(self):
        """NaN/negative guard (reference: Reservoir.h:108-162 sanity_check)."""
        ok = (
            jnp.isfinite(self.weight_sum)
            & jnp.isfinite(self.W)
            & (self.weight_sum >= 0.0)
            & (self.W >= 0.0)
            & jnp.all(jnp.isfinite(self.radiance), axis=-1)
        )
        return ok
