"""BSDF model families and related surface-shading models.

Counterpart of the reference's device BSDF library (src/Device/includes/BSDFs/):
each model exposes vectorized ``eval(mat, n, wo, wi) -> (f, pdf)`` and
``sample(mat, n, wo, rng) -> (wi, f, pdf)`` over batches of hits, dispatched by
``dispatcher.py`` (reference: src/Device/includes/Dispatcher.h:18-68).
"""

from . import lambert, oren_nayar, dispatcher

__all__ = ["lambert", "oren_nayar", "dispatcher"]
