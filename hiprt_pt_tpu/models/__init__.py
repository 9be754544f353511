"""BSDF model families and related surface-shading models.

Counterpart of the reference's device BSDF library (src/Device/includes/BSDFs/):
each model exposes vectorized ``eval(...) -> (f, pdf)`` and ``sample(...)``
over batches of hits, dispatched by ``dispatcher.py`` (reference:
src/Device/includes/Dispatcher.h:18-68).
"""

from . import (
    dispatcher,
    dispersion,
    fresnel,
    lambert,
    microfacet,
    nested_dielectrics,
    oren_nayar,
    principled,
    thin_film,
)

__all__ = [
    "dispatcher",
    "dispersion",
    "fresnel",
    "lambert",
    "microfacet",
    "nested_dielectrics",
    "oren_nayar",
    "principled",
    "thin_film",
]
