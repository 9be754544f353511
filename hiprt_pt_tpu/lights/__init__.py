from . import light_sampling, envmap_sampling

__all__ = ["light_sampling", "envmap_sampling"]
