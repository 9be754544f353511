from . import envmap_sampling, light_sampling, ris

__all__ = ["envmap_sampling", "light_sampling", "ris"]
