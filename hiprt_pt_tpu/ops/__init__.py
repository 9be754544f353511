from . import intersect, traverse, sampling, tonemap

__all__ = ["intersect", "traverse", "sampling", "tonemap"]
