from . import (
    intersect,
    pixel_order,
    sampling,
    texture,
    tonemap,
    traverse,
)

__all__ = [
    "intersect",
    "pixel_order",
    "sampling",
    "texture",
    "tonemap",
    "traverse",
]
