from .build import BVHData, build_bvh

__all__ = ["BVHData", "build_bvh"]
