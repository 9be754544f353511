from .integrator import render_sample, camera_rays_pass
from .renderer import Renderer

__all__ = ["render_sample", "camera_rays_pass", "Renderer"]
