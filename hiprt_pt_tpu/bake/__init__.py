from .baker import (
    bake_all,
    bake_ggx_conductor_ess,
    bake_ggx_glossy_dielectric_ess,
    save_lut,
)

__all__ = [
    "bake_all",
    "bake_ggx_conductor_ess",
    "bake_ggx_glossy_dielectric_ess",
    "save_lut",
]
