from .baker import (
    bake_all,
    bake_ggx_conductor_ess,
    bake_ggx_fresnel_ess,
    bake_ggx_glossy_dielectric_ess,
    bake_glossy_base_ess,
    save_lut,
)

__all__ = [
    "bake_all",
    "bake_ggx_conductor_ess",
    "bake_ggx_fresnel_ess",
    "bake_ggx_glossy_dielectric_ess",
    "bake_glossy_base_ess",
    "save_lut",
]
