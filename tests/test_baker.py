"""LUT baker (reference: GPUBaker + baking kernels)."""

import numpy as np

from hiprt_pt_tpu.bake.baker import (
    bake_ggx_conductor_ess,
    bake_ggx_glossy_dielectric_ess,
)


def test_conductor_ess_properties():
    ess = bake_ggx_conductor_ess(res=16, n_samples=4096)
    assert ess.shape == (16, 16)
    assert np.all(ess <= 1.01) and np.all(ess > 0.1)
    # smooth surfaces lose no energy; rough ones do
    assert ess[0].min() > 0.98
    assert ess[-1].min() < 0.8
    # monotonic-ish in roughness at normal incidence
    assert ess[-1, -1] < ess[0, -1] + 1e-3


def test_glossy_dielectric_below_conductor():
    """Fresnel-weighted albedo is a small fraction of the F=1 conductor's."""
    c = bake_ggx_conductor_ess(res=8, n_samples=4096)
    g = bake_ggx_glossy_dielectric_ess(eta=1.5, res=8, n_samples=4096)
    assert np.all(g <= c + 1e-6)
    assert g[0, -1] < 0.1  # ~4% fresnel at normal incidence


def test_saved_package_lut_matches_fresh_bake():
    import os
    path = os.path.join(
        os.path.dirname(__file__), "..", "hiprt_pt_tpu", "bake",
        "data_ggx_conductor_ess_32.npy",
    )
    saved = np.load(path)
    fresh = bake_ggx_conductor_ess(res=32, n_samples=16384)
    assert np.allclose(saved, fresh, atol=0.02)
