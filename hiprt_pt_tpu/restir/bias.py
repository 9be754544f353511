"""Live ReSTIR DI bias-status explainer.

Role parity with the reference's sampling-panel bias analysis
(src/UI/ImGui/ImGuiSettingsWindow.cpp:1639
``display_ReSTIR_DI_bias_status``): given the CURRENT tier-3 options and
tier-2 settings, report whether the configuration estimates direct lighting
without bias, and if not, each active source of bias with its explanation.
Conditions are adapted to this repo's option set (our reuse-pass m-terms
never use visibility — the reference's ``BIAS_CORRECTION_USE_VISIBILITY``
has no analog — so the corresponding reference conditions simplify).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..core.settings import (
    LightSamplingStrategy,
    ReSTIRBiasCorrection,
    RenderOptions,
)


def _val(x) -> Any:
    try:
        return np.asarray(x).item()
    except Exception:
        return x


def bias_status(options: RenderOptions, settings) -> dict:
    """Returns {"active", "biased", "reasons": [{"title", "explanation"}]}.

    ``active`` is False when the current light-sampling strategy is not
    ReSTIR DI (the analysis only applies to ReSTIR)."""
    if options.direct_light_sampling != LightSamplingStrategy.RESTIR_DI:
        return {"active": False, "biased": False, "reasons": []}

    reasons = []
    scheme = options.restir_di_bias_correction

    if scheme == ReSTIRBiasCorrection.M_WEIGHT_1_OVER_M:
        reasons.append({
            "title": "1/M biased weights",
            "explanation": (
                "1/M weights do not take into account how many neighbors "
                "could have produced the resampled sample; samples are "
                "under-weighted as if all M neighbors could have produced "
                "them, which darkens the image."
            ),
        })

    if options.restir_di_initial_visibility:
        reasons.append({
            "title": "Visibility reuse without visibility in bias "
                     "correction",
            "explanation": (
                "The initial-candidate visibility-reuse pass discards "
                "occluded winners, so reuse passes only ever resample "
                "unoccluded samples. The m-term neighbor counting does not "
                "test visibility (this implementation has no "
                "bias-correction-visibility mode), so neighbors whose view "
                "of the sample is occluded are still counted as able to "
                "produce it — overestimating valid neighbors and "
                "darkening the result."
            ),
        })

    if options.ris_use_visibility_target:
        reasons.append({
            "title": "Target-function visibility without visibility in "
                     "bias correction",
            "explanation": (
                "With visibility inside the candidate target function, "
                "surviving samples are unoccluded; counting neighbors "
                "without a visibility test then overestimates how many "
                "could have produced the winner (darkening), exactly as "
                "with visibility reuse."
            ),
        })

    if _val(settings.enable_adaptive_sampling) and (
        _val(settings.restir_di.spatial_enabled)
        and _val(settings.restir_di.num_spatial_passes) > 0
    ):
        reasons.append({
            "title": "Adaptive sampling + spatial reuse of converged "
                     "neighbors",
            "explanation": (
                "Adaptive sampling stops updating converged pixels; the "
                "spatial pass (which has no converged-neighbor exclusion "
                "here) keeps resampling from their frozen reservoirs, "
                "which shows up as bias exactly where adaptive sampling "
                "works hardest."
            ),
        })

    if not options.restir_di_final_visibility:
        reasons.append({
            "title": "Not using final shading visibility",
            "explanation": (
                "Skipping the final visibility ray shades samples as if "
                "unoccluded — shadows go missing and the scene brightens."
            ),
        })

    return {"active": True, "biased": bool(reasons), "reasons": reasons}
