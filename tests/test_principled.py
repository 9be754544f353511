"""Principled BSDF: white-furnace energy bounds per lobe, sample/eval pdf
consistency, reciprocity of reflective lobes (reference test strategy §4.3 —
white furnace per lobe; reference: Principled.h)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hiprt_pt_tpu.core import rng
from hiprt_pt_tpu.core.material import MaterialBank
from hiprt_pt_tpu.core.settings import RenderOptions
from hiprt_pt_tpu.models import principled

OPTS = RenderOptions()
N = 60000


def _mats(n=N, **overrides):
    bank = MaterialBank.zeros(1)
    rows = {k: v for k, v in overrides.items()}
    bank = MaterialBank.from_rows([rows])
    idx = jnp.zeros((n,), jnp.int32)
    return bank.at_indices(idx).make_safe()


def _nrm(n=N):
    return jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n, 1))


def _wo(theta_deg, n=N):
    t = np.deg2rad(theta_deg)
    w = np.asarray([np.sin(t), 0.0, np.cos(t)], np.float32)
    return jnp.tile(jnp.asarray(w), (n, 1))


def _furnace_estimate(mats, wo, seed=0, n=N):
    """MC estimate of directional albedo ∫ f |cos| dω via BSDF sampling."""
    s = rng.seed(jnp.arange(n), 0, seed)
    nrm = _nrm(n)
    s, wi, f, pdf, aux = principled.sample(OPTS, mats, nrm, wo, s)
    cos_i = jnp.abs(wi[..., 2])
    ok = pdf > 1e-8
    est = jnp.where(
        ok[..., None], f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None], 0.0
    )
    return np.asarray(jnp.mean(est, axis=0))


@pytest.mark.parametrize("theta", [10, 45, 70])
def test_diffuse_white_furnace(theta):
    mats = _mats(base_color=[1, 1, 1], roughness=0.5, metallic=0.0, specular=0.0)
    alb = _furnace_estimate(mats, _wo(theta))
    # single-scattering diffuse+deactivated specular: close to 1, never above
    assert np.all(alb < 1.05), alb
    assert np.all(alb > 0.80), alb


@pytest.mark.parametrize("rough", [0.1, 0.4, 0.9])
def test_metal_energy_bounded(rough):
    mats = _mats(base_color=[1, 1, 1], metallic=1.0, roughness=rough)
    alb = _furnace_estimate(mats, _wo(30))
    # single-scattering GGX loses energy at high roughness but must not gain
    assert np.all(alb <= 1.05), (rough, alb)
    assert np.all(alb > 0.4), (rough, alb)


@pytest.mark.parametrize("rough", [0.05, 0.3])
def test_glass_radiance_albedo(rough):
    """Camera-radiance-convention BTDF: a single entering interface returns
    ~F + (1-F)/eta^2 (radiance compression into the denser medium; it cancels
    on exit — Walter et al. 2007 §5 non-symmetry)."""
    eta = 1.5
    mats = _mats(
        base_color=[1, 1, 1], specular_transmission=1.0, roughness=rough,
        ior=eta, specular=0.0,
    )
    alb = _furnace_estimate(mats, _wo(25))
    from hiprt_pt_tpu.models.fresnel import fresnel_dielectric

    F = float(fresnel_dielectric(jnp.cos(jnp.deg2rad(25.0)), jnp.float32(eta)))
    expected = F + (1.0 - F) / (eta * eta)
    assert np.all(np.abs(alb - expected) < 0.12), (rough, alb, expected)


def test_glass_roundtrip_energy():
    """Enter + exit through parallel interfaces: the eta^2 factors must cancel
    — estimator product over both events ~= (1-F_in)(1-F_out) ... ~1 for
    near-normal smooth glass."""
    n = N
    eta = 1.5
    mats = _mats(
        n=n, base_color=[1, 1, 1], specular_transmission=1.0, roughness=0.02,
        ior=eta, specular=0.0,
    )
    nrm = _nrm(n)
    wo = _wo(10, n)
    s = rng.seed(jnp.arange(n), 0, 31)
    # entering event
    s, wi1, f1, pdf1, _ = principled.sample(OPTS, mats, nrm, wo, s)
    w1 = jnp.where(
        (pdf1 > 1e-8)[..., None],
        f1 * (jnp.abs(wi1[..., 2]) / jnp.maximum(pdf1, 1e-9))[..., None],
        0.0,
    )
    refr1 = np.asarray(wi1[..., 2]) < 0
    # exiting event: shade from inside (flip frame), eta_rel = 1/eta
    wo2 = -wi1
    s, wi2, f2, pdf2, _ = principled.sample(
        OPTS, mats, nrm, wo2, s, {"eta_rel": jnp.full((n,), 1.0 / eta)}
    )
    w2 = jnp.where(
        (pdf2 > 1e-8)[..., None],
        f2 * (jnp.abs(wi2[..., 2]) / jnp.maximum(pdf2, 1e-9))[..., None],
        0.0,
    )
    both = refr1 & (np.asarray(wi2[..., 2]) < 0)
    tot = (np.asarray(w1) * np.asarray(w2))[both]
    assert both.mean() > 0.5
    assert abs(tot.mean() - 1.0) < 0.1, tot.mean()


def test_sample_eval_consistency():
    """f and pdf returned by sample() must equal eval_pdf() at the sampled wi."""
    n = 5000
    mats = _mats(
        n=n, base_color=[0.8, 0.6, 0.4], metallic=0.3, roughness=0.4,
        coat=0.5, sheen=0.5, specular_transmission=0.2,
    )
    nrm = _nrm(n)
    wo = _wo(40, n)
    s = rng.seed(jnp.arange(n), 0, 5)
    s, wi, f, pdf, aux = principled.sample(OPTS, mats, nrm, wo, s)
    f2, pdf2 = principled.eval_pdf(OPTS, mats, nrm, wo, wi)
    ok = np.asarray(pdf) > 1e-6
    assert ok.mean() > 0.7
    assert np.allclose(np.asarray(f)[ok], np.asarray(f2)[ok], rtol=2e-3, atol=1e-5)
    assert np.allclose(np.asarray(pdf)[ok], np.asarray(pdf2)[ok], rtol=2e-3, atol=1e-6)


def test_pdf_integrates_to_one():
    """The combined sampling pdf must integrate to ~1 over the sphere:
    MC with uniform-sphere samples."""
    n = 200000
    mats = _mats(
        n=n, base_color=[0.8, 0.2, 0.2], metallic=0.5, roughness=0.5, coat=0.3
    )
    nrm = _nrm(n)
    wo = _wo(35, n)
    from hiprt_pt_tpu.ops.sampling import sample_uniform_sphere

    s = rng.seed(jnp.arange(n), 0, 9)
    s, u1 = rng.next_float(s)
    s, u2 = rng.next_float(s)
    wi = sample_uniform_sphere(u1, u2)
    _, pdf = principled.eval_pdf(OPTS, mats, nrm, wo, wi)
    est = np.asarray(pdf).mean() * 4.0 * np.pi
    # glass/transmission excluded (weight 0 here) → reflection pdfs only.
    assert abs(est - 1.0) < 0.1, est


def test_reciprocity_reflective():
    n = 2000
    mats = _mats(n=n, base_color=[0.5, 0.5, 0.5], metallic=1.0, roughness=0.6)
    nrm = _nrm(n)
    g = np.random.default_rng(2)
    a = g.normal(size=(n, 3))
    a[:, 2] = np.abs(a[:, 2]) + 0.05
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = g.normal(size=(n, 3))
    b[:, 2] = np.abs(b[:, 2]) + 0.05
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    fa, _ = principled.eval_pdf(
        OPTS, mats, nrm, jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
    )
    fb, _ = principled.eval_pdf(
        OPTS, mats, nrm, jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32)
    )
    assert np.allclose(np.asarray(fa), np.asarray(fb), rtol=5e-3, atol=1e-5)


def test_smooth_metal_mirror_direction():
    """Near-zero roughness metal must sample near the mirror direction."""
    n = 1000
    mats = _mats(n=n, metallic=1.0, roughness=0.001, base_color=[1, 1, 1])
    nrm = _nrm(n)
    wo = _wo(30, n)
    s = rng.seed(jnp.arange(n), 0, 21)
    s, wi, f, pdf, aux = principled.sample(OPTS, mats, nrm, wo, s)
    wo_np = np.asarray(wo)[0]
    mirror = np.asarray([-wo_np[0], -wo_np[1], wo_np[2]])
    cos_to_mirror = (np.asarray(wi) @ mirror)
    assert (cos_to_mirror > 0.999).mean() > 0.95


def test_thin_film_iridescence():
    """Thin film produces wavelength-dependent (colored) reflectance that
    varies with thickness (reference: ThinFilm.h)."""
    import jax.numpy as jnp
    from hiprt_pt_tpu.models.thin_film import thin_film_reflectance

    cos = jnp.full((3,), 0.8)
    ior_f = jnp.full((3,), 1.4)
    base = jnp.full((3,), 1.5)
    hue = jnp.zeros((3,))
    thick = jnp.asarray([100.0, 300.0, 600.0])
    R = np.asarray(thin_film_reflectance(cos, ior_f, thick, base, hue))
    assert np.all((R >= 0) & (R <= 1))
    # channels differ (iridescence) at mid thickness (relative variation)
    assert np.std(R[1]) / np.mean(R[1]) > 0.15
    # different thickness → different color
    assert not np.allclose(R[0], R[2], atol=1e-3)


def test_thin_film_material_changes_metal_color():
    mats_plain = _mats(metallic=1.0, roughness=0.2)
    mats_tf = _mats(
        metallic=1.0, roughness=0.2, thin_film=1.0,
        thin_film_thickness=400.0, thin_film_ior=1.4,
    )
    nrm = _nrm()
    wo = _wo(35)
    # mirror-ish eval direction
    wi = jnp.tile(jnp.asarray([-np.sin(np.deg2rad(35)), 0.0, np.cos(np.deg2rad(35))]), (N, 1)).astype(jnp.float32)
    f0, _ = principled.eval_pdf(OPTS, mats_plain, nrm, wo, wi)
    f1, _ = principled.eval_pdf(OPTS, mats_tf, nrm, wo, wi)
    f0m, f1m = np.asarray(f0)[0], np.asarray(f1)[0]
    assert not np.allclose(f0m, f1m, rtol=1e-2)


def test_energy_compensation_improves_rough_metal():
    """With the baked Ess LUT, rough white metal recovers lost multiple-
    scattering energy (reference: Turquin compensation via BRDF LUTs)."""
    from hiprt_pt_tpu.core.settings import RenderOptions as RO

    mats = _mats(base_color=[1, 1, 1], metallic=1.0, roughness=0.9)
    wo = _wo(30)
    alb_off = _furnace_estimate.__wrapped__(mats, wo) if hasattr(_furnace_estimate, "__wrapped__") else None
    # compare with and without compensation
    import hiprt_pt_tpu.models.principled as P

    def est(opts):
        s = rng.seed(jnp.arange(N), 0, 77)
        nrm = _nrm()
        s, wi, f, pdf, aux = P.sample(opts, mats, nrm, wo, s)
        cos_i = jnp.abs(wi[..., 2])
        ok = pdf > 1e-8
        e = jnp.where(ok[..., None], f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None], 0.0)
        return float(jnp.mean(e))

    on = est(RO(do_energy_compensation=True))
    off = est(RO(do_energy_compensation=False))
    assert on > off + 0.02, (on, off)
    assert on < 1.15, on  # must not blow past white-furnace bound badly


def _est_with_opts(opts, mats, wo, seed=77, n=N):
    import hiprt_pt_tpu.models.principled as P

    s = rng.seed(jnp.arange(n), 0, seed)
    s, wi, f, pdf, aux = P.sample(opts, mats, _nrm(n), wo, s)
    cos_i = jnp.abs(wi[..., 2])
    ok = pdf > 1e-8
    e = jnp.where(
        ok[..., None], f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None], 0.0
    )
    return float(jnp.mean(e))


@pytest.mark.parametrize("rough", [0.5, 0.9])
def test_glossy_base_compensation_furnace(rough):
    """Glossy base (specular=1 over white diffuse) recovers the layer's
    (1-F)^2 + GGX multiple-scattering losses via the baked 3D glossy-base
    table (reference: PrincipledEnergyCompensation.h
    get_principled_energy_compensation_glossy_base sampling
    glossy_dielectric_Ess)."""
    from hiprt_pt_tpu.core.settings import RenderOptions as RO

    mats = _mats(
        base_color=[1, 1, 1], metallic=0.0, roughness=rough,
        specular=1.0, ior=1.5,
    )
    wo = _wo(40)
    on = _est_with_opts(RO(do_energy_compensation=True), mats, wo)
    off = _est_with_opts(RO(do_energy_compensation=False), mats, wo)
    assert on > off + 0.01, (rough, on, off)
    assert 0.90 < on < 1.10, (rough, on, off)
    # exact (trilinear-table) path agrees with the fitted-poly path
    exact = _est_with_opts(
        RO(do_energy_compensation=True, glass_compensation_exact=True),
        mats, wo,
    )
    assert abs(exact - on) < 0.06, (exact, on)


def test_clearcoat_compensation_furnace():
    """Coat over white diffuse: the clearcoat-layer boost recovers the
    coat's fresnel + ms losses (reference:
    get_principled_energy_compensation_clearcoat_lobe)."""
    from hiprt_pt_tpu.core.settings import RenderOptions as RO

    mats = _mats(
        base_color=[1, 1, 1], metallic=0.0, roughness=0.4, specular=0.0,
        coat=1.0, coat_roughness=0.7, coat_ior=1.5,
    )
    wo = _wo(35)
    on = _est_with_opts(RO(do_energy_compensation=True), mats, wo)
    off = _est_with_opts(RO(do_energy_compensation=False), mats, wo)
    assert on > off + 0.01, (on, off)
    assert on < 1.12, (on, off)


def test_vndf_variant_consistency():
    """Both GGX sampling variants must stay sample/eval consistent and agree
    on the furnace estimate."""
    from hiprt_pt_tpu.core.settings import GGXSamplingVariant, RenderOptions as RO

    mats = _mats(metallic=1.0, roughness=0.4, base_color=[1, 1, 1])
    wo = _wo(40)
    import hiprt_pt_tpu.models.principled as P

    def est(opts, seed):
        s = rng.seed(jnp.arange(N), 0, seed)
        s, wi, f, pdf, aux = P.sample(opts, mats, _nrm(), wo, s)
        ok = pdf > 1e-8
        e = jnp.where(ok[..., None], f * (jnp.abs(wi[..., 2]) / jnp.maximum(pdf, 1e-9))[..., None], 0.0)
        return float(jnp.mean(e))

    a = est(RO(ggx_sampling=GGXSamplingVariant.VNDF), 3)
    b = est(RO(ggx_sampling=GGXSamplingVariant.VNDF_SPHERICAL_CAPS), 4)
    assert abs(a - b) < 0.03, (a, b)


def test_anisotropy_rotation_changes_highlight():
    mats0 = _mats(metallic=1.0, roughness=0.3, anisotropy=0.9,
                  anisotropy_rotation=0.0)
    mats1 = _mats(metallic=1.0, roughness=0.3, anisotropy=0.9,
                  anisotropy_rotation=0.5)
    nrm = _nrm()
    wo = _wo(40)
    # off-specular direction sensitive to the tangent frame
    wi_np = np.tile([0.2, 0.5, 0.84], (N, 1))
    wi_np /= np.linalg.norm(wi_np, axis=-1, keepdims=True)
    wi = jnp.asarray(wi_np, jnp.float32)
    f0, _ = principled.eval_pdf(OPTS, mats0, nrm, wo, wi)
    f1, _ = principled.eval_pdf(OPTS, mats1, nrm, wo, wi)
    assert not np.allclose(np.asarray(f0)[0], np.asarray(f1)[0], rtol=0.05)


def test_second_roughness_blend():
    sharp = _mats(metallic=1.0, roughness=0.1)
    dual = _mats(metallic=1.0, roughness=0.1, second_roughness=0.8,
                 second_roughness_weight=0.7)
    nrm = _nrm()
    wo = _wo(30)
    # far off-specular: the wide lobe contributes where the sharp one is ~0
    wi_np = np.tile([0.7, 0.0, 0.714], (N, 1))
    wi_np /= np.linalg.norm(wi_np, axis=-1, keepdims=True)
    wi = jnp.asarray(wi_np, jnp.float32)
    f_sharp, _ = principled.eval_pdf(OPTS, sharp, nrm, wo, wi)
    f_dual, _ = principled.eval_pdf(OPTS, dual, nrm, wo, wi)
    assert float(f_dual[0].sum()) > float(f_sharp[0].sum()) * 2.0


def test_thin_walled_transmits_straight():
    """Thin-walled smooth glass: refracted rays continue ~straight through
    (reference: thin_walled, Material.h:191 + roughness remap)."""
    mats = _mats(specular_transmission=1.0, roughness=0.01, ior=1.5,
                 thin_walled=1.0, specular=0.0, base_color=[1, 1, 1])
    wo = _wo(35)
    s = rng.seed(jnp.arange(N), 0, 41)
    s, wi, f, pdf, aux = principled.sample(OPTS, mats, _nrm(), wo, s)
    wi_np = np.asarray(wi)
    refr = wi_np[:, 2] < 0
    assert refr.mean() > 0.5
    # transmitted direction ~ -wo (straight through)
    wo_np = np.asarray(wo)[0]
    dots = -(wi_np[refr] @ wo_np)
    assert (dots > 0.995).mean() > 0.9, dots.mean()


@pytest.mark.parametrize("rough", [0.4, 0.7, 1.0])
def test_rough_glass_furnace_with_energy_compensation(rough):
    """Round-2 (VERDICT task 5): with the baked glass Ess tables wired
    (MicrofacetEnergyCompensation.h role), a white rough-glass interface must
    pass the white furnace at TIGHT tolerance — the entering interface's
    radiance compression (1/eta^2 on the transmitted share) cancels over an
    enter+exit round trip, and the single-interface albedo with compensation
    must land near the analytic F + (1-F)/eta^2 value instead of sagging with
    roughness."""
    eta = 1.5
    mats = _mats(
        base_color=[1, 1, 1], specular_transmission=1.0, roughness=rough,
        ior=eta, specular=0.0,
    )
    theta = 30.0
    alb = _furnace_estimate(mats, _wo(theta), seed=5)
    from hiprt_pt_tpu.models.fresnel import fresnel_dielectric

    F = float(fresnel_dielectric(
        jnp.cos(jnp.deg2rad(theta)), jnp.float32(eta)
    ))
    target = F + (1.0 - F) / eta**2
    rel = np.abs(alb.mean() - target) / target
    assert rel < 0.08, (rough, float(alb.mean()), target)

    # compensation OFF must lose noticeably more energy at high roughness
    if rough >= 0.7:
        opts_off = RenderOptions(do_energy_compensation=False)
        s = rng.seed(jnp.arange(N), 0, 5)
        s, wi, f, pdf, aux = principled.sample(opts_off, mats, _nrm(), _wo(theta), s)
        cos_i = jnp.abs(wi[..., 2])
        est = jnp.where(
            (pdf > 1e-8)[..., None],
            f * (cos_i / jnp.maximum(pdf, 1e-9))[..., None], 0.0,
        )
        alb_off = float(jnp.mean(est))
        assert alb_off < alb.mean() - 0.01, (alb_off, alb.mean())
