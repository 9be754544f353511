"""Material data model — structure-of-arrays bank of principled-BSDF parameters.

Capability parity with the reference's ``SimplifiedRendererMaterial`` /
``RendererMaterial`` (reference: src/HostDeviceCommon/Material.h:129-260): ~30
scalar/color parameters covering base color, double-roughness GGX, Adobe F82-tint
metals, specular layer, coat layer, sheen, transmission with Beer-Lambert absorption
and Cauchy dispersion, thin-film interference, thin-walled surfaces, alpha opacity
and nested-dielectric priorities — plus per-parameter texture indices.

TPU-first design: instead of an array-of-structs indexed per hit, materials live as
a **bank of flat arrays** (one row per material). Looking up the material at a batch
of hits is a vectorized gather (``bank.at_indices(mat_ids)``) that XLA fuses into
the surrounding elementwise work; there is no per-thread struct load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

NO_TEXTURE = -1
# Emission is a constant color (no texture) but still treated as emissive
# (reference: Material.h:237 CONSTANT_EMISSIVE_TEXTURE).
CONSTANT_EMISSIVE_TEXTURE = -2

ROUGHNESS_CLAMP = 1.0e-4


def _f(v):
    return float(v)


# (field, channels, default) — defaults follow the reference's defaults
# (Material.h:129-224) so that scenes omitting a parameter render alike.
_SCALAR_FIELDS = [
    ("emission_strength", 1.0),
    ("roughness", 0.3),
    ("oren_nayar_sigma", 0.34906585),  # 20 deg in radians
    ("metallic", 0.0),
    ("metallic_F90_falloff_exponent", 5.0),
    ("anisotropy", 0.0),
    ("anisotropy_rotation", 0.0),
    ("second_roughness_weight", 0.0),
    ("second_roughness", 0.5),
    ("specular", 1.0),
    ("specular_tint", 1.0),
    ("specular_darkening", 0.0),
    ("coat", 0.0),
    ("coat_medium_thickness", 5.0),
    ("coat_roughness", 0.0),
    ("coat_roughening", 1.0),
    ("coat_darkening", 1.0),
    ("coat_anisotropy", 0.0),
    ("coat_anisotropy_rotation", 0.0),
    ("coat_ior", 1.5),
    ("sheen", 0.0),
    ("sheen_roughness", 0.5),
    ("ior", 1.4),
    ("specular_transmission", 0.0),
    ("absorption_at_distance", 1.0),
    ("dispersion_scale", 0.0),
    ("dispersion_abbe_number", 20.0),
    ("thin_walled", 0.0),  # bool as float mask
    ("thin_film", 0.0),
    ("thin_film_ior", 1.3),
    ("thin_film_thickness", 500.0),
    ("thin_film_kappa_3", 0.0),
    ("thin_film_hue_shift_degrees", 0.0),
    ("thin_film_base_ior_override", 1.0),
    ("thin_film_do_ior_override", 0.0),  # bool as float mask
    ("alpha_opacity", 1.0),
    ("dielectric_priority", 0.0),
]

_COLOR_FIELDS = [
    ("base_color", (1.0, 1.0, 1.0)),
    ("emission", (0.0, 0.0, 0.0)),
    ("metallic_F82", (1.0, 1.0, 1.0)),
    ("metallic_F90", (1.0, 1.0, 1.0)),
    ("specular_color", (1.0, 1.0, 1.0)),
    ("coat_medium_absorption", (1.0, 1.0, 1.0)),
    ("sheen_color", (1.0, 1.0, 1.0)),
    ("absorption_color", (1.0, 1.0, 1.0)),
]

# Texture indices (int32, NO_TEXTURE = -1), gathered alongside the scalars
# (reference: Material.h:239-260).
_TEXTURE_FIELDS = [
    "normal_map_texture_index",
    "emission_texture_index",
    "base_color_texture_index",
    "roughness_metallic_texture_index",
    "roughness_texture_index",
    "metallic_texture_index",
    "specular_texture_index",
    "coat_texture_index",
    "sheen_texture_index",
    "specular_transmission_texture_index",
]

# above this many materials the one-hot gather's N x M operand outgrows the
# dynamic-gather cost (gather is ~0.4 ms / 65k indices; the one-hot matmul
# scales linearly in M)
_ONEHOT_GATHER_MAX_MATERIALS = 512

_ALL_FIELDS = (
    [name for name, _ in _SCALAR_FIELDS]
    + [name for name, _ in _COLOR_FIELDS]
    + _TEXTURE_FIELDS
)


def _make_fields():
    anns = {}
    for name, _default in _SCALAR_FIELDS + _COLOR_FIELDS:
        anns[name] = jax.Array
    for name in _TEXTURE_FIELDS:
        anns[name] = jax.Array
    return anns


@struct.dataclass
class MaterialBank:
    """SoA bank of N materials. Scalar fields: (N,) f32; colors: (N,3) f32;
    texture indices: (N,) i32."""

    # Fields are generated programmatically below via make(); declare them
    # explicitly for dataclass machinery.
    emission_strength: jax.Array
    roughness: jax.Array
    oren_nayar_sigma: jax.Array
    metallic: jax.Array
    metallic_F90_falloff_exponent: jax.Array
    anisotropy: jax.Array
    anisotropy_rotation: jax.Array
    second_roughness_weight: jax.Array
    second_roughness: jax.Array
    specular: jax.Array
    specular_tint: jax.Array
    specular_darkening: jax.Array
    coat: jax.Array
    coat_medium_thickness: jax.Array
    coat_roughness: jax.Array
    coat_roughening: jax.Array
    coat_darkening: jax.Array
    coat_anisotropy: jax.Array
    coat_anisotropy_rotation: jax.Array
    coat_ior: jax.Array
    sheen: jax.Array
    sheen_roughness: jax.Array
    ior: jax.Array
    specular_transmission: jax.Array
    absorption_at_distance: jax.Array
    dispersion_scale: jax.Array
    dispersion_abbe_number: jax.Array
    thin_walled: jax.Array
    thin_film: jax.Array
    thin_film_ior: jax.Array
    thin_film_thickness: jax.Array
    thin_film_kappa_3: jax.Array
    thin_film_hue_shift_degrees: jax.Array
    thin_film_base_ior_override: jax.Array
    thin_film_do_ior_override: jax.Array
    alpha_opacity: jax.Array
    dielectric_priority: jax.Array
    base_color: jax.Array
    emission: jax.Array
    metallic_F82: jax.Array
    metallic_F90: jax.Array
    specular_color: jax.Array
    coat_medium_absorption: jax.Array
    sheen_color: jax.Array
    absorption_color: jax.Array
    normal_map_texture_index: jax.Array
    emission_texture_index: jax.Array
    base_color_texture_index: jax.Array
    roughness_metallic_texture_index: jax.Array
    roughness_texture_index: jax.Array
    metallic_texture_index: jax.Array
    specular_texture_index: jax.Array
    coat_texture_index: jax.Array
    sheen_texture_index: jax.Array
    specular_transmission_texture_index: jax.Array

    @property
    def num_materials(self) -> int:
        return self.roughness.shape[0]

    @classmethod
    def zeros(cls, n: int) -> "MaterialBank":
        """Bank of n materials with reference defaults."""
        kw = {}
        for name, default in _SCALAR_FIELDS:
            kw[name] = jnp.full((n,), _f(default), dtype=jnp.float32)
        for name, default in _COLOR_FIELDS:
            kw[name] = jnp.tile(jnp.asarray(default, dtype=jnp.float32), (n, 1))
        for name in _TEXTURE_FIELDS:
            kw[name] = jnp.full((n,), NO_TEXTURE, dtype=jnp.int32)
        return cls(**kw)

    @classmethod
    def from_rows(cls, rows: list[dict]) -> "MaterialBank":
        """Build a bank from a list of per-material dicts (missing keys →
        reference defaults). Fields stay HOST numpy arrays: device placement
        happens at the first jit boundary, and scene assembly (build_scene)
        reads them back — with a tunneled remote device, an eager device
        round-trip at load time costs minutes for kilobytes."""
        n = max(len(rows), 1)
        kw = {}
        for name, default in _SCALAR_FIELDS:
            arr = np.full((n,), _f(default), dtype=np.float32)
            for i, r in enumerate(rows):
                if name in r:
                    arr[i] = float(r[name])
            kw[name] = arr
        for name, default in _COLOR_FIELDS:
            arr = np.tile(np.asarray(default, dtype=np.float32), (n, 1))
            for i, r in enumerate(rows):
                if name in r:
                    arr[i] = np.asarray(r[name], dtype=np.float32)[:3]
            kw[name] = arr
        for name in _TEXTURE_FIELDS:
            arr = np.full((n,), NO_TEXTURE, dtype=np.int32)
            for i, r in enumerate(rows):
                if name in r:
                    arr[i] = int(r[name])
            kw[name] = arr
        return cls(**kw)

    def to_device(self) -> "MaterialBank":
        """jnp-ify every field (host numpy banks are produced by from_rows;
        build_scene converts once after the host-side emissive scan)."""
        return jax.tree.map(jnp.asarray, self)

    def at_indices(self, mat_ids: jax.Array) -> "MaterialBank":
        """Gather per-hit materials: every field indexed by mat_ids (N,).

        Equivalent of the reference's material fetch at hit points
        (src/Device/includes/Material.h get_intersection_material).

        TPU-critical: a gather costs ~0.4 ms per 65k indices regardless of row
        width (measured, see accel/build.py) — so the ~71 material fields are
        packed into ONE (M, 128) row, gathered once, transposed to (128, N)
        and decoded as free sublane slices, instead of 55+ separate gathers.
        With few materials (every real scene) the row gather itself is lowered
        as a one-hot MXU matmul, which beats the serial dynamic-gather unit at
        wavefront index counts; texture indices ride as exact small-int floats
        (a bitcast would make denormals the MXU flushes).
        """
        mat_ids = jnp.clip(mat_ids, 0, self.num_materials - 1)
        onehot = self.num_materials <= _ONEHOT_GATHER_MAX_MATERIALS
        cols = []
        for name, _ in _SCALAR_FIELDS:
            cols.append(getattr(self, name))
        for name, _ in _COLOR_FIELDS:
            c = getattr(self, name)
            cols.extend([c[:, 0], c[:, 1], c[:, 2]])
        n_float = len(cols)
        for name in _TEXTURE_FIELDS:
            idx = getattr(self, name)
            cols.append(
                idx.astype(jnp.float32) if onehot
                else jax.lax.bitcast_convert_type(idx, jnp.float32)
            )
        packed = jnp.stack(cols, axis=1)  # (M, n_fields) — tiny, M materials
        pad = 128 - packed.shape[1]
        if pad > 0:
            packed = jnp.pad(packed, ((0, 0), (0, pad)))
        if onehot:
            # one-hot (N, M) @ (M, 128): exact — each output element has one
            # nonzero product, and HIGHEST-precision f32 passes on the MXU
            # reproduce the f32 value through the bf16 hi/lo split
            oh = (
                mat_ids[:, None]
                == jnp.arange(packed.shape[0], dtype=mat_ids.dtype)[None, :]
            ).astype(jnp.float32)
            rowT = jax.lax.dot_general(
                oh, packed, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            ).T
        else:
            rowT = packed[mat_ids].T  # ONE gather, then (128, N)

        kw = {}
        i = 0
        for name, _ in _SCALAR_FIELDS:
            kw[name] = rowT[i]
            i += 1
        for name, _ in _COLOR_FIELDS:
            kw[name] = jnp.stack([rowT[i], rowT[i + 1], rowT[i + 2]], axis=-1)
            i += 3
        for name in _TEXTURE_FIELDS:
            if onehot:
                kw[name] = jnp.round(rowT[i]).astype(jnp.int32)
            else:
                kw[name] = jax.lax.bitcast_convert_type(rowT[i], jnp.int32)
            i += 1
        return MaterialBank(**kw)

    def fields_at(self, mat_ids: jax.Array, names: tuple) -> dict:
        """Gather only the named fields (scalar/color/texture-index) at
        mat_ids — a narrow one-hot matmul (or narrow gather for big banks)
        instead of the full 128-column row fetch. Use at call sites that
        need 1-4 fields (normal-map index, absorption): the full at_indices
        costs ~35 ms at a 2M wavefront; a 4-column fetch is several times
        cheaper. Returns {name: (N,) or (N,3) array}."""
        mat_ids = jnp.clip(mat_ids, 0, self.num_materials - 1)
        onehot = self.num_materials <= _ONEHOT_GATHER_MAX_MATERIALS
        scalar_names = [n for n, _ in _SCALAR_FIELDS]
        color_names = [n for n, _ in _COLOR_FIELDS]
        cols = []
        spans = []  # (name, start, width, kind)
        for name in names:
            if name in scalar_names:
                spans.append((name, len(cols), 1, "s"))
                cols.append(getattr(self, name))
            elif name in color_names:
                spans.append((name, len(cols), 3, "c"))
                c = getattr(self, name)
                cols.extend([c[:, 0], c[:, 1], c[:, 2]])
            elif name in _TEXTURE_FIELDS:
                spans.append((name, len(cols), 1, "i"))
                idx = getattr(self, name)
                cols.append(
                    idx.astype(jnp.float32) if onehot
                    else jax.lax.bitcast_convert_type(idx, jnp.float32)
                )
            else:
                raise KeyError(name)
        packed = jnp.stack(cols, axis=1)  # (M, w)
        if onehot:
            oh = (
                mat_ids[:, None]
                == jnp.arange(packed.shape[0], dtype=mat_ids.dtype)[None, :]
            ).astype(jnp.float32)
            rows = jax.lax.dot_general(
                oh, packed, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            rows = packed[mat_ids]
        out = {}
        for name, start, width, kind in spans:
            if kind == "c":
                out[name] = rows[:, start:start + 3]
            elif kind == "i":
                col = rows[:, start]
                out[name] = (
                    jnp.round(col).astype(jnp.int32) if onehot
                    else jax.lax.bitcast_convert_type(col, jnp.int32)
                )
            else:
                out[name] = rows[:, start]
        return out

    def make_safe(self) -> "MaterialBank":
        """Clamp degenerate parameter values (reference: Material.h:44-60
        make_safe): roughness floor, absorption color floor."""
        return self.replace(
            roughness=jnp.maximum(self.roughness, ROUGHNESS_CLAMP),
            coat_roughness=jnp.maximum(self.coat_roughness, ROUGHNESS_CLAMP),
            second_roughness=jnp.maximum(self.second_roughness, ROUGHNESS_CLAMP),
            sheen_roughness=jnp.maximum(self.sheen_roughness, ROUGHNESS_CLAMP),
            absorption_color=jnp.maximum(self.absorption_color, 1.0 / 512.0),
        )

    def is_emissive(self) -> jax.Array:
        """(N,) bool — matches reference Material.h:33-42."""
        strength = self.emission_strength[..., None] * self.emission
        return jnp.any(strength > 0.0, axis=-1) | (
            self.emission_texture_index != NO_TEXTURE
        )

    def effective_emission(self) -> jax.Array:
        """(N,3) emission scaled by strength (reference: Material.h:119-122)."""
        return self.emission * self.emission_strength[..., None]


def get_alphas(roughness: jax.Array, anisotropy: jax.Array):
    """GGX alpha_x/alpha_y from roughness+anisotropy (reference Material.h:80-85)."""
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropy)
    r2 = roughness * roughness
    alpha_x = jnp.maximum(ROUGHNESS_CLAMP, r2 / aspect)
    alpha_y = jnp.maximum(ROUGHNESS_CLAMP, r2 * aspect)
    return alpha_x, alpha_y


def oren_nayar_AB(sigma: jax.Array):
    """Oren-Nayar A/B coefficients (reference Material.h:73-78)."""
    s2 = sigma * sigma
    A = 1.0 - 0.5 * s2 / (s2 + 0.33)
    B = 0.45 * s2 / (s2 + 0.09)
    return A, B


def thin_walled_roughness(
    thin_walled: jax.Array, base_roughness: jax.Array, relative_eta: jax.Array
) -> jax.Array:
    """Roughness remap so a thin-walled single interface matches a proper
    double-interface slab (reference Material.h:87-111)."""
    eta = jnp.where(jnp.abs(relative_eta - 1.0) < 1.0e-3, 1.001, relative_eta)
    remapped = base_roughness * jnp.sqrt(
        jnp.maximum(0.0, 3.7 * (eta - 1.0) * jnp.square(eta - 0.5) / (eta**3))
    )
    r = jnp.where(thin_walled > 0.5, remapped, base_roughness)
    return jnp.clip(r, ROUGHNESS_CLAMP, 1.0)


def default_material_bank() -> MaterialBank:
    return MaterialBank.zeros(1)
