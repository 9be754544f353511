"""Texture fetch + material texture application.

Role parity with src/Device/includes/Texture.h (texel fetch with sRGB
handling, CPU & GPU paths) and src/Device/includes/Material.h's
``get_intersection_material`` texture evaluation: at every shading vertex the
gathered material parameters are modulated by their textures.

TPU note: one bilinear fetch is ONE 16-byte footprint-row gather from the
flattened atlas (the atlas pre-packs each texel's 2x2 neighborhood — XLA TPU
gathers are row-rate-bound, so this quarters the old 4-tap gather cost); the
uv wrap/weights are pure VPU math. NO_TEXTURE (-1) indices fetch layer 0 and
are masked out, keeping the wavefront branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets.scene import TextureAtlas
from ..core.material import MaterialBank


def _srgb_decode(c):
    """Exact piecewise sRGB → linear (reference: Texture.h sRGB handling)."""
    return jnp.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    )


def fetch_bilinear(atlas: TextureAtlas, tex_idx: jax.Array, uv: jax.Array,
                   lod: jax.Array | None = None,
                   decode_srgb: bool | None = None):
    """Bilinear texel fetch from the flat native-resolution uint8 atlas.

    tex_idx (N,) i32 (NO_TEXTURE = -1 → returns 1s), uv (N,2) wrap-addressed,
    lod optional (N,) f32 mip level (rounded to nearest; 0 = full res).
    The atlas stores 2x2 bilinear-footprint rows, so the whole filter
    neighborhood arrives in ONE row gather. sRGB decode happens per tap
    before filtering; decode_srgb True/False skips the per-lane select when
    the caller statically knows the referenced layers' sRGB-ness
    (TextureAtlas.kinds_srgb_*), None keeps the dynamic select.
    Returns (N,4) f32.
    """
    has = tex_idx >= 0
    layer = jnp.maximum(tex_idx, 0)
    w0 = atlas.widths[layer]
    h0 = atlas.heights[layer]
    if lod is None:
        level = jnp.zeros_like(layer)
    else:
        level = jnp.clip(
            jnp.round(lod).astype(jnp.int32), 0, atlas.num_levels[layer] - 1
        )
    off = atlas.offsets[layer, level]
    w = jnp.maximum(w0 >> level, 1)
    h = jnp.maximum(h0 >> level, 1)

    u = uv[:, 0] % 1.0
    v = uv[:, 1] % 1.0
    x = u * w.astype(jnp.float32) - 0.5
    y = v * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)

    if decode_srgb is False:
        def tap(t):
            return t
    elif decode_srgb is True:
        def tap(t):
            return jnp.concatenate(
                [_srgb_decode(t[:, :3]), t[:, 3:4]], axis=-1)
    else:
        srgb = atlas.is_srgb[layer][:, None]

        def tap(t):
            rgb = jnp.where(srgb, _srgb_decode(t[:, :3]), t[:, :3])
            return jnp.concatenate([rgb, t[:, 3:4]], axis=-1)

    if atlas.footprint:
        row = atlas.texels[off + y0i * w + x0i].astype(jnp.float32) / 255.0
        t00, t01 = row[:, 0:4], row[:, 4:8]
        t10, t11 = row[:, 8:12], row[:, 12:16]
    else:
        x1i = jnp.mod(x0i + 1, w)
        y1i = jnp.mod(y0i + 1, h)

        def texel(yy, xx):
            return atlas.texels[off + yy * w + xx].astype(jnp.float32) / 255.0

        t00, t01 = texel(y0i, x0i), texel(y0i, x1i)
        t10, t11 = texel(y1i, x0i), texel(y1i, x1i)

    tex = (
        tap(t00) * ((1 - fx) * (1 - fy))
        + tap(t01) * (fx * (1 - fy))
        + tap(t10) * ((1 - fx) * fy)
        + tap(t11) * (fx * fy)
    )
    return jnp.where(has[:, None], tex, 1.0)


def apply_textures(
    atlas: TextureAtlas | None, mats: MaterialBank, uv: jax.Array
) -> MaterialBank:
    """Modulate gathered material parameters by their textures (reference:
    Material.h:61-79 get_intersection_material — base color + alpha, MR from
    the GLTF texture's G/B channels or separate roughness/metallic maps,
    emission, and the scalar property maps: specular/coat/sheen/transmission
    read as channel R with replace semantics, Material.h:110-111,150-152).

    Each kind is gated STATICALLY by atlas.kinds_used — a fetch is 4 row
    gathers, ~25 ms per kind at a 2M-lane wavefront, so kinds no material
    references never enter the program."""
    if atlas is None:
        return mats
    kinds = atlas.kinds_used

    def srgb_mode(kind):
        # static per-kind sRGB knowledge from build_scene: skip or force the
        # decode when every referenced layer agrees; None = per-lane select
        if kind in atlas.kinds_srgb_all:
            return True
        if kind not in atlas.kinds_srgb_any:
            return False
        return None

    kw = {}
    if "base" in kinds:
        base = fetch_bilinear(atlas, mats.base_color_texture_index, uv,
                              decode_srgb=srgb_mode("base"))
        has_base = mats.base_color_texture_index >= 0
        kw["base_color"] = jnp.where(
            has_base[:, None], mats.base_color * base[:, :3], mats.base_color
        )
        kw["alpha_opacity"] = jnp.where(
            has_base, mats.alpha_opacity * base[:, 3], mats.alpha_opacity
        )
    roughness = mats.roughness
    metallic = mats.metallic
    if "mr" in kinds:
        mr = fetch_bilinear(atlas, mats.roughness_metallic_texture_index, uv,
                            decode_srgb=srgb_mode("mr"))
        has_mr = mats.roughness_metallic_texture_index >= 0
        roughness = jnp.where(has_mr, mats.roughness * mr[:, 1], roughness)
        metallic = jnp.where(has_mr, mats.metallic * mr[:, 2], metallic)
    if "rough" in kinds:
        r1 = fetch_bilinear(atlas, mats.roughness_texture_index, uv,
                            decode_srgb=srgb_mode("rough"))
        roughness = jnp.where(
            mats.roughness_texture_index >= 0, r1[:, 0], roughness
        )
    if "metal" in kinds:
        m1 = fetch_bilinear(atlas, mats.metallic_texture_index, uv,
                            decode_srgb=srgb_mode("metal"))
        metallic = jnp.where(
            mats.metallic_texture_index >= 0, m1[:, 0], metallic
        )
    if "rough" in kinds or "mr" in kinds:
        kw["roughness"] = roughness
    if "metal" in kinds or "mr" in kinds:
        kw["metallic"] = metallic
    if "em" in kinds:
        em = fetch_bilinear(atlas, mats.emission_texture_index, uv,
                            decode_srgb=srgb_mode("em"))
        kw["emission"] = jnp.where(
            (mats.emission_texture_index >= 0)[:, None],
            mats.emission * em[:, :3], mats.emission,
        )
    if "spec" in kinds:
        s1 = fetch_bilinear(atlas, mats.specular_texture_index, uv,
                            decode_srgb=srgb_mode("spec"))
        kw["specular"] = jnp.where(
            mats.specular_texture_index >= 0, s1[:, 0], mats.specular
        )
    if "coat" in kinds:
        c1 = fetch_bilinear(atlas, mats.coat_texture_index, uv,
                            decode_srgb=srgb_mode("coat"))
        kw["coat"] = jnp.where(
            mats.coat_texture_index >= 0, c1[:, 0], mats.coat
        )
    if "sheen" in kinds:
        sh1 = fetch_bilinear(atlas, mats.sheen_texture_index, uv,
                             decode_srgb=srgb_mode("sheen"))
        kw["sheen"] = jnp.where(
            mats.sheen_texture_index >= 0, sh1[:, 0], mats.sheen
        )
    if "trans" in kinds:
        t1 = fetch_bilinear(atlas, mats.specular_transmission_texture_index, uv,
                            decode_srgb=srgb_mode("trans"))
        kw["specular_transmission"] = jnp.where(
            mats.specular_transmission_texture_index >= 0,
            t1[:, 0], mats.specular_transmission,
        )
    return mats.replace(**kw) if kw else mats


def apply_normal_map(
    atlas: TextureAtlas | None,
    nm_index: jax.Array | MaterialBank,
    uv: jax.Array,
    ns: jax.Array,
    tangent: jax.Array,
) -> jax.Array:
    """Perturb the shading normal by the tangent-space normal map (reference:
    Intersect.h:30-62 normal mapping + tangent computation).

    nm_index: (N,) normal_map_texture_index per hit — or a gathered
    MaterialBank (legacy callers); passing just the index lets call sites
    skip the full 128-column material fetch."""
    if atlas is None or "normal" not in atlas.kinds_used:
        return ns
    if isinstance(nm_index, MaterialBank):
        nm_index = nm_index.normal_map_texture_index
    has = nm_index >= 0
    nm_srgb = (True if "normal" in atlas.kinds_srgb_all
               else (None if "normal" in atlas.kinds_srgb_any else False))
    tex = fetch_bilinear(atlas, nm_index, uv, decode_srgb=nm_srgb)
    nt = tex[:, :3] * 2.0 - 1.0
    # orthonormalize tangent against the (possibly interpolated) normal
    t = tangent - ns * jnp.sum(tangent * ns, axis=-1, keepdims=True)
    t_len = jnp.linalg.norm(t, axis=-1, keepdims=True)
    t = jnp.where(t_len > 1e-6, t / jnp.maximum(t_len, 1e-12), 0.0)
    b = jnp.cross(ns, t)
    n2 = nt[:, 0:1] * t + nt[:, 1:2] * b + nt[:, 2:3] * ns
    n2_len = jnp.linalg.norm(n2, axis=-1, keepdims=True)
    n2 = jnp.where(n2_len > 1e-6, n2 / jnp.maximum(n2_len, 1e-12), ns)
    ok = has & (jnp.linalg.norm(tangent, axis=-1) > 1e-6)
    return jnp.where(ok[:, None], n2, ns)
