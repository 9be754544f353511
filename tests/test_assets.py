"""Asset layer: GLTF parsing, material mapping, envmap tables
(reference parity: SceneParser.cpp material mapping; Image.cpp:553-660 CDF +
Vose alias table)."""

import numpy as np
import jax.numpy as jnp

from hiprt_pt_tpu.assets.envmap import (
    compute_alias_table,
    compute_cdf,
    make_test_envmap,
    sin_weighted_luminance,
)
from hiprt_pt_tpu.core.material import MaterialBank, NO_TEXTURE


def test_gltf_cornell(cornell_scene):
    scene, camera = cornell_scene
    assert scene.num_triangles > 1000
    assert int(scene.num_emissives) >= 1
    assert camera is not None
    # materials mapped: left wall red-ish exists
    base = np.asarray(scene.materials.base_color)
    assert base.shape[1] == 3
    em = np.asarray(scene.materials.effective_emission())
    assert em.max() > 10.0  # emissive strength 100 × 0.78


def test_material_bank_defaults_and_gather():
    bank = MaterialBank.from_rows([{"roughness": 0.1}, {"base_color": [1, 0, 0]}])
    assert bank.num_materials == 2
    assert np.isclose(float(bank.roughness[0]), 0.1)
    assert np.isclose(float(bank.ior[0]), 1.4)  # reference default
    assert int(bank.base_color_texture_index[0]) == NO_TEXTURE
    g = bank.at_indices(jnp.asarray([1, 1, 0]))
    assert np.allclose(np.asarray(g.base_color)[0], [1, 0, 0])
    assert g.roughness.shape == (3,)


def test_material_gather_onehot_exact():
    """The one-hot-matmul gather path (small banks) must reproduce direct
    per-field indexing bitwise — including texture indices, which ride as
    exact small-int floats rather than bitcasts."""
    import hiprt_pt_tpu.core.material as mat_mod

    rng = np.random.default_rng(5)
    rows = []
    for i in range(7):
        rows.append({
            "roughness": float(rng.uniform(0.01, 1.0)),
            "base_color": rng.uniform(0, 1, 3).tolist(),
            "emission": (rng.uniform(0, 40, 3).tolist() if i % 3 == 0
                         else [0.0, 0.0, 0.0]),
            "ior": float(rng.uniform(1.0, 2.5)),
            "base_color_texture_index": int(rng.integers(-1, 1000)),
            "normal_map_texture_index": int(rng.integers(-1, 1000)),
        })
    bank = MaterialBank.from_rows(rows)
    ids = jnp.asarray(rng.integers(0, 7, 333), jnp.int32)
    assert bank.num_materials <= mat_mod._ONEHOT_GATHER_MAX_MATERIALS
    g = bank.at_indices(ids)
    idn = np.asarray(ids)
    for name in ("roughness", "ior", "emission_strength"):
        assert np.array_equal(
            np.asarray(getattr(g, name)), np.asarray(getattr(bank, name))[idn]
        ), name
    for name in ("base_color", "emission"):
        assert np.array_equal(
            np.asarray(getattr(g, name)), np.asarray(getattr(bank, name))[idn]
        ), name
    for name in ("base_color_texture_index", "normal_map_texture_index"):
        assert np.array_equal(
            np.asarray(getattr(g, name)), np.asarray(getattr(bank, name))[idn]
        ), name


def test_material_fields_at_matches_full_gather():
    """Narrow fields_at must agree with at_indices for every field kind."""
    rng = np.random.default_rng(9)
    rows = [{
        "roughness": float(rng.uniform(0.01, 1.0)),
        "absorption_color": rng.uniform(0.1, 1.0, 3).tolist(),
        "absorption_at_distance": float(rng.uniform(0.1, 5.0)),
        "normal_map_texture_index": int(rng.integers(-1, 40)),
    } for _ in range(6)]
    bank = MaterialBank.from_rows(rows)
    ids = jnp.asarray(rng.integers(0, 6, 123), jnp.int32)
    full = bank.at_indices(ids)
    narrow = bank.fields_at(ids, (
        "roughness", "absorption_color", "absorption_at_distance",
        "normal_map_texture_index",
    ))
    assert np.array_equal(np.asarray(narrow["roughness"]),
                          np.asarray(full.roughness))
    assert np.array_equal(np.asarray(narrow["absorption_color"]),
                          np.asarray(full.absorption_color))
    assert np.array_equal(np.asarray(narrow["absorption_at_distance"]),
                          np.asarray(full.absorption_at_distance))
    assert np.array_equal(np.asarray(narrow["normal_map_texture_index"]),
                          np.asarray(full.normal_map_texture_index))


def test_cdf_monotone_normalized():
    img = make_test_envmap(32, 64, "sky")
    cdf = compute_cdf(img)
    assert np.all(np.diff(cdf) >= -1e-7)
    assert abs(cdf[-1] - 1.0) < 1e-5


def test_alias_table_distribution():
    """Sampling via the alias table must reproduce the texel importance."""
    img = make_test_envmap(16, 32, "sky")
    probas, aliases = compute_alias_table(img)
    imp = sin_weighted_luminance(img).ravel()
    p_true = imp / imp.sum()
    n_tex = imp.size
    g = np.random.default_rng(0)
    n_draws = 400000
    idx = g.integers(0, n_tex, n_draws)
    u = g.uniform(size=n_draws)
    chosen = np.where(u < probas[idx], idx, aliases[idx])
    counts = np.bincount(chosen, minlength=n_tex) / n_draws
    # total-variation distance small (expected ~sqrt(n_tex/(2*pi*n_draws)))
    assert np.abs(counts - p_true).sum() < 0.04


def test_alias_table_zero_importance_texels():
    img = np.zeros((8, 16, 3), np.float32)
    img[2, 3] = 10.0
    probas, aliases = compute_alias_table(img)
    g = np.random.default_rng(1)
    idx = g.integers(0, img[..., 0].size, 10000)
    u = g.uniform(size=10000)
    chosen = np.where(u < probas[idx], idx, aliases[idx])
    assert np.all(chosen == 2 * 16 + 3)


def test_glb_container_roundtrip(tmp_path):
    """Pack cornell_pbr into a .glb and verify identical parse (GLTF 2.0
    binary container support)."""
    import json as _json
    import struct as _struct

    src_gltf = "/root/reference/data/GLTFs/cornell_pbr.gltf"
    with open(src_gltf) as f:
        doc = _json.load(f)
    with open("/root/reference/data/GLTFs/cornell_pbr.bin", "rb") as f:
        blob = f.read()
    doc["buffers"] = [{"byteLength": len(blob)}]
    js = _json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    blob_p = blob + b"\x00" * ((4 - len(blob) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob_p)
    glb = (
        _struct.pack("<4sII", b"glTF", 2, total)
        + _struct.pack("<I4s", len(js), b"JSON") + js
        + _struct.pack("<I4s", len(blob_p), b"BIN\x00") + blob_p
    )
    path = tmp_path / "cornell.glb"
    path.write_bytes(glb)

    from hiprt_pt_tpu.assets.gltf import load_gltf

    a = load_gltf(str(path), aspect_override=1.0)
    b = load_gltf(src_gltf, aspect_override=1.0)
    assert np.array_equal(a.vertices, b.vertices)
    assert np.array_equal(a.triangles, b.triangles)
    assert a.material_rows == b.material_rows
