"""Resources tests: UBO pytrees, materials, glTF loading with defaulting rules.

Mirrors the reference's ubo tests (ubo.rs:416-596) and model tests
(model.rs + resources/tests/integration_test.rs:8-83) — but with a
self-contained in-test glTF asset instead of a large binary, so nothing skips.
"""

import base64
import json
import math

import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.core.errors import (
    FileNotFoundError_,
    GltfLoadError,
    NoMeshesError,
)
from renderer_rs_tpu.resources import (
    CameraUbo,
    DirectionalLightUbo,
    Material,
    MaterialBank,
    Model,
    ObjectUbo,
    SceneUbo,
    Sampler,
    Texture,
    build_mip_pyramid,
)


# --- in-test glTF builder -------------------------------------------------------

def _make_gltf(tmp_path, with_normals=True, with_indices=True, with_material=True):
    """A single-triangle glTF with a base64 data-URI buffer."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    normals = np.array([[0, 0, 1]] * 3, np.float32)
    indices = np.array([0, 1, 2], np.uint16)

    blob = positions.tobytes()
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": len(blob)},
    ]
    accessors = [
        {
            "bufferView": 0,
            "componentType": 5126,
            "count": 3,
            "type": "VEC3",
            "min": positions.min(0).tolist(),
            "max": positions.max(0).tolist(),
        }
    ]
    attrs = {"POSITION": 0}
    if with_normals:
        views.append({"buffer": 0, "byteOffset": len(blob), "byteLength": normals.nbytes})
        blob += normals.tobytes()
        accessors.append(
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"}
        )
        attrs["NORMAL"] = len(accessors) - 1
    prim = {"attributes": attrs, "mode": 4}
    if with_indices:
        views.append({"buffer": 0, "byteOffset": len(blob), "byteLength": indices.nbytes})
        blob += indices.tobytes()
        accessors.append(
            {"bufferView": len(views) - 1, "componentType": 5123, "count": 3, "type": "SCALAR"}
        )
        prim["indices"] = len(accessors) - 1
    if with_material:
        prim["material"] = 0

    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
                "byteLength": len(blob),
            }
        ],
        "bufferViews": views,
        "accessors": accessors,
        "meshes": [{"primitives": [prim]}],
        "materials": (
            [
                {
                    "pbrMetallicRoughness": {
                        "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                        "metallicFactor": 0.3,
                        "roughnessFactor": 0.7,
                    },
                    "emissiveFactor": [0.1, 0.0, 0.0],
                }
            ]
            if with_material
            else []
        ),
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


# --- Model loading ---------------------------------------------------------------

def test_model_load_basic(tmp_path):
    m = Model.load(_make_gltf(tmp_path))
    assert m.mesh_count() == 1
    assert m.total_vertex_count() == 3
    assert m.total_triangle_count() == 1
    mesh = m.meshes[0]
    np.testing.assert_array_equal(mesh.indices, [0, 1, 2])
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 3)
    assert mesh.material_index == 0
    # AABB (model.rs:211-215)
    np.testing.assert_allclose(m.aabb_min, [0, 0, 0])
    np.testing.assert_allclose(m.aabb_max, [1, 1, 0])
    np.testing.assert_allclose(m.center(), [0.5, 0.5, 0.0])
    assert abs(m.diagonal() - math.sqrt(2.0)) < 1e-6


def test_model_default_normals_and_indices(tmp_path):
    """Missing NORMAL/TANGENT now generate real frames from geometry
    (upgrade over model.rs:163-197 constant defaults; VERDICT item 5);
    missing indices -> sequential (model.rs:200-209); the reference's
    constant defaults remain available via generate_tangent_frames=False."""
    path = _make_gltf(tmp_path, with_normals=False, with_indices=False)
    m = Model.load(path)
    mesh = m.meshes[0]
    # generated: area-weighted geometric normal of the triangle (unit length)
    np.testing.assert_allclose(
        np.linalg.norm(mesh.normals, axis=-1), np.ones(3), atol=1e-6
    )
    np.testing.assert_array_equal(mesh.indices, [0, 1, 2])
    np.testing.assert_allclose(mesh.tex_coords, np.zeros((3, 2)))
    # zero UVs -> degenerate UV gradient -> +X tangent fallback
    np.testing.assert_allclose(mesh.tangents, [[1, 0, 0, 1]] * 3)

    # reference-exact defaulting still available
    m2 = Model.load(path, generate_tangent_frames=False)
    np.testing.assert_allclose(m2.meshes[0].normals, [[0, 1, 0]] * 3)
    np.testing.assert_allclose(m2.meshes[0].tangents, [[1, 0, 0, 1]] * 3)


def test_model_material_extraction(tmp_path):
    """≙ extract_materials (model.rs:273-309)."""
    m = Model.load(_make_gltf(tmp_path))
    mat = m.materials[0]
    np.testing.assert_allclose(mat.base_color, [0.8, 0.2, 0.1, 1.0])
    assert mat.metallic == pytest.approx(0.3)
    assert mat.roughness == pytest.approx(0.7)
    assert mat.ao == 1.0
    np.testing.assert_allclose(mat.emissive, [0.1, 0.0, 0.0, 0.0])


def test_model_missing_file():
    with pytest.raises(FileNotFoundError_):
        Model.load("/nonexistent/model.gltf")


def test_model_no_meshes(tmp_path):
    p = tmp_path / "empty.gltf"
    p.write_text(json.dumps({"asset": {"version": "2.0"}, "meshes": []}))
    with pytest.raises(NoMeshesError):
        Model.load(str(p))


def test_gltf_invalid_json(tmp_path):
    p = tmp_path / "bad.gltf"
    p.write_text("{not json")
    with pytest.raises(GltfLoadError):
        Model.load(str(p))


def test_glb_container(tmp_path):
    """GLB framing: JSON chunk + BIN chunk round-trips."""
    import struct as s

    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    bin_chunk = positions.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": len(bin_chunk)}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"}
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
    }
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    bin_padded = bin_chunk + b"\x00" * (-len(bin_chunk) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_padded)
    glb = (
        s.pack("<III", 0x46546C67, 2, total)
        + s.pack("<II", len(js), 0x4E4F534A)
        + js
        + s.pack("<II", len(bin_padded), 0x004E4942)
        + bin_padded
    )
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    m = Model.load(str(p))
    assert m.total_vertex_count() == 3


# --- UBOs -------------------------------------------------------------------------

def test_camera_ubo_precomputed_vp():
    """view_projection = projection @ view (ubo.rs:109-123)."""
    view = jnp.eye(4).at[0, 3].set(2.0)
    proj = jnp.diag(jnp.array([1.0, 2.0, 3.0, 1.0]))
    ubo = CameraUbo.create(view, proj, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(ubo.view_projection), np.asarray(proj @ view), atol=1e-6
    )


def test_camera_ubo_update_view_recomputes():
    ubo = CameraUbo.create(jnp.eye(4), jnp.eye(4) * 2, [0.0, 0.0, 0.0])
    new_view = jnp.eye(4).at[1, 3].set(5.0)
    ubo2 = ubo.update_view(new_view, [0.0, 5.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(ubo2.view_projection),
        np.asarray((jnp.eye(4) * 2) @ new_view),
        atol=1e-6,
    )


def test_object_ubo_normal_matrix():
    model = jnp.diag(jnp.array([2.0, 1.0, 1.0, 1.0]))
    ubo = ObjectUbo.create(model)
    np.testing.assert_allclose(
        np.asarray(ubo.normal_matrix[:3, :3]), np.diag([0.5, 1, 1]), atol=1e-6
    )


def test_object_ubo_singular_fallback():
    """ubo.rs:502-523: zero matrix -> identity normal matrix, no NaN."""
    ubo = ObjectUbo.create(jnp.zeros((4, 4)))
    np.testing.assert_allclose(np.asarray(ubo.normal_matrix), np.eye(4))


def test_directional_light_ubo_normalizes():
    ubo = DirectionalLightUbo.create([0.0, -2.0, 0.0], [1.0, 1.0, 1.0], 3.0)
    np.testing.assert_allclose(np.asarray(ubo.direction), [0, -1, 0], atol=1e-6)


def test_directional_light_ubo_zero_direction():
    """ubo.rs:546-556: zero direction stays zero (no NaN)."""
    ubo = DirectionalLightUbo.create([0.0, 0.0, 0.0], [1.0, 1.0, 1.0], 1.0)
    np.testing.assert_allclose(np.asarray(ubo.direction), [0, 0, 0])


def test_scene_ubo_update_time():
    ubo = SceneUbo.create(time=1.0, delta_time=0.016)
    ubo2 = ubo.update_time(2.0, 0.033)
    assert float(ubo2.time) == pytest.approx(2.0)
    assert float(ubo2.delta_time) == pytest.approx(0.033)
    np.testing.assert_allclose(
        np.asarray(ubo2.ambient_color), np.asarray(ubo.ambient_color)
    )


# --- Materials / textures ------------------------------------------------------------

def test_material_defaults():
    m = Material()
    assert m.base_color == (1.0, 1.0, 1.0, 1.0)
    assert m.roughness == 0.5 and m.metallic == 0.0 and m.ao == 1.0


def test_material_bank_soa():
    bank = MaterialBank.create([Material(), Material(metallic=1.0, roughness=0.1)])
    assert bank.num_materials == 2
    assert float(bank.metallic[1]) == 1.0
    assert bank.tex_ids.shape == (2, 5)


def test_mip_pyramid_chain():
    base = jnp.ones((8, 16, 3))
    mips = build_mip_pyramid(base)
    shapes = [m.shape for m in mips]
    assert shapes == [(8, 16, 3), (4, 8, 3), (2, 4, 3), (1, 2, 3)]
    # box filter of a constant image stays constant
    np.testing.assert_allclose(np.asarray(mips[-1]), 1.0)


def test_texture_from_array_srgb_linearizes():
    t = Texture.from_array(np.full((4, 4, 3), 0.5, np.float32), srgb=True)
    # sRGB 0.5 -> linear ~0.2140
    assert abs(float(t.mips[0][0, 0, 0]) - 0.2140) < 1e-3


def test_sampler_presets():
    s = Sampler.nearest()
    assert s.mag_filter.value == "nearest"
    assert Sampler() != s
    assert hash(Sampler()) == hash(Sampler())


def test_gltf_sparse_accessor():
    """Sparse accessors (glTF 2.0 §3.6.2.3): base array patched with
    sparse.values at sparse.indices; zero base when bufferView absent."""
    import base64
    import json

    import numpy as np

    from renderer_rs_tpu.resources.gltf import GltfDocument

    base = np.arange(12, dtype=np.float32).reshape(4, 3)
    sparse_idx = np.asarray([1, 3], np.uint16)
    sparse_val = np.asarray([[9, 9, 9], [7, 7, 7]], np.float32)
    blob = base.tobytes() + sparse_idx.tobytes() + sparse_val.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [
            {
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
                "byteLength": len(blob),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 4},
            {"buffer": 0, "byteOffset": 52, "byteLength": 24},
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
                "sparse": {
                    "count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            },
            {  # zero-base sparse (no bufferView)
                "componentType": 5126,
                "count": 4,
                "type": "VEC3",
                "sparse": {
                    "count": 2,
                    "indices": {"bufferView": 1, "componentType": 5123},
                    "values": {"bufferView": 2},
                },
            },
        ],
    }
    g = GltfDocument(doc, [blob], ".")
    out = g.read_accessor(0)
    expect = base.copy()
    expect[[1, 3]] = sparse_val
    np.testing.assert_array_equal(out, expect)
    out0 = g.read_accessor(1)
    expect0 = np.zeros((4, 3), np.float32)
    expect0[[1, 3]] = sparse_val
    np.testing.assert_array_equal(out0, expect0)


def test_gltf_node_transforms_baked(tmp_path):
    """Scene-graph node transforms bake into mesh vertices at load (upgrade
    over the reference's flatten-and-ignore, model.rs:135-236): a translated+
    scaled node moves its mesh; two nodes sharing one mesh instance it."""
    import base64
    import json

    import numpy as np

    from renderer_rs_tpu.resources.model import Model

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [5, 0, 0], "scale": [2, 2, 2]},
            {"mesh": 0},  # second instance at identity
        ],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0}, "indices": 1}
                ]
            }
        ],
        "buffers": [
            {
                "uri": "data:application/octet-stream;base64,"
                + base64.b64encode(blob).decode(),
                "byteLength": len(blob),
            }
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    p = tmp_path / "node.gltf"
    p.write_text(json.dumps(doc))
    model = Model.load(str(p))
    assert len(model.meshes) == 2  # two instances of the one mesh
    np.testing.assert_allclose(
        model.meshes[0].positions,
        pos * 2.0 + np.array([5, 0, 0], np.float32),
        atol=1e-6,
    )
    np.testing.assert_allclose(model.meshes[1].positions, pos, atol=1e-6)
    # AABB spans both instances
    np.testing.assert_allclose(model.aabb_min, [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(model.aabb_max, [7, 2, 0], atol=1e-6)
