"""Native geometry library tests: C++ vs numpy fallback agreement + semantics."""

import numpy as np
import pytest

from renderer_rs_tpu.resources import geometry as g
from renderer_rs_tpu.utils import meshgen


@pytest.fixture(scope="module")
def sphere():
    return meshgen.uv_sphere_mesh(1.0, 8, 12)


def test_native_library_builds():
    """The image has g++; the library should load (not the fallback)."""
    assert g._load_library() is not None


def test_compute_normals_sphere(sphere):
    """Generated normals on a sphere match the analytic (radial) normals."""
    n = g.compute_normals(sphere.positions, sphere.indices)
    radial = sphere.positions / np.maximum(
        np.linalg.norm(sphere.positions, axis=-1, keepdims=True), 1e-12
    )
    # poles/seams are averaged; interior vertices should be near-radial
    dots = np.sum(n * radial, axis=-1)
    assert np.median(dots) > 0.99


def test_compute_normals_matches_numpy(sphere):
    if g._load_library() is None:
        pytest.skip("native lib unavailable")
    a = g.compute_normals(sphere.positions, sphere.indices)
    b = g._compute_normals_np(
        np.ascontiguousarray(sphere.positions), np.ascontiguousarray(sphere.indices)
    )
    # accumulation order differs (sequential C++ vs np.add.at), so compare
    # directions, not bits; pole/seam vertices see the largest drift
    dots = np.sum(a * b, axis=-1)
    assert np.min(dots) > 0.999


def test_compute_tangents_orthogonal(sphere):
    t = g.compute_tangents(
        sphere.positions, sphere.normals, sphere.tex_coords, sphere.indices
    )
    assert t.shape == (sphere.vertex_count, 4)
    # tangents orthogonal to normals (Gram-Schmidt guarantee)
    dots = np.abs(np.sum(t[:, :3] * sphere.normals, axis=-1))
    assert np.max(dots) < 1e-3
    # unit length
    lens = np.linalg.norm(t[:, :3], axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    # handedness is ±1
    assert set(np.unique(t[:, 3])) <= {-1.0, 1.0}


def test_compute_tangents_matches_numpy(sphere):
    if g._load_library() is None:
        pytest.skip("native lib unavailable")
    a = g.compute_tangents(
        sphere.positions, sphere.normals, sphere.tex_coords, sphere.indices
    )
    b = g._compute_tangents_np(
        np.ascontiguousarray(sphere.positions),
        np.ascontiguousarray(sphere.normals),
        np.ascontiguousarray(sphere.tex_coords),
        np.ascontiguousarray(sphere.indices),
    )
    # direction agreement (accumulation order differs between impls; the
    # last seam vertex sees the largest drift)
    dots = np.sum(a[:, :3] * b[:, :3], axis=-1)
    assert np.median(dots) > 0.9999
    assert np.min(dots) > 0.99
    np.testing.assert_array_equal(a[:, 3], b[:, 3])  # handedness identical


def test_tangents_degenerate_uv_fallback():
    """Zero UVs (the loader's default-UV case) -> +X w=1 fallback, like the
    reference's constant default (model.rs:187-197)."""
    quad = meshgen.plane_mesh(1.0)
    t = g.compute_tangents(
        quad.positions, quad.normals, np.zeros_like(quad.tex_coords), quad.indices
    )
    np.testing.assert_allclose(t, np.tile([[1, 0, 0, 1]], (4, 1)), atol=0)


def test_weld_vertices():
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 0, 1e-9], [2, 0, 0], [1, 0, 0]], np.float32
    )
    remap, unique = g.weld_vertices(pos, eps=1e-6)
    assert unique == 3
    assert remap[0] == remap[2]  # within eps
    assert remap[1] == remap[4]  # exact duplicate
    assert len({remap[0], remap[1], remap[3]}) == 3


def test_weld_matches_numpy():
    if g._load_library() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 5, (200, 3)).astype(np.float32) * 0.25
    a_remap, a_n = g.weld_vertices(pos, 1e-3)
    b_remap, b_n = g._weld_vertices_np(pos, 1e-3)
    assert a_n == b_n
    np.testing.assert_array_equal(a_remap, b_remap)


def test_vertex_stage_batch_matches_loop(monkeypatch):
    """The batched vertex stage (one matmul against per-object column
    blocks + block select, the default) matches the per-object unrolled
    loop (RENDERER_VSTAGE=loop) to ulp on every output, for both the
    forward and the shadow vertex stages. (Strict bit-equality is not
    guaranteed: XLA lowers tiny per-object [4,4] matmuls with different
    rounding than the wide [V,4]@[4,4O] form.)"""
    import numpy as np

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import (
        shadow_vertex_stage,
        vertex_stage,
    )

    scene, layout, _, _ = full_scene(96, 64, tri_budget=800, textured=True)
    assert len(layout.object_ranges) > 1

    monkeypatch.setenv("RENDERER_VSTAGE", "loop")
    a = vertex_stage(scene, layout)
    sa = np.asarray(shadow_vertex_stage(scene, layout))
    monkeypatch.setenv("RENDERER_VSTAGE", "batch")
    b = vertex_stage(scene, layout)
    sb = np.asarray(shadow_vertex_stage(scene, layout))

    for x, y in [
        (a.clip, b.clip),
        (a.world_pos, b.world_pos),
        (a.world_normal, b.world_normal),
        (a.world_tangent, b.world_tangent),
    ]:
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-6, atol=2e-6
        )
    np.testing.assert_allclose(sa, sb, rtol=2e-6, atol=2e-6)
