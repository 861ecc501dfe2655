"""glTF asset integration test — mirrors the reference's only integration
test (resources/tests/integration_test.rs:8-83: load the dancer model, check
mesh/attribute counts and a non-degenerate AABB; skip if assets are absent).

Uses the reference's own asset snapshot when mounted (textures are stripped
there, but geometry loads); otherwise skips exactly like the reference's
"CI environment may not have assets" guard.
"""

import glob
import os

import numpy as np
import pytest

_ASSET_GLOB = "/root/reference/assets/models/*/scene.gltf"


def _find_asset():
    matches = sorted(glob.glob(_ASSET_GLOB))
    return matches[0] if matches else None


@pytest.mark.skipif(_find_asset() is None, reason="reference assets not mounted")
def test_load_reference_model():
    from renderer_rs_tpu.resources.model import Model

    path = _find_asset()
    model = Model.load(path)
    # structure checks (≙ integration_test.rs assertions)
    assert model.mesh_count() >= 1
    assert model.total_vertex_count() > 0
    assert model.total_triangle_count() > 0
    for mesh in model.meshes:
        n = mesh.vertex_count
        assert mesh.normals.shape == (n, 3)
        assert mesh.tex_coords.shape == (n, 2)
        assert mesh.tangents.shape == (n, 4)
        assert mesh.indices.size % 3 == 0
        assert mesh.indices.max() < n
    # non-degenerate AABB
    assert np.all(model.aabb_max > model.aabb_min)
    assert np.isfinite(model.diagonal())


@pytest.mark.skipif(_find_asset() is None, reason="reference assets not mounted")
def test_render_reference_model():
    """End-to-end: the loaded asset renders through the PBR pipeline."""
    from renderer_rs_tpu.app.scenes import gltf_pbr_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    scene, layout, kwargs, _ = gltf_pbr_scene(96, 64, _find_asset())
    pipe = GraphicsPipelineBuilder().build()
    out = np.asarray(
        forward_frame(scene, layout, pipe, kwargs["shading"], 96, 64)
    )
    assert np.isfinite(out).all()
    # something should be on screen (not all clear color)
    assert np.unique(out[..., 0]).size > 4
