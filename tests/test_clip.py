"""Near-plane clipping tests (ops/clip.py)."""

import math

import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.ops.clip import clip_triangles_near


def test_fully_in_front_passthrough():
    tri = jnp.array([[[0.0, 0.0, 0.5, 1.0], [1.0, 0.0, 0.5, 2.0], [0.0, 1.0, 0.5, 3.0]]])
    clipped, valid, src, bary = clip_triangles_near(tri)
    assert clipped.shape == (2, 3, 4)
    np.testing.assert_array_equal(np.asarray(valid), [True, False])
    np.testing.assert_allclose(np.asarray(clipped[0]), np.asarray(tri[0]))
    np.testing.assert_allclose(np.asarray(bary[0]), np.eye(3))
    assert int(src[0]) == 0


def test_fully_behind_dropped():
    tri = jnp.array([[[0.0, 0.0, 0.0, -1.0]] * 3])
    _, valid, _, _ = clip_triangles_near(tri)
    assert not np.asarray(valid).any()


def test_one_vertex_behind_gives_quad():
    """One behind vertex -> two valid triangles forming the clipped quad;
    all output w >= eps; intersection barycentrics mix exactly 2 sources."""
    tri = jnp.array(
        [[[0.0, 0.0, 0.0, -1.0], [1.0, 0.0, 0.5, 1.0], [0.0, 1.0, 0.5, 1.0]]]
    )
    clipped, valid, src, bary = clip_triangles_near(tri)
    assert np.asarray(valid).all()
    assert np.asarray(clipped)[..., 3].min() >= 1e-6
    b = np.asarray(bary)
    # every row is a convex combination of source vertices
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-6)
    assert (b >= -1e-6).all()
    # intersection on edge 0-1 at w=0 -> t = (eps+1)/2 ~ 0.5
    np.testing.assert_allclose(b[0, 0], [0.5, 0.5, 0.0], atol=1e-4)


def test_two_vertices_behind_gives_triangle():
    tri = jnp.array(
        [[[0.0, 0.0, 0.5, 1.0], [1.0, 0.0, 0.0, -1.0], [0.0, 1.0, 0.0, -1.0]]]
    )
    clipped, valid, src, bary = clip_triangles_near(tri)
    np.testing.assert_array_equal(np.asarray(valid), [True, False])
    assert np.asarray(clipped[0])[..., 3].min() >= 1e-6
    # vertex A survives with identity barycentric
    np.testing.assert_allclose(np.asarray(bary[0, 0]), [1, 0, 0], atol=1e-6)


def test_compact_secondary_preserves_output():
    """compact_secondary (r4 perf): compacting the secondary clip half
    into a static cap block keeps exactly the valid slots, in order, with
    identical vertices/src/planes — and counts overflow beyond the cap."""
    from renderer_rs_tpu.ops.clip import (
        clip_triangles_near_planes,
        compact_secondary,
        bary_planes_to_array,
    )

    rng = np.random.default_rng(7)
    t = 64
    # mix of fully-front, fully-behind, and crossing triangles
    w = rng.uniform(-1.0, 2.0, size=(t, 3, 1)).astype(np.float32)
    xyz = rng.normal(size=(t, 3, 3)).astype(np.float32)
    tri = jnp.asarray(np.concatenate([xyz, w], axis=-1))
    clipped, valid, src, planes = clip_triangles_near_planes(tri)
    n_sec = int(np.asarray(valid)[t:].sum())
    assert n_sec > 0, "test scene produced no crossing triangles"

    cap = n_sec + 2  # fits
    c_clip, c_valid, c_src, c_planes, ovf = compact_secondary(
        clipped, valid, src, planes, cap
    )
    assert int(ovf) == 0
    assert c_clip.shape == (t + cap, 3, 4)
    # primaries untouched
    np.testing.assert_array_equal(np.asarray(c_clip[:t]), np.asarray(clipped[:t]))
    # valid secondaries appear in ascending source order with same data
    sec_idx = np.nonzero(np.asarray(valid)[t:])[0]
    got_src = np.asarray(c_src[t:])[np.asarray(c_valid[t:])]
    np.testing.assert_array_equal(got_src, sec_idx)
    np.testing.assert_allclose(
        np.asarray(c_clip[t:])[np.asarray(c_valid[t:])],
        np.asarray(clipped[t:])[np.asarray(valid[t:])],
    )
    b_full = np.asarray(bary_planes_to_array(planes))
    b_comp = np.asarray(bary_planes_to_array(c_planes))
    np.testing.assert_allclose(
        b_comp[t:][np.asarray(c_valid[t:])], b_full[t:][np.asarray(valid[t:])]
    )

    # cap too small -> overflow counted, kept block still valid+ordered
    small = max(1, n_sec - 2)
    _, s_valid, s_src, _, ovf2 = compact_secondary(
        clipped, valid, src, planes, small
    )
    assert int(ovf2) == n_sec - small
    assert int(np.asarray(s_valid)[t:].sum()) == small
    np.testing.assert_array_equal(
        np.asarray(s_src[t:])[np.asarray(s_valid[t:])], sec_idx[:small]
    )


def test_clip_compact_frame_bit_identical():
    """The compacted forward frame is bit-identical to the [2T] layout on
    a near-plane-crossing scene (no overflow)."""
    import os

    from renderer_rs_tpu.app.scenes import _camera_ubo
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.renderer.scene_build import SceneBuilder
    from renderer_rs_tpu.resources.material import Material
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
    from renderer_rs_tpu.scene.camera import Camera, Projection
    from renderer_rs_tpu.utils import meshgen

    w, h = 96, 64
    cam = Camera(Projection.perspective(math.radians(70), w / h, 0.1, 50.0))
    cam.position = np.array([0.0, 1.0, 0.0], np.float32)
    cam.look_at([0.0, 0.0, -4.0])
    builder = SceneBuilder()
    # enough triangles to engage the compaction path (>= 1024) with a
    # ground plane crossing the near plane
    builder.add_mesh(meshgen.uv_sphere_mesh(1.0, 24, 24))
    builder.add_mesh(
        meshgen.plane_mesh(40.0),
        material=Material(base_color=(1.0, 0.2, 0.2, 1.0), roughness=0.9),
    )
    builder.set_camera(_camera_ubo(cam))
    scene, layout = builder.build()
    assert layout.num_triangles >= 1024
    pipe = GraphicsPipelineBuilder().build()

    def run():
        return np.asarray(
            forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, w, h)
        )

    os.environ["RENDERER_CLIP_COMPACT"] = "0"
    try:
        base = run()
    finally:
        del os.environ["RENDERER_CLIP_COMPACT"]
    os.environ["RENDERER_CLIP_COMPACT"] = "8"
    try:
        compact = run()
    finally:
        del os.environ["RENDERER_CLIP_COMPACT"]
    np.testing.assert_array_equal(base, compact)


def test_floor_under_camera_renders():
    """End-to-end: a ground plane extending behind the camera must still
    fill the lower half of the frame (it vanished entirely pre-clipping)."""
    from renderer_rs_tpu.app.scenes import _camera_ubo
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.renderer.scene_build import SceneBuilder
    from renderer_rs_tpu.resources.material import Material
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
    from renderer_rs_tpu.scene.camera import Camera, Projection
    from renderer_rs_tpu.utils import meshgen

    w, h = 96, 64
    cam = Camera(Projection.perspective(math.radians(70), w / h, 0.1, 50.0))
    cam.position = np.array([0.0, 1.0, 0.0], np.float32)
    cam.look_at([0.0, 0.0, -4.0])  # looking forward over the ground
    builder = SceneBuilder()
    builder.add_mesh(
        meshgen.plane_mesh(40.0),
        material=Material(base_color=(1.0, 0.2, 0.2, 1.0), roughness=0.9),
    )
    builder.set_camera(_camera_ubo(cam))
    scene, layout = builder.build()
    pipe = GraphicsPipelineBuilder().build()
    out = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, w, h)
    )
    # bottom rows must be floor (reddish), top rows background
    bottom = out[-4:, :, 0].mean()
    top = out[:4, :, 0].mean()
    assert bottom > 0.1
    assert bottom > 2.0 * top
    # the floor should cover a large fraction of the bottom half
    floor_mask = out[h // 2 :, :, 0] > out[h // 2 :, :, 2]  # red > blue
    assert floor_mask.mean() > 0.9
