"""Rasterizer tests: the Hello Triangle acceptance path + fill-rule invariants.

The acceptance criterion from SURVEY.md §7 step 2: Hello Triangle,
clip-space passthrough + flat color interp (vertex/triangle.hlsl:16-22,
pixel/triangle.hlsl:10-13), on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.ops.raster import (
    VisibilityBuffer,
    gather_triangle_clip,
    interpolate,
    perspective_bary,
    rasterize,
    rasterize_depth_only,
    rasterize_ordered,
    setup_triangles,
    shade_visibility,
)
from renderer_rs_tpu.rhi.pipeline import (
    ColorBlendAttachment,
    CompareOp,
    CullMode,
    FrontFace,
    GraphicsPipelineBuilder,
)

# The reference's Hello Triangle (renderer.rs:242-246): clip-space positions,
# top red / bottom-left green / bottom-right blue. Vulkan NDC y-down: -0.5 is
# the top. The pipeline disables culling and depth (renderer.rs:235-237).
TRI_POS = jnp.array(
    [[0.0, -0.5, 0.0], [-0.5, 0.5, 0.0], [0.5, 0.5, 0.0]], jnp.float32
)
TRI_COL = jnp.array(
    [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
)
TRIS = jnp.array([[0, 1, 2]], jnp.int32)


def _clip_passthrough(pos3):
    """≙ vertex/triangle.hlsl:16-22: float4(position, 1.0)."""
    n = pos3.shape[0]
    return jnp.concatenate([pos3, jnp.ones((n, 1), jnp.float32)], axis=-1)


def _triangle_pipeline():
    return (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )


def _raster_triangle(w=80, h=60):
    clip = _clip_passthrough(TRI_POS)
    setup = setup_triangles(gather_triangle_clip(clip, TRIS), w, h, _triangle_pipeline())
    return setup, rasterize(setup, h, w, _triangle_pipeline())


def test_hello_triangle_coverage_shape():
    """Triangle apex is up; covered region widens toward the bottom."""
    _, vis = _raster_triangle()
    cov = np.asarray(vis.covered)
    assert cov.shape == (60, 80)
    # center of the triangle is covered
    assert cov[40, 40]
    # apex row (just below y=-0.5 -> row 15) narrow; near-bottom row wide
    assert cov[16].sum() < cov[43].sum()
    # above the apex: empty
    assert cov[:14].sum() == 0
    # bottom edge at ndc y=0.5 -> row 45; below that: empty
    assert cov[46:].sum() == 0
    # corners never covered
    assert not cov[0, 0] and not cov[59, 79]


def test_hello_triangle_color_interpolation():
    """Vertex colors interpolate; center pixel ~ (1/3,1/3,1/3)."""
    setup, vis = _raster_triangle()
    bary3 = perspective_bary(vis, setup)
    color = interpolate(vis, TRIS, TRI_COL, bary3)
    # centroid in screen space: x=0, y=(-0.5+0.5+0.5)/3=1/6 -> px=40, py=35
    c = np.asarray(color[35, 40])
    np.testing.assert_allclose(c, [1 / 3, 1 / 3, 1 / 3], atol=0.05)
    # near the apex: red dominates
    c_apex = np.asarray(color[17, 40])
    assert c_apex[0] > 0.8


def test_hello_triangle_background_composite():
    """Clear color composite (renderer.rs:479-501 clears to 0.1,0.1,0.15)."""
    setup, vis = _raster_triangle()
    bary3 = perspective_bary(vis, setup)
    rgb = interpolate(vis, TRIS, TRI_COL, bary3)
    rgba = jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1)
    bg = jnp.broadcast_to(jnp.array([0.1, 0.1, 0.15, 1.0]), rgba.shape)
    out = shade_visibility(vis, rgba, bg)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0.1, 0.1, 0.15, 1.0], atol=1e-6)
    assert np.asarray(out)[40, 40, 0] > 0.05


def test_watertight_shared_edge():
    """Two triangles sharing a diagonal cover every quad pixel exactly once
    (top-left fill rule) — the watertightness property SURVEY.md §7 demands."""
    quad = jnp.array(
        [[-0.8, -0.8, 0.0], [0.8, -0.8, 0.0], [0.8, 0.8, 0.0], [-0.8, 0.8, 0.0]],
        jnp.float32,
    )
    tris = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    clip = _clip_passthrough(quad)
    pipe = _triangle_pipeline()
    w, h = 64, 64
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    # rasterize each triangle alone and check disjoint+complete coverage
    setup0 = jax.tree.map(lambda a: a[:1], setup)
    setup1 = jax.tree.map(lambda a: a[1:], setup)
    cov0 = np.asarray(rasterize(setup0, h, w, pipe).covered)
    cov1 = np.asarray(rasterize(setup1, h, w, pipe).covered)
    both = rasterize(setup, h, w, pipe)
    cov_all = np.asarray(both.covered)

    assert not np.any(cov0 & cov1), "shared-edge pixels covered twice"
    np.testing.assert_array_equal(cov0 | cov1, cov_all)
    # interior fully covered: (±0.8 NDC over 64px -> px 6.4..57.6)
    assert cov_all[32, 7:57].all()


def test_depth_test_less():
    """Nearer triangle wins regardless of submission order (CompareOp::Less,
    pipeline.rs:679)."""
    pos = jnp.array(
        [
            # far triangle (z=0.8), big
            [0.0, -0.9, 0.8], [-0.9, 0.9, 0.8], [0.9, 0.9, 0.8],
            # near triangle (z=0.2), small
            [0.0, -0.4, 0.2], [-0.4, 0.4, 0.2], [0.4, 0.4, 0.2],
        ],
        jnp.float32,
    )
    tris = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    clip = _clip_passthrough(pos)
    w = h = 64
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vis = rasterize(setup, h, w, pipe)
    tid = np.asarray(vis.tri_id)
    assert tid[32, 32] == 1  # center: near triangle
    assert tid[60, 32] == 0  # bottom: only far triangle
    assert np.asarray(vis.depth)[32, 32] == np.float32(0.2)

    # reversed submission order: same result for LESS
    tris_rev = jnp.array([[3, 4, 5], [0, 1, 2]], jnp.int32)
    setup_rev = setup_triangles(gather_triangle_clip(clip, tris_rev), w, h, pipe)
    vis_rev = rasterize(setup_rev, h, w, pipe)
    assert np.asarray(vis_rev.tri_id)[32, 32] == 0
    assert np.asarray(vis_rev.depth)[32, 32] == np.float32(0.2)


def test_backface_culling():
    """Vulkan facing rule: a = -(1/2)·shoelace in framebuffer coords, CCW
    front ⇔ a > 0. The Hello Triangle (top, bottom-left, bottom-right) is
    front-facing: it survives the default cull-Back pipeline; its flipped
    winding is culled; under a CLOCKWISE front-face it is culled too."""
    clip = _clip_passthrough(TRI_POS)
    pipe_cull = (
        GraphicsPipelineBuilder()
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )
    setup = setup_triangles(gather_triangle_clip(clip, TRIS), 64, 64, pipe_cull)
    vis = rasterize(setup, 64, 64, pipe_cull)
    front_cov = np.asarray(vis.covered).sum()
    assert front_cov > 0

    # flipped winding -> back-facing -> culled
    tris_flipped = jnp.array([[0, 2, 1]], jnp.int32)
    setup2 = setup_triangles(
        gather_triangle_clip(clip, tris_flipped), 64, 64, pipe_cull
    )
    vis2 = rasterize(setup2, 64, 64, pipe_cull)
    assert np.asarray(vis2.covered).sum() == 0

    # CLOCKWISE front face inverts the decision
    pipe_cw = (
        GraphicsPipelineBuilder()
        .front_face(FrontFace.CLOCKWISE)
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )
    setup3 = setup_triangles(gather_triangle_clip(clip, TRIS), 64, 64, pipe_cw)
    vis3 = rasterize(setup3, 64, 64, pipe_cw)
    assert np.asarray(vis3.covered).sum() == 0
    # and accepts the flipped winding
    setup4 = setup_triangles(
        gather_triangle_clip(clip, tris_flipped), 64, 64, pipe_cw
    )
    vis4 = rasterize(setup4, 64, 64, pipe_cw)
    assert np.asarray(vis4.covered).sum() == front_cov


def test_near_plane_triangle_dropped():
    """Triangles with any w<=0 vertex are dropped whole (documented limitation)."""
    pos = jnp.array(
        [[0.0, -0.5, 0.0, 1.0], [-0.5, 0.5, 0.0, 1.0], [0.5, 0.5, 0.0, -0.1]],
        jnp.float32,
    )
    pipe = _triangle_pipeline()
    setup = setup_triangles(pos[None], 32, 32, pipe)
    assert not bool(np.asarray(setup.valid)[0])


def test_depth_only_matches_full_raster():
    """Shadow-pass depth equals the full rasterizer's depth buffer."""
    pos = jnp.array(
        [[0.0, -0.9, 0.3], [-0.9, 0.9, 0.6], [0.9, 0.9, 0.9]], jnp.float32
    )
    tris = jnp.array([[0, 1, 2]], jnp.int32)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    clip = _clip_passthrough(pos)
    setup = setup_triangles(gather_triangle_clip(clip, tris), 48, 48, pipe)
    vis = rasterize(setup, 48, 48, pipe)
    depth = rasterize_depth_only(setup, 48, 48, pipe)
    np.testing.assert_array_equal(np.asarray(vis.depth), np.asarray(depth))


def test_perspective_correct_interpolation():
    """A varying on a perspective-foreshortened triangle interpolates
    hyperbolically: at the screen-space midpoint of an edge whose endpoints
    have w=1 and w=3, the attribute weight of the near vertex is 3/4."""
    # Vertical edge from near (w=1) to far (w=3) — build clip coords directly.
    # v0 near bottom (y=+0.5*w0), v1 far top, v2 off to the right.
    clip = jnp.array(
        [
            [0.0, 0.5, 0.5, 1.0],     # near, screen y=+0.5
            [0.0, -1.5, 1.5, 3.0],    # far,  ndc y=-0.5
            [2.0, 0.5, 0.5, 1.0],     # right, ndc x=+2 (offscreen but fine)
        ],
        jnp.float32,
    )
    tris = jnp.array([[0, 1, 2]], jnp.int32)
    attr = jnp.array([[1.0], [0.0], [0.0]], jnp.float32)  # 1 at near vertex
    pipe = _triangle_pipeline()
    h = w = 64
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vis = rasterize(setup, h, w, pipe)
    bary3 = perspective_bary(vis, setup)
    vals = interpolate(vis, tris, attr, bary3)
    # screen midpoint of edge v0-v1: ndc (0,0) -> pixel (32,32); sample just
    # inside the triangle at x=33
    v = float(np.asarray(vals)[32, 33, 0])
    # perspective-correct weight of near vertex at screen midpoint:
    # (0.5/1)/((0.5/1)+(0.5/3)) = 0.75 (± half-pixel sampling offset).
    # A screen-linear (incorrect) interpolation would give 0.5 here.
    assert abs(v - 0.75) < 0.04, v


def test_rasterize_ordered_alpha_blend():
    """Translucent pipeline: src-over compositing in submission order."""
    pos = jnp.array(
        [[0.0, -0.8, 0.5], [-0.8, 0.8, 0.5], [0.8, 0.8, 0.5]], jnp.float32
    )
    tris = jnp.array([[0, 1, 2]], jnp.int32)
    pipe = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .blend_attachment(ColorBlendAttachment.alpha_blend())
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )
    clip = _clip_passthrough(pos)
    h = w = 32
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    red_half = jnp.array([1.0, 0.0, 0.0, 0.5], jnp.float32)

    def frag(t, bary3, mask):
        return jnp.broadcast_to(red_half, (h, w, 4))

    bg = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32), (h, w, 4))
    color, _ = rasterize_ordered(setup, h, w, pipe, frag, bg)
    c = np.asarray(color)[20, 16]
    np.testing.assert_allclose(c[:3], [0.5, 0.0, 0.5], atol=1e-5)
    c_bg = np.asarray(color)[0, 0]
    np.testing.assert_allclose(c_bg, [0.0, 0.0, 1.0, 1.0], atol=1e-6)


def test_compare_op_semantics():
    """GREATER inverts the winner; ALWAYS takes the last submitted; NEVER none."""
    pos = jnp.array(
        [
            [0.0, -0.9, 0.8], [-0.9, 0.9, 0.8], [0.9, 0.9, 0.8],
            [0.0, -0.9, 0.2], [-0.9, 0.9, 0.2], [0.9, 0.9, 0.2],
        ],
        jnp.float32,
    )
    tris = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    clip = _clip_passthrough(pos)

    def run(op, depth_init=None):
        pipe = (
            GraphicsPipelineBuilder()
            .cull_mode(CullMode.NONE)
            .depth_compare_op(op)
            .build()
        )
        setup = setup_triangles(gather_triangle_clip(clip, tris), 32, 32, pipe)
        return rasterize(setup, 32, 32, pipe, depth_init=depth_init)

    assert np.asarray(run(CompareOp.LESS).tri_id)[16, 16] == 1
    # GREATER never passes against the 1.0 clear; seed the buffer at 0.
    vis_g = run(CompareOp.GREATER, depth_init=jnp.zeros((32, 32), jnp.float32))
    assert np.asarray(vis_g.tri_id)[16, 16] == 0  # z=0.8 > 0.2: far one wins
    assert np.asarray(run(CompareOp.ALWAYS).tri_id)[16, 16] == 1  # last drawn
    assert np.asarray(run(CompareOp.NEVER).tri_id)[16, 16] == -1


def test_visibility_buffer_is_pytree():
    """VisibilityBuffer flows through jit/tree ops (flax struct)."""
    vis = VisibilityBuffer(
        tri_id=jnp.zeros((4, 4), jnp.int32),
        depth=jnp.ones((4, 4)),
        bary=jnp.zeros((4, 4, 2)),
    )
    leaves = jax.tree.leaves(vis)
    assert len(leaves) == 3
