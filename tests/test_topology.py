"""Point/line primitive topologies (≙ PrimitiveTopology, pipeline.rs:273-310).

Points and lines ride the scan rasterizer as degenerate index triples
produced by rhi.vertex.expand_topology (the host-side IA stage); coverage
follows Vulkan's point-square / line-rectangle rules.
"""

import math

import numpy as np
import jax.numpy as jnp

from renderer_rs_tpu.ops.raster import (
    gather_triangle_clip,
    rasterize,
    setup_triangles,
)
from renderer_rs_tpu.rhi.pipeline import (
    CullMode,
    GraphicsPipelineBuilder,
    PrimitiveTopology,
)
from renderer_rs_tpu.rhi.vertex import expand_topology


def test_expand_topology_all_modes():
    idx = np.arange(6)
    pts = expand_topology(idx[:3], PrimitiveTopology.POINT_LIST)
    np.testing.assert_array_equal(pts, [[0, 0, 0], [1, 1, 1], [2, 2, 2]])
    ll = expand_topology(idx[:4], PrimitiveTopology.LINE_LIST)
    np.testing.assert_array_equal(ll, [[0, 1, 1], [2, 3, 3]])
    ls = expand_topology(idx[:4], PrimitiveTopology.LINE_STRIP)
    np.testing.assert_array_equal(ls, [[0, 1, 1], [1, 2, 2], [2, 3, 3]])
    tl = expand_topology(idx, PrimitiveTopology.TRIANGLE_LIST)
    np.testing.assert_array_equal(tl, [[0, 1, 2], [3, 4, 5]])
    ts = expand_topology(idx[:5], PrimitiveTopology.TRIANGLE_STRIP)
    # odd triangles swap the first two indices to preserve winding
    np.testing.assert_array_equal(ts, [[0, 1, 2], [2, 1, 3], [2, 3, 4]])
    tf = expand_topology(idx[:5], PrimitiveTopology.TRIANGLE_FAN)
    np.testing.assert_array_equal(tf, [[0, 1, 2], [0, 2, 3], [0, 3, 4]])


def _ndc_clip(points):
    """[N,3] NDC -> [N,4] clip with w=1."""
    p = np.asarray(points, np.float32)
    return jnp.asarray(np.concatenate([p, np.ones((p.shape[0], 1), np.float32)], -1))


def test_point_list_rasterizes_single_pixels():
    h, w = 16, 32
    # NDC so that screen = ((ndc+1)/2)*extent: place points at pixel (8, 4)
    # center and at (20, 10)
    pts = np.array(
        [
            [(8.5 / w) * 2 - 1, (4.5 / h) * 2 - 1, 0.25],
            [(20.5 / w) * 2 - 1, (10.5 / h) * 2 - 1, 0.5],
        ],
        np.float32,
    )
    clip = _ndc_clip(pts)
    tris = jnp.asarray(expand_topology(np.arange(2), PrimitiveTopology.POINT_LIST))
    pipe = (
        GraphicsPipelineBuilder()
        .topology(PrimitiveTopology.POINT_LIST)
        .cull_mode(CullMode.NONE)
        .build()
    )
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vis = rasterize(setup, h, w, pipe)
    tid = np.asarray(vis.tri_id)
    assert tid[4, 8] == 0
    assert tid[10, 20] == 1
    assert (tid >= 0).sum() == 2  # exactly one pixel per point
    np.testing.assert_allclose(np.asarray(vis.depth)[4, 8], 0.25, atol=1e-6)


def test_line_list_rasterizes_segment():
    h, w = 16, 64
    # horizontal segment along row 8 from x=4 to x=40 at depth 0.2->0.6
    a = [(4.0 / w) * 2 - 1, (8.5 / h) * 2 - 1, 0.2]
    b = [(40.0 / w) * 2 - 1, (8.5 / h) * 2 - 1, 0.6]
    clip = _ndc_clip([a, b])
    tris = jnp.asarray(expand_topology(np.arange(2), PrimitiveTopology.LINE_LIST))
    pipe = (
        GraphicsPipelineBuilder()
        .topology(PrimitiveTopology.LINE_LIST)
        .cull_mode(CullMode.NONE)
        .build()
    )
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vis = rasterize(setup, h, w, pipe)
    tid = np.asarray(vis.tri_id)
    row = tid[8]
    assert (row >= 0).sum() >= 34  # ~36 pixels of the segment covered
    assert (tid[np.arange(h) != 8] >= 0).sum() == 0  # only row 8
    # depth interpolates along the segment
    d = np.asarray(vis.depth)[8]
    covered = np.where(row >= 0)[0]
    assert d[covered[0]] < d[covered[-1]]
    # barycentric b0 = 1-s at the start, ~0 near the end
    bar = np.asarray(vis.bary)[8]
    assert bar[covered[0], 0] > 0.9
    assert bar[covered[-1], 0] < 0.15


def test_line_strip_end_to_end_frame():
    """A LINE_STRIP draw through forward_frame (FLAT shading): the strip's
    pixels light up with interpolated vertex colors."""
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.renderer.scene_build import SceneBuilder
    from renderer_rs_tpu.resources.model import Mesh

    w, h = 64, 48
    # a V-shaped strip across the screen in NDC (w=1)
    pos = np.array(
        [[-0.8, -0.5, 0.3], [0.0, 0.5, 0.3], [0.8, -0.5, 0.3]], np.float32
    )
    n = pos.shape[0]
    mesh = Mesh(
        positions=pos,
        normals=np.tile(np.array([[0, 0, 1]], np.float32), (n, 1)),
        tex_coords=np.zeros((n, 2), np.float32),
        tangents=np.tile(np.array([[1, 0, 0, 1]], np.float32), (n, 1)),
        indices=expand_topology(
            np.arange(n), PrimitiveTopology.LINE_STRIP
        ).reshape(-1),
        colors=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32),
    )
    builder = SceneBuilder()
    builder.add_mesh(mesh)
    scene, layout = builder.build()
    pipe = (
        GraphicsPipelineBuilder()
        .topology(PrimitiveTopology.LINE_STRIP)
        .cull_mode(CullMode.NONE)
        .line_width(1.5)
        .build()
    )
    out = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.FLAT, w, h)
    )
    assert np.isfinite(out).all()
    bg = out[0, 0]
    lit = np.abs(out - bg).sum(-1) > 0.05
    assert lit.sum() > 40  # the strip is visible
    # left arm trends red, right arm trends blue
    left = out[:, : w // 3][lit[:, : w // 3]]
    right = out[:, 2 * w // 3 :][lit[:, 2 * w // 3 :]]
    assert left[:, 0].mean() > left[:, 2].mean()
    assert right[:, 2].mean() > right[:, 0].mean()
