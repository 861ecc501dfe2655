"""Binned-rasterizer equivalence tests: the fast path must match the exact
sequential scan bit-for-bit on coverage and winners (LESS semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.ops.raster import (
    gather_triangle_clip,
    rasterize,
    setup_triangles,
)
from renderer_rs_tpu.ops.raster_binned import (
    bin_triangles,
    rasterize_binned,
    supports_binned,
)
from renderer_rs_tpu.rhi.pipeline import (
    ColorBlendAttachment,
    CompareOp,
    CullMode,
    GraphicsPipelineBuilder,
)


def _random_scene(t=200, seed=0):
    """Random triangles in NDC with random depth."""
    rng = np.random.default_rng(seed)
    center = rng.uniform(-1.1, 1.1, (t, 1, 3)).astype(np.float32)
    offset = rng.uniform(-0.25, 0.25, (t, 3, 3)).astype(np.float32)
    pos = center + offset
    pos[..., 2] = rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32)
    clip = np.concatenate([pos, np.ones((t, 3, 1), np.float32)], -1)
    return jnp.asarray(clip.reshape(t * 3, 4)), jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3)


def _compare(pipe, h=96, w=160, t=200, seed=0, **binned_kw):
    clip, tris = _random_scene(t, seed)
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vis_scan = rasterize(setup, h, w, pipe)
    vis_bin = rasterize_binned(setup, h, w, pipe, **binned_kw)
    np.testing.assert_array_equal(
        np.asarray(vis_scan.tri_id), np.asarray(vis_bin.tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(vis_scan.depth), np.asarray(vis_bin.depth)
    )
    cov = np.asarray(vis_scan.covered)
    np.testing.assert_allclose(
        np.asarray(vis_scan.bary)[cov], np.asarray(vis_bin.bary)[cov], atol=0
    )


def test_binned_matches_scan_less():
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    _compare(pipe)


def test_binned_matches_scan_greater():
    pipe = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_compare_op(CompareOp.GREATER)
        .build()
    )
    clip, tris = _random_scene(150, seed=3)
    h, w = 96, 160
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    depth0 = jnp.zeros((h, w), jnp.float32)
    vis_scan = rasterize(setup, h, w, pipe, depth_init=depth0)
    vis_bin = rasterize_binned(setup, h, w, pipe, depth_init=depth0)
    np.testing.assert_array_equal(
        np.asarray(vis_scan.tri_id), np.asarray(vis_bin.tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(vis_scan.depth), np.asarray(vis_bin.depth)
    )


def test_binned_matches_with_culling():
    pipe = GraphicsPipelineBuilder().build()  # cull back
    _compare(pipe, seed=7)


def test_binned_small_tiles_and_chunks():
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    _compare(pipe, t=64, seed=1, tile_h=16, tile_w=128, cap=64, chunk=8)


def test_binned_nondivisible_resolution():
    """Resolutions not divisible by the tile size stitch correctly."""
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    _compare(pipe, h=75, w=133, t=80, seed=5)


def test_bin_triangles_counts():
    """A triangle covering one tile appears in exactly that tile's list."""
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    # small tri centered in tile (0,0): pixels ~(16,16) of a 64x256 image
    clip = jnp.asarray(
        [[[-0.9, -0.6, 0.5, 1.0], [-0.85, -0.6, 0.5, 1.0], [-0.875, -0.5, 0.5, 1.0]]],
        jnp.float32,
    )
    setup = setup_triangles(clip, 256, 64, pipe)
    tri_idx, counts, nty, ntx = bin_triangles(setup, 64, 256, 32, 128, 16)
    counts = np.asarray(counts).reshape(nty, ntx)
    assert counts.sum() == 1
    assert counts[0, 0] == 1


def test_supports_binned_rules():
    opaque = GraphicsPipelineBuilder().build()
    assert supports_binned(opaque, 1000)
    assert not supports_binned(opaque, 10)  # small scenes: scan is fine
    blend = (
        GraphicsPipelineBuilder()
        .blend_attachment(ColorBlendAttachment.alpha_blend())
        .build()
    )
    assert not supports_binned(blend, 1000)
    no_depth = (
        GraphicsPipelineBuilder()
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )
    assert not supports_binned(no_depth, 1000)
    eq = GraphicsPipelineBuilder().depth_compare_op(CompareOp.EQUAL).build()
    assert not supports_binned(eq, 1000)


def test_binned_jits():
    """The binned path compiles under jit (static shapes only)."""
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    clip, tris = _random_scene(100, seed=2)

    @jax.jit
    def run(clip):
        setup = setup_triangles(gather_triangle_clip(clip, tris), 128, 96, pipe)
        return rasterize_binned(setup, 96, 128, pipe)

    vis = run(clip)
    assert vis.tri_id.shape == (96, 128)


def test_sorted_binning_matches_dense():
    """Sort-based binning produces identical lists/counts to dense binning,
    including oversized triangles routed through the big-list path."""
    from renderer_rs_tpu.ops.raster_binned import bin_triangles_dense

    clip, tris = _random_scene(300, seed=11)
    # add a huge floor-like triangle spanning many tiles (big path)
    big = jnp.array(
        [[-1.0, -1.0, 0.9, 1.0], [1.0, -1.0, 0.9, 1.0], [0.0, 1.0, 0.9, 1.0]],
        jnp.float32,
    )
    clip = jnp.concatenate([clip, big])
    tris = jnp.concatenate(
        [tris, jnp.array([[900, 901, 902]], jnp.int32)]
    )
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 160, 384
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    idx_s, cnt_s, nty, ntx = bin_triangles(setup, h, w, 32, 128, 256)
    idx_d, cnt_d, _, _ = bin_triangles_dense(setup, h, w, 32, 128, 256)
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_d))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_d))


def test_sorted_binning_big_overflow_falls_back_to_dense():
    """More oversized triangles than the big side list holds (cap_big) must
    not drop any of them — the lax.cond fallback routes the whole frame
    through dense binning (round-1 advisor finding: 100 tall triangles lost
    entries vs dense)."""
    from renderer_rs_tpu.ops.raster_binned import bin_triangles_dense

    rng = np.random.default_rng(13)
    t = 100
    # tall skinny triangles spanning the full NDC height -> every one exceeds
    # the 2-tile row span -> all 100 go to the big path (> cap_big=64)
    x = rng.uniform(-1.0, 1.0, (t, 1)).astype(np.float32)
    pos = np.zeros((t, 3, 3), np.float32)
    pos[:, 0, 0] = x[:, 0] - 0.01
    pos[:, 1, 0] = x[:, 0] + 0.01
    pos[:, 2, 0] = x[:, 0]
    pos[:, 0, 1] = -1.0
    pos[:, 1, 1] = -1.0
    pos[:, 2, 1] = 1.0
    pos[..., 2] = rng.uniform(0.1, 0.9, (t, 3)).astype(np.float32)
    clip = jnp.asarray(
        np.concatenate([pos, np.ones((t, 3, 1), np.float32)], -1)
    )
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 192, 384
    setup = setup_triangles(clip, w, h, pipe)
    idx_s, cnt_s, _, _ = bin_triangles(setup, h, w, 32, 128, 128)
    idx_d, cnt_d, _, _ = bin_triangles_dense(setup, h, w, 32, 128, 128)
    assert int(np.asarray(cnt_d).sum()) > 0
    np.testing.assert_array_equal(np.asarray(cnt_s), np.asarray(cnt_d))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_d))

    # and the rasterized image still matches the scan oracle
    vis_scan = rasterize(setup, h, w, pipe)
    vis_bin = rasterize_binned(setup, h, w, pipe)
    np.testing.assert_array_equal(
        np.asarray(vis_scan.tri_id), np.asarray(vis_bin.tri_id)
    )


def test_compact_binning_matches_dense_membership():
    """bin_triangles_compact: per-bin segments hold EXACTLY the dense
    overlap membership in ascending id order — across all three expansion
    classes (small spans, big spans, screen-filling huge)."""
    import numpy as np

    from renderer_rs_tpu.ops.raster_binned import (
        bin_triangles_compact,
        bin_triangles_dense,
    )

    rng = np.random.default_rng(11)
    t = 160
    # mix of sizes: small tris, some wide/tall, and two full-screen quads
    center = rng.uniform(0.0, 1.0, (t, 1, 2)).astype(np.float32)
    size = rng.uniform(0.005, 0.4, (t, 1, 1)).astype(np.float32)
    off = rng.uniform(-1.0, 1.0, (t, 3, 2)).astype(np.float32) * size
    xy = (center + off) * np.array([256.0, 96.0], np.float32)
    xy[-2] = [[-10, -10], [400, -10], [-10, 300]]  # huge
    xy[-1] = [[400, 300], [400, -10], [-10, 300]]
    z = rng.uniform(0.1, 0.9, (t, 3)).astype(np.float32)
    from renderer_rs_tpu.ops.raster import TriangleSetup

    area2 = (
        (xy[:, 1, 0] - xy[:, 0, 0]) * (xy[:, 2, 1] - xy[:, 0, 1])
        - (xy[:, 1, 1] - xy[:, 0, 1]) * (xy[:, 2, 0] - xy[:, 0, 0])
    )
    setup = TriangleSetup(
        xy=jnp.asarray(xy), z=jnp.asarray(z), w=jnp.ones((t, 3), jnp.float32),
        area2=jnp.asarray(area2), valid=jnp.asarray(area2 != 0.0),
    )
    h, w, bh, bw = 96, 256, 16, 128
    sorted_tris, seg, nby, nbx, overflow = bin_triangles_compact(
        setup, h, w, bh, bw
    )
    assert int(overflow.sum()) == 0
    tri_dense, counts, _, _ = bin_triangles_dense(setup, h, w, bh, bw, cap=t)
    st = np.asarray(sorted_tris)
    seg = np.asarray(seg)
    td = np.asarray(tri_dense)
    cd = np.asarray(counts)
    for b in range(nby * nbx):
        got = st[seg[b] : seg[b + 1]]
        want = td[b][: cd[b]]
        np.testing.assert_array_equal(got, want, err_msg=f"bin {b}")

def test_binned_le_ties_resolve_last_submitted():
    """Equal-depth LESS_OR_EQUAL ties pick the LAST submitted fragment
    (Vulkan: an equal fragment re-passes `<=` and overwrites), matching the
    scan oracle bit-for-bit. Duplicated triangles tie at every covered
    pixel, so every winner must be the second copy."""
    pipe = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_compare_op(CompareOp.LESS_OR_EQUAL)
        .build()
    )
    clip, tris = _random_scene(30, seed=11)
    tris2 = jnp.concatenate([tris, tris], axis=0)  # exact coplanar twins
    h, w = 96, 160
    setup = setup_triangles(gather_triangle_clip(clip, tris2), w, h, pipe)
    vis_scan = rasterize(setup, h, w, pipe)
    vis_bin = rasterize_binned(setup, h, w, pipe)
    np.testing.assert_array_equal(
        np.asarray(vis_scan.tri_id), np.asarray(vis_bin.tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(vis_scan.depth), np.asarray(vis_bin.depth)
    )
    ids = np.asarray(vis_bin.tri_id)
    assert ids.max() >= 30
    assert (ids[ids >= 0] >= 30).all()
