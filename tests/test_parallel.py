"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the frame x rows SPMD decomposition produces bit-identical
images to single-device rendering (the reference has no analog — this is
the rebuild's scale-out path, SURVEY.md §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.app.scenes import blinnphong_scene
from renderer_rs_tpu.parallel import (
    make_device_mesh,
    render_frame_sharded,
    stack_scenes,
)
from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

W, H = 64, 48


@pytest.fixture(scope="module")
def small_scene():
    # tiny sphere scene (few hundred tris) for fast CPU SPMD checks
    scene, layout, kwargs, _ = blinnphong_scene(W, H, rings=6, sectors=8)
    return scene, layout


def test_mesh_shapes():
    mesh = make_device_mesh(8)
    assert mesh.shape == {"frame": 2, "rows": 4}
    mesh1 = make_device_mesh(4, frame_axis=1)
    assert mesh1.shape == {"frame": 1, "rows": 4}
    with pytest.raises(ValueError):
        make_device_mesh(6, frame_axis=4)


def test_sharded_matches_single_device(small_scene):
    scene, layout = small_scene
    pipe = GraphicsPipelineBuilder().build()

    ref = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, W, H)
    )

    mesh = make_device_mesh(8)  # frame=2, rows=4
    stacked = stack_scenes([scene, scene])
    out = render_frame_sharded(
        stacked, layout, pipe, ShadingModel.BLINN_PHONG, W, H, mesh
    )
    out = np.asarray(out)
    assert out.shape == (2, H, W, 4)
    np.testing.assert_array_equal(out[0], ref)
    np.testing.assert_array_equal(out[1], ref)


def test_sharded_output_sharding(small_scene):
    """The result is born sharded over (frame, rows) — no full-image gather."""
    scene, layout = small_scene
    pipe = GraphicsPipelineBuilder().build()
    mesh = make_device_mesh(8)
    stacked = stack_scenes([scene, scene])
    out = render_frame_sharded(
        stacked, layout, pipe, ShadingModel.BLINN_PHONG, W, H, mesh
    )
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, H // 4, W, 4)}


def test_rows_only_mesh(small_scene):
    scene, layout = small_scene
    pipe = GraphicsPipelineBuilder().build()
    mesh = make_device_mesh(8, frame_axis=1)
    stacked = stack_scenes([scene])
    out = render_frame_sharded(
        stacked, layout, pipe, ShadingModel.BLINN_PHONG, W, H, mesh
    )
    ref = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, W, H)
    )
    np.testing.assert_array_equal(np.asarray(out)[0], ref)


def test_band_rendering_matches_full():
    """forward_frame band slices stitch to the full frame (single device)."""
    scene, layout, _, _ = blinnphong_scene(W, H, rings=5, sectors=6)
    pipe = GraphicsPipelineBuilder().build()
    full = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, W, H)
    )
    bands = [
        np.asarray(
            forward_frame(
                scene, layout, pipe, ShadingModel.BLINN_PHONG, W, H,
                band=(jnp.int32(y0), H // 4),
            )
        )
        for y0 in range(0, H, H // 4)
    ]
    np.testing.assert_array_equal(np.concatenate(bands, axis=0), full)


def test_band_binned_matches_scan_path():
    """The band fast path (binned rasterizer with y_offset/y_stride) is
    bit-identical to the scan rasterizer's band output — contiguous AND
    interleaved (VERDICT r2 item 3: multi-chip must not pay the O(T) scan)."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near
    from renderer_rs_tpu.ops.raster import (
        gather_triangle_clip,
        rasterize,
        setup_triangles,
    )
    from renderer_rs_tpu.ops.raster_binned import rasterize_binned
    from renderer_rs_tpu.renderer.passes import vertex_stage

    scene, layout, _, _ = blinnphong_scene(W, H, rings=6, sectors=8)
    pipe = GraphicsPipelineBuilder().build()
    vs = vertex_stage(scene, layout)
    tri_clip = gather_triangle_clip(vs.clip, scene.tris)
    tri_clip, clip_valid, _, _ = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip, W, H, pipe, tri_valid=clip_valid)

    for band in [(jnp.int32(12), 12), (jnp.int32(2), 12, 4), (0, H)]:
        y0 = band[0]
        bh = band[1]
        stride = band[2] if len(band) > 2 else 1
        ref = rasterize(setup, bh, W, pipe, y_offset=y0, y_stride=stride)
        out = rasterize_binned(
            setup, bh, W, pipe, cap=256, y_offset=y0, y_stride=stride
        )
        np.testing.assert_array_equal(np.asarray(out.tri_id), np.asarray(ref.tri_id))
        np.testing.assert_array_equal(np.asarray(out.depth), np.asarray(ref.depth))
        np.testing.assert_array_equal(np.asarray(out.bary), np.asarray(ref.bary))


def test_msaa_sharded_matches_single_chip(small_scene, monkeypatch):
    """8-device MSAA render == single-chip MSAA bit-for-bit (VERDICT r2
    item 7): supersampled bands render sharded, box-resolve after stitch.

    Sharded MSAA keeps SUPERSAMPLING semantics (each device renders
    unresolved supersampled band rows — the r5 shade-once resolve mode
    is a full-frame path), so the single-chip reference pins
    RENDERER_MSAA=super."""
    from renderer_rs_tpu.parallel import resolve_msaa, unshard_rows

    scene, layout = small_scene
    pipe = GraphicsPipelineBuilder().msaa_samples(4).build()
    monkeypatch.setenv("RENDERER_MSAA", "super")
    ref = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, W, H)
    )
    mesh = make_device_mesh(8)  # frame=2, rows=4
    stacked = stack_scenes([scene, scene])
    out = render_frame_sharded(
        stacked, layout, pipe, ShadingModel.BLINN_PHONG, W, H, mesh,
        interleaved=True,
    )
    assert out.shape == (2, H * 2, W * 2, 4)  # unresolved supersampled rows
    resolved = np.asarray(resolve_msaa(unshard_rows(out, 4, True), 4))
    assert resolved.shape == (2, H, W, 4)
    np.testing.assert_array_equal(resolved[0], ref)
    np.testing.assert_array_equal(resolved[1], ref)


def test_sharded_flagship_ibl_csm_matches_single_device(monkeypatch):
    """The FLAGSHIP shading combination survives sharding (VERDICT r3 item
    4): textured PBR + full IBL ambient + 4-cascade CSM + skybox + ACES
    (≙ model_pbr_ibl_csm.hlsl:118-292) renders bit-identically over the
    8-device mesh with interleaved load-balanced rows at 128x128.

    The y-half accelerations (PCF / cube radiance) are FULL-FRAME-only
    knobs — band shards keep exact per-pixel semantics by design — so the
    comparison pins the exact modes on both sides."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.parallel.tile_shard import unshard_rows

    monkeypatch.setenv("RENDERER_CUBE_RES", "full")
    monkeypatch.setenv("RENDERER_PCF_RES", "full")

    w, h = 128, 128
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=900, ibl=True, csm=True, textured=True
    )
    assert layout.has_csm and layout.has_environment and layout.has_textures
    pipe = GraphicsPipelineBuilder().build()
    ref = np.asarray(
        forward_frame(
            scene, layout, pipe, kwargs["shading"], w, h,
            tonemap="aces", shadow_map_size=128,
            shadow_params=kwargs["shadow_params"],
        )
    )
    mesh = make_device_mesh(8)  # frame=2, rows=4
    stacked = stack_scenes([scene, scene])
    out = render_frame_sharded(
        stacked, layout, pipe, kwargs["shading"], w, h, mesh,
        interleaved=True, tonemap="aces", shadow_map_size=128,
        shadow_params=kwargs["shadow_params"],
    )
    out = np.asarray(unshard_rows(out, 4, True))
    assert out.shape == (2, h, w, 4)
    np.testing.assert_array_equal(out[0], ref)
    np.testing.assert_array_equal(out[1], ref)


def test_odd_offset_band_lod_parity(monkeypatch):
    """A contiguous band starting at an ODD framebuffer row must compute
    the same quad-paired texture-LOD derivatives as the full frame for
    every interior row (r4 review finding: local row parity shifted every
    quad pairing in odd-aligned bands; only the band's boundary rows may
    clamp differently — the same one-row residual the old
    forward-difference form had). The y-half/quarter accelerations are
    full-frame-only knobs, so the comparison pins the exact modes."""
    from renderer_rs_tpu.app.scenes import full_scene

    monkeypatch.setenv("RENDERER_PCF_RES", "full")
    monkeypatch.setenv("RENDERER_CUBE_RES", "full")

    w, h = 128, 128
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=900, ibl=False, textured=True
    )
    pipe = GraphicsPipelineBuilder().build()
    common = dict(
        tonemap="aces", shadow_map_size=128,
        shadow_params=kwargs["shadow_params"],
    )
    full = np.asarray(
        forward_frame(scene, layout, pipe, kwargs["shading"], w, h, **common)
    )
    band = np.asarray(
        forward_frame(
            scene, layout, pipe, kwargs["shading"], w, h,
            band=(jnp.int32(31), 30), **common,
        )
    )
    np.testing.assert_array_equal(band[1:-1], full[32:60])


def test_interleaved_rows_match_single_device(small_scene):
    """Load-balanced (interleaved-row) sharding: de-interleaved output is
    bit-identical to the single-device frame — per-row pixel math anchors at
    absolute rows, so only the row ASSIGNMENT changes."""
    from renderer_rs_tpu.parallel.tile_shard import unshard_rows

    scene, layout = small_scene
    pipe = GraphicsPipelineBuilder().build()
    ref = np.asarray(
        forward_frame(scene, layout, pipe, ShadingModel.BLINN_PHONG, W, H)
    )
    mesh = make_device_mesh(8)  # frame=2, rows=4
    stacked = stack_scenes([scene, scene])
    out = render_frame_sharded(
        stacked, layout, pipe, ShadingModel.BLINN_PHONG, W, H, mesh,
        interleaved=True,
    )
    out = np.asarray(unshard_rows(jnp.asarray(out), 4, True))
    assert out.shape == (2, H, W, 4)
    np.testing.assert_array_equal(out[0], ref)
    np.testing.assert_array_equal(out[1], ref)
