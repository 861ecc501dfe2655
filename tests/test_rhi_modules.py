"""Tests for the swapchain/command/sync/descriptor/shader RHI modules —
mirrors the reference's pure-logic test suites (swapchain choice functions
swapchain.rs:730-893, shader validation shader.rs:466-525, command state
machine, descriptor validation)."""

import os
import struct

import numpy as np
import pytest

from renderer_rs_tpu.core.errors import RhiError, ShaderError
from renderer_rs_tpu.rhi.command import CommandBuffer, CommandPool
from renderer_rs_tpu.rhi.descriptor import (
    SET_FRAME,
    SET_IBL,
    BindingKind,
    layouts_for,
)
from renderer_rs_tpu.rhi.pipeline import CompareOp, GraphicsPipelineBuilder
from renderer_rs_tpu.rhi.shader import (
    Shader,
    ShaderStage,
    builtin_library,
    validate_spirv,
)
from renderer_rs_tpu.rhi.swapchain import (
    FORMAT_LINEAR_F32,
    FORMAT_SRGB8,
    PRESENT_FIFO,
    PRESENT_MAILBOX,
    SurfaceCapabilities,
    Swapchain,
    choose_extent,
    choose_present_mode,
    choose_surface_format,
    determine_image_count,
)
from renderer_rs_tpu.rhi.sync import Fence, FrameSync, Semaphore


# --- swapchain choice functions (≙ swapchain.rs:730-893) ------------------------

def test_choose_surface_format_prefers_srgb():
    assert choose_surface_format([FORMAT_LINEAR_F32, FORMAT_SRGB8]) == FORMAT_SRGB8
    assert choose_surface_format([FORMAT_LINEAR_F32]) == FORMAT_LINEAR_F32
    with pytest.raises(RhiError):
        choose_surface_format([])


def test_choose_present_mode_mailbox_then_fifo():
    assert choose_present_mode([PRESENT_FIFO, PRESENT_MAILBOX]) == PRESENT_MAILBOX
    assert choose_present_mode([PRESENT_FIFO]) == PRESENT_FIFO
    assert choose_present_mode([]) == PRESENT_FIFO  # FIFO always guaranteed


def test_choose_extent_clamps():
    caps = SurfaceCapabilities(min_extent=(100, 100), max_extent=(2000, 1000))
    assert choose_extent(caps, (50, 5000)) == (100, 1000)
    assert choose_extent(caps, (800, 600)) == (800, 600)
    fixed = SurfaceCapabilities(current_extent=(640, 480))
    assert choose_extent(fixed, (999, 999)) == (640, 480)


def test_determine_image_count_min_plus_one_clamped():
    assert determine_image_count(SurfaceCapabilities(min_image_count=2)) == 3
    assert (
        determine_image_count(SurfaceCapabilities(min_image_count=2, max_image_count=2))
        == 2
    )


def test_swapchain_acquire_present_recreate():
    sc = Swapchain(64, 48)
    idx, needs = sc.acquire_next_image()
    assert not needs
    subopt = sc.present(idx, np.zeros((48, 64, 4), np.uint8))
    assert not subopt
    # wrong-size present marks stale (≙ SUBOPTIMAL_KHR)
    assert sc.present(idx, np.zeros((10, 10, 4), np.uint8))
    _, needs = sc.acquire_next_image()
    assert needs  # ≙ ERROR_OUT_OF_DATE
    sc.recreate(128, 96)
    assert sc.extent == (128, 96)
    _, needs = sc.acquire_next_image()
    assert not needs


# --- command recording -----------------------------------------------------------

def test_command_state_machine():
    cb = CommandBuffer()
    with pytest.raises(RhiError):
        cb.draw_mesh(None)  # not recording
    cb.begin()
    with pytest.raises(RhiError):
        cb.draw_mesh(None)  # no pipeline bound
    pipe = GraphicsPipelineBuilder().build()
    cb.bind_pipeline(pipe)
    from renderer_rs_tpu.utils import meshgen

    cb.draw_mesh(meshgen.cube_mesh())
    cb.end()
    with pytest.raises(RhiError):
        cb.bind_pipeline(pipe)  # recording ended


def test_command_buffer_lowers_to_scene():
    from renderer_rs_tpu.utils import meshgen

    pipe = GraphicsPipelineBuilder().build()
    cb = CommandBuffer().begin()
    cb.bind_pipeline(pipe)
    cb.draw_mesh(meshgen.cube_mesh())
    cb.draw_mesh(meshgen.plane_mesh(4.0))
    cb.end()
    scene, layout, pipeline = cb.build_scene()
    assert layout.num_objects == 2
    assert layout.num_triangles == 12 + 2
    assert pipeline is pipe


def test_command_pool():
    pool = CommandPool()
    bufs = pool.allocate(3)
    assert pool.allocated == 3
    bufs[0].begin()
    pool.reset()
    with pytest.raises(RhiError):
        bufs[0].end()  # reset back to initial


# --- sync ---------------------------------------------------------------------------

def test_fence_wait_and_status():
    import jax.numpy as jnp

    f = Fence()
    assert not f.is_signaled()
    f.attach(jnp.ones(8) * 2)
    f.wait()
    assert f.is_signaled()
    f.reset()
    assert not f.is_signaled()


def test_frame_sync_starts_signaled():
    fs = FrameSync.create()
    assert fs.in_flight.is_signaled()  # frame 0 must not deadlock
    assert isinstance(fs.image_available, Semaphore)


# --- descriptors ---------------------------------------------------------------------

def test_descriptor_validation():
    from renderer_rs_tpu.app.scenes import triangle_scene, full_scene
    from renderer_rs_tpu.renderer.passes import ShadingModel

    scene, _, _, _ = triangle_scene(32, 32)
    SET_FRAME.validate(scene)  # camera/scene_ubo/lights always present
    with pytest.raises(RhiError):
        SET_IBL.validate(scene)  # no environment bound
    full, _, _, _ = full_scene(32, 32, tri_budget=100)
    SET_IBL.validate(full)
    assert len(layouts_for(ShadingModel.PBR_IBL)) == 4
    assert len(layouts_for(ShadingModel.PBR)) == 3


# --- shaders ------------------------------------------------------------------------

def test_spirv_validation():
    """≙ shader.rs:466-525 validation tests."""
    good = struct.pack("<I", 0x07230203) + b"\x00" * 12
    assert validate_spirv(good) == "little"
    swapped = struct.pack("<I", 0x03022307) + b"\x00" * 12
    assert validate_spirv(swapped) == "big"
    with pytest.raises(ShaderError):
        validate_spirv(b"")
    with pytest.raises(ShaderError):
        validate_spirv(good + b"\x00")  # misaligned
    with pytest.raises(ShaderError):
        validate_spirv(b"\xde\xad\xbe\xef" * 2)  # bad magic


def test_builtin_shader_library():
    lib = builtin_library()
    assert "model_pbr_ibl.frag" in lib
    assert lib.get("model.vert").stage == ShaderStage.VERTEX
    assert lib.get("brdf_lut.comp").stage == ShaderStage.COMPUTE
    info = lib.get("triangle.frag").stage_create_info()
    assert info["entry"] == "main"
    with pytest.raises(ShaderError):
        lib.get("missing.frag")


# --- MSAA (supersample resolve) -------------------------------------------------------

def test_msaa_resolve_smooths_edges():
    """4x MSAA reduces staircase aliasing: edge pixels take intermediate
    values, and the interior is unchanged."""
    from renderer_rs_tpu.app.scenes import triangle_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    import dataclasses
    import jax.numpy as jnp

    scene, layout, kwargs, _ = triangle_scene(64, 64)
    pipe1 = kwargs["pipeline"]
    pipe4 = dataclasses.replace(pipe1, msaa_samples=4)
    f1 = np.asarray(forward_frame(scene, layout, pipe1, kwargs["shading"], 64, 64))
    f4 = np.asarray(forward_frame(scene, layout, pipe4, kwargs["shading"], 64, 64))
    assert f4.shape == f1.shape
    # interior matches closely
    assert abs(float(f1[40, 32, 0]) - float(f4[40, 32, 0])) < 0.05
    # more distinct intensity levels along the left edge column band = smoothing
    col1 = np.unique(np.round(f1[:, 20, 0], 3))
    col4 = np.unique(np.round(f4[:, 20, 0], 3))
    assert col4.size >= col1.size


# --- alpha cutoff (MASK materials) ----------------------------------------------------

def test_alpha_cutoff_discards_fragments():
    """A checker-alpha texture with MASK mode cuts holes in the quad BEFORE
    the depth write (discard semantics, model_pbr.hlsl:218-221)."""
    import dataclasses
    import jax.numpy as jnp
    from renderer_rs_tpu.app.scenes import _camera_ubo
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.renderer.scene_build import SceneBuilder
    from renderer_rs_tpu.resources.material import Material
    from renderer_rs_tpu.scene.camera import Camera, Projection
    from renderer_rs_tpu.utils import meshgen
    import math

    w, h = 64, 64
    # texture: left half alpha 0, right half alpha 1
    img = np.ones((8, 8, 4), np.float32)
    img[:, :4, 3] = 0.0
    cam = Camera(Projection.perspective(math.radians(60), 1.0, 0.1, 50.0))
    cam.position = np.array([0.0, 2.5, 0.001], np.float32)
    cam.look_at([0.0, 0.0, 0.0])
    builder = SceneBuilder()
    builder.add_mesh(
        meshgen.plane_mesh(2.0, uv_scale=1.0),
        material=Material(base_color=(1, 1, 1, 1), base_color_texture=0),
    )
    builder.set_textures([img], size=8)
    builder.set_camera(_camera_ubo(cam))
    scene, layout = builder.build()

    opaque = GraphicsPipelineBuilder().build()
    masked = dataclasses.replace(opaque, alpha_cutoff=0.5)
    f_opaque = np.asarray(
        forward_frame(scene, layout, opaque, ShadingModel.BLINN_PHONG, w, h)
    )
    f_masked = np.asarray(
        forward_frame(scene, layout, masked, ShadingModel.BLINN_PHONG, w, h)
    )
    bg = f_opaque[0, 0]  # clear color
    # opaque: whole quad covers the center row; masked: half discarded
    center = h // 2
    opaque_cov = (np.abs(f_opaque[center] - bg).sum(-1) > 0.05).mean()
    masked_cov = (np.abs(f_masked[center] - bg).sum(-1) > 0.05).mean()
    # plane spans ~69% of the row at this camera distance
    assert opaque_cov > 0.6
    assert 0.15 < masked_cov < 0.55  # roughly half the visible quad discarded
    assert masked_cov < 0.75 * opaque_cov


# --- stencil (StencilAttachment path) -------------------------------------------------

def test_stencil_mask_then_test():
    """Two-pass stencil: pass 1 writes ref=1 where a small triangle covers;
    pass 2 with EQUAL test only draws inside that mask (the classic portal/
    mask technique, exercising REPLACE + EQUAL + KEEP ops)."""
    import dataclasses
    import jax.numpy as jnp
    from renderer_rs_tpu.ops.raster import (
        gather_triangle_clip, rasterize_stencil, setup_triangles,
    )
    from renderer_rs_tpu.rhi.rendering import StencilAttachment, StencilOp
    from renderer_rs_tpu.rhi.pipeline import CullMode

    h = w = 64
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()

    def quad(scale, z):
        pos = np.array(
            [[-scale, -scale, z], [scale, -scale, z], [scale, scale, z],
             [-scale, scale, z]], np.float32)
        clip = jnp.asarray(np.concatenate([pos, np.ones((4, 1), np.float32)], -1))
        tris = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
        return setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    # pass 1: small quad stamps stencil=1 (ALWAYS pass, REPLACE)
    st1 = StencilAttachment(reference=1, compare="always",
                           pass_op=StencilOp.REPLACE)
    vis1, sbuf = rasterize_stencil(quad(0.4, 0.5), h, w, pipe, st1)
    assert int(sbuf[32, 32]) == 1
    assert int(sbuf[2, 2]) == 0

    # pass 2: big quad drawn only where stencil == 1 (EQUAL, KEEP)
    st2 = StencilAttachment(reference=1, compare="equal",
                           pass_op=StencilOp.KEEP, fail_op=StencilOp.KEEP)
    vis2, _ = rasterize_stencil(quad(0.9, 0.3), h, w, pipe, st2,
                                stencil_init=sbuf)
    cov = np.asarray(vis2.covered)
    assert cov[32, 32]          # inside the mask
    assert not cov[4, 4]        # outside the mask, inside the big quad
    # the covered area equals the stencil mask area
    np.testing.assert_array_equal(cov, np.asarray(sbuf) == 1)


def test_stencil_increment_counts_overdraw():
    """INCR pass op counts overdraw: two overlapping triangles -> stencil 2
    in the overlap (depth test off)."""
    import jax.numpy as jnp
    from renderer_rs_tpu.ops.raster import (
        gather_triangle_clip, rasterize_stencil, setup_triangles,
    )
    from renderer_rs_tpu.rhi.rendering import StencilAttachment, StencilOp
    from renderer_rs_tpu.rhi.pipeline import CullMode

    h = w = 32
    pipe = (GraphicsPipelineBuilder().cull_mode(CullMode.NONE)
            .depth_compare_op(CompareOp.ALWAYS).build())
    pos = np.array(
        [[-0.8, -0.8, 0.5], [0.8, -0.8, 0.5], [0.0, 0.8, 0.5],
         [-0.8, 0.8, 0.5], [0.8, 0.8, 0.5], [0.0, -0.8, 0.5]], np.float32)
    clip = jnp.asarray(np.concatenate([pos, np.ones((6, 1), np.float32)], -1))
    tris = jnp.array([[0, 1, 2], [3, 5, 4]], jnp.int32)
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    st = StencilAttachment(compare="always", pass_op=StencilOp.INCREMENT_AND_CLAMP)
    _, sbuf = rasterize_stencil(setup, h, w, pipe, st)
    s = np.asarray(sbuf)
    assert s.max() == 2      # overlap region
    assert (s == 1).sum() > 0


# --- wireframe (polygon mode LINE) ----------------------------------------------------

def test_wireframe_mode():
    """LINE polygon mode draws edges only: far fewer covered pixels than
    FILL, and the triangle centroid is empty."""
    import dataclasses
    import jax.numpy as jnp
    from renderer_rs_tpu.ops.raster import (
        gather_triangle_clip, rasterize, setup_triangles,
    )
    from renderer_rs_tpu.rhi.pipeline import CullMode, PolygonMode

    h = w = 96
    fill = (GraphicsPipelineBuilder().cull_mode(CullMode.NONE)
            .depth_test_enable(False).depth_write_enable(False)
            .depth_attachment_format(None).build())
    wire = dataclasses.replace(fill, polygon_mode=PolygonMode.LINE, line_width=2.0)
    pos = np.array([[0.0, -0.7, 0.0], [-0.7, 0.7, 0.0], [0.7, 0.7, 0.0]], np.float32)
    clip = jnp.asarray(np.concatenate([pos, np.ones((3, 1), np.float32)], -1))
    tris = jnp.array([[0, 1, 2]], jnp.int32)
    sf = setup_triangles(gather_triangle_clip(clip, tris), w, h, fill)
    sw = setup_triangles(gather_triangle_clip(clip, tris), w, h, wire)
    cov_f = np.asarray(rasterize(sf, h, w, fill).covered)
    cov_w = np.asarray(rasterize(sw, h, w, wire).covered)
    assert 0 < cov_w.sum() < 0.35 * cov_f.sum()
    assert not cov_w[52, 48]  # centroid is hollow
    assert cov_w.sum() > 100  # but the outline exists
    # wireframe coverage is a subset of fill coverage
    assert not (cov_w & ~cov_f).any()


# --- buffers ---------------------------------------------------------------------------

def test_buffer_usage_and_uploads():
    """≙ buffer.rs tests: usage->placement table, write_data, staging upload."""
    import jax.numpy as jnp
    from renderer_rs_tpu.rhi.buffer import Buffer, BufferUsage

    assert BufferUsage.STORAGE.device_resident
    assert not BufferUsage.VERTEX.device_resident

    b = Buffer.new_with_data(BufferUsage.VERTEX, np.zeros((4, 3), np.float32))
    assert b.size_bytes == 48
    b.write_data(3, jnp.asarray([9.0, 9.0, 9.0]))
    out = np.asarray(b.data)
    np.testing.assert_allclose(out[1], [9, 9, 9])  # flat offset 3 = row 1
    np.testing.assert_allclose(out[0], [0, 0, 0])

    b.upload_via_staging(np.ones((4, 3), np.float32))
    np.testing.assert_allclose(np.asarray(b.data), 1.0)


def test_two_sided_stencil():
    """Back-facing primitives use the `back` face state (≙ VkStencilOpState
    front/back): front triangles INCREMENT, back triangles DECREMENT."""
    import dataclasses

    import jax.numpy as jnp

    from renderer_rs_tpu.ops.raster import (
        gather_triangle_clip,
        rasterize_stencil,
        setup_triangles,
    )
    from renderer_rs_tpu.rhi.pipeline import CullMode, GraphicsPipelineBuilder
    from renderer_rs_tpu.rhi.rendering import (
        StencilAttachment,
        StencilFaceState,
        StencilOp,
    )

    h, w = 32, 64
    # left triangle CCW-in-NDC (front after the Vulkan facing rule),
    # right triangle with swapped winding (back-facing)
    def tri(cx, flip):
        v = np.array(
            [[cx - 0.4, -0.5, 0.5], [cx + 0.4, -0.5, 0.5], [cx, 0.5, 0.5]],
            np.float32,
        )
        if flip:
            v = v[[1, 0, 2]]
        return v

    pos = np.concatenate([tri(-0.5, False), tri(0.5, True)])
    clip = jnp.asarray(
        np.concatenate([pos, np.ones((6, 1), np.float32)], -1)
    )
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    st = StencilAttachment(
        clear_stencil=5,
        compare="always",
        pass_op=StencilOp.INCREMENT_AND_CLAMP,
        back=StencilFaceState(
            compare="always", pass_op=StencilOp.DECREMENT_AND_CLAMP
        ),
    )
    _, sbuf = rasterize_stencil(setup, h, w, pipe, st)
    sbuf = np.asarray(sbuf)
    assert (sbuf == 6).any()  # front region incremented
    assert (sbuf == 4).any()  # back region decremented
    assert (sbuf == 5).any()  # untouched background


def test_forward_frame_stencil_wiring():
    """forward_frame(stencil=..., return_stencil=True) routes the opaque
    raster through the stencil machinery and returns the buffer."""
    from renderer_rs_tpu.app.scenes import triangle_scene
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.rhi.rendering import StencilAttachment, StencilOp

    w, h = 64, 48
    scene, layout, kwargs, _ = triangle_scene(w, h)
    st = StencilAttachment(
        clear_stencil=0, compare="always", pass_op=StencilOp.REPLACE, reference=7
    )
    out, sbuf = forward_frame(
        scene, layout, kwargs["pipeline"], ShadingModel.FLAT, w, h,
        stencil=st, return_stencil=True,
    )
    out, sbuf = np.asarray(out), np.asarray(sbuf)
    assert np.isfinite(out).all()
    covered = sbuf == 7
    assert covered.any() and (~covered).any()
    # stencil coverage matches the rendered triangle's pixels
    bg = out[0, 0]
    lit = np.abs(out - bg).sum(-1) > 1e-5
    np.testing.assert_array_equal(covered, lit)

@pytest.mark.skipif(
    not os.path.exists("/root/reference/shaders/spirv/triangle.vert.spv"),
    reason="reference SPIR-V binaries not mounted",
)
def test_validate_reference_spirv_binaries():
    """The reference's checked-in DXC-compiled SPIR-V (loaded by
    Shader::from_spirv_file, shader.rs:244-257) passes our validation:
    4-byte aligned, little-endian magic 0x07230203."""
    for name in ("triangle.vert.spv", "triangle.frag.spv"):
        with open(f"/root/reference/shaders/spirv/{name}", "rb") as f:
            data = f.read()
        assert validate_spirv(data) == "little"


def test_forward_frame_stencil_band_rejected():
    """stencil and band sharding cannot combine (the stencil state machine
    runs on the full-frame scan path) — must raise, not silently ignore the
    band (advisor r2 finding)."""
    from renderer_rs_tpu.app.scenes import triangle_scene
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.rhi.rendering import StencilAttachment, StencilOp

    w, h = 64, 48
    scene, layout, kwargs, _ = triangle_scene(w, h)
    st = StencilAttachment(
        clear_stencil=0, compare="always", pass_op=StencilOp.REPLACE, reference=7
    )
    with pytest.raises(ValueError, match="stencil and band"):
        forward_frame(
            scene, layout, kwargs["pipeline"], ShadingModel.FLAT, w, h,
            stencil=st, band=(0, h),
        )
