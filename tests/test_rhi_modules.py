"""Tests for the swapchain/command/sync/descriptor/shader RHI modules —
mirrors the reference's pure-logic test suites (swapchain choice functions
swapchain.rs:730-893, shader validation shader.rs:466-525, command state
machine, descriptor validation)."""

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
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder
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
