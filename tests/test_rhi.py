"""RHI layer tests: pipeline builder validation, enums, blend, attachments.

Mirrors the reference's pipeline tests (pipeline.rs:1065-1156: enum conversion
tables, builder validation) and rendering-config tests (rendering.rs:1204+).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.core.errors import PipelineError
from renderer_rs_tpu.ops.blend import apply_blend
from renderer_rs_tpu.rhi import (
    AttachmentLoadOp,
    BlendFactor,
    BlendOp,
    ColorAttachment,
    ColorBlendAttachment,
    CompareOp,
    CullMode,
    DepthAttachment,
    Device,
    FrontFace,
    GraphicsPipeline,
    GraphicsPipelineBuilder,
)


def test_pipeline_defaults_match_reference():
    """Builder defaults ≙ GraphicsPipelineBuilder::default (pipeline.rs:655-690)."""
    p = GraphicsPipelineBuilder().build()
    assert p.cull_mode == CullMode.BACK
    assert p.front_face == FrontFace.COUNTER_CLOCKWISE
    assert p.depth_test_enable and p.depth_write_enable
    assert p.depth_compare_op == CompareOp.LESS
    assert not p.blend.blend_enable
    assert p.msaa_samples == 1


def test_pipeline_depth_without_format_errors():
    """Depth enabled but no depth format -> build error (pipeline.rs:934-941)."""
    with pytest.raises(PipelineError):
        GraphicsPipelineBuilder().depth_attachment_format(None).build()


def test_pipeline_depth_disabled_without_format_ok():
    p = (
        GraphicsPipelineBuilder()
        .depth_test_enable(False)
        .depth_write_enable(False)
        .depth_attachment_format(None)
        .build()
    )
    assert p.depth_format is None


def test_pipeline_invalid_msaa():
    with pytest.raises(PipelineError):
        GraphicsPipelineBuilder().msaa_samples(3).build()


def test_pipeline_hashable_static_arg():
    """Pipelines must be hashable (jit static args ≙ pipeline objects)."""
    a = GraphicsPipelineBuilder().build()
    b = GraphicsPipelineBuilder().build()
    assert a == b and hash(a) == hash(b)
    c = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    assert a != c


def test_alpha_blend_preset():
    """≙ ColorBlendAttachment::alpha_blend (pipeline.rs:524-544)."""
    b = ColorBlendAttachment.alpha_blend()
    assert b.blend_enable
    assert b.src_color_blend_factor == BlendFactor.SRC_ALPHA
    assert b.dst_color_blend_factor == BlendFactor.ONE_MINUS_SRC_ALPHA
    assert b.color_blend_op == BlendOp.ADD


def test_blend_src_over_math():
    src = jnp.array([1.0, 0.0, 0.0, 0.25])
    dst = jnp.array([0.0, 1.0, 0.0, 1.0])
    out = apply_blend(ColorBlendAttachment.alpha_blend(), src, dst)
    np.testing.assert_allclose(np.asarray(out), [0.25, 0.75, 0.0, 1.0], atol=1e-6)


def test_blend_disabled_passthrough():
    src = jnp.array([0.3, 0.4, 0.5, 0.5])
    dst = jnp.array([1.0, 1.0, 1.0, 1.0])
    out = apply_blend(ColorBlendAttachment.disabled(), src, dst)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src))


def test_color_attachment_clear_default_black():
    """≙ ColorAttachment defaults CLEAR/STORE black (rendering.rs:101-115)."""
    att = ColorAttachment()
    assert att.load_op == AttachmentLoadOp.CLEAR
    arr = att.initial_array(4, 8)
    assert arr.shape == (4, 8, 4)
    np.testing.assert_allclose(np.asarray(arr[0, 0]), [0, 0, 0, 1])


def test_depth_attachment_clear_one():
    """≙ DepthAttachment default clear 1.0 (rendering.rs:362-365)."""
    att = DepthAttachment()
    arr = att.initial_array(4, 8)
    assert arr.shape == (4, 8)
    assert float(arr[0, 0]) == 1.0


def test_device_selection():
    """Device finds the CPU test mesh (≙ graceful GPU-less fallback,
    instance.rs:288-326 — but the rebuild runs fully, not skipping)."""
    d = Device()
    assert len(d.devices) >= 1
    d.wait_idle()
