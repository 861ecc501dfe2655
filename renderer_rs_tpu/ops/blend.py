"""Color blend equation (VkPipelineColorBlendAttachmentState semantics).

Implements the blend factors/ops of rhi/src/pipeline.rs:412-544 as pure array
math: out.rgb = op(src.rgb * srcFactor, dst.rgb * dstFactor), separately for
alpha. Used by the order-preserving rasterizer for translucent pipelines.
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_rs_tpu.rhi.pipeline import BlendFactor, BlendOp, ColorBlendAttachment


def _factor(
    f: BlendFactor, src: jnp.ndarray, dst: jnp.ndarray, alpha: bool
) -> jnp.ndarray:
    """Blend factor value, broadcastable over rgb ([...,3]) or alpha ([...,1])."""
    sa = src[..., 3:4]
    da = dst[..., 3:4]
    if f == BlendFactor.ZERO:
        return jnp.zeros_like(sa)
    if f == BlendFactor.ONE:
        return jnp.ones_like(sa)
    if f == BlendFactor.SRC_COLOR:
        return sa if alpha else src[..., :3]
    if f == BlendFactor.ONE_MINUS_SRC_COLOR:
        return 1.0 - (sa if alpha else src[..., :3])
    if f == BlendFactor.SRC_ALPHA:
        return sa
    if f == BlendFactor.ONE_MINUS_SRC_ALPHA:
        return 1.0 - sa
    if f == BlendFactor.DST_ALPHA:
        return da
    if f == BlendFactor.ONE_MINUS_DST_ALPHA:
        return 1.0 - da
    raise ValueError(f"unsupported blend factor {f}")


def _op(op: BlendOp, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if op == BlendOp.ADD:
        return a + b
    if op == BlendOp.SUBTRACT:
        return a - b
    if op == BlendOp.REVERSE_SUBTRACT:
        return b - a
    if op == BlendOp.MIN:
        return jnp.minimum(a, b)
    return jnp.maximum(a, b)  # MAX


def apply_blend(
    state: ColorBlendAttachment, src: jnp.ndarray, dst: jnp.ndarray
) -> jnp.ndarray:
    """Blend src over dst ([...,4] each) per the attachment state."""
    if not state.blend_enable:
        return src
    rgb = _op(
        state.color_blend_op,
        src[..., :3] * _factor(state.src_color_blend_factor, src, dst, False),
        dst[..., :3] * _factor(state.dst_color_blend_factor, src, dst, False),
    )
    # MIN/MAX ignore factors per the Vulkan spec
    if state.color_blend_op in (BlendOp.MIN, BlendOp.MAX):
        rgb = _op(state.color_blend_op, src[..., :3], dst[..., :3])
    a = _op(
        state.alpha_blend_op,
        src[..., 3:4] * _factor(state.src_alpha_blend_factor, src, dst, True),
        dst[..., 3:4] * _factor(state.dst_alpha_blend_factor, src, dst, True),
    )
    if state.alpha_blend_op in (BlendOp.MIN, BlendOp.MAX):
        a = _op(state.alpha_blend_op, src[..., 3:4], dst[..., 3:4])
    return jnp.concatenate([rgb, a], axis=-1)
