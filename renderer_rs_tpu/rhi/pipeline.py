"""Graphics pipeline state — compile-time specialization keys.

Mirrors crates/rhi/src/pipeline.rs: the safe enums (pipeline.rs:273-476), the
``ColorBlendAttachment`` presets (pipeline.rs:479-544), and the
``GraphicsPipelineBuilder`` with build-time validation (pipeline.rs:589-1058).

A Vulkan pipeline bakes fixed-function state into a driver-compiled object;
here a :class:`GraphicsPipeline` is a frozen, hashable dataclass passed as a
*static* argument to the jitted frame function — every distinct pipeline state
triggers one XLA specialization, exactly like one vkCreateGraphicsPipelines
call. There are no shader modules: the "shader" is the shading function the
renderer fuses around the rasterizer (ops/).
"""

from __future__ import annotations

import dataclasses
import enum

from renderer_rs_tpu.core.errors import PipelineError


class PrimitiveTopology(enum.Enum):
    """≙ pipeline.rs:273-310."""

    POINT_LIST = "point_list"
    LINE_LIST = "line_list"
    LINE_STRIP = "line_strip"
    TRIANGLE_LIST = "triangle_list"
    TRIANGLE_STRIP = "triangle_strip"
    TRIANGLE_FAN = "triangle_fan"


class PolygonMode(enum.Enum):
    """≙ pipeline.rs:313-327."""

    FILL = "fill"
    LINE = "line"
    POINT = "point"


class CullMode(enum.Enum):
    """≙ pipeline.rs:329-351."""

    NONE = "none"
    FRONT = "front"
    BACK = "back"
    FRONT_AND_BACK = "front_and_back"


class FrontFace(enum.Enum):
    """≙ pipeline.rs:355-371. Winding is evaluated on framebuffer-space signed
    area per the Vulkan spec (positive area = front for COUNTER_CLOCKWISE)."""

    COUNTER_CLOCKWISE = "ccw"
    CLOCKWISE = "cw"


class CompareOp(enum.Enum):
    """≙ pipeline.rs:375-409. Default depth compare is LESS (pipeline.rs:679)."""

    NEVER = "never"
    LESS = "less"
    EQUAL = "equal"
    LESS_OR_EQUAL = "less_or_equal"
    GREATER = "greater"
    NOT_EQUAL = "not_equal"
    GREATER_OR_EQUAL = "greater_or_equal"
    ALWAYS = "always"


class BlendFactor(enum.Enum):
    """≙ pipeline.rs:412-452 (subset actually used by the presets)."""

    ZERO = "zero"
    ONE = "one"
    SRC_COLOR = "src_color"
    ONE_MINUS_SRC_COLOR = "one_minus_src_color"
    SRC_ALPHA = "src_alpha"
    ONE_MINUS_SRC_ALPHA = "one_minus_src_alpha"
    DST_ALPHA = "dst_alpha"
    ONE_MINUS_DST_ALPHA = "one_minus_dst_alpha"


class BlendOp(enum.Enum):
    """≙ pipeline.rs:455-476."""

    ADD = "add"
    SUBTRACT = "subtract"
    REVERSE_SUBTRACT = "reverse_subtract"
    MIN = "min"
    MAX = "max"


@dataclasses.dataclass(frozen=True)
class ColorBlendAttachment:
    """Per-attachment blend state (≙ pipeline.rs:479-544)."""

    blend_enable: bool = False
    src_color_blend_factor: BlendFactor = BlendFactor.ONE
    dst_color_blend_factor: BlendFactor = BlendFactor.ZERO
    color_blend_op: BlendOp = BlendOp.ADD
    src_alpha_blend_factor: BlendFactor = BlendFactor.ONE
    dst_alpha_blend_factor: BlendFactor = BlendFactor.ZERO
    alpha_blend_op: BlendOp = BlendOp.ADD

    @staticmethod
    def disabled() -> "ColorBlendAttachment":
        return ColorBlendAttachment()

    @staticmethod
    def alpha_blend() -> "ColorBlendAttachment":
        """Standard src-over alpha blending preset (≙ pipeline.rs:524-544)."""
        return ColorBlendAttachment(
            blend_enable=True,
            src_color_blend_factor=BlendFactor.SRC_ALPHA,
            dst_color_blend_factor=BlendFactor.ONE_MINUS_SRC_ALPHA,
            color_blend_op=BlendOp.ADD,
            src_alpha_blend_factor=BlendFactor.ONE,
            dst_alpha_blend_factor=BlendFactor.ONE_MINUS_SRC_ALPHA,
            alpha_blend_op=BlendOp.ADD,
        )


@dataclasses.dataclass(frozen=True)
class GraphicsPipeline:
    """Immutable pipeline state. Hashable so it can be a jit static arg.

    Field defaults mirror GraphicsPipelineBuilder::default
    (pipeline.rs:655-690): cull Back, front CCW, depth test+write on, LESS.
    """

    topology: PrimitiveTopology = PrimitiveTopology.TRIANGLE_LIST
    polygon_mode: PolygonMode = PolygonMode.FILL
    cull_mode: CullMode = CullMode.BACK
    front_face: FrontFace = FrontFace.COUNTER_CLOCKWISE
    line_width: float = 1.0
    depth_test_enable: bool = True
    depth_write_enable: bool = True
    depth_compare_op: CompareOp = CompareOp.LESS
    # Depth bias (≙ pipeline.rs:609-613 raster state, applied by
    # ops/raster._biased_z at triangle setup so all three rasterizers
    # inherit the same biased depth plane).
    depth_bias_enable: bool = False
    depth_bias_constant: float = 0.0
    depth_bias_clamp: float = 0.0  # 0 = unclamped (Vulkan semantics)
    depth_bias_slope: float = 0.0
    blend: ColorBlendAttachment = dataclasses.field(
        default_factory=ColorBlendAttachment.disabled
    )
    # Alpha-cutoff discard (model_pbr.hlsl:218-221): fragments with
    # alpha < cutoff are dropped BEFORE the depth write (SURVEY.md §7 hard parts).
    alpha_cutoff: float | None = None
    msaa_samples: int = 1
    # Dynamic-rendering attachment formats (pipeline.rs:1031-1041): in the
    # rebuild these are dtypes + channel counts of the framebuffer arrays.
    color_format: str = "rgba8_srgb"
    depth_format: str | None = "d32_sfloat"


class GraphicsPipelineBuilder:
    """Fluent builder with build-time validation (≙ pipeline.rs:589-1058)."""

    def __init__(self) -> None:
        self._state = GraphicsPipeline()
        self._color_attachment_set = False

    def _set(self, **kw) -> "GraphicsPipelineBuilder":
        self._state = dataclasses.replace(self._state, **kw)
        return self

    def topology(self, t: PrimitiveTopology):
        return self._set(topology=t)

    def polygon_mode(self, m: PolygonMode):
        return self._set(polygon_mode=m)

    def cull_mode(self, m: CullMode):
        return self._set(cull_mode=m)

    def front_face(self, f: FrontFace):
        return self._set(front_face=f)

    def line_width(self, w: float):
        return self._set(line_width=w)

    def depth_test_enable(self, e: bool):
        return self._set(depth_test_enable=e)

    def depth_write_enable(self, e: bool):
        return self._set(depth_write_enable=e)

    def depth_compare_op(self, op: CompareOp):
        return self._set(depth_compare_op=op)

    def depth_bias(self, constant: float, slope: float, clamp: float = 0.0):
        """≙ depth_bias(constant_factor, clamp, slope_factor),
        pipeline.rs:781-789 (clamp keyword-only-ish here: the common call
        sites set constant+slope and leave clamp 0 = unclamped)."""
        return self._set(
            depth_bias_enable=True,
            depth_bias_constant=constant,
            depth_bias_clamp=clamp,
            depth_bias_slope=slope,
        )

    def blend_attachment(self, b: ColorBlendAttachment):
        return self._set(blend=b)

    def alpha_cutoff(self, cutoff: float | None):
        return self._set(alpha_cutoff=cutoff)

    def msaa_samples(self, n: int):
        return self._set(msaa_samples=n)

    def color_attachment_format(self, fmt: str):
        self._color_attachment_set = True
        return self._set(color_format=fmt)

    def depth_attachment_format(self, fmt: str | None):
        return self._set(depth_format=fmt)

    def build(self) -> GraphicsPipeline:
        """Validate and freeze (≙ Pipeline build validation pipeline.rs:918-1057).

        Reproduces the reference's build-time errors:
        - depth test/write enabled without a depth attachment format
          (pipeline.rs:934-941)
        """
        s = self._state
        if (s.depth_test_enable or s.depth_write_enable) and s.depth_format is None:
            raise PipelineError(
                "depth test/write enabled but no depth attachment format set "
                "(≙ rhi pipeline.rs:934-941)"
            )
        if s.msaa_samples not in (1, 2, 4, 8):
            raise PipelineError(f"unsupported MSAA sample count {s.msaa_samples}")
        if s.line_width <= 0.0:
            raise PipelineError("line_width must be positive")
        return s
