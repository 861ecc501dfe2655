"""Dynamic-rendering configuration: attachments, load/store ops, clears.

Mirrors crates/rhi/src/rendering.rs: ``ColorAttachment`` (defaults CLEAR/STORE,
black — rendering.rs:101-115), ``DepthAttachment`` (CLEAR/DONT_CARE, depth 1.0
— rendering.rs:355-370), and ``RenderingConfig`` (render area, layers —
rendering.rs:679-911). On TPU an "attachment" is just an array; LOAD/CLEAR
decide whether a pass starts from the previous array or from the clear value,
and STORE/DONT_CARE decide whether the pass's output array is kept.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class AttachmentLoadOp(enum.Enum):
    LOAD = "load"
    CLEAR = "clear"
    DONT_CARE = "dont_care"


class AttachmentStoreOp(enum.Enum):
    STORE = "store"
    DONT_CARE = "dont_care"


@dataclasses.dataclass(frozen=True)
class ColorAttachment:
    """≙ rendering.rs:64-115. Default: CLEAR to opaque black, STORE."""

    load_op: AttachmentLoadOp = AttachmentLoadOp.CLEAR
    store_op: AttachmentStoreOp = AttachmentStoreOp.STORE
    clear_color: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 1.0)

    def initial_array(self, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(self.clear_color, dtype), (h, w, 4)
        ).astype(dtype)


@dataclasses.dataclass(frozen=True)
class DepthAttachment:
    """≙ rendering.rs:340-370. Default: CLEAR to 1.0 (far plane), DONT_CARE."""

    load_op: AttachmentLoadOp = AttachmentLoadOp.CLEAR
    store_op: AttachmentStoreOp = AttachmentStoreOp.DONT_CARE
    clear_depth: float = 1.0

    def initial_array(self, h: int, w: int) -> jnp.ndarray:
        return jnp.full((h, w), self.clear_depth, jnp.float32)


class StencilOp(enum.Enum):
    """VkStencilOp subset (≙ the ops StencilAttachment configures)."""

    KEEP = "keep"
    ZERO = "zero"
    REPLACE = "replace"
    INCREMENT_AND_CLAMP = "incr"
    DECREMENT_AND_CLAMP = "decr"
    INVERT = "invert"


@dataclasses.dataclass(frozen=True)
class StencilFaceState:
    """Per-face stencil state (≙ vk::StencilOpState; pipeline.rs exposes
    independent front/back states)."""

    reference: int = 1
    read_mask: int = 0xFF
    write_mask: int = 0xFF
    compare: str = "always"  # CompareOp value names
    fail_op: StencilOp = StencilOp.KEEP
    depth_fail_op: StencilOp = StencilOp.KEEP
    pass_op: StencilOp = StencilOp.REPLACE


@dataclasses.dataclass(frozen=True)
class StencilAttachment:
    """≙ rendering.rs:537-648: stencil buffer config + per-face state.

    The stencil test runs in the scan rasterizer (ops/raster.rasterize with
    stencil=...): pass ⇔ (ref & read_mask) OP (stored & read_mask). The
    inline fields are the FRONT face state; `back` (two-sided stencil,
    ≙ VkPipelineDepthStencilStateCreateInfo front/back) optionally gives
    back-facing primitives their own state — None means both faces share
    the front state, matching single-sided pipelines.
    """

    load_op: AttachmentLoadOp = AttachmentLoadOp.CLEAR
    store_op: AttachmentStoreOp = AttachmentStoreOp.DONT_CARE
    clear_stencil: int = 0
    reference: int = 1
    read_mask: int = 0xFF
    write_mask: int = 0xFF
    compare: str = "always"  # CompareOp value names
    fail_op: StencilOp = StencilOp.KEEP
    depth_fail_op: StencilOp = StencilOp.KEEP
    pass_op: StencilOp = StencilOp.REPLACE
    back: StencilFaceState | None = None

    @property
    def front_state(self) -> StencilFaceState:
        return StencilFaceState(
            reference=self.reference,
            read_mask=self.read_mask,
            write_mask=self.write_mask,
            compare=self.compare,
            fail_op=self.fail_op,
            depth_fail_op=self.depth_fail_op,
            pass_op=self.pass_op,
        )

    def initial_array(self, h: int, w: int) -> jnp.ndarray:
        return jnp.full((h, w), self.clear_stencil, jnp.int32)


@dataclasses.dataclass(frozen=True)
class RenderingConfig:
    """≙ rendering.rs:679-911 (render area subset meaningful in software)."""

    width: int
    height: int
    color: ColorAttachment = dataclasses.field(default_factory=ColorAttachment)
    depth: DepthAttachment | None = dataclasses.field(default_factory=DepthAttachment)
    stencil: StencilAttachment | None = None
    layers: int = 1
