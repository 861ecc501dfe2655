"""rhi — the software GPU (TPU-native equivalent of crates/rhi).

The reference's RHI wraps Vulkan objects (instance/device/swapchain/pipeline/
command/buffer/descriptor/sync, rhi/src/lib.rs:12-34). On TPU none of those
exist as driver objects; they become:

- ``Device``        -> backend selection + mesh handle (instance/physical_device/device)
- ``GraphicsPipeline`` (frozen, hashable) -> a *compile-time specialization key*
  for the jitted frame function (pipeline compile ≙ XLA compile)
- vertex formats    -> SoA pytrees of device arrays
- command recording -> draw lists lowered into batched arrays (tracing IS recording)
- sync              -> XLA program order + host-side async dispatch
- rasterizer        -> ops/raster.py (the fixed-function stage, in software)
"""

from renderer_rs_tpu.rhi.pipeline import (  # noqa: F401
    BlendFactor,
    BlendOp,
    ColorBlendAttachment,
    CompareOp,
    CullMode,
    FrontFace,
    GraphicsPipeline,
    GraphicsPipelineBuilder,
    PolygonMode,
    PrimitiveTopology,
)
from renderer_rs_tpu.rhi.vertex import TriangleVertexBuffer, VertexBuffer  # noqa: F401
from renderer_rs_tpu.rhi.rendering import (  # noqa: F401
    AttachmentLoadOp,
    AttachmentStoreOp,
    ColorAttachment,
    DepthAttachment,
    RenderingConfig,
    StencilAttachment,
    StencilOp,
)
from renderer_rs_tpu.rhi.device import Device  # noqa: F401
from renderer_rs_tpu.rhi.buffer import Buffer, BufferUsage  # noqa: F401
from renderer_rs_tpu.rhi.command import CommandBuffer, CommandPool  # noqa: F401
from renderer_rs_tpu.rhi.descriptor import (  # noqa: F401
    Binding,
    BindingKind,
    DescriptorSetLayout,
)
from renderer_rs_tpu.rhi.shader import Shader, ShaderStage, builtin_library  # noqa: F401
from renderer_rs_tpu.rhi.swapchain import Swapchain, SurfaceCapabilities  # noqa: F401
from renderer_rs_tpu.rhi.sync import Fence, FrameSync, Semaphore  # noqa: F401
