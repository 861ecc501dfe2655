"""renderer_rs_tpu — a TPU-native software graphics pipeline.

A ground-up rebuild of the capabilities of itsakeyfut/renderer-rs (a Vulkan 1.3
renderer in Rust) as a JAX/XLA/Pallas array program:

- the Vulkan RHI becomes a *software GPU*: vertex transforms are batched MXU
  matmuls, rasterization is a tile-based visibility-buffer kernel, and fragment
  shading runs as fused vector passes over screen tiles
  (reference: crates/rhi/src/*.rs),
- a frame is ONE jitted function ``render(scene_state) -> framebuffer[H,W,4]``
  (reference hot path: crates/renderer/src/renderer.rs:367-449),
- present is a host readback of the framebuffer array
  (reference: crates/rhi/src/swapchain.rs:425-441),
- multi-chip scaling shards screen tiles / frames over a ``jax.sharding.Mesh``
  instead of multi-queue Vulkan submission.

Layer map (mirrors the reference crate graph, SURVEY.md §1):

    app -> renderer -> {scene, resources} -> rhi -> platform -> core
                                              |
                                           ops/ (the "shader library")
"""

__version__ = "0.1.0"

from renderer_rs_tpu.core import (  # noqa: F401
    RendererError,
    Result,
    Timer,
    init_logging,
)
