"""renderer — frame orchestration (≙ crates/renderer).

The reference Renderer owns instance/device/swapchain and records command
buffers per frame (renderer.rs:55-86, 452-557). Here the entire record→submit
block is ONE jitted function over the scene pytree (SURVEY.md §3.2 TPU
analog); the Renderer owns the compiled specializations, the FrameManager
owns async-dispatch depth (frames in flight), and present is host readback.
"""

from renderer_rs_tpu.renderer.depth_buffer import DepthBuffer  # noqa: F401
from renderer_rs_tpu.renderer.frame_manager import FrameManager  # noqa: F401
from renderer_rs_tpu.renderer.scene_build import (  # noqa: F401
    GpuScene,
    SceneBuilder,
    SceneLayout,
)
from renderer_rs_tpu.renderer.passes import ShadingModel  # noqa: F401
from renderer_rs_tpu.renderer.renderer import Renderer  # noqa: F401

MAX_FRAMES_IN_FLIGHT = 2  # ≙ crates/renderer/src/lib.rs:43
