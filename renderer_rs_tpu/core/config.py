"""Typed renderer configuration.

The reference hardcodes its knobs (1280x720 window app/src/main.rs:38,
validation-on-debug renderer.rs:105, shader paths renderer.rs:210-222) and
declares-but-never-uses serde for config (core/src/lib.rs:7). The rebuild
promotes them to one small typed config, honoring the same env-var logging
convention (SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    """Static (compile-relevant) renderer configuration.

    Changing width/height/msaa/etc. re-specializes the jitted frame function,
    exactly as a Vulkan swapchain resize forces pipeline-compatible
    framebuffer recreation (rhi/src/swapchain.rs:307-352).
    """

    width: int = 1280
    height: int = 720
    # ≙ MAX_FRAMES_IN_FLIGHT = 2 (crates/renderer/src/lib.rs:43): depth of the
    # async-dispatch queue before the host blocks on readback.
    frames_in_flight: int = 2
    # Validation mode ≙ VK_LAYER_KHRONOS_validation + debug messenger
    # (instance.rs:62-131, 240-282): bind-time finite sweeps over scene
    # state, eager (jit-disabled) frame execution, frame-output NaN/Inf
    # checks — findings route through core.validation.debug_callback's
    # severity→log mapping. Slow by design; a CPU-backend debugging tool.
    enable_validation: bool = False
    # JAX platform preference: None = default, else "cpu"/"tpu".
    backend: str | None = None
    # Rasterizer tile size (rows, cols); cols should stay lane-aligned (×128).
    tile_h: int = 32
    tile_w: int = 128
    # Bucketed framebuffer shapes for resize → re-jit (SURVEY.md §3.5 analog).
    shape_buckets: tuple[tuple[int, int], ...] = (
        (800, 600),
        (1280, 720),
        (1920, 1080),
    )

    def aspect_ratio(self) -> float:
        return self.width / self.height

    def with_size(self, width: int, height: int) -> "RendererConfig":
        return dataclasses.replace(self, width=width, height=height)


def ensure_f32_matmuls() -> None:
    """Pin the default matmul/einsum precision to f32-accurate (HIGHEST).

    JAX's DEFAULT precision on TPU rounds f32 matmul operands to bf16
    (8 mantissa bits): vertex positions through the [Nv,4]x[4,4] MVP
    matmuls would land with ~0.2% coordinate error (≈ pixels at 1080p) and
    the barycentric/UV interpolation einsums would shimmer. The reference
    pipeline is f32 end-to-end (HLSL default precision), so every entry
    point (app, bench, dryrun, profilers) calls this; tests set the same
    flag in conftest. The affected matmuls are microseconds of MXU time —
    full-precision passes cost nothing measurable at this scale.
    """
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
