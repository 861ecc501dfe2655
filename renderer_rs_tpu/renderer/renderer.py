"""Renderer: top-level orchestration (≙ crates/renderer/src/renderer.rs).

Owns the Device, the compiled frame-function specializations (≙ pipelines),
the FrameManager (frames in flight), and the present surface. The per-frame
hot path (renderer.rs:367-449) collapses to:

    render_frame(): update UBO pytree -> jitted frame fn (async) ->
                    bounded queue -> readback -> surface.present

Resize keeps the reference's *deferred* semantics (renderer.rs:265-353):
a resize flag re-specializes the frame function at the next render_frame —
re-jit ≙ swapchain + pipeline recreation; there are no semaphores to heal.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import numpy as np

from renderer_rs_tpu.core.config import RendererConfig
from renderer_rs_tpu.core.profiling import FrameStats
from renderer_rs_tpu.ops.shadow import ShadowParams
from renderer_rs_tpu.platform.window import Window
from renderer_rs_tpu.renderer.frame_manager import FrameManager
from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
from renderer_rs_tpu.renderer.scene_build import GpuScene, SceneLayout
from renderer_rs_tpu.resources.ubo import CameraUbo
from renderer_rs_tpu.rhi.descriptor import layouts_for
from renderer_rs_tpu.rhi.device import Device
from renderer_rs_tpu.rhi.pipeline import GraphicsPipeline, GraphicsPipelineBuilder
from renderer_rs_tpu.rhi.shader import builtin_library
from renderer_rs_tpu.rhi.swapchain import Swapchain
from renderer_rs_tpu.scene.camera import Camera
from renderer_rs_tpu.utils.image_io import framebuffer_to_u8

log = logging.getLogger("renderer_rs_tpu.renderer")

# Clear color of the reference's Phase-1 frame (renderer.rs:479-501).
DEFAULT_CLEAR = (0.1, 0.1, 0.15, 1.0)


class Renderer:
    """≙ renderer::Renderer (renderer.rs:98-683)."""

    def __init__(
        self,
        window: Window,
        config: RendererConfig | None = None,
        pipeline: GraphicsPipeline | None = None,
        shading: ShadingModel = ShadingModel.PBR,
        clear_color: tuple = DEFAULT_CLEAR,
        tonemap: str = "none",
        shadow_map_size: int = 1024,
        shadow_params: ShadowParams = ShadowParams(),
        camera: Camera | None = None,
    ) -> None:
        self.window = window
        # host-side Camera the app's controllers mutate (scene factories
        # pass it through their kwargs); update_camera() refreshes the UBO
        self.camera = camera
        self.config = (config or RendererConfig()).with_size(window.width, window.height)
        self.device = Device(self.config.backend)
        self.surface = window.create_surface()
        self.pipeline = pipeline or GraphicsPipelineBuilder().build()
        self.shading = shading
        self.clear_color = tuple(clear_color)
        self.tonemap = tonemap
        self.shadow_map_size = shadow_map_size
        self.shadow_params = shadow_params
        # swapchain: rotating present slots behind the Surface (≙ Renderer
        # owning the Swapchain, renderer.rs:55-86); resize marks it stale.
        # Its chosen present mode drives the FrameManager's pacing behavior
        # (MAILBOX drops stale completed frames; FIFO queues all).
        self.swapchain = Swapchain(window.width, window.height)
        self.frame_manager = FrameManager(
            self.config.frames_in_flight, present_mode=self.swapchain.present_mode
        )
        # depth attachment parameters (≙ renderer-owned DepthBuffer,
        # depth_buffer.rs:117-228; recreated with the swapchain on resize) —
        # its clear value seeds the frame's DepthAttachment below
        from renderer_rs_tpu.renderer.depth_buffer import DepthBuffer

        self.depth_buffer = DepthBuffer(window.width, window.height)
        self._pending_slots: list[int] = []  # acquired indices of in-flight frames
        self._scene: GpuScene | None = None
        self._layout: SceneLayout | None = None
        self._framebuffer_resized = False
        self._frame_fn = None  # compiled specialization (≙ the pipeline object)
        self._shadow_fn = None  # separate jit: resize does NOT recompile it
        self._shadow_cache = None  # (shadow-inputs identity key, shadow map)
        # compiled-specialization cache keyed by (w, h): resizing back to a
        # previously-seen extent (e.g. the shape_buckets) is recompile-free,
        # the way Vulkan keeps pipeline objects alive across swapchain
        # recreations (pipeline.rs pipelines are extent-independent)
        self._fn_cache: dict = {}
        self.last_frame: np.ndarray | None = None
        self.stats = FrameStats()  # rolling FPS (the reference's missing counter)
        log.info(
            "renderer created: %dx%d on %s",
            self.config.width,
            self.config.height,
            self.device.platform,
        )

    # --- scene ---------------------------------------------------------------
    def set_scene(self, scene: GpuScene, layout: SceneLayout) -> None:
        """Bind the scene. A new layout re-specializes the frame function
        (≙ building pipelines for a new vertex/descriptor layout)."""
        # descriptor-set validation (≙ the validation layer catching an
        # unbound set at bind time): every set the (shading, layout) pair
        # requires must resolve to a non-None scene binding
        for set_layout in layouts_for(self.shading, layout):
            set_layout.validate(scene)
        if self.config.enable_validation:
            # validation mode (≙ enabling VK_LAYER_KHRONOS_validation,
            # instance.rs:62-131): finite-sweep the bound state; findings
            # route through core.validation.debug_callback
            from renderer_rs_tpu.core.validation import validate_scene

            validate_scene(scene, layout)
        if layout != self._layout:
            self._frame_fn = None
            self._shadow_fn = None
            self._shadow_cache = None
            self._fn_cache.clear()
        self._scene = scene
        self._layout = layout

    def update_camera(self, camera: Camera) -> None:
        """Refresh the camera UBO from a scene Camera (≙ CameraUbo update)."""
        if self._scene is None:
            raise RuntimeError("no scene bound")
        self._scene = self._scene.replace(
            camera=CameraUbo.create(
                camera.view_matrix(), camera.projection_matrix(), camera.position
            )
        )

    def update_scene(self, scene: GpuScene) -> None:
        """Swap dynamic scene state (same layout: no recompile)."""
        self._scene = scene

    # --- resize (≙ renderer.rs:265-353) ---------------------------------------
    def resize(self, width: int, height: int) -> None:
        """Deferred: takes effect at the next render_frame."""
        self.window.resize(width, height)
        self.swapchain.mark_stale()  # ≙ ERROR_OUT_OF_DATE on next acquire
        self._framebuffer_resized = True

    def _recreate_if_needed(self) -> None:
        if not self._framebuffer_resized:
            return
        # ≙ wait_for_all_frames before swapchain recreate (renderer.rs:286-296)
        self.frame_manager.wait_for_all_frames()
        self._pending_slots.clear()
        self.config = self.config.with_size(self.window.width, self.window.height)
        self.swapchain.recreate(self.config.width, self.config.height)
        from renderer_rs_tpu.renderer.depth_buffer import DepthBuffer

        # ≙ DepthBuffer recreated alongside the swapchain (depth_buffer.rs)
        self.depth_buffer = DepthBuffer(
            self.config.width, self.config.height, self.depth_buffer.clear_depth
        )
        self._frame_fn = None  # re-jit for the new extent
        self._framebuffer_resized = False
        log.debug("framebuffer recreated: %dx%d", self.config.width, self.config.height)

    # --- frame function --------------------------------------------------------
    def _needs_shadow(self) -> bool:
        return bool(self._layout.has_csm or self._layout.has_shadow)

    def _build_shadow_fn(self):
        """Compile the shadow pass as its OWN jit: it depends on the shadow
        map size and layout but not on the framebuffer extent, so a window
        resize never re-pays this compile."""
        from renderer_rs_tpu.renderer.passes import csm_shadow_pass, shadow_map_pass

        layout = self._layout
        sm_size = self.shadow_map_size

        def shadow_py(scene: GpuScene):
            if layout.has_csm:
                return csm_shadow_pass(scene, layout, sm_size)
            return shadow_map_pass(scene, layout, sm_size)

        if self.config.enable_validation:
            # validation mode: run the pass eagerly (≙ the validation
            # layers interposing every call; stage boundaries become real
            # values instead of one fused program)
            def shadow_eager(scene: GpuScene):
                with jax.disable_jit():
                    return shadow_py(scene)

            return shadow_eager

        shadow = jax.jit(shadow_py)

        t0 = time.perf_counter()
        compiled = shadow.lower(self._scene).compile()
        log.info(
            "shadow pass compiled in %.2fs (%d^2%s)",
            time.perf_counter() - t0,
            sm_size,
            " x4 cascades" if layout.has_csm else "",
        )
        return compiled

    # shading model -> shader-stage names, the analog of the reference's
    # SPIR-V file table (renderer.rs:210-222); resolved against the registry
    # at pipeline build so a missing stage fails like a missing .spv
    _STAGE_TABLE = {
        ShadingModel.FLAT: ("triangle.vert", "triangle.frag"),
        ShadingModel.BLINN_PHONG: ("model.vert", "model_full.frag"),
        ShadingModel.PBR: ("model.vert", "model_pbr.frag"),
        ShadingModel.PBR_IBL: ("model.vert", "model_pbr_ibl.frag"),
    }

    def _resolve_shader_stages(self) -> tuple:
        """Look up every stage this frame specialization fuses
        (≙ Shader::from_spirv_file ×N, renderer.rs:205-260)."""
        lib = builtin_library()
        names = list(self._STAGE_TABLE[self.shading])
        if self._needs_shadow():
            names.append("shadow.vert")
        if self._layout is not None and self._layout.has_environment:
            names.append("skybox.frag")
        if self.tonemap != "none":
            names.append("tonemap.frag")
        return tuple(lib.get(n) for n in names)  # ShaderError if unregistered

    def _build_frame_fn(self):
        """Compile the forward-frame specialization for the current extent
        (≙ vkCreateGraphicsPipelines: the expensive driver compile happens
        once per extent, SURVEY.md §3.1; cached across resizes)."""
        stages = self._resolve_shader_stages()
        log.debug(
            "pipeline stages: %s",
            [s.stage_create_info() for s in stages],
        )
        layout = self._layout
        pipeline = self.pipeline
        shading = self.shading
        width, height = self.config.width, self.config.height
        tonemap = self.tonemap
        sm_size = self.shadow_map_size
        sp = self.shadow_params
        split_shadow = self._needs_shadow()
        # the frame's attachment state (≙ cmd_begin_rendering's
        # RenderingInfo, renderer.rs:479-501): clear color/depth flow from
        # the attachment configs, not ad-hoc kwargs
        from renderer_rs_tpu.rhi.rendering import (
            ColorAttachment,
            DepthAttachment,
            RenderingConfig,
        )

        rc = RenderingConfig(
            width=width,
            height=height,
            color=ColorAttachment(clear_color=tuple(self.clear_color)),
            # the depth attachment's clear value comes from the renderer's
            # DepthBuffer (≙ the DepthBuffer image bound as depth attachment)
            depth=DepthAttachment(clear_depth=self.depth_buffer.clear_depth),
        )

        if split_shadow:

            def frame_py(scene: GpuScene, shadow_map):
                return forward_frame(
                    scene, layout, pipeline, shading, width, height,
                    rendering=rc, tonemap=tonemap,
                    shadow_map_size=sm_size, shadow_params=sp,
                    shadow_map=shadow_map,
                )

        else:

            def frame_py(scene: GpuScene):
                return forward_frame(
                    scene, layout, pipeline, shading, width, height,
                    rendering=rc, tonemap=tonemap,
                    shadow_map_size=sm_size, shadow_params=sp,
                )

        if self.config.enable_validation:
            # validation mode: eager frame (≙ running under the layers —
            # slow by design; a CPU-backend debugging tool, see
            # core/validation.py). Returns BEFORE building the AOT
            # example args: rendering a throwaway eager shadow map just
            # to discard it would pay a full per-op pass for nothing.
            def frame_eager(*args):
                with jax.disable_jit():
                    return frame_py(*args)

            return frame_eager

        example = (
            (self._scene, self._shadow_fn(self._scene))
            if split_shadow
            else (self._scene,)
        )
        frame = jax.jit(frame_py)

        t0 = time.perf_counter()
        compiled = frame.lower(*example).compile()
        log.info(
            "frame function compiled in %.2fs (%dx%d, %s, %d objects, %d tris)",
            time.perf_counter() - t0,
            width,
            height,
            shading.value,
            layout.num_objects,
            layout.num_triangles,
        )
        return compiled

    def _ensure_compiled(self) -> None:
        if self._needs_shadow() and self._shadow_fn is None:
            self._shadow_fn = self._build_shadow_fn()
        # the clear state is baked into the specialization (it flows through
        # the RenderingConfig at trace time), so it is part of the cache key
        # and re-resolved every frame: changing clear_color/clear_depth (or
        # resizing back to a seen extent after such a change) swaps to the
        # matching compile instead of silently reusing a stale one
        key = (
            self.config.width, self.config.height,
            self.clear_color, self.depth_buffer.clear_depth,
        )
        if self._frame_fn is None or self._fn_cache.get(key) is not self._frame_fn:
            if key not in self._fn_cache:
                self._fn_cache[key] = self._build_frame_fn()
            self._frame_fn = self._fn_cache[key]

    def _shadow_inputs_key(self, scene: GpuScene) -> tuple:
        """Identity key over everything the shadow pass reads: geometry,
        object transforms, and the light matrices. Camera/material/light-
        color updates don't appear here, so camera-only frames (the orbit
        and fly demos) reuse the cached map.

        The key holds the array OBJECTS (compared with `is`), not id()s:
        the cache keeping the references alive is what makes the identity
        test sound — a freed array's id() can be reused by a new allocation
        after two scene swaps, which would serve a stale shadow map."""
        return (
            scene.positions, scene.tris, scene.models,
            scene.light_space_matrix, scene.csm_matrices,
        )

    def _run_frame(self, scene: GpuScene):
        """The per-frame dispatch: shadow jit feeds the forward jit (both
        async; XLA orders them by dataflow). The shadow map re-renders only
        when its inputs changed (geometry/transforms/light) — the static-
        scene shadow cache every production engine keeps."""
        if self._needs_shadow():
            key = self._shadow_inputs_key(scene)
            if self._shadow_cache is None or not all(
                a is b for a, b in zip(self._shadow_cache[0], key)
            ):
                self._shadow_cache = (key, self._shadow_fn(scene))
            out = self._frame_fn(scene, self._shadow_cache[1])
        else:
            out = self._frame_fn(scene)
        if self.config.enable_validation:
            # frame-product validation (≙ the layers flagging a bad
            # present source); synchronous by design in validation mode
            from renderer_rs_tpu.core.validation import validate_frame_output

            validate_frame_output(out)
        return out

    def precompile_buckets(self) -> None:
        """Pre-warm forward-pass specializations for config.shape_buckets so
        interactive resizes between standard extents never stall."""
        orig = self.config
        try:
            for w, h in self.config.shape_buckets:
                self.config = self.config.with_size(w, h)
                key = (w, h)
                if key not in self._fn_cache:
                    if self._needs_shadow() and self._shadow_fn is None:
                        self._shadow_fn = self._build_shadow_fn()
                    self._fn_cache[key] = self._build_frame_fn()
        finally:
            self.config = orig

    # --- hot path (≙ render_frame, renderer.rs:367-449) -------------------------
    def render_frame(self, present: bool = True) -> np.ndarray | None:
        """Render one frame; returns the presented uint8 image (or None while
        the pipeline is still filling)."""
        if self._scene is None or self._layout is None:
            raise RuntimeError("no scene bound — call set_scene first")
        self._recreate_if_needed()
        self._ensure_compiled()

        # acquire the frame's swapchain slot; a stale chain recreates and
        # skips this frame (≙ acquire ERROR_OUT_OF_DATE -> recreate + return,
        # renderer.rs:385-394)
        image_index, needs_recreate = self.swapchain.acquire_next_image()
        if needs_recreate:
            self._framebuffer_resized = True
            self._recreate_if_needed()
            self._ensure_compiled()
            image_index, _ = self.swapchain.acquire_next_image()

        # submit (async enqueue; blocks only when 2 frames are in flight).
        # The manager may retire frames without presenting them — stale
        # completed frames under MAILBOX, or the oldest frame when a
        # present=False burst fills the queue; consume one acquired slot
        # per retired frame so slots track the in-flight queue exactly.
        def _retired() -> int:
            fm = self.frame_manager
            return fm.frames_dropped + fm.frames_retired_unpresented

        retired_before = _retired()
        self.frame_manager.submit(self._run_frame, self._scene)
        self._pending_slots.append(image_index)
        self.stats.tick()

        if not present:
            for _ in range(_retired() - retired_before):
                self._pending_slots.pop(0)
            return None
        # present the oldest finished frame: device->host readback + sRGB
        # encode into its swapchain slot, then out the window surface.
        # Under MAILBOX the presented frame is the newest completed one.
        fb = self.frame_manager.present_oldest()
        if fb is None:
            return None
        u8 = framebuffer_to_u8(fb)
        for _ in range(_retired() - retired_before):
            self._pending_slots.pop(0)
        slot = self._pending_slots.pop(0)
        suboptimal = self.swapchain.present(slot, u8)
        if suboptimal:  # ≙ SUBOPTIMAL_KHR -> recreate next frame
            self._framebuffer_resized = True
        self.surface.present(u8)
        self.last_frame = u8
        return u8

    def render_frame_hdr(self):
        """Synchronous single frame, returning the linear device array
        (bench/golden path; no sRGB encode, no surface)."""
        self._ensure_compiled()
        return self._run_frame(self._scene)

    def frame_diagnostics(self) -> dict:
        """Render one diagnostics frame and return the bounded-path
        counters as Python ints: peel_exhausted (alpha-cutoff depth peels
        beyond the 4-layer budget — those pixels resolved to background)
        and clip_overflow (near-clip secondary halves beyond the
        compaction cap — dropped clipped halves). Non-zero counters are
        logged at WARNING so a library user on a foliage-heavy or
        camera-in-geometry scene sees the documented bound fire instead
        of silently losing fragments (VERDICT r3 weak 6). Compiles its
        own specialization on first use — a debugging/validation surface,
        not a per-frame call."""
        if self._scene is None or self._layout is None:
            raise RuntimeError("no scene bound — call set_scene first")
        import jax

        from renderer_rs_tpu.renderer.passes import forward_frame

        # ONE jitted program (eager jnp ops on the TPU backend each pay
        # the remote-compile hop — CLAUDE.md); closure captures the
        # static config, the scene rides as the traced argument. pjit's
        # trace cache keys on the CALLABLE's identity, so the closure is
        # built once per (layout, pipeline, shading) specialization and
        # cached on self — a fresh lambda per call would re-trace (and on
        # the TPU backend re-pay the remote-compile hop) every time.
        diag_key = (
            self._layout, self.pipeline, self.shading,
            self.config.width, self.config.height, self.clear_color,
            self.tonemap, self.shadow_map_size, self.shadow_params,
        )
        if getattr(self, "_diag_key", None) != diag_key:
            self._diag_fn = jax.jit(
                lambda s: forward_frame(
                    s, self._layout, self.pipeline, self.shading,
                    self.config.width, self.config.height,
                    clear_color=self.clear_color, tonemap=self.tonemap,
                    shadow_map_size=self.shadow_map_size,
                    shadow_params=self.shadow_params,
                    diagnostics=True,
                )
            )
            self._diag_key = diag_key
        _, diag = self._diag_fn(self._scene)
        out = {k: int(v) for k, v in diag.items()}
        for name, count in out.items():
            if count:
                log.warning(
                    "frame diagnostics: %s = %d (documented bound fired "
                    "— see ROADMAP.md Known deviations)", name, count,
                )
        return out

    def wait_idle(self) -> None:
        """≙ device.wait_idle on drop (renderer.rs:635-683)."""
        self.frame_manager.wait_for_all_frames()
        self.device.wait_idle()
