"""Command recording: the draw-list layer.

TPU reinterpretation of crates/rhi/src/command.rs. A Vulkan CommandBuffer
records ~30 vkCmd* calls into a driver object replayed by the GPU
(command.rs:250-1040). Under XLA, *tracing is recording*: the recorder below
captures the same verbs (bind pipeline, bind vertex/index data, set
viewport, draw, dispatch) into a host-side DrawList that SceneBuilder lowers
into the static SceneLayout + GpuScene pytree — the recorded program then
IS the jitted frame function.

The state-machine validation the reference gets from the validation layer
(begin before record, pipeline bound before draw, reset semantics,
one-time-submit) is enforced here eagerly.
"""

from __future__ import annotations

import dataclasses
import enum
import logging
from typing import Any

from renderer_rs_tpu.core.errors import RhiError
from renderer_rs_tpu.rhi.pipeline import GraphicsPipeline

log = logging.getLogger("renderer_rs_tpu.rhi.command")


class _State(enum.Enum):
    INITIAL = "initial"
    RECORDING = "recording"
    EXECUTABLE = "executable"


@dataclasses.dataclass
class DrawCmd:
    """One recorded draw (≙ cmd_draw_indexed, command.rs:585-616)."""

    pipeline: GraphicsPipeline
    mesh: Any  # resources.Mesh (vertex/index data)
    transform: Any  # scene.Transform (the push-constant/UBO analog)
    material: Any  # resources.Material | int


@dataclasses.dataclass
class ModelDrawCmd:
    """One recorded multi-mesh model draw (≙ the per-primitive draw loop a
    glTF model expands into, renderer.rs:535-538)."""

    pipeline: GraphicsPipeline
    model: Any  # resources.Model
    transform: Any


@dataclasses.dataclass
class DispatchCmd:
    """One recorded compute dispatch (≙ cmd_dispatch, command.rs:690-713):
    a jittable function + args, executed in submission order."""

    fn: Any
    args: tuple


class CommandBuffer:
    """Recording state machine (≙ rhi::CommandBuffer)."""

    def __init__(self) -> None:
        self._state = _State.INITIAL
        self.draws: list[DrawCmd] = []
        self.dispatches: list[DispatchCmd] = []
        self._pipeline: GraphicsPipeline | None = None
        self._viewport: tuple | None = None

    # --- lifecycle (command.rs:280-360) -------------------------------------
    def begin(self) -> "CommandBuffer":
        if self._state == _State.RECORDING:
            raise RhiError("command buffer already recording")
        self._state = _State.RECORDING
        self.draws.clear()
        self.dispatches.clear()
        self._pipeline = None
        return self

    def end(self) -> "CommandBuffer":
        self._require_recording()
        self._state = _State.EXECUTABLE
        return self

    def reset(self) -> "CommandBuffer":
        """≙ RESET_COMMAND_BUFFER pool flag semantics (command.rs:89-120)."""
        self._state = _State.INITIAL
        self.draws.clear()
        self.dispatches.clear()
        return self

    # --- recording verbs ------------------------------------------------------
    def bind_pipeline(self, pipeline: GraphicsPipeline) -> "CommandBuffer":
        self._require_recording()
        self._pipeline = pipeline
        return self

    def set_viewport(self, width: int, height: int) -> "CommandBuffer":
        self._require_recording()
        self._viewport = (width, height)
        return self

    def draw_mesh(self, mesh, transform=None, material=None) -> "CommandBuffer":
        """≙ bind vertex/index buffers + cmd_draw_indexed."""
        self._require_recording()
        if self._pipeline is None:
            raise RhiError("draw recorded with no pipeline bound")
        self.draws.append(DrawCmd(self._pipeline, mesh, transform, material))
        return self

    def draw_model(self, model, transform=None) -> "CommandBuffer":
        """Record every mesh of a glTF model with its material table
        (≙ the app iterating model primitives into draw calls)."""
        self._require_recording()
        if self._pipeline is None:
            raise RhiError("draw recorded with no pipeline bound")
        self.draws.append(ModelDrawCmd(self._pipeline, model, transform))
        return self

    def dispatch(self, fn, *args) -> "CommandBuffer":
        """≙ cmd_dispatch: a compute program (e.g. an IBL precompute)."""
        self._require_recording()
        self.dispatches.append(DispatchCmd(fn, args))
        return self

    # --- lowering ---------------------------------------------------------------
    def build_scene(self, builder=None, **builder_kwargs):
        """Lower the recorded draw list into (GpuScene, SceneLayout) — the
        point where "recording" becomes the traced frame program.

        All draws must share one pipeline (one specialization); mixed-pipeline
        command buffers split into multiple passes at the renderer level.

        builder: an optional pre-configured SceneBuilder carrying the
        resource bindings (textures/lights/camera/environment — the
        descriptor-set side); the draw list is lowered into it in recorded
        order. Simple single-arg bindings can ride **builder_kwargs
        (`set_<key>(value)`) instead.
        """
        from renderer_rs_tpu.renderer.scene_build import SceneBuilder

        if self._state != _State.EXECUTABLE:
            raise RhiError("command buffer not ended (≙ submitting unrecorded cb)")
        if not self.draws:
            raise RhiError("command buffer has no draws")
        pipelines = {id(d.pipeline) for d in self.draws}
        if len(pipelines) > 1:
            raise RhiError("mixed pipelines in one draw list; split passes")
        builder = builder if builder is not None else SceneBuilder()
        for d in self.draws:
            if isinstance(d, ModelDrawCmd):
                builder.add_model(d.model, d.transform)
            else:
                builder.add_mesh(d.mesh, d.transform, d.material)
        for key, value in builder_kwargs.items():
            getattr(builder, f"set_{key}")(value)
        scene, layout = builder.build()
        return scene, layout, self.draws[0].pipeline

    def execute_dispatches(self) -> list:
        """Run recorded compute dispatches in order; returns their results."""
        if self._state != _State.EXECUTABLE:
            raise RhiError("command buffer not ended")
        return [d.fn(*d.args) for d in self.dispatches]

    def _require_recording(self) -> None:
        if self._state != _State.RECORDING:
            raise RhiError("command buffer is not recording (call begin())")


class CommandPool:
    """≙ rhi::CommandPool (command.rs:89-236): allocation bookkeeping."""

    def __init__(self, transient: bool = False) -> None:
        self.transient = transient
        self._buffers: list[CommandBuffer] = []

    def allocate(self, count: int = 1) -> list[CommandBuffer]:
        out = [CommandBuffer() for _ in range(count)]
        self._buffers.extend(out)
        return out

    def reset(self) -> None:
        for b in self._buffers:
            b.reset()

    @property
    def allocated(self) -> int:
        return len(self._buffers)
