"""Synchronization primitives over JAX async dispatch.

TPU reinterpretation of crates/rhi/src/sync.rs. Vulkan needs explicit
GPU-GPU semaphores and CPU-GPU fences (sync.rs:62-307) because command
streams are opaque; XLA's dataflow graph orders device work automatically,
so only the CPU<->device edge survives:

- Fence: wraps in-flight device values; wait() ≙ vkWaitForFences
  (block_until_ready), is_signaled() ≙ vkGetFenceStatus (non-blocking
  readiness probe), signaled-create for the first-frame case
  (sync.rs:150-176).
- Semaphore: retained as a no-op marker type so frame-loop code that names
  its dependency edges still reads like the reference
  (image_available/render_finished, sync.rs:366-460); the ordering it would
  enforce is already guaranteed by dataflow.
- FrameSync: the per-frame trio bundle (sync.rs:366-460).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

MAX_FRAMES_IN_FLIGHT = 2  # ≙ sync.rs:314


class Fence:
    """CPU-device completion handle (≙ rhi::Fence, sync.rs:134-307)."""

    def __init__(self, signaled: bool = False) -> None:
        self._value: Any = None
        self._signaled = signaled

    def attach(self, value: Any) -> None:
        """Associate the fence with in-flight device value(s) (≙ passing the
        fence to vkQueueSubmit)."""
        self._value = value
        self._signaled = False

    def wait(self) -> Any:
        """Block until the attached work completes (≙ vkWaitForFences)."""
        if self._value is not None:
            jax.block_until_ready(self._value)
            self._signaled = True
        return self._value

    def is_signaled(self) -> bool:
        """Non-blocking status probe (≙ vkGetFenceStatus)."""
        if self._signaled or self._value is None:
            return self._signaled
        try:
            ready = all(
                getattr(leaf, "is_ready", lambda: True)()
                for leaf in jax.tree.leaves(self._value)
            )
        except Exception:  # noqa: BLE001 - conservatively not-ready
            ready = False
        self._signaled = ready
        return ready

    def reset(self) -> None:
        """≙ vkResetFences."""
        self._value = None
        self._signaled = False


class Semaphore:
    """GPU-GPU dependency marker (≙ rhi::Semaphore, sync.rs:62-120).

    Pure documentation of an edge the XLA dataflow already enforces; kept so
    frame-loop code names its dependencies like the reference does.
    """

    def __init__(self, name: str = "") -> None:
        self.name = name

    def __repr__(self) -> str:
        return f"Semaphore({self.name!r})"


@dataclasses.dataclass
class FrameSync:
    """Per-frame sync trio (≙ rhi::FrameSync, sync.rs:366-460)."""

    image_available: Semaphore
    render_finished: Semaphore
    in_flight: Fence

    @staticmethod
    def create(signaled: bool = True) -> "FrameSync":
        # fences start signaled so frame 0 doesn't deadlock (sync.rs:150-176)
        return FrameSync(
            image_available=Semaphore("image_available"),
            render_finished=Semaphore("render_finished"),
            in_flight=Fence(signaled=signaled),
        )
