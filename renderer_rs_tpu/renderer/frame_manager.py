"""Frame manager: frames-in-flight over JAX async dispatch.

The reference FrameManager gates the CPU on per-frame fences so at most
MAX_FRAMES_IN_FLIGHT=2 frames are recorded ahead of the GPU
(frame_manager.rs:111-171, 341-588). JAX's async dispatch gives the same
pipelining for free: calling the jitted frame function *enqueues* work and
returns device futures. This class bounds the in-flight queue and maps the
reference's step verbs:

    wait_for_frame   -> block on the oldest future when the queue is full
    acquire/begin    -> pick the next framebuffer slot
    submit           -> call the jitted frame fn (enqueue)
    present          -> readback np.asarray (≙ fence wait + vkQueuePresentKHR)
    wait_for_all     -> drain every in-flight frame
"""

from __future__ import annotations

import collections
import logging
from typing import Any, Callable

import jax
import numpy as np

log = logging.getLogger("renderer_rs_tpu.renderer.frame_manager")

MAX_FRAMES_IN_FLIGHT = 2  # ≙ crates/renderer/src/lib.rs:43


class FrameManager:
    """Bounded async frame queue (≙ renderer::FrameManager)."""

    def __init__(self, frames_in_flight: int = MAX_FRAMES_IN_FLIGHT):
        if frames_in_flight < 1:
            raise ValueError("frames_in_flight must be >= 1")
        self.frames_in_flight = frames_in_flight
        self._in_flight: collections.deque = collections.deque()
        self.current_frame = 0
        self.frame_count = 0

    def submit(self, frame_fn: Callable[..., Any], *args) -> None:
        """Enqueue one frame (≙ begin_frame + record + submit,
        frame_manager.rs:380-462). Blocks only when the queue is full
        (≙ wait_for_frame fence wait, frame_manager.rs:341-355)."""
        if len(self._in_flight) >= self.frames_in_flight:
            oldest = self._in_flight.popleft()
            jax.block_until_ready(oldest)  # fence wait
        self._in_flight.append(frame_fn(*args))
        self.current_frame = (self.current_frame + 1) % self.frames_in_flight
        self.frame_count += 1

    def present_oldest(self) -> np.ndarray | None:
        """Readback the oldest completed frame (≙ present,
        frame_manager.rs:499-518). Returns the [H,W,4] host array."""
        if not self._in_flight:
            return None
        return np.asarray(self._in_flight.popleft())

    def wait_for_all_frames(self) -> list[np.ndarray]:
        """Drain the queue (≙ wait_for_all_frames, frame_manager.rs:549-560;
        used before swapchain/resize recreation)."""
        out = []
        while self._in_flight:
            out.append(np.asarray(self._in_flight.popleft()))
        return out

    @property
    def in_flight(self) -> int:
        return len(self._in_flight)
