"""Frame manager: frames-in-flight over JAX async dispatch.

The reference FrameManager gates the CPU on per-frame fences so at most
MAX_FRAMES_IN_FLIGHT=2 frames are recorded ahead of the GPU
(frame_manager.rs:111-171, 341-588). JAX's async dispatch gives the same
pipelining for free: calling the jitted frame function *enqueues* work and
returns device futures. This class bounds the in-flight queue with the
rhi.sync primitives and maps the reference's step verbs:

    wait_for_frame   -> Fence.wait() on the oldest slot when the queue is full
    acquire/begin    -> pick the next FrameSync slot (fence reset ≙ begin_frame)
    submit           -> call the jitted frame fn and attach the result to the
                        slot's in-flight Fence (≙ vkQueueSubmit w/ fence)
    present          -> readback np.asarray (≙ fence wait + vkQueuePresentKHR)
    wait_for_all     -> drain every in-flight fence

Present-mode pacing is BEHAVIORAL (≙ the reference's MAILBOX-vs-FIFO
choice, swapchain.rs:594-611): under MAILBOX, `present_oldest` discards
stale *completed* frames and presents only the newest one ready (the
triple-buffer "replace the pending image" semantics); under FIFO every
submitted frame presents in order (vsync queue semantics).
"""

from __future__ import annotations

import collections
import logging
from typing import Any, Callable

import numpy as np

from renderer_rs_tpu.rhi.swapchain import PRESENT_FIFO, PRESENT_MAILBOX
from renderer_rs_tpu.rhi.sync import Fence, FrameSync

log = logging.getLogger("renderer_rs_tpu.renderer.frame_manager")

MAX_FRAMES_IN_FLIGHT = 2  # ≙ crates/renderer/src/lib.rs:43


class FrameManager:
    """Bounded async frame queue (≙ renderer::FrameManager)."""

    def __init__(
        self,
        frames_in_flight: int = MAX_FRAMES_IN_FLIGHT,
        present_mode: str = PRESENT_FIFO,
    ):
        if frames_in_flight < 1:
            raise ValueError("frames_in_flight must be >= 1")
        if present_mode not in (PRESENT_FIFO, PRESENT_MAILBOX):
            raise ValueError(f"unknown present mode: {present_mode}")
        self.frames_in_flight = frames_in_flight
        self.present_mode = present_mode
        # per-slot sync trio, fences created signaled so frame 0 never waits
        # (≙ create_frame_sync, renderer.rs:157-196 / sync.rs:150-176)
        self.frame_sync = tuple(
            FrameSync.create(signaled=True) for _ in range(frames_in_flight)
        )
        self._in_flight: collections.deque[Fence] = collections.deque()
        self.current_frame = 0
        self.frame_count = 0
        self.frames_dropped = 0  # MAILBOX: stale completed frames discarded
        # frames retired at submit time to bound the queue when the caller
        # outruns presentation (present=False bursts); these never present
        self.frames_retired_unpresented = 0

    def submit(self, frame_fn: Callable[..., Any], *args) -> None:
        """Enqueue one frame (≙ begin_frame + record + submit,
        frame_manager.rs:380-462). Blocks only when the queue is full
        (≙ wait_for_frame fence wait, frame_manager.rs:341-355). A frame
        retired here to make room never presents (the reference never hits
        this: its FIFO present blocks the loop instead; headless callers
        that skip presentation accept the drop) — counted in
        frames_retired_unpresented so callers can keep slot accounting."""
        if len(self._in_flight) >= self.frames_in_flight:
            self._in_flight.popleft().wait()  # ≙ vkWaitForFences
            self.frames_retired_unpresented += 1
        fence = self.frame_sync[self.current_frame].in_flight
        fence.reset()  # ≙ vkResetFences before reuse (renderer.rs:397-401)
        fence.attach(frame_fn(*args))  # ≙ vkQueueSubmit(..., fence)
        self._in_flight.append(fence)
        self.current_frame = (self.current_frame + 1) % self.frames_in_flight
        self.frame_count += 1

    def present_oldest(self) -> np.ndarray | None:
        """Readback one frame for presentation (≙ present,
        frame_manager.rs:499-518). Returns the [H,W,4] host array.

        FIFO: the oldest in-flight frame, always (every frame shows).
        MAILBOX: waits for the oldest, then — if newer frames have ALSO
        already completed — discards the stale ones and presents the
        newest completed frame (≙ MAILBOX replacing the queued image,
        swapchain.rs:594-602: "low latency, drops stale frames")."""
        if not self._in_flight:
            return None
        fence = self._in_flight.popleft()
        result = fence.wait()
        if self.present_mode == PRESENT_MAILBOX:
            dropped_now = 0
            while self._in_flight and self._in_flight[0].is_signaled():
                result = self._in_flight.popleft().wait()
                dropped_now += 1
            if dropped_now:
                self.frames_dropped += dropped_now
                log.debug(
                    "mailbox present: %d stale frame(s) dropped (%d total)",
                    dropped_now,
                    self.frames_dropped,
                )
        return np.asarray(result)

    def wait_for_all_frames(self) -> list[np.ndarray]:
        """Drain the queue (≙ wait_for_all_frames, frame_manager.rs:549-560;
        used before swapchain/resize recreation)."""
        out = []
        while self._in_flight:
            out.append(np.asarray(self._in_flight.popleft().wait()))
        return out

    @property
    def in_flight(self) -> int:
        return len(self._in_flight)
