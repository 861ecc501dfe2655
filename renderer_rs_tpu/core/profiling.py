"""Frame profiling and tracing.

The reference's observability is `tracing` spans + a frame Timer whose delta
is computed but not yet displayed (core/src/timer.rs, app/src/main.rs:77,
SURVEY.md §5 "Tracing/profiling"). The rebuild completes the story:

- FrameStats: rolling FPS / frame-time stats (the missing FPS counter)
- trace(): context manager around jax.profiler for device-level traces
  (≙ the GPU timestamp queries the reference lacks)
- log_pass_time: per-pass wall-clock logging at debug level, preserving the
  reference's create/destroy + frame-delta logging shape
"""

from __future__ import annotations

import collections
import contextlib
import logging
import time

log = logging.getLogger("renderer_rs_tpu.profiling")


class FrameStats:
    """Rolling frame statistics (window of N frames)."""

    def __init__(self, window: int = 120):
        self._times = collections.deque(maxlen=window)
        self._last = None
        self.frame_count = 0

    def tick(self) -> float:
        """Record a frame boundary; returns the last frame time (seconds)."""
        now = time.perf_counter()
        dt = 0.0
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        self.frame_count += 1
        return dt

    @property
    def fps(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def frame_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)

    @property
    def worst_ms(self) -> float:
        return 1000.0 * max(self._times) if self._times else 0.0

    def summary(self) -> str:
        return (
            f"{self.fps:.1f} FPS avg ({self.frame_ms:.2f} ms, "
            f"worst {self.worst_ms:.2f} ms, {self.frame_count} frames)"
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-level profiler trace (view with TensorBoard / xprof).

    ≙ the GPU timestamp queries + flamegraph integration the reference
    defers; on TPU jax.profiler captures per-op device timelines.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


@contextlib.contextmanager
def log_pass_time(name: str, sync=None):
    """Wall-clock a host-side pass; pass `sync` (an array/pytree) to block on
    device completion first (≙ vkQueueWaitIdle around a timestamped span)."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        import jax

        jax.block_until_ready(sync)
    log.debug("%s: %.2f ms", name, (time.perf_counter() - t0) * 1000.0)
