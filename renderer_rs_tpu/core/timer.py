"""High-resolution frame timer.

Semantics match crates/core/src/timer.rs:7-58: ``elapsed()`` since creation or
last reset, ``tick()`` returning the delta since the previous tick, and
``delta_secs()`` exposing the last computed delta.
"""

from __future__ import annotations

import time


class Timer:
    """Frame timer over the monotonic clock (≙ core::Timer, timer.rs:7)."""

    def __init__(self) -> None:
        now = time.perf_counter()
        self._start = now
        self._last_tick = now
        self._delta = 0.0

    def elapsed(self) -> float:
        """Seconds since creation or :meth:`reset` (≙ Timer::elapsed, timer.rs:24)."""
        return time.perf_counter() - self._start

    def tick(self) -> float:
        """Advance the frame clock; returns seconds since the previous tick
        (≙ Timer::tick, timer.rs:33-41)."""
        now = time.perf_counter()
        self._delta = now - self._last_tick
        self._last_tick = now
        return self._delta

    def delta_secs(self) -> float:
        """Last delta computed by :meth:`tick` (≙ Timer::delta_secs, timer.rs:44)."""
        return self._delta

    def reset(self) -> None:
        """Restart the timer (≙ Timer::reset, timer.rs:52-58)."""
        now = time.perf_counter()
        self._start = now
        self._last_tick = now
        self._delta = 0.0
