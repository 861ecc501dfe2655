"""Swapchain: double-buffered framebuffer arrays + present policy.

TPU reinterpretation of crates/rhi/src/swapchain.rs. The driver objects
disappear, but every *decision* the reference makes survives with the same
semantics:

- choose_surface_format: B8G8R8A8_SRGB preferred (swapchain.rs:561-588)
  -> framebuffer encode format selection (srgb8 preferred over linear)
- choose_present_mode: MAILBOX -> FIFO fallback (swapchain.rs:594-611)
  -> present pacing policy (mailbox = drop stale frames, fifo = queue all)
- choose_extent: clamp requested size into device capability bounds
  (swapchain.rs:617-656) -> identical clamp over configured shape buckets
- determine_image_count: min+1, clamped by max (swapchain.rs:662-684)
- acquire/present/recreate: slot rotation over pre-allocated framebuffer
  arrays; resize marks the chain stale (≙ ERROR_OUT_OF_DATE_KHR) and
  recreate() rebuilds with the new extent (swapchain.rs:307-352)
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from renderer_rs_tpu.core.errors import RhiError

log = logging.getLogger("renderer_rs_tpu.rhi.swapchain")

FORMAT_SRGB8 = "b8g8r8a8_srgb"
FORMAT_LINEAR_F32 = "rgba32_sfloat"

PRESENT_MAILBOX = "mailbox"
PRESENT_FIFO = "fifo"


@dataclasses.dataclass(frozen=True)
class SurfaceCapabilities:
    """≙ vk::SurfaceCapabilitiesKHR (the fields the choice logic reads)."""

    min_image_count: int = 2
    max_image_count: int = 0  # 0 = unlimited (Vulkan convention)
    min_extent: tuple[int, int] = (1, 1)
    max_extent: tuple[int, int] = (8192, 8192)
    current_extent: tuple[int, int] | None = None  # None ≙ u32::MAX sentinel


def choose_surface_format(available: list[str]) -> str:
    """Prefer sRGB8, else the first available (≙ swapchain.rs:561-588)."""
    if not available:
        raise RhiError("no surface formats available")
    return FORMAT_SRGB8 if FORMAT_SRGB8 in available else available[0]


def choose_present_mode(available: list[str]) -> str:
    """MAILBOX preferred (low latency, drops stale frames), FIFO guaranteed
    fallback (≙ swapchain.rs:594-611)."""
    return PRESENT_MAILBOX if PRESENT_MAILBOX in available else PRESENT_FIFO


def choose_extent(
    caps: SurfaceCapabilities, desired: tuple[int, int]
) -> tuple[int, int]:
    """If the surface dictates an extent use it; else clamp the request into
    the capability bounds (≙ swapchain.rs:617-656)."""
    if caps.current_extent is not None:
        return caps.current_extent
    w = min(max(desired[0], caps.min_extent[0]), caps.max_extent[0])
    h = min(max(desired[1], caps.min_extent[1]), caps.max_extent[1])
    return (w, h)


def determine_image_count(caps: SurfaceCapabilities) -> int:
    """min+1 for pipelining, clamped by the max (0 = unbounded)
    (≙ swapchain.rs:662-684)."""
    count = caps.min_image_count + 1
    if caps.max_image_count > 0:
        count = min(count, caps.max_image_count)
    return count


class Swapchain:
    """Rotating framebuffer slots with reference recreate semantics."""

    def __init__(
        self,
        width: int,
        height: int,
        caps: SurfaceCapabilities | None = None,
        formats: list[str] | None = None,
        present_modes: list[str] | None = None,
    ) -> None:
        caps = caps or SurfaceCapabilities()
        self.format = choose_surface_format(formats or [FORMAT_SRGB8])
        self.present_mode = choose_present_mode(present_modes or [PRESENT_MAILBOX])
        self.extent = choose_extent(caps, (width, height))
        self.image_count = determine_image_count(caps)
        self._caps = caps
        self._images: list[np.ndarray | None] = [None] * self.image_count
        self._next = 0
        self._stale = False
        log.debug(
            "swapchain created: %dx%d x%d %s/%s",
            *self.extent, self.image_count, self.format, self.present_mode,
        )

    @property
    def width(self) -> int:
        return self.extent[0]

    @property
    def height(self) -> int:
        return self.extent[1]

    def mark_stale(self) -> None:
        """≙ receiving ERROR_OUT_OF_DATE_KHR / a resize event."""
        self._stale = True

    def acquire_next_image(self) -> tuple[int, bool]:
        """Returns (image_index, needs_recreate) — the two-channel result of
        vkAcquireNextImageKHR (swapchain.rs:371-395)."""
        if self._stale:
            return (self._next, True)
        idx = self._next
        self._next = (self._next + 1) % self.image_count
        return (idx, False)

    def present(self, index: int, frame: np.ndarray) -> bool:
        """Store the frame into its slot; returns suboptimal flag
        (≙ swapchain.rs:425-441)."""
        if frame.shape[0] != self.height or frame.shape[1] != self.width:
            self._stale = True
            return True
        self._images[index] = frame
        return self._stale

    def image(self, index: int) -> np.ndarray | None:
        return self._images[index]

    def recreate(self, width: int, height: int) -> None:
        """Rebuild for a new extent, dropping old images (the reference
        reuses old_swapchain then destroys it — swapchain.rs:307-352)."""
        self.extent = choose_extent(self._caps, (width, height))
        self._images = [None] * self.image_count
        self._next = 0
        self._stale = False
        log.debug("swapchain recreated: %dx%d", *self.extent)
