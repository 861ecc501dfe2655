"""Depth buffer (≙ crates/renderer/src/depth_buffer.rs).

The reference allocates a D32_SFLOAT GPU image with careful failure-path
cleanup (depth_buffer.rs:117-228); on TPU a depth buffer is a [H,W] f32
array — creation cannot partially fail, and "layout transitions" don't
exist. Kept as a tiny type so the renderer's API shape matches.
"""

from __future__ import annotations

import jax.numpy as jnp


class DepthBuffer:
    """D32_SFLOAT-equivalent depth attachment (default format,
    depth_buffer.rs:48)."""

    FORMAT = "d32_sfloat"

    def __init__(self, width: int, height: int, clear_depth: float = 1.0):
        self.width = width
        self.height = height
        self.clear_depth = clear_depth

    def clear(self) -> jnp.ndarray:
        """Fresh cleared depth array (≙ the CLEAR load op, 1.0 far plane)."""
        return jnp.full((self.height, self.width), self.clear_depth, jnp.float32)

    @property
    def extent(self) -> tuple[int, int]:
        return (self.width, self.height)
