"""Buffers: typed device-array allocation and upload.

TPU reinterpretation of crates/rhi/src/buffer.rs. Vulkan buffers need usage
flags + memory-location choices (CpuToGpu for vertex/index/uniform/staging,
GpuOnly for storage/indirect — buffer.rs:62-111) and explicit staging copies
(buffer.rs:345-399). XLA owns memory, so what survives is:

- BufferUsage: the same taxonomy, now selecting *placement/donation* policy
  (GpuOnly usages are device_put immediately; CpuToGpu usages may stay host-
  side until first use — matching the reference's memory-location table)
- Buffer.new_with_data ≙ create+allocate+bind+upload (buffer.rs:227-257)
- write_data ≙ the mapped-pointer update (buffer.rs:247-293): a functional
  .at[].set returning the updated buffer
- upload_via_staging ≙ the synchronous staged copy (buffer.rs:345-399):
  device_put + block_until_ready (the fence wait it performs internally)
"""

from __future__ import annotations

import enum
import logging
from typing import Any

import jax
import jax.numpy as jnp

log = logging.getLogger("renderer_rs_tpu.rhi.buffer")


class BufferUsage(enum.Enum):
    """≙ rhi::BufferUsage (buffer.rs:38-60)."""

    VERTEX = "vertex"
    INDEX = "index"
    UNIFORM = "uniform"
    STORAGE = "storage"
    STAGING = "staging"
    INDIRECT = "indirect"

    @property
    def device_resident(self) -> bool:
        """≙ the GpuOnly memory-location choice (buffer.rs:62-111):
        storage/indirect live on device; the CpuToGpu usages can defer."""
        return self in (BufferUsage.STORAGE, BufferUsage.INDIRECT)


class Buffer:
    """A usage-tagged device array (≙ rhi::Buffer, buffer.rs:124-436).

    Functional update semantics: mutation methods return the new array; the
    wrapper tracks the latest value (host-side book-keeping only).
    """

    def __init__(self, usage: BufferUsage, data: Any, device=None):
        self.usage = usage
        arr = jnp.asarray(data)
        if usage.device_resident or device is not None:
            arr = jax.device_put(arr, device)
        self.data = arr
        log.debug("buffer created: %s %s %s", usage.value, arr.shape, arr.dtype)

    @staticmethod
    def new_with_data(usage: BufferUsage, data: Any, device=None) -> "Buffer":
        """≙ Buffer::new_with_data (buffer.rs:227-257)."""
        return Buffer(usage, data, device)

    @property
    def size_bytes(self) -> int:
        return self.data.size * self.data.dtype.itemsize

    def write_data(self, offset: int, values: Any) -> "Buffer":
        """≙ the mapped-pointer write (buffer.rs:247-293), functional form."""
        values = jnp.asarray(values, self.data.dtype)
        flat = self.data.reshape(-1)
        flat = jax.lax.dynamic_update_slice(flat, values.reshape(-1), (offset,))
        self.data = flat.reshape(self.data.shape)
        return self

    def upload_via_staging(self, values: Any, device=None) -> "Buffer":
        """≙ the synchronous staging copy (buffer.rs:345-399): replaces the
        whole contents, placed on device, blocking until resident (the
        queue_wait_idle the reference performs)."""
        arr = jax.device_put(jnp.asarray(values, self.data.dtype), device)
        arr.block_until_ready()
        self.data = arr
        return self
