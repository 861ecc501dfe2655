"""Shared utilities: image IO, framebuffer conversion."""

from renderer_rs_tpu.utils.image_io import (  # noqa: F401
    framebuffer_to_u8,
    read_image,
    write_png,
)
