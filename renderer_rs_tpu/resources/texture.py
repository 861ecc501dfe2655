"""Textures, samplers, and mip pyramids.

Implements the reference's three stubbed RHI tasks as TPU-native data:
- texture.rs:5 "Task 3.1" (texture loading + mipmap generation),
- image.rs:5 "Task 2.6" (image data + layout — here just arrays),
- sampler.rs:5 "Task 3.2" (VkSampler — here a frozen Sampler config consumed
  by ops/sampling.py gather kernels).

A Texture is a pytree of mip levels (tuple of [H,W,C] f32 arrays, static
shapes). Mip generation is a 2x2 box filter chain, jitted once per shape.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


class Filter(enum.Enum):
    NEAREST = "nearest"
    LINEAR = "linear"


class MipmapMode(enum.Enum):
    NEAREST = "nearest"
    LINEAR = "linear"  # trilinear


class WrapMode(enum.Enum):
    REPEAT = "repeat"
    CLAMP_TO_EDGE = "clamp"
    MIRRORED_REPEAT = "mirror"


@dataclasses.dataclass(frozen=True)
class Sampler:
    """Immutable sampler state (≙ VkSampler config, the Task 3.2 stub).

    Hashable: samplers specialize the jitted sampling code the way pipeline
    state specializes the frame function.
    """

    mag_filter: Filter = Filter.LINEAR
    min_filter: Filter = Filter.LINEAR
    mipmap_mode: MipmapMode = MipmapMode.LINEAR
    wrap_u: WrapMode = WrapMode.REPEAT
    wrap_v: WrapMode = WrapMode.REPEAT

    @staticmethod
    def nearest() -> "Sampler":
        return Sampler(
            mag_filter=Filter.NEAREST,
            min_filter=Filter.NEAREST,
            mipmap_mode=MipmapMode.NEAREST,
        )

    @staticmethod
    def linear_clamp() -> "Sampler":
        return Sampler(wrap_u=WrapMode.CLAMP_TO_EDGE, wrap_v=WrapMode.CLAMP_TO_EDGE)


def _box_downsample(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box filter; odd dims are cropped to even first (floor semantics)."""
    h, w = img.shape[0] & ~1, img.shape[1] & ~1
    img = img[:h, :w]
    return (
        img[0::2, 0::2] + img[1::2, 0::2] + img[0::2, 1::2] + img[1::2, 1::2]
    ) * 0.25


def build_mip_pyramid(base: jnp.ndarray, max_levels: int | None = None) -> tuple:
    """Full mip chain down to 1x1 (or max_levels)."""
    base = jnp.asarray(base, jnp.float32)
    mips = [base]
    while min(mips[-1].shape[0], mips[-1].shape[1]) > 1:
        if max_levels is not None and len(mips) >= max_levels:
            break
        mips.append(_box_downsample(mips[-1]))
    return tuple(mips)


@struct.dataclass
class Texture:
    """2D texture with mip pyramid (pytree of static-shape levels)."""

    mips: Any  # tuple of [H,W,C] f32 arrays

    @staticmethod
    def from_array(data, generate_mips: bool = True, srgb: bool = False) -> "Texture":
        arr = jnp.asarray(np.asarray(data), jnp.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if srgb:
            from renderer_rs_tpu.ops.srgb import srgb_to_linear

            rgb = srgb_to_linear(arr[..., :3])
            arr = jnp.concatenate([rgb, arr[..., 3:]], axis=-1) if arr.shape[-1] > 3 else rgb
        mips = build_mip_pyramid(arr) if generate_mips else (arr,)
        return Texture(mips=mips)

    @staticmethod
    def from_file(path: str, generate_mips: bool = True, srgb: bool = False) -> "Texture":
        from renderer_rs_tpu.utils.image_io import read_image

        return Texture.from_array(read_image(path), generate_mips, srgb)

    @property
    def num_levels(self) -> int:
        return len(self.mips)

    @property
    def shape(self) -> tuple:
        return self.mips[0].shape


@struct.dataclass
class CubeMap:
    """Cubemap as [6,H,W,C] per mip level (faces in Vulkan order:
    +X,-X,+Y,-Y,+Z,-Z), for skybox/IBL (pixel/skybox.hlsl:18-33)."""

    mips: Any  # tuple of [6,H,W,C] arrays

    @staticmethod
    def from_faces(faces, generate_mips: bool = False) -> "CubeMap":
        arr = jnp.asarray(faces, jnp.float32)
        assert arr.shape[0] == 6, "cubemap needs 6 faces"
        mips = [arr]
        if generate_mips:
            import jax

            while mips[-1].shape[1] > 1:
                mips.append(jax.vmap(_box_downsample)(mips[-1]))
        return CubeMap(mips=tuple(mips))

    @property
    def num_levels(self) -> int:
        return len(self.mips)

    @property
    def face_size(self) -> int:
        return self.mips[0].shape[1]
