"""PBR materials (metallic-roughness workflow).

≙ crates/resources/src/material.rs:7-30: base_color (vec4), metallic,
roughness, ao=1.0, emissive, with the same defaults. A MaterialBank packs
all scene materials into SoA arrays so the fragment pass gathers per-pixel
material parameters by material id in one vectorized lookup (the TPU form
of the per-draw material descriptor set in pixel/model_pbr.hlsl:4-21).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass
class Material:
    """≙ resources::Material (material.rs:7-30); host-side description.

    Texture indices point into the renderer's texture atlas/array; -1 = none
    (≙ the hasXTexture flags in model_pbr.hlsl:57-63).
    """

    base_color: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    metallic: float = 0.0
    roughness: float = 0.5
    ao: float = 1.0
    emissive: tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    # texture slots (later rounds wire these to Texture objects)
    base_color_texture: int = -1
    normal_texture: int = -1
    metallic_roughness_texture: int = -1
    occlusion_texture: int = -1
    emissive_texture: int = -1
    normal_scale: float = 1.0
    alpha_cutoff: float | None = None


@struct.dataclass
class MaterialBank:
    """SoA device bank of materials, indexed by per-triangle material id."""

    base_color: Any  # [M,4]
    metallic: Any  # [M]
    roughness: Any  # [M]
    ao: Any  # [M]
    emissive: Any  # [M,4]
    normal_scale: Any  # [M]
    tex_ids: Any  # [M,5] int32: base/normal/mr/ao/emissive, -1 = none

    @staticmethod
    def create(materials: Sequence[Material]) -> "MaterialBank":
        if not materials:
            materials = [Material()]
        return MaterialBank(
            base_color=jnp.asarray([m.base_color for m in materials], jnp.float32),
            metallic=jnp.asarray([m.metallic for m in materials], jnp.float32),
            roughness=jnp.asarray([m.roughness for m in materials], jnp.float32),
            ao=jnp.asarray([m.ao for m in materials], jnp.float32),
            emissive=jnp.asarray([m.emissive for m in materials], jnp.float32),
            normal_scale=jnp.asarray([m.normal_scale for m in materials], jnp.float32),
            tex_ids=jnp.asarray(
                [
                    [
                        m.base_color_texture,
                        m.normal_texture,
                        m.metallic_roughness_texture,
                        m.occlusion_texture,
                        m.emissive_texture,
                    ]
                    for m in materials
                ],
                jnp.int32,
            ),
        )

    @property
    def num_materials(self) -> int:
        return self.base_color.shape[0]
