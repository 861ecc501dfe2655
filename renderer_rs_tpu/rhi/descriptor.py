"""Descriptor sets: typed resource-binding validation.

TPU reinterpretation of crates/rhi/src/descriptor.rs. Vulkan descriptors
marshal GPU pointers into shader binding slots; under jit, "bindings" are
just pytree fields of GpuScene — but the *layout contract* (which slots a
shading model needs, with which types) is still worth validating eagerly,
exactly like the reference validates set layouts at bind time
(descriptor.rs:65-139, 438-588).

A DescriptorSetLayout declares named bindings with kinds; `validate` checks
a scene/layout pair against it before the frame compiles — turning the
silent None-field failure mode into the reference's explicit error.
"""

from __future__ import annotations

import dataclasses
import enum
import logging

from renderer_rs_tpu.core.errors import RhiError

log = logging.getLogger("renderer_rs_tpu.rhi.descriptor")


class BindingKind(enum.Enum):
    """≙ DescriptorBindingBuilder's 8 binding kinds (descriptor.rs:438-588),
    collapsed to what survives on TPU."""

    UNIFORM = "uniform"  # UBO pytree field (camera, scene, lights)
    STORAGE = "storage"  # large SoA arrays (vertices, banks)
    SAMPLED_TEXTURE = "sampled_texture"  # texture arrays / cubemaps
    STORAGE_IMAGE = "storage_image"  # writable images (IBL precompute outputs)


@dataclasses.dataclass(frozen=True)
class Binding:
    name: str  # GpuScene field (dots allowed: "environment.brdf_lut")
    kind: BindingKind
    required: bool = True


@dataclasses.dataclass(frozen=True)
class DescriptorSetLayout:
    """≙ rhi::DescriptorSetLayout (descriptor.rs:65-139)."""

    bindings: tuple[Binding, ...]

    def validate(self, scene) -> None:
        """Raise RhiError if a required binding is missing/None on the scene
        (≙ the validation layer catching an unbound descriptor)."""
        for b in self.bindings:
            obj = scene
            ok = True
            for part in b.name.split("."):
                obj = getattr(obj, part, None)
                if obj is None:
                    ok = False
                    break
            if b.required and not ok:
                raise RhiError(
                    f"missing binding '{b.name}' ({b.kind.value}) — scene does "
                    f"not provide it (≙ unbound descriptor set)"
                )


# The documented set layouts of the richest reference shader
# (model_pbr.hlsl:4-21 documents 3 descriptor sets; model_pbr_ibl adds set 3).
SET_FRAME = DescriptorSetLayout(
    (
        Binding("camera", BindingKind.UNIFORM),
        Binding("scene_ubo", BindingKind.UNIFORM),
        Binding("lights", BindingKind.UNIFORM),
    )
)
SET_OBJECT = DescriptorSetLayout(
    (
        Binding("models", BindingKind.STORAGE),
        Binding("normal_mats", BindingKind.STORAGE),
    )
)
SET_MATERIAL = DescriptorSetLayout(
    (
        Binding("materials", BindingKind.UNIFORM),
        Binding("textures", BindingKind.SAMPLED_TEXTURE, required=False),
    )
)
SET_IBL = DescriptorSetLayout(
    (
        Binding("environment.irradiance_mips", BindingKind.SAMPLED_TEXTURE),
        Binding("environment.prefiltered_mips", BindingKind.SAMPLED_TEXTURE),
        Binding("environment.brdf_lut", BindingKind.SAMPLED_TEXTURE),
    )
)


# Feature sets gated by SceneLayout flags (the has_* statics): the flag
# claims the feature, the set layout checks the scene actually binds it.
SET_TEXTURES = DescriptorSetLayout(
    (Binding("textures.mips", BindingKind.SAMPLED_TEXTURE),)
)
SET_SHADOW = DescriptorSetLayout(
    (Binding("light_space_matrix", BindingKind.UNIFORM),)
)
SET_CSM = DescriptorSetLayout(
    (
        Binding("csm_matrices", BindingKind.UNIFORM),
        Binding("csm_splits", BindingKind.UNIFORM),
    )
)


def layouts_for(shading, layout=None) -> tuple[DescriptorSetLayout, ...]:
    """The set layouts a (shading model, scene layout) pair binds
    (≙ pipeline layout creation). With a SceneLayout, every feature the
    layout claims (has_textures/has_environment/has_shadow/has_csm) adds
    its set — validate() then catches a scene whose pytree doesn't actually
    provide the claimed binding (the unbound-descriptor failure mode)."""
    from renderer_rs_tpu.renderer.passes import ShadingModel

    sets = (SET_FRAME, SET_OBJECT, SET_MATERIAL)
    if layout is None:
        if shading == ShadingModel.PBR_IBL:
            sets += (SET_IBL,)
        return sets
    if layout.has_textures:
        sets += (SET_TEXTURES,)
    if shading == ShadingModel.PBR_IBL and layout.has_environment:
        sets += (SET_IBL,)
    if layout.has_csm:
        sets += (SET_CSM,)
    elif layout.has_shadow:
        sets += (SET_SHADOW,)
    return sets
