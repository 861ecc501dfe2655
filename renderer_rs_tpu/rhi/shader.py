"""Shader stages: the shading-function registry.

TPU reinterpretation of crates/rhi/src/shader.rs. The reference loads
SPIR-V binaries with strict validation (4-byte alignment shader.rs:72-80,
magic 0x07230203 with byte-order detection shader.rs:92-127) and wraps them
in stage metadata (shader.rs:134-177). Here "shaders" are Python shading
functions fused into the frame program, so the analog is:

- ShaderStage: the same stage taxonomy (validation of which stages a
  pipeline needs)
- Shader: a registered, stage-tagged shading callable with an entry point
  name (≙ vkShaderModule + entry "main")
- validate_spirv: the byte-level validation logic itself, preserved verbatim
  in behavior — the loader still accepts real SPIR-V blobs (for asset
  pipelines that carry them) and reports the same error classes, including
  big-endian detection via the byte-swapped magic.
"""

from __future__ import annotations

import dataclasses
import enum
import struct
from typing import Callable

from renderer_rs_tpu.core.errors import ShaderError

SPIRV_MAGIC = 0x07230203
SPIRV_MAGIC_SWAPPED = 0x03022307


class ShaderStage(enum.Enum):
    """≙ rhi::ShaderStage (shader.rs:134-177)."""

    VERTEX = "vertex"
    FRAGMENT = "fragment"
    COMPUTE = "compute"
    GEOMETRY = "geometry"
    TESS_CONTROL = "tess_control"
    TESS_EVAL = "tess_eval"


def validate_spirv(data: bytes) -> str:
    """Validate a SPIR-V blob; returns 'little'/'big' endianness.

    Reproduces the reference checks: non-empty, 4-byte aligned
    (shader.rs:72-80), magic number with byte-order detection
    (shader.rs:92-127).
    """
    if len(data) == 0:
        raise ShaderError("empty SPIR-V blob")
    if len(data) % 4 != 0:
        raise ShaderError(f"SPIR-V length {len(data)} is not 4-byte aligned")
    (magic_le,) = struct.unpack_from("<I", data, 0)
    if magic_le == SPIRV_MAGIC:
        return "little"
    if magic_le == SPIRV_MAGIC_SWAPPED:
        return "big"
    raise ShaderError(f"invalid SPIR-V magic 0x{magic_le:08x}")


@dataclasses.dataclass(frozen=True)
class Shader:
    """A stage-tagged shading function (≙ rhi::Shader)."""

    stage: ShaderStage
    entry_point: str
    fn: Callable | None = None
    name: str = ""

    def stage_create_info(self) -> dict:
        """≙ Shader::stage_create_info (shader.rs:382-387)."""
        return {"stage": self.stage, "entry": self.entry_point, "name": self.name}


class ShaderLibrary:
    """Registry mapping names -> Shaders (≙ the shaders/ directory).

    Pre-registered with the frame program's stages so pipeline assembly can
    name them like the reference names SPIR-V files (renderer.rs:210-222).
    """

    def __init__(self) -> None:
        self._shaders: dict[str, Shader] = {}

    def register(self, name: str, shader: Shader) -> None:
        self._shaders[name] = shader

    def get(self, name: str) -> Shader:
        if name not in self._shaders:
            raise ShaderError(f"unknown shader '{name}'")
        return self._shaders[name]

    def __contains__(self, name: str) -> bool:
        return name in self._shaders


def builtin_library() -> ShaderLibrary:
    """The built-in stage set mirroring shaders/hlsl/* (SURVEY.md §2.8)."""
    from renderer_rs_tpu.ops import blinn_phong, ibl, pbr, skybox, tonemap
    from renderer_rs_tpu.renderer import passes

    lib = ShaderLibrary()
    lib.register("triangle.vert", Shader(ShaderStage.VERTEX, "main", passes.vertex_stage, "triangle.vert"))
    lib.register("model.vert", Shader(ShaderStage.VERTEX, "main", passes.vertex_stage, "model.vert"))
    lib.register("shadow.vert", Shader(ShaderStage.VERTEX, "main", passes.shadow_vertex_stage, "shadow.vert"))
    lib.register("triangle.frag", Shader(ShaderStage.FRAGMENT, "main", None, "triangle.frag"))
    lib.register("model_full.frag", Shader(ShaderStage.FRAGMENT, "main", blinn_phong.blinn_phong, "model_full.frag"))
    lib.register("model_pbr.frag", Shader(ShaderStage.FRAGMENT, "main", pbr.pbr_direct, "model_pbr.frag"))
    lib.register("model_pbr_ibl.frag", Shader(ShaderStage.FRAGMENT, "main", pbr.calculate_ibl, "model_pbr_ibl.frag"))
    lib.register("skybox.frag", Shader(ShaderStage.FRAGMENT, "main", skybox.skybox_pass, "skybox.frag"))
    lib.register("equirect_to_cubemap.comp", Shader(ShaderStage.COMPUTE, "main", ibl.equirect_to_cubemap, "equirect_to_cubemap.comp"))
    lib.register("irradiance_map.comp", Shader(ShaderStage.COMPUTE, "main", ibl.irradiance_map, "irradiance_map.comp"))
    lib.register("prefilter_map.comp", Shader(ShaderStage.COMPUTE, "main", ibl.prefilter_map, "prefilter_map.comp"))
    lib.register("brdf_lut.comp", Shader(ShaderStage.COMPUTE, "main", ibl.brdf_lut, "brdf_lut.comp"))
    lib.register("tonemap.frag", Shader(ShaderStage.FRAGMENT, "main", tonemap.apply_tonemap, "tonemap.frag"))
    return lib
