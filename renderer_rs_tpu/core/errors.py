"""Workspace-wide error hierarchy.

Mirrors the reference's layered error enums (crates/core/src/error.rs:7-38 for
the workspace `Error`, crates/rhi/src/error.rs:6-50 for `RhiError`,
crates/resources/src/error.rs:8-40 for `ResourceError`) as a Python exception
hierarchy. Every subsystem raises a subclass of :class:`RendererError`, so the
app layer can catch one type at the frame boundary and keep running (the
reference logs render errors rather than aborting, crates/app/src/main.rs:79-83).
"""

from __future__ import annotations

from typing import TypeVar, Union

T = TypeVar("T")


class RendererError(Exception):
    """Base error for the whole framework (≙ core::Error, core/src/error.rs:7)."""


class WindowError(RendererError):
    """Windowing / surface errors (≙ Error::Window)."""


class RhiError(RendererError):
    """Software-GPU layer errors (≙ rhi::RhiError, rhi/src/error.rs:6-50)."""


class PipelineError(RhiError):
    """Pipeline construction/validation errors (≙ RhiError::Pipeline)."""


class ShaderError(RendererError):
    """Shading-pass configuration errors (≙ Error::Shader / RhiError::Shader)."""


class ResourceError(RendererError):
    """Asset loading errors (≙ resources::ResourceError, resources/src/error.rs:8-40)."""


class GltfLoadError(ResourceError):
    """glTF import failures (≙ ResourceError::GltfLoad)."""


class NoMeshesError(ResourceError):
    """Model contained no meshes (≙ ResourceError::NoMeshes)."""


class NoPositionDataError(ResourceError):
    """A primitive had no POSITION accessor (≙ ResourceError::NoPositionData)."""


class FileNotFoundError_(ResourceError):
    """Asset path does not exist (≙ ResourceError::FileNotFound)."""


class ImageError(ResourceError):
    """Texture/image decode errors (≙ ResourceError::Image)."""


class ConfigError(RendererError):
    """Configuration errors (≙ Error::Config)."""


class InternalError(RendererError):
    """Internal invariant violations (≙ Error::Internal)."""


# ``Result<T>`` in the reference is ``Result<T, Error>``; in Python we simply
# raise, but the alias documents intent at API boundaries.
Result = Union[T, RendererError]
