"""Uniform-buffer pytrees.

The reference's std140 #[repr(C)] UBO structs (resources/src/ubo.rs) become
flax struct pytrees — byte layout dissolves (XLA owns layout), field
semantics are preserved exactly:

- CameraUbo: view, projection, view_projection = projection*view
  PRE-multiplied (ubo.rs:109-123), camera_position (ubo.rs:62-150)
- ObjectUbo: model + normal_matrix = inverse-transpose with identity
  fallback at |det| < 1e-6 (ubo.rs:172-268)
- DirectionalLightUbo: direction stored normalize_or_zero (ubo.rs:285-337)
- SceneUbo: ambient_color, time, delta_time (ubo.rs:353-414)
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from renderer_rs_tpu.mathx import inverse_transpose_3x3, normalize_or_zero


@struct.dataclass
class CameraUbo:
    """≙ resources::CameraUbo (ubo.rs:62-150)."""

    view: Any  # [4,4]
    projection: Any  # [4,4]
    view_projection: Any  # [4,4] = projection @ view (precomputed, ubo.rs:118)
    camera_position: Any  # [3]

    @staticmethod
    def create(view, projection, camera_position) -> "CameraUbo":
        view = jnp.asarray(view, jnp.float32)
        projection = jnp.asarray(projection, jnp.float32)
        return CameraUbo(
            view=view,
            projection=projection,
            view_projection=projection @ view,
            camera_position=jnp.asarray(camera_position, jnp.float32),
        )

    def update_view(self, view, camera_position) -> "CameraUbo":
        """≙ ubo.rs:126-135 (recomputes view_projection)."""
        return CameraUbo.create(view, self.projection, camera_position)

    def update_projection(self, projection) -> "CameraUbo":
        """≙ ubo.rs:138-147."""
        return CameraUbo.create(self.view, projection, self.camera_position)


@struct.dataclass
class ObjectUbo:
    """≙ resources::ObjectUbo (ubo.rs:172-268)."""

    model: Any  # [4,4]
    normal_matrix: Any  # [4,4], upper-left 3x3 is inverse-transpose

    @staticmethod
    def create(model) -> "ObjectUbo":
        model = jnp.asarray(model, jnp.float32)
        return ObjectUbo(model=model, normal_matrix=ObjectUbo.compute_normal_matrix(model))

    def update_model(self, model) -> "ObjectUbo":
        return ObjectUbo.create(model)

    @staticmethod
    def compute_normal_matrix(model) -> jnp.ndarray:
        """Inverse-transpose w/ identity fallback, EPSILON=1e-6 (ubo.rs:242-268)."""
        return inverse_transpose_3x3(jnp.asarray(model, jnp.float32), eps=1e-6)


@struct.dataclass
class DirectionalLightUbo:
    """≙ resources::DirectionalLightUbo (ubo.rs:285-337)."""

    direction: Any  # [3], normalized or zero
    color: Any  # [3]
    intensity: Any  # scalar

    @staticmethod
    def create(direction, color, intensity) -> "DirectionalLightUbo":
        return DirectionalLightUbo(
            direction=normalize_or_zero(jnp.asarray(direction, jnp.float32)),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.asarray(intensity, jnp.float32),
        )


@struct.dataclass
class SceneUbo:
    """≙ resources::SceneUbo (ubo.rs:353-414)."""

    ambient_color: Any  # [3]
    time: Any  # scalar seconds
    delta_time: Any  # scalar seconds

    @staticmethod
    def create(ambient_color=(0.03, 0.03, 0.03), time=0.0, delta_time=0.0) -> "SceneUbo":
        return SceneUbo(
            ambient_color=jnp.asarray(ambient_color, jnp.float32),
            time=jnp.asarray(time, jnp.float32),
            delta_time=jnp.asarray(delta_time, jnp.float32),
        )

    def update_time(self, time, delta_time) -> "SceneUbo":
        """≙ ubo.rs:404-409."""
        return SceneUbo(
            ambient_color=self.ambient_color,
            time=jnp.asarray(time, jnp.float32),
            delta_time=jnp.asarray(delta_time, jnp.float32),
        )
