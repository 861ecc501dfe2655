"""TRS transform with hierarchical parenting.

Semantics ported from crates/scene/src/transform.rs:
- local = T*R*S compose (transform.rs:119-121, glam
  from_scale_rotation_translation)
- world = parent.world * local, recursive over an *owned* parent clone —
  the reference stores `Option<Box<Transform>>`, i.e. a snapshot, not a
  shared graph (transform.rs:33-42); we keep that (copy-on-set) semantics.
- normal_matrix = inverse-transpose with identity fallback when
  |det| < 1e-6 (transform.rs:164-179)
- forward/right/up = rotation applied to -Z / +X / +Y (transform.rs:181-196)

On TPU the hierarchy is host-side; flattened world matrices are what the
vertex stage consumes (SURVEY.md §7 step 5).
"""

from __future__ import annotations

import copy

import numpy as np

from renderer_rs_tpu.mathx import (
    compose_srt,
    inverse_transpose_3x3,
    quat_identity,
    quat_rotate,
    quat_to_mat3,
)


class Transform:
    """≙ scene::Transform (transform.rs:33-196)."""

    def __init__(self) -> None:
        self.position = np.zeros(3, np.float32)
        self.rotation = np.asarray(quat_identity())
        self.scale = np.ones(3, np.float32)
        self._parent: Transform | None = None

    # --- builders (≙ with_* fluent constructors) ---------------------------
    def with_position(self, position) -> "Transform":
        self.position = np.asarray(position, np.float32)
        return self

    def with_rotation(self, rotation) -> "Transform":
        self.rotation = np.asarray(rotation, np.float32)
        return self

    def with_scale(self, scale) -> "Transform":
        self.scale = np.asarray(scale, np.float32)
        return self

    def with_parent(self, parent: "Transform") -> "Transform":
        self.set_parent(parent)
        return self

    # --- parenting (owned-clone semantics, transform.rs:33-42,88-105) ------
    def set_parent(self, parent: "Transform") -> None:
        self._parent = copy.deepcopy(parent)

    def clear_parent(self) -> None:
        self._parent = None

    def has_parent(self) -> bool:
        return self._parent is not None

    @property
    def parent(self) -> "Transform | None":
        return self._parent

    # --- matrices -----------------------------------------------------------
    def local_matrix(self):
        """SRT compose (≙ transform.rs:119-121)."""
        return compose_srt(self.scale, quat_to_mat3(self.rotation), self.position)

    def world_matrix(self):
        """Recursive parent·local (≙ transform.rs:147-153)."""
        local = self.local_matrix()
        if self._parent is not None:
            return self._parent.world_matrix() @ local
        return local

    def normal_matrix(self):
        """Inverse-transpose with identity fallback (≙ transform.rs:164-179)."""
        return inverse_transpose_3x3(self.world_matrix())

    # --- directions ----------------------------------------------------------
    def forward(self):
        return np.asarray(quat_rotate(self.rotation, np.array([0.0, 0.0, -1.0], np.float32)))

    def right(self):
        return np.asarray(quat_rotate(self.rotation, np.array([1.0, 0.0, 0.0], np.float32)))

    def up(self):
        return np.asarray(quat_rotate(self.rotation, np.array([0.0, 1.0, 0.0], np.float32)))
