"""Vertex formats as SoA device arrays.

Mirrors crates/rhi/src/vertex.rs: ``TriangleVertex{position,color}``
(vertex.rs:20-62) and the full PBR ``Vertex{position,normal,tex_coord,
tangent(w=handedness)}`` (vertex.rs:88-170). Interleaved byte layouts and
VkVertexInputAttributeDescription dissolve on TPU — the natural layout is
structure-of-arrays so each attribute is a dense [N,k] matrix the vertex stage
can stream through the MXU. The Mesh loader already produces SoA
(resources/src/model.rs:31-44), so this is the same data without the
interleave/deinterleave round trip.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TriangleVertexBuffer:
    """Position+color vertices (≙ TriangleVertex, vertex.rs:20-62).

    position: [N,3] f32 — clip-space in the Hello Triangle demo
    color:    [N,3] f32
    """

    position: Any
    color: Any

    @staticmethod
    def create(position, color) -> "TriangleVertexBuffer":
        position = jnp.asarray(position, jnp.float32)
        color = jnp.asarray(color, jnp.float32)
        assert position.ndim == 2 and position.shape[1] == 3
        assert color.shape == position.shape
        return TriangleVertexBuffer(position=position, color=color)

    @property
    def num_vertices(self) -> int:
        return self.position.shape[0]


@struct.dataclass
class VertexBuffer:
    """Full PBR vertex stream (≙ Vertex, vertex.rs:88-170).

    position:  [N,3] f32 object space
    normal:    [N,3] f32
    tex_coord: [N,2] f32
    tangent:   [N,4] f32, w = handedness (+1/-1)
    """

    position: Any
    normal: Any
    tex_coord: Any
    tangent: Any

    @staticmethod
    def create(position, normal=None, tex_coord=None, tangent=None) -> "VertexBuffer":
        position = jnp.asarray(position, jnp.float32)
        n = position.shape[0]
        # Defaulting rules match the glTF loader's fallbacks
        # (resources/src/model.rs:163-197): Y-up normals, zero UVs, +X tangents.
        if normal is None:
            normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
        if tex_coord is None:
            tex_coord = jnp.zeros((n, 2), jnp.float32)
        if tangent is None:
            tangent = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        return VertexBuffer(
            position=position,
            normal=jnp.asarray(normal, jnp.float32),
            tex_coord=jnp.asarray(tex_coord, jnp.float32),
            tangent=jnp.asarray(tangent, jnp.float32),
        )

    @property
    def num_vertices(self) -> int:
        return self.position.shape[0]
