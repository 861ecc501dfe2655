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
import numpy as np
from flax import struct


def expand_topology(indices, topology) -> np.ndarray:
    """Input-assembly expansion: turn an index stream into the degenerate
    [P,3] triples the rasterizer consumes (≙ the IA stage's primitive
    assembly for each VkPrimitiveTopology, pipeline.rs:273-310).

    POINT_LIST      [N]   -> (v,v,v) per vertex
    LINE_LIST       [2L]  -> (a,b,b) per pair
    LINE_STRIP      [N]   -> (v_i, v_i+1, v_i+1)
    TRIANGLE_LIST   [3T]  -> (a,b,c)
    TRIANGLE_STRIP  [N]   -> (i, i+1, i+2) with odd-triangle winding flip
    TRIANGLE_FAN    [N]   -> (0, i+1, i+2)
    """
    from renderer_rs_tpu.rhi.pipeline import PrimitiveTopology as T

    idx = np.asarray(indices, np.int32).reshape(-1)
    n = idx.shape[0]
    if topology == T.POINT_LIST:
        return np.stack([idx, idx, idx], axis=-1)
    if topology == T.LINE_LIST:
        pairs = idx.reshape(-1, 2)
        return np.stack([pairs[:, 0], pairs[:, 1], pairs[:, 1]], axis=-1)
    if topology == T.LINE_STRIP:
        return np.stack([idx[:-1], idx[1:], idx[1:]], axis=-1)
    if topology == T.TRIANGLE_LIST:
        return idx.reshape(-1, 3)
    if topology == T.TRIANGLE_STRIP:
        tris = np.stack([idx[: n - 2], idx[1 : n - 1], idx[2:]], axis=-1)
        flip = np.arange(tris.shape[0]) % 2 == 1  # odd triangles swap winding
        tris[flip] = tris[flip][:, [1, 0, 2]]
        return tris
    if topology == T.TRIANGLE_FAN:
        return np.stack(
            [np.full(n - 2, idx[0], np.int32), idx[1 : n - 1], idx[2:]], axis=-1
        )
    raise ValueError(f"unknown topology {topology}")


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
