"""Vertex-format and color-transfer tests (≙ rhi vertex.rs:173-320 layout
tests and common.hlsli transfer helpers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.ops.srgb import (
    linear_to_srgb,
    linear_to_srgb_pow22,
    srgb_to_linear,
    srgb_to_linear_pow22,
)
from renderer_rs_tpu.ops.tonemap import (
    apply_tonemap,
    tonemap_aces,
    tonemap_reinhard,
)
from renderer_rs_tpu.rhi.vertex import TriangleVertexBuffer, VertexBuffer
from renderer_rs_tpu.utils.image_io import framebuffer_to_u8


def test_triangle_vertex_buffer_shapes():
    """≙ TriangleVertex{position,color} (vertex.rs:20-62) as SoA."""
    vb = TriangleVertexBuffer.create(
        position=[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        color=[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
    )
    assert vb.num_vertices == 3
    assert vb.position.dtype == jnp.float32
    with pytest.raises(AssertionError):
        TriangleVertexBuffer.create([[0, 0, 0]], [[1, 0]])  # shape mismatch


def test_vertex_buffer_defaults_match_loader():
    """Full Vertex defaults = the glTF loader's fallbacks (vertex.rs:88-170,
    model.rs:163-197): Y-up normals, zero UVs, +X tangents w=1."""
    vb = VertexBuffer.create(position=np.zeros((5, 3), np.float32))
    np.testing.assert_allclose(np.asarray(vb.normal), [[0, 1, 0]] * 5)
    np.testing.assert_allclose(np.asarray(vb.tex_coord), np.zeros((5, 2)))
    np.testing.assert_allclose(np.asarray(vb.tangent), [[1, 0, 0, 1]] * 5)


def test_srgb_roundtrip_exact():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        np.asarray(srgb_to_linear(linear_to_srgb(x))), np.asarray(x), atol=1e-5
    )
    # linear-segment boundary continuity
    lo = float(linear_to_srgb(jnp.asarray(0.0031308 - 1e-7)))
    hi = float(linear_to_srgb(jnp.asarray(0.0031308 + 1e-7)))
    assert abs(lo - hi) < 1e-4


def test_srgb_pow22_matches_reference_formula():
    """≙ common.hlsli: pow(c, 2.2) / pow(c, 1/2.2)."""
    c = 0.5
    assert float(srgb_to_linear_pow22(jnp.asarray(c))) == pytest.approx(0.5**2.2)
    assert float(linear_to_srgb_pow22(jnp.asarray(c))) == pytest.approx(
        0.5 ** (1 / 2.2)
    )


def test_tonemap_properties():
    hdr = jnp.asarray([0.0, 0.18, 1.0, 4.0, 100.0])
    for tm in (tonemap_reinhard, tonemap_aces):
        out = np.asarray(tm(hdr))
        assert (out >= 0).all() and (out <= 1.0 + 1e-6).all()
        assert np.all(np.diff(out) >= -1e-6)  # monotone
    # aces preserves alpha through apply_tonemap
    rgba = jnp.broadcast_to(jnp.array([2.0, 2.0, 2.0, 0.7]), (2, 2, 4))
    out = np.asarray(apply_tonemap(rgba, "aces"))
    np.testing.assert_allclose(out[..., 3], 0.7)


def test_framebuffer_to_u8_srgb_encode():
    """The present conversion applies the exact sRGB curve (≙ the
    B8G8R8A8_SRGB attachment store)."""
    fb = jnp.broadcast_to(jnp.array([0.1, 0.0, 1.0, 1.0]), (2, 2, 4))
    u8 = framebuffer_to_u8(fb)
    assert u8[0, 0, 0] == 89  # sRGB(0.1) = 0.349 -> 89
    assert u8[0, 0, 1] == 0
    assert u8[0, 0, 2] == 255
    assert u8.dtype == np.uint8
