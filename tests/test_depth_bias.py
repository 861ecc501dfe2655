"""Depth-bias raster state (≙ pipeline.rs:609-613, 781-789; VERDICT r4
item 6): the bias lands on the per-vertex NDC z at triangle setup, so the
sequential-scan, XLA-binned, and Pallas rasterizers inherit identical
biased depth planes — tri-rasterizer bit-identity enforced here."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import renderer_rs_tpu.ops.raster_pallas as rp
from renderer_rs_tpu.ops.raster import (
    gather_triangle_clip,
    gather_triangle_planes,
    rasterize,
    setup_triangles,
    setup_triangles_planes,
)
from renderer_rs_tpu.ops.raster_binned import rasterize_binned
from renderer_rs_tpu.rhi.pipeline import CullMode, GraphicsPipelineBuilder

R_F32 = 2.0**-23  # minimum resolvable depth difference, d32_sfloat


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rp.pl, "pallas_call", interp)


def _scene(t=100, seed=3):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-1.0, 1.0, (t, 1, 3)).astype(np.float32)
    off = rng.uniform(-0.3, 0.3, (t, 3, 3)).astype(np.float32)
    pos = center + off
    pos[..., 2] = rng.uniform(0.1, 0.8, (t, 3))
    clip = np.concatenate([pos, np.ones((t, 3, 1), np.float32)], -1)
    return (
        jnp.asarray(clip.reshape(t * 3, 4)),
        jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3),
    )


def _tilted_tri(z0=0.5, dz=0.2, w=64, h=64):
    """One triangle spanning the viewport with depth slope dz/dx in NDC x."""
    clip = jnp.asarray(
        [
            [-1.0, -1.0, z0 - dz, 1.0],
            [3.0, -1.0, z0 + 3 * dz, 1.0],
            [-1.0, 3.0, z0 - dz, 1.0],
        ],
        jnp.float32,
    )
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    return clip, tris


def test_constant_bias_offsets_depth():
    clip, tris = _tilted_tri(dz=0.0)
    base = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    biased = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_bias(constant=4096.0, slope=0.0)
        .build()
    )
    s0 = setup_triangles(gather_triangle_clip(clip, tris), 64, 64, base)
    s1 = setup_triangles(gather_triangle_clip(clip, tris), 64, 64, biased)
    d0 = np.asarray(rasterize(s0, 64, 64, base).depth)
    d1 = np.asarray(rasterize(s1, 64, 64, biased).depth)
    cov = d0 < 1.0
    assert cov.any()
    np.testing.assert_allclose(
        d1[cov] - d0[cov], 4096.0 * R_F32, rtol=1e-4
    )


def test_slope_bias_scales_with_depth_gradient():
    """o = m * slope_factor with m = max(|dz/dx|, |dz/dy|) of the screen
    depth plane (Vulkan spec 27.7.3)."""
    w = h = 64
    dz = 0.3  # per NDC x unit -> per-pixel gradient dz*2/w
    clip, tris = _tilted_tri(z0=0.4, dz=dz)
    m = dz * 2.0 / w
    base = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    biased = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_bias(constant=0.0, slope=2.0)
        .build()
    )
    s0 = setup_triangles(gather_triangle_clip(clip, tris), w, h, base)
    s1 = setup_triangles(gather_triangle_clip(clip, tris), w, h, biased)
    d0 = np.asarray(rasterize(s0, h, w, base).depth)
    d1 = np.asarray(rasterize(s1, h, w, biased).depth)
    cov = d0 < 1.0
    np.testing.assert_allclose(d1[cov] - d0[cov], 2.0 * m, rtol=1e-4)


def test_bias_clamp_limits_offset():
    clip, tris = _tilted_tri(z0=0.4, dz=0.3)
    base = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    clamped = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_bias(constant=0.0, slope=100.0, clamp=0.001)
        .build()
    )
    s0 = setup_triangles(gather_triangle_clip(clip, tris), 64, 64, base)
    s1 = setup_triangles(gather_triangle_clip(clip, tris), 64, 64, clamped)
    d0 = np.asarray(rasterize(s0, 64, 64, base).depth)
    d1 = np.asarray(rasterize(s1, 64, 64, clamped).depth)
    cov = d0 < 1.0
    np.testing.assert_allclose(d1[cov] - d0[cov], 0.001, rtol=5e-4)


def test_bias_tri_rasterizer_bit_identity():
    """All three rasterizers see the same biased plane (setup-level bias
    -> no per-implementation drift)."""
    clip, tris = _scene()
    pipe = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_bias(constant=16.0, slope=1.75)
        .build()
    )
    h, w = 96, 256
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vs = rasterize(setup, h, w, pipe)
    vb = rasterize_binned(setup, h, w, pipe, cap=256)
    vp = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16)
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(vs.depth), np.asarray(vb.depth))
    np.testing.assert_array_equal(np.asarray(vs.tri_id), np.asarray(vp.tri_id))
    np.testing.assert_array_equal(np.asarray(vs.depth), np.asarray(vp.depth))


def test_bias_plane_form_setup_matches_array_form():
    """setup_triangles_planes stays bit-identical under bias (the r4
    plane-form geometry chain feeds the same _biased_z)."""
    clip, tris = _scene(seed=11)
    pipe = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_bias(constant=8.0, slope=0.5)
        .build()
    )
    sa = setup_triangles(gather_triangle_clip(clip, tris), 128, 64, pipe)
    sp = setup_triangles_planes(
        gather_triangle_planes(clip, tris), 128, 64, pipe
    )
    np.testing.assert_array_equal(np.asarray(sa.z), np.asarray(sp.z))
    np.testing.assert_array_equal(np.asarray(sa.valid), np.asarray(sp.valid))


def test_bias_disabled_is_inert():
    clip, tris = _scene(seed=5)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    assert not pipe.depth_bias_enable
    s = setup_triangles(gather_triangle_clip(clip, tris), 64, 64, pipe)
    # z equals the raw NDC z when bias is off (no clip/clamp applied)
    ndc_z = np.asarray(clip).reshape(-1, 4)[:, 2][np.asarray(tris)]
    np.testing.assert_array_equal(np.asarray(s.z), ndc_z)


def test_shadow_acne_margin():
    """The shadow-caster use case (the reason depth bias exists): a
    depth-only render of a sloped surface with slope bias stores depth
    strictly behind every point of the true surface plane — the
    self-shadow comparison `stored >= surface` then never false-positives
    (acne) for any sample position on the surface."""
    w = h = 64
    clip, tris = _tilted_tri(z0=0.45, dz=0.25)
    biased = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_bias(constant=32.0, slope=1.5)
        .build()
    )
    base = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    sb = setup_triangles(gather_triangle_clip(clip, tris), w, h, biased)
    s0 = setup_triangles(gather_triangle_clip(clip, tris), w, h, base)
    stored = np.asarray(rasterize(sb, h, w, biased).depth)
    surface = np.asarray(rasterize(s0, h, w, base).depth)
    cov = surface < 1.0
    # the per-pixel depth gradient is m = dz*2/w; bias must exceed the
    # worst-case half-texel interpolation error m/2 everywhere
    m = 0.25 * 2.0 / w
    assert (stored[cov] > surface[cov] + 0.5 * m).all()
