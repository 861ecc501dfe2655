"""Fused Pallas shade kernel (ops/shade_pallas) vs the deferred XLA shade.

The fused path must reproduce the deferred _shade_pixels fast-ambient frame
to float tolerance (different interpolation/fusion arithmetic, same math).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from renderer_rs_tpu.app.scenes import full_scene
from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

W, H = 192, 128


@pytest.fixture()
def _interp(monkeypatch):
    import renderer_rs_tpu.ops.raster_pallas as rp
    import renderer_rs_tpu.ops.shade_pallas as sp
    import renderer_rs_tpu.renderer.passes as passes_mod

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rp.pl, "pallas_call", interp)
    monkeypatch.setattr(sp.pl, "pallas_call", interp)
    monkeypatch.setattr(passes_mod, "_use_pallas", lambda: True)


def test_fused_shade_matches_deferred(_interp):
    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=400)
    pipe = GraphicsPipelineBuilder().build()
    shading = kwargs["shading"]
    assert shading == ShadingModel.PBR_IBL

    fused = np.asarray(
        forward_frame(
            scene, layout, pipe, shading, W, H, tonemap="aces",
            shadow_map_size=128,
        )
    )
    # deferred oracle: force the non-fused path by disabling pallas
    import renderer_rs_tpu.renderer.passes as passes_mod

    orig = passes_mod._use_pallas
    passes_mod._use_pallas = lambda: False
    try:
        deferred = np.asarray(
            forward_frame(
                scene, layout, pipe, shading, W, H, tonemap="aces",
                shadow_map_size=128,
            )
        )
    finally:
        passes_mod._use_pallas = orig

    assert fused.shape == deferred.shape == (H, W, 4)
    assert np.isfinite(fused).all()
    # covered pixels agree to tolerance; a hairline of coverage-boundary
    # texels may differ between the fused and deferred interpolators
    bad = np.mean(np.any(np.abs(fused - deferred) > 2e-3, axis=-1))
    assert bad < 0.005, f"fused vs deferred mismatch frac {bad:.4f}"


def test_fused_shade_return_depth(_interp):
    scene, layout, kwargs, _ = full_scene(W, H, tri_budget=400)
    pipe = GraphicsPipelineBuilder().build()
    out, depth = forward_frame(
        scene, layout, pipe, kwargs["shading"], W, H, tonemap="aces",
        shadow_map_size=128, return_depth=True,
    )
    out, depth = np.asarray(out), np.asarray(depth)
    assert out.shape == (H, W, 4) and depth.shape == (H, W)
    assert np.isfinite(depth).all()
    assert (depth < 1.0).any() and (depth >= 1.0).any()


def test_shadow_factor_planes_matches_oracle():
    """Plane-form shadow factor == channel-last calculate_shadow."""
    from renderer_rs_tpu.ops.shade_pallas import shadow_factor_planes
    from renderer_rs_tpu.ops.shadow import ShadowParams, calculate_shadow

    rng = np.random.default_rng(3)
    s = 64
    sm = jnp.asarray(rng.random((s, s)), jnp.float32)
    lsm = jnp.asarray(np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32))
    wp = rng.standard_normal((7, 16, 128, 3)).astype(np.float32)
    n = rng.standard_normal((7, 16, 128, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    sun = jnp.asarray([0.3, 0.8, 0.5], jnp.float32)
    params = ShadowParams(shadow_bias=0.01, normal_bias=0.03)

    oracle = np.asarray(
        calculate_shadow(
            sm, lsm, jnp.asarray(wp), jnp.asarray(n),
            jnp.broadcast_to(sun, wp.shape), params,
        )
    )
    planes = np.asarray(
        shadow_factor_planes(
            sm, lsm,
            tuple(jnp.asarray(wp[..., c]) for c in range(3)),
            tuple(jnp.asarray(n[..., c]) for c in range(3)),
            sun, params,
        )
    )
    np.testing.assert_allclose(planes, oracle, atol=1e-6)
