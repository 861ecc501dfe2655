"""Shade-once-per-pixel MSAA (VERDICT r4 item 8): sample-rate visibility
+ pixel-rate shading + id-matched resolve (ops/msaa.py), quality-gated
against the supersampling oracle."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from renderer_rs_tpu.ops.msaa import _shift, msaa_id_resolve


def test_shift_edge_clamp():
    a = jnp.arange(12.0).reshape(3, 4)
    up = np.asarray(_shift(a, -1, 0))  # out[y] = a[y-1], row 0 clamps
    np.testing.assert_array_equal(up[0], np.asarray(a[0]))
    np.testing.assert_array_equal(up[1:], np.asarray(a[:-1]))
    dn = np.asarray(_shift(a, 1, 0))
    np.testing.assert_array_equal(dn[-1], np.asarray(a[-1]))
    lt = np.asarray(_shift(a, 0, -1))
    np.testing.assert_array_equal(lt[:, 0], np.asarray(a[:, 0]))
    rt = np.asarray(_shift(a, 0, 1))
    np.testing.assert_array_equal(rt[:, -1], np.asarray(a[:, -1]))


def test_resolve_interior_is_exact_and_edges_blend():
    """A vertical edge between surface 7 (left, red) and surface 9 (right,
    blue): interior pixels resolve to exactly their own shade; the edge
    pixel whose samples straddle the boundary blends both true colors by
    coverage."""
    h = w = 4
    red = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    blue = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    center_ids = jnp.asarray(
        [[7, 7, 9, 9]] * 4, jnp.int32
    )
    color = jnp.where((center_ids == 7)[..., None], red, blue)
    # sample grid 2x2 per pixel: pixel (y,1) has right-half samples on 9
    sample_ids = jnp.repeat(jnp.repeat(center_ids, 2, 0), 2, 1)
    sample_ids = sample_ids.at[:, 3].set(9)  # pixel 1's right samples see 9
    out = np.asarray(msaa_id_resolve(color, center_ids, sample_ids, 2, 2))
    # interiors exact
    np.testing.assert_array_equal(out[:, 0], np.broadcast_to(red, (4, 4)))
    np.testing.assert_array_equal(out[:, 3], np.broadcast_to(blue, (4, 4)))
    # edge pixel: 2 of 4 samples on 9 -> 50/50 blend of the TRUE colors
    np.testing.assert_allclose(out[:, 1, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[:, 1, 2], 0.5, atol=1e-6)


def test_resolve_unmatched_sample_falls_back_to_own():
    ids = jnp.zeros((2, 2), jnp.int32)
    color = jnp.ones((2, 2, 4), jnp.float32) * 0.25
    # a sample sees id 42 which no center holds anywhere
    sample_ids = jnp.zeros((4, 4), jnp.int32).at[0, 0].set(42)
    out = np.asarray(msaa_id_resolve(color, ids, sample_ids, 2, 2))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def _triangle(w=64, h=64):
    from renderer_rs_tpu.app.scenes import triangle_scene

    return triangle_scene(w, h)


def test_forward_frame_resolve_mode(monkeypatch):
    """End-to-end: resolve-mode MSAA matches the 1x shade exactly on
    interior pixels, smooths edges, and stays close to the supersampling
    oracle (the quality gate's CPU proxy)."""
    from renderer_rs_tpu.renderer.passes import forward_frame

    scene, layout, kwargs, _ = _triangle()
    pipe1 = kwargs["pipeline"]
    pipe4 = dataclasses.replace(pipe1, msaa_samples=4)

    f1 = np.asarray(
        forward_frame(scene, layout, pipe1, kwargs["shading"], 64, 64)
    )
    monkeypatch.setenv("RENDERER_MSAA", "resolve")
    fr = np.asarray(
        forward_frame(scene, layout, pipe4, kwargs["shading"], 64, 64)
    )
    monkeypatch.setenv("RENDERER_MSAA", "super")
    fs = np.asarray(
        forward_frame(scene, layout, pipe4, kwargs["shading"], 64, 64)
    )
    assert fr.shape == f1.shape == fs.shape
    # interior pixels are EXACTLY the 1x shade (no supersampled shading)
    np.testing.assert_array_equal(fr[40, 32], f1[40, 32])
    np.testing.assert_array_equal(fr[0, 0], f1[0, 0])  # background
    # edge smoothing: more distinct levels than the aliased 1x render
    col1 = np.unique(np.round(f1[:, 20, 0], 3))
    colr = np.unique(np.round(fr[:, 20, 0], 3))
    assert colr.size >= col1.size
    # quality vs the supersampling oracle: tight everywhere on a flat-
    # shaded scene (shading is constant per surface -> resolve == box
    # resolve up to the oracle's sub-sample shading of the SAME color)
    assert float(np.abs(fr - fs).mean()) < 5e-3
    assert float(np.abs(fr - fs).max()) < 0.35


def test_ids_only_matches_return_ids():
    from renderer_rs_tpu.renderer.passes import forward_frame

    scene, layout, kwargs, _ = _triangle()
    pipe = kwargs["pipeline"]
    _, ids_a = forward_frame(
        scene, layout, pipe, kwargs["shading"], 64, 64, return_ids=True
    )
    ids_b = forward_frame(
        scene, layout, pipe, kwargs["shading"], 64, 64, ids_only=True
    )
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
