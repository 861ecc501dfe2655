"""Shadow mapping + CSM tests (shadow.hlsli / shadow_csm.hlsli semantics)."""

import math

import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.ops.csm import (
    CASCADE_COUNT,
    CSMParams,
    calculate_shadow_csm,
    calculate_shadow_csm_blended,
    cascade_debug_color,
    fit_cascades,
    practical_split_depths,
    select_cascade,
)
from renderer_rs_tpu.ops.shadow import (
    ShadowParams,
    calculate_shadow,
    directional_light_matrix,
)
from renderer_rs_tpu.scene.camera import Camera, Projection


def test_shadow_out_of_bounds_is_lit():
    """Fragments outside the shadow frustum return fully lit
    (shadow.hlsli:69-77)."""
    sm = jnp.zeros((16, 16), jnp.float32)  # everything occluded
    lsm = jnp.eye(4)
    far_pos = jnp.array([[10.0, 0.0, 0.0]])  # ndc x=10 -> out of bounds
    lit = calculate_shadow(sm, lsm, far_pos, jnp.array([[0.0, 1.0, 0.0]]),
                           jnp.array([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(lit), 1.0)


def test_shadow_occluded_vs_lit():
    """Point behind the stored depth is shadowed; in front is lit."""
    lsm = jnp.asarray(
        directional_light_matrix(
            jnp.array([0.0, -1.0, 0.0]), jnp.zeros(3), 5.0
        )
    )
    sm_occluded = jnp.zeros((64, 64), jnp.float32)  # blocker at depth 0
    sm_open = jnp.ones((64, 64), jnp.float32)
    pos = jnp.array([[0.0, 0.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    l = jnp.array([[0.0, 1.0, 0.0]])
    params = ShadowParams(pcf=False)
    lit_occ = float(calculate_shadow(sm_occluded, lsm, pos, n, l, params)[0])
    lit_open = float(calculate_shadow(sm_open, lsm, pos, n, l, params)[0])
    assert lit_occ == 0.0
    assert lit_open == 1.0


def test_shadow_strength_lerp():
    """strength=0.5 -> halfway between lit and shadowed (shadow.hlsli:125-128)."""
    lsm = jnp.asarray(
        directional_light_matrix(jnp.array([0.0, -1.0, 0.0]), jnp.zeros(3), 5.0)
    )
    sm = jnp.zeros((64, 64), jnp.float32)
    pos = jnp.array([[0.0, 0.0, 0.0]])
    n = l = jnp.array([[0.0, 1.0, 0.0]])
    half = float(
        calculate_shadow(sm, lsm, pos, n, l, ShadowParams(shadow_strength=0.5, pcf=False))[0]
    )
    assert abs(half - 0.5) < 1e-6


def test_pcf_soft_edge():
    """PCF at a blocker edge gives a fractional factor."""
    lsm = jnp.asarray(
        directional_light_matrix(jnp.array([0.0, -1.0, 0.0]), jnp.zeros(3), 5.0)
    )
    sm = jnp.ones((64, 64), jnp.float32)
    sm = sm.at[:, :32].set(0.0)  # left half blocked
    n = l = jnp.array([[0.0, 1.0, 0.0]])
    # position near the blocker boundary in light space
    pos = jnp.array([[0.0, 0.0, 0.0]])
    lit = float(calculate_shadow(sm, lsm, pos, n, l, ShadowParams())[0])
    assert 0.0 < lit < 1.0


def test_select_cascade():
    splits = jnp.array([0.25, 0.5, 0.75, 1.0])
    depth = jnp.array([0.1, 0.3, 0.6, 0.9])
    idx = np.asarray(select_cascade(splits, depth))
    np.testing.assert_array_equal(idx, [0, 1, 2, 3])


def test_cascade_debug_colors():
    splits = jnp.array([0.25, 0.5, 0.75, 1.0])
    c = np.asarray(cascade_debug_color(splits, jnp.array([0.1, 0.9])))
    np.testing.assert_allclose(c[0], [1, 0, 0])
    np.testing.assert_allclose(c[1], [1, 1, 0])


def test_practical_splits_monotonic():
    s = practical_split_depths(0.1, 100.0)
    assert len(s) == CASCADE_COUNT
    assert np.all(np.diff(s) > 0)
    assert abs(s[-1] - 100.0) < 1e-4


def test_fit_cascades_shapes_and_containment():
    cam = Camera(Projection.perspective(math.radians(60), 16 / 9, 0.1, 50.0))
    cam.position = np.array([0.0, 2.0, 5.0], np.float32)
    cam.look_at([0.0, 0.0, 0.0])
    mats, splits = fit_cascades(cam, [-0.5, -1.0, -0.3])
    assert mats.shape == (CASCADE_COUNT, 4, 4)
    assert splits.shape == (CASCADE_COUNT,)
    assert np.all(np.diff(splits) > 0)  # NDC splits increase
    # a world point in the near frustum slice projects inside cascade 0's box
    p = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    h = mats[0] @ p
    ndc = h[:3] / h[3]
    assert np.all(np.abs(ndc[:2]) <= 1.0) and 0.0 <= ndc[2] <= 1.0


def test_csm_occlusion_per_cascade():
    """Cascade selection routes to the right map: cascade 0 blocked,
    cascade 1 open."""
    s = 32
    maps = jnp.stack(
        [
            jnp.zeros((s, s), jnp.float32),  # cascade 0: blocked
            jnp.ones((s, s), jnp.float32),  # cascade 1: open
            jnp.ones((s, s), jnp.float32),
            jnp.ones((s, s), jnp.float32),
        ]
    )
    ident = jnp.broadcast_to(jnp.eye(4), (CASCADE_COUNT, 4, 4))
    splits = jnp.array([0.5, 0.8, 0.9, 1.0])
    pos = jnp.array([[0.0, 0.0, 0.5]])  # projects to uv center, depth 0.5
    n = l = jnp.array([[0.0, 0.0, -1.0]])
    params = CSMParams(pcf=False, normal_bias=0.0)
    near = float(
        calculate_shadow_csm(maps, ident, splits, pos, n, l, jnp.array([0.1]), params)[0]
    )
    far = float(
        calculate_shadow_csm(maps, ident, splits, pos, n, l, jnp.array([0.7]), params)[0]
    )
    assert near == 0.0  # cascade 0, blocked
    assert far == 1.0  # cascade 1, open


def test_csm_blended_transitions():
    """Inside the blend region the factor interpolates between cascades."""
    s = 16
    maps = jnp.stack(
        [
            jnp.zeros((s, s), jnp.float32),
            jnp.ones((s, s), jnp.float32),
            jnp.ones((s, s), jnp.float32),
            jnp.ones((s, s), jnp.float32),
        ]
    )
    ident = jnp.broadcast_to(jnp.eye(4), (CASCADE_COUNT, 4, 4))
    splits = jnp.array([0.5, 0.8, 0.9, 1.0])
    pos = jnp.array([[0.0, 0.0, 0.5]])
    n = l = jnp.array([[0.0, 0.0, -1.0]])
    params = CSMParams(pcf=False, normal_bias=0.0, blend_threshold=0.2)
    # depth just inside the blend region before split 0 (0.5): region=0.1
    mid = float(
        calculate_shadow_csm_blended(
            maps, ident, splits, pos, n, l, jnp.array([0.45]), params
        )[0]
    )
    assert 0.0 < mid < 1.0
    # far from the boundary: pure cascade 0
    pure = float(
        calculate_shadow_csm_blended(
            maps, ident, splits, pos, n, l, jnp.array([0.2]), params
        )[0]
    )
    assert pure == 0.0


def test_full_scene_csm_renders():
    """End-to-end: the full config with 4-cascade shadows renders finite
    pixels and produces shadows (darker floor regions) like the single-map
    path."""
    import jax.numpy as jnp
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 96, 72
    scene, layout, kwargs, _ = full_scene(w, h, tri_budget=600, ibl=False, csm=True)
    assert layout.has_csm and not layout.has_shadow
    pipe = GraphicsPipelineBuilder().build()
    out = np.asarray(
        forward_frame(
            scene, layout, pipe, kwargs["shading"], w, h,
            tonemap="aces", shadow_map_size=128,
            shadow_params=kwargs["shadow_params"],
        )
    )
    assert np.isfinite(out).all()
    # compare against the no-shadow version: CSM must darken some pixels
    scene2, layout2, kwargs2, _ = full_scene(w, h, tri_budget=600, ibl=False, csm=False)
    import dataclasses
    layout_nos = dataclasses.replace(layout2, has_shadow=False)
    out_nos = np.asarray(
        forward_frame(
            scene2.replace(light_space_matrix=None), layout_nos, pipe,
            kwargs2["shading"], w, h, tonemap="aces",
        )
    )
    darker = (out_nos[..., :3].sum(-1) - out[..., :3].sum(-1)) > 0.05
    assert darker.mean() > 0.02  # some pixels are shadowed


def test_full_scene_ibl_plus_csm():
    """The richest reference shader (model_pbr_ibl_csm.hlsl): split-sum IBL
    ambient + 4-cascade shadows in one frame."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 96, 72
    scene, layout, kwargs, _ = full_scene(w, h, tri_budget=600, ibl=True, csm=True)
    assert layout.has_csm and layout.has_environment
    assert kwargs["shading"] == ShadingModel.PBR_IBL
    out = np.asarray(
        forward_frame(
            scene, layout, GraphicsPipelineBuilder().build(),
            kwargs["shading"], w, h, tonemap="aces", shadow_map_size=128,
            shadow_params=kwargs["shadow_params"],
        )
    )
    assert np.isfinite(out).all()
    assert out[..., :3].std() > 0.05  # an actual image, not a constant


def test_csm_pcf_group_bit_identical(monkeypatch):
    """The grouped PCF window table (RENDERER_PCF_GROUP=8, the default for
    group-divisible map sizes) must be bit-identical to the ungrouped
    per-texel table — the mask-reduce only ever adds zeros."""
    rng = np.random.default_rng(5)
    s = 32
    maps = jnp.asarray(rng.random((CASCADE_COUNT, s, s), dtype=np.float32))
    ident = jnp.broadcast_to(jnp.eye(4), (CASCADE_COUNT, 4, 4))
    splits = jnp.array([0.25, 0.5, 0.75, 1.0])
    n_pts = 257
    pos = jnp.asarray(rng.uniform(-0.99, 0.99, (n_pts, 3)).astype(np.float32))
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (n_pts, 3))
    depth = jnp.asarray(rng.random(n_pts, dtype=np.float32))
    params = CSMParams(pcf=True)

    outs = {}
    for group in ("1", "8"):
        monkeypatch.setenv("RENDERER_PCF_GROUP", group)
        outs[group] = np.asarray(
            calculate_shadow_csm(maps, ident, splits, pos, n, n, depth, params)
        )
    np.testing.assert_array_equal(outs["1"], outs["8"])


def test_fit_cascades_caster_margin_catches_out_of_slice_casters():
    """A caster ABOVE a near cascade's frustum slice (toward the sun) must
    still land inside that cascade's ortho volume — the near-plane extension
    standing in for depth pancaking. Without the margin the light eye sits
    only 2*radius behind the slice and such casters fall behind the near
    plane, silently vanishing from the shadow map."""
    cam = Camera(Projection.perspective(math.radians(60), 16 / 9, 0.1, 50.0))
    cam.position = np.array([0.0, 2.0, 5.0], np.float32)
    cam.look_at([0.0, 0.0, 0.0])
    sun = np.array([0.0, -1.0, 0.0], np.float32)  # straight down
    mats, _ = fit_cascades(cam, sun)
    # a tall blocker 30 world units above the near-slice center: well above
    # the slice (cascade-0 radius is ~1-2 here) but inside the camera far
    blocker = np.array([0.0, 30.0, 4.0, 1.0], np.float32)
    h = mats[0] @ blocker
    ndc = h[:3] / h[3]
    assert 0.0 <= ndc[2] <= 1.0, f"caster clipped from cascade 0: z={ndc[2]}"
    # tight fit (margin=0) reproduces the old clipping behavior
    mats0, _ = fit_cascades(cam, sun, caster_margin=0.0)
    h0 = mats0[0] @ blocker
    assert not 0.0 <= (h0[:3] / h0[3])[2] <= 1.0


def test_pcf_halo_layout_bit_identical(monkeypatch):
    """RENDERER_PCF_LAYOUT=halo (3 dy-planes x (group+2) x-halo lanes,
    30 lanes at group=8) must be bit-identical to the "group" layout
    (full 9-tap window per x-texel, 72 lanes) AND to the ungrouped
    per-texel table: all three enumerate the same edge-clamped 3x3 taps
    and sum <=9 exact f32 ones. Random points include off-edge UVs so the
    clamp rows/cols are exercised."""
    rng = np.random.default_rng(11)
    s = 32
    sm = jnp.asarray(rng.random((s, s), dtype=np.float32))
    lsm = jnp.asarray(
        directional_light_matrix(
            jnp.array([0.3, -1.0, 0.2]), jnp.zeros(3), 4.0
        )
    )
    n_pts = 513
    pos = jnp.asarray(rng.uniform(-4.5, 4.5, (n_pts, 3)).astype(np.float32))
    nrm = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n_pts, 3))
    ldir = jnp.broadcast_to(jnp.array([-0.3, 1.0, -0.2]), (n_pts, 3))
    params = ShadowParams(pcf=True)

    outs = {}
    for layout, group in (
        ("halo", "8"),
        ("halo", "16"),
        ("halo", "32"),
        ("group", "8"),
        ("group", "1"),
    ):
        monkeypatch.setenv("RENDERER_PCF_LAYOUT", layout)
        monkeypatch.setenv("RENDERER_PCF_GROUP", group)
        outs[(layout, group)] = np.asarray(
            calculate_shadow(sm, lsm, pos, nrm, ldir, params)
        )
    np.testing.assert_array_equal(outs[("halo", "8")], outs[("group", "8")])
    np.testing.assert_array_equal(outs[("halo", "8")], outs[("group", "1")])
    np.testing.assert_array_equal(outs[("halo", "16")], outs[("group", "1")])
    np.testing.assert_array_equal(outs[("halo", "32")], outs[("group", "1")])


def test_upsample2x_bilinear_exact():
    """upsample2x_bilinear must reproduce the even-grid samples exactly and
    average neighbors (edge-clamped) at odd pixels — checked against a
    straightforward numpy reference at even and odd full-res extents."""
    from renderer_rs_tpu.ops.shadow import upsample2x_bilinear

    rng = np.random.default_rng(3)
    for height, width in ((8, 12), (7, 11), (6, 10)):
        hh, hw = (height + 1) // 2, (width + 1) // 2
        s = rng.random((hh, hw)).astype(np.float32)
        out = np.asarray(upsample2x_bilinear(jnp.asarray(s), height, width))
        assert out.shape == (height, width)
        ref = np.empty((height, width), np.float32)
        for y in range(height):
            i0, i1 = y // 2, min(y // 2 + (y % 2), hh - 1)
            for x in range(width):
                j0, j1 = x // 2, min(x // 2 + (x % 2), hw - 1)
                ref[y, x] = 0.25 * (
                    s[i0, j0] + s[i0, j1] + s[i1, j0] + s[i1, j1]
                )
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-7)
        # grid points are preserved bit-exactly
        np.testing.assert_array_equal(out[::2, ::2], s[: (height + 1) // 2, : (width + 1) // 2])


def test_pcf_res_half_knob_engages(monkeypatch):
    """RENDERER_PCF_RES=half must engage (image changes at penumbrae) while
    staying close to the full-res shadow term on the full scene."""
    import jax

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    width, height = 96, 64
    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=600)
    pipe = GraphicsPipelineBuilder().build()

    def render():
        return np.asarray(
            forward_frame(
                scene, layout, pipe, kwargs["shading"], width, height,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=128,
                shadow_params=kwargs.get("shadow_params"),
            )
        )

    full = render()
    monkeypatch.setenv("RENDERER_PCF_RES", "half")
    half = render()
    assert full.shape == half.shape
    diff = np.abs(full - half)
    # bounded drift: the lit factor only modulates the sun term
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.99) < 0.15, np.quantile(diff, 0.99)


def test_upsample2x_y_exact():
    """upsample2x_y must preserve even rows bit-exactly and linearly
    interpolate odd rows (edge-clamped), at even and odd heights."""
    from renderer_rs_tpu.ops.shadow import upsample2x_y

    rng = np.random.default_rng(5)
    for height, width in ((8, 12), (7, 11)):
        hh = (height + 1) // 2
        s = rng.random((hh, width)).astype(np.float32)
        out = np.asarray(upsample2x_y(jnp.asarray(s), height))
        assert out.shape == (height, width)
        np.testing.assert_array_equal(out[::2], s[: (height + 1) // 2])
        for y in range(1, height, 2):
            i1 = min(y // 2 + 1, hh - 1)
            np.testing.assert_allclose(
                out[y], 0.5 * (s[y // 2] + s[i1]), rtol=0, atol=1e-7
            )


def test_pcf_res_yhalf_default(monkeypatch):
    """The y-half PCF default engages on tall frames (>=128 rows) with
    bounded drift vs the exact term, and small frames keep the exact
    per-pixel reference semantics (default == RENDERER_PCF_RES=full)."""
    import jax

    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    pipe = GraphicsPipelineBuilder().build()

    def render(width, height, scene, layout, kwargs):
        return np.asarray(
            forward_frame(
                scene, layout, pipe, kwargs["shading"], width, height,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=128,
                shadow_params=kwargs.get("shadow_params"),
            )
        )

    # tall frame: default (yhalf) differs from exact, but stays close
    width, height = 96, 144
    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=600)
    dflt = render(width, height, scene, layout, kwargs)
    monkeypatch.setenv("RENDERER_PCF_RES", "full")
    exact = render(width, height, scene, layout, kwargs)
    monkeypatch.delenv("RENDERER_PCF_RES")
    assert not np.array_equal(dflt, exact), "yhalf default did not engage"
    diff = np.abs(dflt - exact)
    assert diff.mean() < 5e-3, diff.mean()
    assert np.quantile(diff, 0.99) < 0.15, np.quantile(diff, 0.99)

    # short frame (< 128 rows): default stays exact per-pixel PCF
    width, height = 96, 64
    scene, layout, kwargs, _ = full_scene(width, height, tri_budget=600)
    dflt = render(width, height, scene, layout, kwargs)
    monkeypatch.setenv("RENDERER_PCF_RES", "full")
    exact = render(width, height, scene, layout, kwargs)
    np.testing.assert_array_equal(dflt, exact)


def test_csm_yquarter_rate_quality(monkeypatch):
    """The r5 y-strided CSM shadow term (same ladder as the single-map
    PCF reduction): engages only on full-row frames >= 128 rows, stays
    within the probe_quality-style tolerance of the exact per-pixel
    evaluation, and RENDERER_PCF_RES=full restores the exact path."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 256  # tall enough for the y-quarter gate
    scene, layout, kwargs, _ = full_scene(w, h, tri_budget=600, ibl=False, csm=True)
    pipe = GraphicsPipelineBuilder().build()

    def render():
        return np.asarray(
            forward_frame(
                scene, layout, pipe, kwargs["shading"], w, h,
                tonemap="aces", shadow_map_size=128,
                shadow_params=kwargs["shadow_params"],
            )
        )

    monkeypatch.setenv("RENDERER_PCF_RES", "full")
    exact = render()
    monkeypatch.setenv("RENDERER_PCF_RES", "yquarter")
    fast = render()
    err = np.abs(fast - exact)
    # tolerances are for THIS toy scale (128^2 cascade maps on a 256-row
    # frame): penumbra rows are a far larger image fraction than at the
    # 1080p/1024^2 flagship, where the single-map y-quarter gate measured
    # mean 2.9e-4 (probe_quality pcfyquarter)
    assert float(err.mean()) < 0.01
    assert float(np.quantile(err, 0.99)) < 0.25  # penumbra rows only
    # even rows of each 4-row group are exact (the sampled rows)
    np.testing.assert_allclose(fast[::4], exact[::4], atol=1e-6)
