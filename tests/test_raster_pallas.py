"""Pallas raster kernel tests (interpret mode on CPU).

The kernel must match the XLA binned path bit-for-bit on visibility, and the
fused-varyings output must match the deferred perspective-correct
interpolation to float tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import renderer_rs_tpu.ops.raster_pallas as rp
from renderer_rs_tpu.ops.raster import (
    gather_triangle_clip,
    interpolate,
    perspective_bary,
    rasterize,
    setup_triangles,
)
from renderer_rs_tpu.ops.raster_binned import rasterize_binned
from renderer_rs_tpu.rhi.pipeline import (
    CompareOp,
    CullMode,
    GraphicsPipelineBuilder,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(rp.pl, "pallas_call", interp)


def _scene(t=120, seed=4, perspective=True):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-1.0, 1.0, (t, 1, 3)).astype(np.float32)
    off = rng.uniform(-0.3, 0.3, (t, 3, 3)).astype(np.float32)
    pos = center + off
    pos[..., 2] = rng.uniform(0.05, 0.95, (t, 3))
    w = (
        rng.uniform(0.5, 3.0, (t, 3, 1)).astype(np.float32)
        if perspective
        else np.ones((t, 3, 1), np.float32)
    )
    clip = np.concatenate([pos * w, w], -1)
    return (
        jnp.asarray(clip.reshape(t * 3, 4)),
        jnp.arange(t * 3, dtype=jnp.int32).reshape(t, 3),
    )


def test_pallas_matches_xla_binned():
    clip, tris = _scene()
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vx = rasterize_binned(setup, h, w, pipe, cap=256)
    vp = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), np.asarray(vp.tri_id))
    np.testing.assert_array_equal(np.asarray(vx.depth), np.asarray(vp.depth))
    cov = np.asarray(vx.covered)
    np.testing.assert_allclose(
        np.asarray(vx.bary)[cov], np.asarray(vp.bary)[cov], atol=0
    )


def test_pallas_depth_only_matches():
    clip, tris = _scene(seed=9)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    dx = rasterize_binned(setup, h, w, pipe, cap=256).depth
    dp = rp.rasterize_binned_pallas(setup, h, w, pipe, depth_only=True)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dp))
    # the shadow-tuning knob combos (renderer.passes._shadow_kernel_knobs)
    # must stay bit-identical at any tile/sub/chunk shape
    for knobs in ({"tile_h": 16, "sub_h": 16, "chunk": 32},
                  {"tile_h": 32, "sub_h": 32, "chunk": 16}):
        dk = rp.rasterize_binned_pallas(
            setup, h, w, pipe, depth_only=True, **knobs
        )
        np.testing.assert_array_equal(np.asarray(dx), np.asarray(dk))


def test_pallas_fused_varyings_match_deferred():
    """In-kernel perspective-correct interpolation == the deferred
    perspective_bary + interpolate path (float-order tolerance)."""
    clip, tris = _scene(seed=4)
    rng = np.random.default_rng(7)
    attr = jnp.asarray(rng.random((clip.shape[0], 8), dtype=np.float32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    vis_ref = rasterize(setup, h, w, pipe)
    bary3 = perspective_bary(vis_ref, setup)
    vary_ref = interpolate(vis_ref, tris, attr, bary3)

    vis_pl, vary_pl = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16, varyings=attr[tris]
    )
    np.testing.assert_array_equal(
        np.asarray(vis_ref.tri_id), np.asarray(vis_pl.tri_id)
    )
    cov = np.asarray(vis_ref.covered)
    np.testing.assert_allclose(
        np.asarray(vary_ref)[cov], np.asarray(vary_pl)[cov], atol=2e-5
    )


def test_pallas_flat_only_varyings():
    """flat_varyings WITHOUT smooth varyings: the kernel must read flat
    channels from the correct column base (24 when n_vary==0 — round-1
    advisor finding: it read col 27 and returned garbage)."""
    clip, tris = _scene(seed=5, t=60)
    rng = np.random.default_rng(11)
    t = tris.shape[0]
    flat = jnp.asarray(rng.random((t, 4), dtype=np.float32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    vis_ref = rasterize(setup, h, w, pipe)
    vis_pl, flat_pl = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16, flat_varyings=flat
    )
    np.testing.assert_array_equal(
        np.asarray(vis_ref.tri_id), np.asarray(vis_pl.tri_id)
    )
    cov = np.asarray(vis_ref.covered)
    tid = np.asarray(vis_ref.tri_id)
    expect = np.asarray(flat)[np.maximum(tid, 0)]
    np.testing.assert_allclose(
        np.asarray(flat_pl)[cov], expect[cov], atol=1e-6
    )


def test_pallas_flat_plus_smooth_varyings():
    """flat + smooth varyings together keep both channel groups correct."""
    clip, tris = _scene(seed=6, t=60)
    rng = np.random.default_rng(12)
    t = tris.shape[0]
    attr = jnp.asarray(rng.random((clip.shape[0], 3), dtype=np.float32))
    flat = jnp.asarray(rng.random((t, 2), dtype=np.float32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    vis_ref = rasterize(setup, h, w, pipe)
    bary3 = perspective_bary(vis_ref, setup)
    vary_ref = interpolate(vis_ref, tris, attr, bary3)

    vis_pl, out_pl = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16,
        varyings=attr[tris], flat_varyings=flat,
    )
    cov = np.asarray(vis_ref.covered)
    tid = np.asarray(vis_ref.tri_id)
    np.testing.assert_allclose(
        np.asarray(vary_ref)[cov], np.asarray(out_pl)[..., :3][cov], atol=2e-5
    )
    expect = np.asarray(flat)[np.maximum(tid, 0)]
    np.testing.assert_allclose(
        np.asarray(out_pl)[..., 3:][cov], expect[cov], atol=1e-6
    )


def test_pallas_z_floor_matches_xla_binned():
    """The depth-peeling z_floor constraint matches across kernels: both
    must return the next-nearest fragment strictly beyond the floor."""
    clip, tris = _scene(t=100, seed=9)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    # layer 0 (no floor) then peel at the layer-0 depth
    v0 = rasterize_binned(setup, h, w, pipe, cap=128)
    floor = jnp.where(v0.covered, v0.depth, jnp.inf)
    vx = rasterize_binned(setup, h, w, pipe, cap=128, z_floor=floor)
    vp = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16, z_floor=floor)
    np.testing.assert_array_equal(np.asarray(vx.tri_id), np.asarray(vp.tri_id))
    np.testing.assert_array_equal(np.asarray(vx.depth), np.asarray(vp.depth))
    # the peeled layer is strictly behind layer 0 wherever covered
    both = np.asarray(v0.covered & vx.covered)
    assert both.any()
    assert (np.asarray(vx.depth)[both] > np.asarray(v0.depth)[both]).all()


def test_depth_only_batch_matches_sequential():
    """rasterize_depth_only_batch (one launch, N*n_tiles grid — the CSM
    cascade batching) is bit-identical to N separate depth-only calls."""
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setups = []
    for seed in (4, 9, 13):
        clip, tris = _scene(t=60, seed=seed)
        setups.append(setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe))
    batched = rp.rasterize_depth_only_batch(setups, h, w, pipe, chunk=16)
    assert batched.shape == (3, h, w)
    for i, s in enumerate(setups):
        single = rp.rasterize_binned_pallas(
            s, h, w, pipe, chunk=16, depth_only=True
        )
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(single))


def test_skip_bary_matches_full_outputs():
    """skip_bary drops the b0/b1 outputs and reductions; depth/tid/varyings
    stay bit-identical to the full-output kernel."""
    clip, tris = _scene(t=100, seed=6)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vary = jnp.asarray(
        np.random.default_rng(0).standard_normal((100, 3, 6)).astype(np.float32)
    )
    va, ia = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16, varyings=vary, skip_bary=False
    )
    vb, ib = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16, varyings=vary, skip_bary=True
    )
    np.testing.assert_array_equal(np.asarray(va.tri_id), np.asarray(vb.tri_id))
    np.testing.assert_array_equal(np.asarray(va.depth), np.asarray(vb.depth))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    assert (np.asarray(vb.bary) == 0).all()  # placeholder, never read


def test_fused_forward_frame_matches_deferred(monkeypatch):
    """forward_frame's fused TPU path (kernel varyings + flat material lanes
    + fused texture-set id) matches the deferred CPU path on a textured PBR
    scene (interpret mode drives the same code the TPU runs)."""
    import renderer_rs_tpu.renderer.passes as passes
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 64
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=300, ibl=False, textured=True
    )
    pipe = GraphicsPipelineBuilder().build()

    ref = np.asarray(
        passes.forward_frame(
            scene, layout, pipe, kwargs["shading"], w, h,
            shadow_map_size=64, shadow_params=kwargs["shadow_params"],
        )
    )

    monkeypatch.setattr(passes, "_use_pallas", lambda: True)
    out = np.asarray(
        passes.forward_frame(
            scene, layout, pipe, kwargs["shading"], w, h,
            shadow_map_size=64, shadow_params=kwargs["shadow_params"],
        )
    )
    assert np.isfinite(out).all()
    # same rasterization (bit-identical visibility) -> shading differs only
    # by the varying interpolation order; tolerance covers fp reassociation
    # plus isolated mip-boundary flips: quad-shared LOD (r4) picks one mip
    # per 2x2 quad from the EVEN pixel's uv difference, so a ~1-ulp uv
    # delta between the kernel and deferred interpolation can flip a
    # boundary quad's mip (bound = bf16 atlas + parent-smoothing delta)
    err = np.abs(out - ref)
    flipped = err > 2e-3 + 2e-3 * np.abs(ref)
    assert flipped.mean() < 2e-3, f"{flipped.mean():.4%} pixels off"
    assert err.max() < 0.05, f"max err {err.max()}"


def test_fused_frame_ibl_matches_deferred(monkeypatch):
    """The flagship bench combination (textured PBR + IBL fast-ambient +
    merged specular/skybox fetch) through the fused path matches the
    deferred CPU path."""
    import renderer_rs_tpu.renderer.passes as passes
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 64
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=300, ibl=True, textured=True
    )
    assert layout.has_environment
    pipe = GraphicsPipelineBuilder().build()

    def frame():
        return np.asarray(
            passes.forward_frame(
                scene, layout, pipe, kwargs["shading"], w, h,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=64, shadow_params=kwargs["shadow_params"],
            )
        )

    ref = frame()
    monkeypatch.setattr(passes, "_use_pallas", lambda: True)
    out = frame()
    assert np.isfinite(out).all()
    # fp-reassociation tolerance + isolated quad-LOD mip-boundary flips
    # (see test_fused_forward_frame_matches_deferred)
    _err = np.abs(out - ref)
    _flipped = _err > 2e-3 + 2e-3 * np.abs(ref)
    assert _flipped.mean() < 2e-3, f"{_flipped.mean():.4%} pixels off"
    assert _err.max() < 0.05, f"max err {_err.max()}"


def test_fused_frame_csm_matches_deferred(monkeypatch):
    """forward_frame's fused path under CSM (batched cascade raster +
    blended cascade select reading vis.depth) matches the deferred CPU
    path — the composition behind the --csm TPU screenshot."""
    import renderer_rs_tpu.renderer.passes as passes
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 64
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=300, ibl=False, textured=True, csm=True
    )
    assert layout.has_csm
    pipe = GraphicsPipelineBuilder().build()

    def frame():
        return np.asarray(
            passes.forward_frame(
                scene, layout, pipe, kwargs["shading"], w, h,
                shadow_map_size=64, shadow_params=kwargs["shadow_params"],
            )
        )

    ref = frame()
    monkeypatch.setattr(passes, "_use_pallas", lambda: True)
    out = frame()
    assert np.isfinite(out).all()
    # fp-reassociation tolerance + isolated quad-LOD mip-boundary flips
    # (see test_fused_forward_frame_matches_deferred)
    _err = np.abs(out - ref)
    _flipped = _err > 2e-3 + 2e-3 * np.abs(ref)
    assert _flipped.mean() < 2e-3, f"{_flipped.mean():.4%} pixels off"
    assert _err.max() < 0.05, f"max err {_err.max()}"


def test_fused_frame_arith_src_matches_packed_ids(monkeypatch):
    """The arithmetic source mapping (src = slot mod T + material-id flat
    lane, the defer-path default) is BIT-identical to the packed-ids
    payload scheme (RENDERER_PACK_IDS=1): same source ids, same material
    ids, same shaded image."""
    import renderer_rs_tpu.renderer.passes as passes
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 64
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=300, ibl=False, textured=True
    )
    pipe = GraphicsPipelineBuilder().build()
    monkeypatch.setattr(passes, "_use_pallas", lambda: True)

    def frame():
        return np.asarray(
            passes.forward_frame(
                scene, layout, pipe, kwargs["shading"], w, h,
                shadow_map_size=64, shadow_params=kwargs["shadow_params"],
            )
        )

    # the packed-ids payload is an XLA-defer-path scheme: pin the resolve
    # mode so the comparison stays meaningful under the kernel default
    monkeypatch.setenv("RENDERER_DEFER_VARY", "1")
    arith = frame()
    monkeypatch.setenv("RENDERER_PACK_IDS", "1")
    packed = frame()
    np.testing.assert_array_equal(arith, packed)


def test_fused_frame_bf16_defer_table(monkeypatch):
    """RENDERER_DEFER_DTYPE=bf16 (half-width defer-table gather) renders a
    finite image close to the f32 path: attributes quantize to 8 mantissa
    bits but integer lanes (material id) stay exact, so shading must agree
    to bf16-level tolerance with NO structural differences (same coverage,
    same materials)."""
    import renderer_rs_tpu.renderer.passes as passes
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 64
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=300, ibl=False, textured=True
    )
    pipe = GraphicsPipelineBuilder().build()
    monkeypatch.setattr(passes, "_use_pallas", lambda: True)

    def frame():
        return np.asarray(
            passes.forward_frame(
                scene, layout, pipe, kwargs["shading"], w, h,
                shadow_map_size=64, shadow_params=kwargs["shadow_params"],
            )
        )

    # bf16 defer tables exist only on the XLA defer path (the kernel-
    # gather default reads the f32 slab): pin the resolve mode
    monkeypatch.setenv("RENDERER_DEFER_VARY", "1")
    ref = frame()
    monkeypatch.setenv("RENDERER_DEFER_DTYPE", "bf16")
    out = frame()
    assert np.isfinite(out).all()
    # bf16 attribute quantization: ~0.4% of range; shadow-boundary pixels
    # can flip, so compare the bulk (99.5th percentile error small)
    err = np.abs(out - ref)
    assert err.max() > 0, "bf16 knob silently inert (trace-cache or plumbing)"
    assert np.quantile(err, 0.995) < 0.05
    assert np.median(err) < 0.005


def test_pallas_defer_varyings_bit_matches_fused():
    """defer_varyings=True (visibility kernel + post-hoc wide-row gather)
    must reproduce the in-kernel fused-varying output on covered pixels:
    visibility (depth/tri_id) BIT-identically, varyings to ulp-level
    tolerance (same f32 formula, but XLA and Mosaic contract mul+add to
    FMA differently), including flat channels, the ids payload, and
    under near-clip source composition."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    clip, tris = _scene(seed=9, t=90)
    rng = np.random.default_rng(13)
    attr = jnp.asarray(rng.random((clip.shape[0], 5), dtype=np.float32))
    t = tris.shape[0]
    flat = jnp.asarray(rng.random((t, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 1000, t).astype(np.int32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256

    tri_clip = gather_triangle_clip(clip, tris)
    tri_clip2, valid, src, bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip2, w, h, pipe, tri_valid=valid)
    ids2 = ids[src]

    vis_f, vary_f = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16,
        varyings=attr[tris], vary_src=src, vary_bary=bary,
        flat_varyings=flat, ids=ids2, skip_bary=True,
    )
    vis_d, vary_d = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16,
        varyings=attr[tris], vary_src=src, vary_bary=bary,
        flat_varyings=flat, ids=ids2, skip_bary=True,
        defer_varyings=True,
    )
    np.testing.assert_array_equal(
        np.asarray(vis_f.tri_id), np.asarray(vis_d.tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(vis_f.depth), np.asarray(vis_d.depth)
    )
    cov = np.asarray(vis_f.covered)
    np.testing.assert_allclose(
        np.asarray(vary_f)[cov], np.asarray(vary_d)[cov],
        rtol=4e-6, atol=1e-6,
    )


@pytest.mark.parametrize("mode", ["table", "reshape"])
def test_defer_sublane_matches_flat(monkeypatch, mode):
    """RENDERER_DEFER_SUBLANE (vertex-sublane defer table [t,3,L]: one
    einsum build, 3-D winner gather, sublane-reduce blend) produces the
    same resolved varyings, exact flat lanes, and exact ids as the default
    flat-table layout — required before flipping the default. Covers the
    flagship shape: clip mapping, flat varyings, and an ids payload."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    clip, tris = _scene(60, seed=21)
    rng = np.random.default_rng(7)
    attr = jnp.asarray(rng.random((clip.shape[0], 6), dtype=np.float32))
    t = tris.shape[0]
    flat = jnp.asarray(rng.random((t, 2), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 1000, t).astype(np.int32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128

    tri_clip = gather_triangle_clip(clip, tris)
    tri_clip2, valid, src, bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip2, w, h, pipe, tri_valid=valid)

    def run():
        return rp.rasterize_binned_pallas(
            setup, h, w, pipe, chunk=16,
            varyings=attr[tris], vary_src=src, vary_bary=bary,
            flat_varyings=flat, ids=ids[src], skip_bary=True,
            defer_varyings=True,
        )

    vis_a, vary_a = run()
    monkeypatch.setenv("RENDERER_DEFER_SUBLANE", mode)
    vis_b, vary_b = run()
    np.testing.assert_array_equal(
        np.asarray(vis_a.tri_id), np.asarray(vis_b.tri_id)
    )
    cov = np.asarray(vis_a.tri_id) >= 0
    nv = attr.shape[-1]
    # interpolated varyings: ulp-level (einsum vs per-column FMA compose)
    np.testing.assert_allclose(
        np.asarray(vary_a)[cov][:, :nv], np.asarray(vary_b)[cov][:, :nv],
        rtol=4e-6, atol=1e-6,
    )
    # flat lanes ride vertex-0 lanes and stay winner-select EXACT
    np.testing.assert_array_equal(
        np.asarray(vary_a)[cov][:, nv:], np.asarray(vary_b)[cov][:, nv:]
    )


def test_gather_defer_matches_deferred():
    """defer_varyings="kernel" (in-kernel winner-row dynamic_gather resolve)
    must reproduce the XLA deferred path: visibility BIT-identically,
    varyings + flats to ulp-level tolerance (same f32 formulas; XLA and
    the kernel contract FMAs differently). Covers near-clip source
    composition, flat lanes, and both AoS and SoA table builds."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    clip, tris = _scene(90, seed=9)
    rng = np.random.default_rng(13)
    attr = jnp.asarray(rng.random((clip.shape[0], 5), dtype=np.float32))
    t = tris.shape[0]
    flat = jnp.asarray(rng.random((t, 2), dtype=np.float32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256

    tri_clip = gather_triangle_clip(clip, tris)
    tri_clip2, valid, src, bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip2, w, h, pipe, tri_valid=valid)

    vis_d, vary_d = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16,
        varyings=attr[tris], vary_src=src, vary_bary=bary,
        flat_varyings=flat, skip_bary=True, defer_varyings=True,
    )
    # chunk=16 (< tile_w: exercises the transposed-slab lane pad) and
    # chunk=128 (the production shape: slab fills the lane width)
    for chunk in (16, 128):
        vis_g, vary_g = rp.rasterize_binned_pallas(
            setup, h, w, pipe, chunk=chunk,
            varyings=attr[tris], vary_src=src, vary_bary=bary,
            flat_varyings=flat, skip_bary=True, defer_varyings="kernel",
        )
        np.testing.assert_array_equal(
            np.asarray(vis_d.tri_id), np.asarray(vis_g.tri_id)
        )
        np.testing.assert_array_equal(
            np.asarray(vis_d.depth), np.asarray(vis_g.depth)
        )
        cov = np.asarray(vis_d.tri_id) >= 0
        np.testing.assert_allclose(
            np.asarray(vary_d)[cov][:, :5], np.asarray(vary_g)[cov][:, :5],
            rtol=4e-6, atol=1e-6,
        )
        # flat lanes are winner-select EXACT in both schemes
        np.testing.assert_array_equal(
            np.asarray(vary_d)[cov][:, 5:], np.asarray(vary_g)[cov][:, 5:]
        )
    # SoA build must equal the AoS build bit-for-bit (same formulas)
    from renderer_rs_tpu.ops.clip import clip_triangles_near_planes

    _, _, src_p, bary_p = clip_triangles_near_planes(tri_clip)
    vis_s, vary_s = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=128,
        varyings_soa=(attr, tris), vary_src=src, vary_bary_planes=bary_p,
        flat_varyings=flat, skip_bary=True, defer_varyings="kernel",
    )
    vis_g, vary_g = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=128,
        varyings=attr[tris], vary_src=src, vary_bary=bary,
        flat_varyings=flat, skip_bary=True, defer_varyings="kernel",
    )
    np.testing.assert_array_equal(
        np.asarray(vis_s.tri_id), np.asarray(vis_g.tri_id)
    )
    np.testing.assert_array_equal(np.asarray(vary_s), np.asarray(vary_g))


def test_fused_frame_kernel_defer_matches(monkeypatch):
    """The kernel-gather resolve default renders the full textured fused
    frame (arith source mapping + material-id flat lane) matching the
    XLA deferred path (RENDERER_DEFER_VARY=1) to float tolerance, with
    identical coverage."""
    import renderer_rs_tpu.renderer.passes as passes
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 64
    scene, layout, kwargs, _ = full_scene(
        w, h, tri_budget=300, ibl=False, textured=True
    )
    pipe = GraphicsPipelineBuilder().build()
    monkeypatch.setattr(passes, "_use_pallas", lambda: True)

    def frame():
        return np.asarray(
            passes.forward_frame(
                scene, layout, pipe, kwargs["shading"], w, h,
                shadow_map_size=64, shadow_params=kwargs["shadow_params"],
            )
        )

    monkeypatch.setenv("RENDERER_DEFER_VARY", "1")
    ref = frame()
    monkeypatch.setenv("RENDERER_DEFER_VARY", "kernel")
    out = frame()
    assert np.isfinite(out).all()
    # fp-reassociation tolerance + isolated quad-LOD mip-boundary flips
    # (see test_fused_forward_frame_matches_deferred)
    _err = np.abs(out - ref)
    _flipped = _err > 2e-3 + 2e-3 * np.abs(ref)
    assert _flipped.mean() < 2e-3, f"{_flipped.mean():.4%} pixels off"
    assert _err.max() < 0.05, f"max err {_err.max()}"


def test_defer_tbl_einsum_matches_stack(monkeypatch):
    """RENDERER_DEFER_TBL=einsum (block-assembled defer table: einsum
    clip-frame compose + concat) produces the same resolved varyings and
    ids as the default 40-column jnp.stack build — required before
    flipping the default. Covers the flagship shape: clip mapping
    (vary_src/vary_bary), flat varyings, and an ids payload."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    clip, tris = _scene(60, seed=21)
    rng = np.random.default_rng(7)
    attr = jnp.asarray(rng.random((clip.shape[0], 6), dtype=np.float32))
    t = tris.shape[0]
    flat = jnp.asarray(rng.random((t, 2), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 1000, t).astype(np.int32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128

    tri_clip = gather_triangle_clip(clip, tris)
    tri_clip2, valid, src, bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip2, w, h, pipe, tri_valid=valid)

    def run():
        return rp.rasterize_binned_pallas(
            setup, h, w, pipe, chunk=16,
            varyings=attr[tris], vary_src=src, vary_bary=bary,
            flat_varyings=flat, ids=ids[src], skip_bary=True,
            defer_varyings=True,
        )

    vis_a, vary_a = run()
    monkeypatch.setenv("RENDERER_DEFER_TBL", "einsum")
    vis_b, vary_b = run()
    np.testing.assert_array_equal(
        np.asarray(vis_a.tri_id), np.asarray(vis_b.tri_id)
    )
    cov = np.asarray(vis_a.tri_id) >= 0
    np.testing.assert_allclose(
        np.asarray(vary_a)[cov], np.asarray(vary_b)[cov],
        rtol=4e-6, atol=1e-6,
    )


def test_ktbl_block_bit_matches_stack(monkeypatch):
    """RENDERER_KTBL=block (the default: edge-vectorized block-assembled
    kernel table) is BIT-identical to the per-column stack build
    (RENDERER_KTBL=stack): same visibility, same barycentrics, same
    varyings. Covers near-clip invalid slots (thresh=inf folding),
    depth-only, and the fused-varyings path."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    clip, tris = _scene(80, seed=19)
    rng = np.random.default_rng(2)
    attr = jnp.asarray(rng.random((clip.shape[0], 4), dtype=np.float32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256

    tri_clip = gather_triangle_clip(clip, tris)
    tri_clip2, valid, src, bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip2, w, h, pipe, tri_valid=valid)

    def runs():
        vis = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16)
        d = rp.rasterize_binned_pallas(setup, h, w, pipe, depth_only=True)
        vv, vy = rp.rasterize_binned_pallas(
            setup, h, w, pipe, chunk=16,
            varyings=attr[tris], vary_src=src, vary_bary=bary,
            skip_bary=True, defer_varyings=True,
        )
        return vis, d, vv, vy

    monkeypatch.setenv("RENDERER_KTBL", "stack")
    a = runs()
    monkeypatch.setenv("RENDERER_KTBL", "block")
    b = runs()
    np.testing.assert_array_equal(np.asarray(a[0].tri_id), np.asarray(b[0].tri_id))
    np.testing.assert_array_equal(np.asarray(a[0].depth), np.asarray(b[0].depth))
    np.testing.assert_array_equal(np.asarray(a[0].bary), np.asarray(b[0].bary))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[2].tri_id), np.asarray(b[2].tri_id))
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(b[3]))


def test_pallas_le_ties_resolve_last_submitted():
    """LESS_OR_EQUAL equal-depth ties pick the LAST submitted fragment in
    the Pallas kernel too (scan/binned/pallas stay bit-identical)."""
    pipe = (
        GraphicsPipelineBuilder()
        .cull_mode(CullMode.NONE)
        .depth_compare_op(CompareOp.LESS_OR_EQUAL)
        .build()
    )
    clip, tris = _scene(24, seed=9)
    tris2 = jnp.concatenate([tris, tris], axis=0)  # exact coplanar twins
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris2), w, h, pipe)
    vis_scan = rasterize(setup, h, w, pipe)
    vp = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16)
    np.testing.assert_array_equal(
        np.asarray(vis_scan.tri_id), np.asarray(vp.tri_id)
    )
    np.testing.assert_array_equal(
        np.asarray(vis_scan.depth), np.asarray(vp.depth)
    )
    ids = np.asarray(vp.tri_id)
    assert ids.max() >= 24
    assert (ids[ids >= 0] >= 24).all()


def test_defer_matmul_matches_slice_blend(monkeypatch):
    """RENDERER_DEFER_MATMUL=1 (lane-masked weighted rows + constant 0/1
    selection matmul) computes the same per-channel 3-product blend as the
    default block-slice FMA — required before flipping the default."""
    clip, tris = _scene(seed=12)
    rng = np.random.default_rng(3)
    attr = jnp.asarray(rng.random((clip.shape[0], 8), dtype=np.float32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)

    vis_a, vary_a = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16, varyings=attr[tris],
        skip_bary=True, defer_varyings=True,
    )
    monkeypatch.setenv("RENDERER_DEFER_MATMUL", "1")
    vis_b, vary_b = rp.rasterize_binned_pallas(
        setup, h, w, pipe, chunk=16, varyings=attr[tris],
        skip_bary=True, defer_varyings=True,
    )
    np.testing.assert_array_equal(
        np.asarray(vis_a.tri_id), np.asarray(vis_b.tri_id)
    )
    cov = np.asarray(vis_a.tri_id) >= 0
    np.testing.assert_allclose(
        np.asarray(vary_a)[cov], np.asarray(vary_b)[cov], atol=1e-6, rtol=1e-6
    )


def test_defer_matmul_folds_flat_lanes(monkeypatch):
    """RENDERER_DEFER_MATMUL=1 with flat varyings AND an ids payload: the
    flat lanes fold into the selection matmul (weight 1, winner-select
    passthrough) and must equal the slice-blend path exactly; the ids
    payload must stay exact."""
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    clip, tris = _scene(60, seed=17)
    rng = np.random.default_rng(5)
    attr = jnp.asarray(rng.random((clip.shape[0], 4), dtype=np.float32))
    t = tris.shape[0]
    flat = jnp.asarray(rng.random((t, 3), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, 1000, t).astype(np.int32))
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128

    tri_clip = gather_triangle_clip(clip, tris)
    tri_clip2, valid, src, bary = clip_triangles_near(tri_clip)
    setup = setup_triangles(tri_clip2, w, h, pipe, tri_valid=valid)

    def run():
        return rp.rasterize_binned_pallas(
            setup, h, w, pipe, chunk=16,
            varyings=attr[tris], vary_src=src, vary_bary=bary,
            flat_varyings=flat, ids=ids[src], skip_bary=True,
            defer_varyings=True,
        )

    vis_a, vary_a = run()
    monkeypatch.setenv("RENDERER_DEFER_MATMUL", "1")
    vis_b, vary_b = run()
    np.testing.assert_array_equal(
        np.asarray(vis_a.tri_id), np.asarray(vis_b.tri_id)
    )
    cov = np.asarray(vis_a.tri_id) >= 0
    # smooth lanes: same 3-product formula, MXU accumulation at HIGHEST
    np.testing.assert_allclose(
        np.asarray(vary_a)[..., :4][cov], np.asarray(vary_b)[..., :4][cov],
        atol=1e-6, rtol=1e-6,
    )
    # flat lanes: winner-select passthrough, exact either way
    np.testing.assert_array_equal(
        np.asarray(vary_a)[..., 4:][cov], np.asarray(vary_b)[..., 4:][cov]
    )


def test_geom_soa_frame_bit_identical(monkeypatch):
    """RENDERER_GEOM=soa (SoA defer-table build: [V,K] attrs + vertex ids +
    [t]-plane clip frame, no [t,3,K] intermediate and no per-column table
    stack) must be BIT-identical to the AoS build at frame level — same
    column order and per-element FMA order by construction. This is the
    guard for flipping the default (the 2026-08-19 remote-compiler update
    pessimized the AoS stack lowering ~70 ms/frame at 1080p; SoA avoids
    it)."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 96
    pipe = GraphicsPipelineBuilder().build()
    for textured in (True, False):
        scene, layout, kwargs, _ = full_scene(
            w, h, tri_budget=900, textured=textured
        )

        def render():
            return np.asarray(
                forward_frame(
                    scene, layout, pipe, kwargs["shading"], w, h,
                    tonemap=kwargs.get("tonemap", "aces"),
                    shadow_map_size=128,
                    shadow_params=kwargs.get("shadow_params"),
                )
            )

        monkeypatch.setenv("RENDERER_GEOM", "0")
        aos = render()
        monkeypatch.setenv("RENDERER_GEOM", "soa")
        soa = render()
        np.testing.assert_array_equal(aos, soa)


def test_pallas_ids_only_visibility_mode():
    """skip_bary with no attribute lanes (the resolve-mode MSAA sample
    pass): depth+tid outputs only, ids payload written directly."""
    clip, tris = _scene(seed=12)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 64, 128
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    vx = rasterize_binned(setup, h, w, pipe, cap=256)
    src = jnp.arange(setup.num_triangles, dtype=jnp.int32) + 1000
    vp = rp.rasterize_binned_pallas(
        setup, h, w, pipe, skip_bary=True, ids=src, chunk=16
    )
    np.testing.assert_array_equal(np.asarray(vx.depth), np.asarray(vp.depth))
    cov = np.asarray(vx.covered)
    # payload ids ride through exactly (offset +1000 proves no remap ran)
    np.testing.assert_array_equal(
        np.asarray(vx.tri_id)[cov] + 1000, np.asarray(vp.tri_id)[cov]
    )
    # bary intentionally zeroed in skip_bary mode
    assert float(np.abs(np.asarray(vp.bary)).max()) == 0.0


def test_zplane_depth_only_tolerance_contract(monkeypatch):
    """RENDERER_Z_FORM=plane (the shadow-pass perf knob, DEPTH-ONLY
    scoped — raster.z_plane_mode): the Pallas depth kernel and the
    binned depth variant agree with each other to a few ulp, track the
    default bary-form depth within the anchored form's cancellation
    bound, and the FULL visibility paths are untouched by the knob."""
    from renderer_rs_tpu.ops.raster_binned import rasterize_depth_only_binned

    clip, tris = _scene(seed=21)
    pipe = GraphicsPipelineBuilder().cull_mode(CullMode.NONE).build()
    h, w = 96, 256
    setup = setup_triangles(gather_triangle_clip(clip, tris), w, h, pipe)
    ref = rasterize(setup, h, w, pipe)  # bary-form oracle

    monkeypatch.setenv("RENDERER_Z_FORM", "plane")
    dp = rp.rasterize_binned_pallas(setup, h, w, pipe, depth_only=True)
    db = rasterize_depth_only_binned(setup, h, w, pipe, cap=256)
    # plane-vs-plane across implementations: a few ulp
    np.testing.assert_allclose(np.asarray(dp), np.asarray(db), atol=1e-5)
    # same pixels covered as the oracle (z-range culls agree away from
    # the z in {0,1} boundaries this scene avoids)
    np.testing.assert_array_equal(
        np.asarray(dp) < 1.0, np.asarray(ref.covered)
    )
    # plane-vs-bary depth within the cancellation bound
    cov = np.asarray(ref.covered)
    np.testing.assert_allclose(
        np.asarray(dp)[cov], np.asarray(ref.depth)[cov], atol=2e-4
    )
    # the FULL visibility path ignores the knob: bitwise vs default mode
    vp_knob = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16)
    monkeypatch.delenv("RENDERER_Z_FORM")
    vp_def = rp.rasterize_binned_pallas(setup, h, w, pipe, chunk=16)
    np.testing.assert_array_equal(
        np.asarray(vp_knob.depth), np.asarray(vp_def.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(vp_knob.tri_id), np.asarray(vp_def.tri_id)
    )
