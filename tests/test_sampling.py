"""Texture-unit tests: filtering, wrap modes, LOD, cubemaps."""

import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.ops.sampling import (
    direction_to_cube_uv,
    sample_bilinear,
    sample_cubemap,
    sample_lod,
    sample_nearest,
    screen_space_lod,
)
from renderer_rs_tpu.resources.texture import Sampler, WrapMode, build_mip_pyramid


def _checker(h=4, w=4):
    """2x2 checkerboard of 0/1."""
    y, x = np.mgrid[0:h, 0:w]
    return jnp.asarray(((x + y) % 2).astype(np.float32)[..., None])


def test_nearest_texel_centers():
    tex = _checker()
    # texel (0,0)=0, texel (1,0)=1
    uv = jnp.array([[0.125, 0.125], [0.375, 0.125]])
    out = sample_nearest(tex, uv)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 1.0])


def test_bilinear_at_texel_center_exact():
    """At texel centers bilinear returns the texel exactly."""
    tex = _checker()
    uv = jnp.array([[0.125, 0.125]])
    out = sample_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0, atol=1e-6)


def test_bilinear_midpoint_blend():
    """Halfway between 0 and 1 texels -> 0.5."""
    tex = _checker()
    uv = jnp.array([[0.25, 0.125]])  # between texel 0 and 1 in x
    out = sample_bilinear(tex, uv)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.5, atol=1e-6)


def test_wrap_repeat_vs_clamp():
    tex = _checker()
    uv = jnp.array([[1.125, 0.125]])  # one full wrap + texel 0 center
    rep = sample_nearest(tex, uv, Sampler.nearest())
    assert float(rep[0, 0]) == 0.0
    clamp_sampler = Sampler(
        mag_filter=Sampler.nearest().mag_filter,
        min_filter=Sampler.nearest().min_filter,
        mipmap_mode=Sampler.nearest().mipmap_mode,
        wrap_u=WrapMode.CLAMP_TO_EDGE,
        wrap_v=WrapMode.CLAMP_TO_EDGE,
    )
    cl = sample_nearest(tex, uv, clamp_sampler)
    assert float(cl[0, 0]) == 1.0  # clamped to right edge texel (3,0)=1


def test_mirror_wrap():
    tex = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1) / 3.0
    s = Sampler(wrap_u=WrapMode.MIRRORED_REPEAT, wrap_v=WrapMode.MIRRORED_REPEAT)
    # u = 1.125 -> texel index 4 (past edge) -> mirrored to texel 3
    out = sample_nearest(tex, jnp.array([[1.0 + 0.125, 0.5]]), s)
    np.testing.assert_allclose(float(out[0, 0]), 1.0, atol=1e-6)


def test_sample_lod_selects_levels():
    base = jnp.zeros((4, 4, 1))
    mips = (base, jnp.ones((2, 2, 1)), jnp.full((1, 1, 1), 2.0))
    uv = jnp.array([[0.5, 0.5]])
    out0 = sample_lod(mips, uv, jnp.array([0.0]))
    out1 = sample_lod(mips, uv, jnp.array([1.0]))
    out_mid = sample_lod(mips, uv, jnp.array([0.5]))
    assert float(out0[0, 0]) == 0.0
    assert float(out1[0, 0]) == 1.0
    np.testing.assert_allclose(float(out_mid[0, 0]), 0.5, atol=1e-6)


def test_screen_space_lod_magnification_negative():
    """1:1 texel:pixel mapping -> lod 0; magnified -> negative lod."""
    h = w = 8
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    uv = jnp.asarray(np.stack([(x + 0.5) / w, (y + 0.5) / h], -1))
    lod = screen_space_lod(uv, 8, 8)
    np.testing.assert_allclose(np.asarray(lod[2, 2]), 0.0, atol=1e-4)
    lod_mag = screen_space_lod(uv * 0.25, 8, 8)
    assert float(lod_mag[2, 2]) < -1.0


def test_mip_pyramid_average_preserved():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    mips = build_mip_pyramid(img)
    np.testing.assert_allclose(
        float(jnp.mean(mips[0])), float(jnp.mean(mips[-1])), atol=1e-5
    )


def test_cube_face_selection():
    dirs = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, -1.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.0, 0.0, -1.0],
        ]
    )
    face, uv = direction_to_cube_uv(dirs)
    np.testing.assert_array_equal(np.asarray(face), [0, 1, 2, 3, 4, 5])
    # axis-aligned directions hit face centers
    np.testing.assert_allclose(np.asarray(uv), 0.5, atol=1e-6)


def test_cubemap_sample_face_colors():
    """Each face a constant color; sampling along each axis returns it."""
    colors = np.eye(6, 3, k=0, dtype=np.float32)
    colors = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [0, 1, 1], [1, 0, 1]],
        np.float32,
    )
    faces = jnp.asarray(
        np.broadcast_to(colors[:, None, None, :], (6, 4, 4, 3)).copy()
    )
    dirs = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [-1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, -1.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.0, 0.0, -1.0],
        ]
    )
    out = sample_cubemap(faces, dirs)
    np.testing.assert_allclose(np.asarray(out), colors, atol=1e-6)


def test_array_atlas_matches_per_level_sampler():
    """The 2-gather window-atlas trilinear path bit-matches the
    evaluate-every-level oracle (sample_array_textured) for REPEAT and
    CLAMP samplers."""
    import numpy as np
    import jax.numpy as jnp

    from renderer_rs_tpu.ops.sampling import (
        Sampler,
        WrapMode,
        build_array_atlas,
        sample_array_textured,
        sample_array_textured_atlas,
    )

    rng = np.random.default_rng(11)
    mips = []
    s = 32
    base = rng.random((3, s, s, 4)).astype(np.float32)
    lvl = base
    mips.append(jnp.asarray(lvl))
    while lvl.shape[1] > 1:
        lvl = (
            lvl[:, 0::2, 0::2] + lvl[:, 1::2, 0::2]
            + lvl[:, 0::2, 1::2] + lvl[:, 1::2, 1::2]
        ) * 0.25
        mips.append(jnp.asarray(lvl))
    mips = tuple(mips)

    h, w = 24, 40
    tid = jnp.asarray(rng.integers(0, 3, (h, w)), jnp.int32)
    # smooth + warped UVs so the screen-space LOD spans several mip levels,
    # including out-of-[0,1] values to exercise wrap
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    uv = np.stack(
        [xx / w * 3.0 - 1.0 + 0.1 * np.sin(yy / 3), (yy / h) ** 2 * 4.0], -1
    ).astype(np.float32)
    uv = jnp.asarray(uv)

    for sampler in (
        Sampler(),
        Sampler(wrap_u=WrapMode.CLAMP_TO_EDGE, wrap_v=WrapMode.CLAMP_TO_EDGE),
    ):
        ref = np.asarray(sample_array_textured(mips, tid, uv, sampler))
        atlas, offsets, sizes = build_array_atlas(mips, sampler)
        got = np.asarray(
            sample_array_textured_atlas(
                atlas, offsets, sizes, len(mips), (s, s), 4, tid, uv, sampler
            )
        )
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_cube_trilinear_single_gather_matches_pair():
    """cube_trilinear_fetch (ONE gather: child 2x2 + parent 3x3 rows)
    matches the lo/hi _cube_atlas_fetch pair across levels, faces, edges,
    and the frac==0 tail/sky rows. The parent term evaluates the same
    bilinear as a separable weighted sum over the stored 3x3 (fewer
    relayout passes), so agreement is to fp association (~1 ulp), not
    bit-exact."""
    import numpy as np
    import jax.numpy as jnp

    from renderer_rs_tpu.ops.sampling import (
        _cube_atlas_fetch,
        _cube_window_flat,
        build_cube_trilinear_atlas,
        cube_trilinear_fetch,
        direction_to_cube_uv,
    )

    rng = np.random.default_rng(5)
    sizes_list = [16, 8, 4, 2]
    segments = [
        jnp.asarray(rng.random((6, s, s, 3)).astype(np.float32))
        for s in sizes_list
    ] + [jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32))]  # sky
    n_pref = 4
    atlas = jnp.concatenate([_cube_window_flat(m) for m in segments], axis=0)
    atlas13 = build_cube_trilinear_atlas(segments)
    sizes, offsets, off = [], [], 0
    for m in segments:
        sizes.append(m.shape[1])
        offsets.append(off)
        off += 6 * m.shape[1] * m.shape[1]
    sizes = jnp.asarray(sizes, jnp.int32)
    offsets = jnp.asarray(offsets, jnp.int32)

    d = rng.standard_normal((64, 64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    face, uv = direction_to_cube_uv(d)
    # lod sweep incl. exact integers (frac==0), the top level, and the sky
    lod = jnp.asarray(
        rng.uniform(0.0, n_pref - 1, (64, 64)).astype(np.float32)
    )
    lod = lod.at[0, :8].set(0.0).at[1, :8].set(float(n_pref - 1))
    far = jnp.zeros((64, 64), bool).at[2, :].set(True)
    lod = jnp.where(far, float(n_pref), lod)

    lo_l = jnp.floor(lod).astype(jnp.int32)
    hi_l = jnp.where(far, n_pref, jnp.minimum(lo_l + 1, n_pref - 1))
    frac = lod - lo_l.astype(lod.dtype)
    f_lo = _cube_atlas_fetch(atlas, offsets, sizes, lo_l, face, uv, 3)
    f_hi = _cube_atlas_fetch(atlas, offsets, sizes, hi_l, face, uv, 3)
    ref = f_lo * (1.0 - frac[..., None]) + f_hi * frac[..., None]

    got = cube_trilinear_fetch(atlas13, offsets, sizes, lo_l, frac, face, uv, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)

    # bf16 atlas knob (RENDERER_CUBE_DTYPE=bf16 at build / cast in place):
    # same fetch path, taps quantized to 8 mantissa bits -> 0.4%-of-range
    # agreement; blend math must stay f32 (no compounding)
    got_bf = cube_trilinear_fetch(
        atlas13.astype(jnp.bfloat16), offsets, sizes, lo_l, frac, face, uv, 3
    )
    assert got_bf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got_bf), np.asarray(ref), atol=5e-3)


def test_build_cube_trilinear_atlas_bf16_env(monkeypatch):
    """RENDERER_CUBE_DTYPE=bf16 makes the build emit a bfloat16 atlas."""
    import jax.numpy as jnp

    from renderer_rs_tpu.ops.sampling import build_cube_trilinear_atlas

    rng = np.random.default_rng(3)
    segments = [
        jnp.asarray(rng.random((6, s, s, 3)).astype(np.float32))
        for s in (8, 4)
    ] + [jnp.asarray(rng.random((6, 16, 16, 3)).astype(np.float32))]
    monkeypatch.setenv("RENDERER_CUBE_DTYPE", "bf16")
    atlas = build_cube_trilinear_atlas(segments)
    assert atlas.dtype == jnp.bfloat16


def test_material_atlas_tri_matches_two_gather():
    """The single-gather bf16 trilinear material atlas matches the exact
    2-gather f32 path over random UVs within bf16 quantization + the
    parent-resample smoothing bound (build_material_atlas_tri docstring)."""
    from renderer_rs_tpu.ops.sampling import (
        _SLOT_CHANNELS,
        build_material_atlas,
        build_material_atlas_tri,
        sample_array_textured_atlas,
        sample_material_atlas_tri,
    )

    rng = np.random.default_rng(7)
    n_tex, s = 3, 16
    base = rng.random((n_tex, s, s, 4)).astype(np.float32)
    mips = [jnp.asarray(base)]
    lvl = base
    while lvl.shape[1] > 1:
        lvl = lvl.reshape(
            n_tex, lvl.shape[1] // 2, 2, lvl.shape[2] // 2, 2, 4
        ).mean(axis=(2, 4))
        mips.append(jnp.asarray(lvl))
    mips = tuple(mips)
    slots = (0, 1, 2, 3, 4)
    tex_ids = np.array([[0, 1, 2, -1, 0], [2, -1, 0, 1, -1]], np.int64)

    atlas, offs, sizes = build_material_atlas(mips, tex_ids, slots)
    tri, offs_t, sizes_t = build_material_atlas_tri(mips, tex_ids, slots)

    h = w = 24
    uv = jnp.asarray(rng.random((h, w, 2)) * 1.4 - 0.2, jnp.float32)
    mid = jnp.asarray(rng.integers(0, 2, (h, w)), jnp.int32)
    c_all = 4 * len(slots)

    shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in mips)
    offs_l, off = [], 0
    for h_, w_ in shapes:
        offs_l.append(off)
        off += 2 * h_ * w_
    exact = sample_array_textured_atlas(
        atlas, tuple(offs_l), shapes, len(mips), shapes[0], c_all, mid, uv
    )
    got = sample_material_atlas_tri(
        tri, tuple(offs_t), sizes_t, len(mips), shapes[0], 13, mid, uv
    )

    # map packed channels -> the 4C layout
    pos, o = {}, 0
    for slot in slots:
        pos[slot] = o
        o += len(_SLOT_CHANNELS[slot])
    for slot in slots:
        for j, ch in enumerate(_SLOT_CHANNELS[slot]):
            a = np.asarray(exact[..., 4 * slot + ch])
            b = np.asarray(got[..., pos[slot] + j])
            # bound = bf16 quantization + parent-resample smoothing; 4e-2
            # covers the worst random-UV pixel under quad-shared LOD (r4:
            # quad derivatives can shift a pixel's mip pick vs per-pixel
            # forward differences, max observed 0.0344)
            np.testing.assert_allclose(b, a, atol=4e-2, err_msg=f"slot {slot} ch {ch}")


def test_material_atlas_tri_exact_at_integer_lod():
    """At frac==0 (minified far enough that lod rounds to an integer via
    constant UV gradients) the tri path equals the child bilinear up to bf16
    quantization only."""
    from renderer_rs_tpu.ops.sampling import (
        build_material_atlas,
        build_material_atlas_tri,
        sample_array_textured_atlas,
        sample_material_atlas_tri,
    )

    rng = np.random.default_rng(3)
    n_tex, s = 1, 8
    base = rng.random((n_tex, s, s, 4)).astype(np.float32)
    mips = (jnp.asarray(base), jnp.asarray(
        base.reshape(n_tex, 4, 2, 4, 2, 4).mean(axis=(2, 4))
    ))
    slots = (0,)
    tex_ids = np.array([[0, -1, -1, -1, -1]], np.int64)
    atlas, _, _ = build_material_atlas(mips, tex_ids, slots)
    tri, offs_t, sizes_t = build_material_atlas_tri(mips, tex_ids, slots)

    h = w = 8
    # uv gradient of exactly one texel per pixel -> lod == 0, frac == 0
    y, x = np.mgrid[0:h, 0:w]
    uv = jnp.asarray(np.stack([x / s, y / s], axis=-1), jnp.float32)
    mid = jnp.zeros((h, w), jnp.int32)

    shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in mips)
    offs_l, off = [], 0
    for h_, w_ in shapes:
        offs_l.append(off)
        off += 1 * h_ * w_
    exact = sample_array_textured_atlas(
        atlas, tuple(offs_l), shapes, len(mips), shapes[0], 4, mid, uv
    )
    got = sample_material_atlas_tri(
        tri, tuple(offs_t), sizes_t, len(mips), shapes[0], 4, mid, uv
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), atol=5e-3)


def test_blend_mode_matmul_reshape_match_slice(monkeypatch):
    """RENDERER_BLEND=matmul/reshape (full-lane weighted reduce instead of
    per-window lane slices) matches the default slice blend to fp
    association on BOTH wide-row atlas fetches (material trilinear + cube
    trilinear/sky) — required before flipping the default."""
    import pytest

    from renderer_rs_tpu.ops.sampling import (
        _cube_window_flat,
        build_cube_trilinear_atlas,
        build_material_atlas_tri,
        cube_trilinear_fetch,
        direction_to_cube_uv,
        sample_material_atlas_tri,
    )

    rng = np.random.default_rng(11)

    # --- material atlas ---------------------------------------------------
    n_tex, s = 3, 16
    base = rng.random((n_tex, s, s, 4)).astype(np.float32)
    mips, lvl = [jnp.asarray(base)], base
    while lvl.shape[1] > 1:
        lvl = lvl.reshape(
            n_tex, lvl.shape[1] // 2, 2, lvl.shape[2] // 2, 2, 4
        ).mean(axis=(2, 4))
        mips.append(jnp.asarray(lvl))
    mips = tuple(mips)
    slots = (0, 1, 2, 3, 4)
    tex_ids = np.array([[0, 1, 2, -1, 0], [2, -1, 0, 1, -1]], np.int64)
    tri, offs_t, sizes_t = build_material_atlas_tri(mips, tex_ids, slots)
    shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in mips)
    h = w = 24
    uv = jnp.asarray(rng.random((h, w, 2)) * 1.4 - 0.2, jnp.float32)
    mid = jnp.asarray(rng.integers(0, 2, (h, w)), jnp.int32)

    def mat():
        return np.asarray(
            sample_material_atlas_tri(
                tri, tuple(offs_t), sizes_t, len(mips), shapes[0], 13, mid, uv
            )
        )

    # --- cube atlas ---------------------------------------------------------
    sizes_list = [16, 8, 4, 2]
    segments = [
        jnp.asarray(rng.random((6, s_, s_, 3)).astype(np.float32))
        for s_ in sizes_list
    ] + [jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32))]
    n_pref = 4
    atlas13 = build_cube_trilinear_atlas(segments)
    csizes, coffs, off = [], [], 0
    for m in segments:
        csizes.append(m.shape[1])
        coffs.append(off)
        off += 6 * m.shape[1] * m.shape[1]
    d = rng.standard_normal((32, 32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    face, cuv = direction_to_cube_uv(jnp.asarray(d))
    lod = jnp.asarray(rng.uniform(0.0, n_pref - 1, (32, 32)).astype(np.float32))
    lod = lod.at[0, :8].set(0.0)
    far = jnp.zeros((32, 32), bool).at[2, :].set(True)
    lod = jnp.where(far, float(n_pref), lod)
    lo_l = jnp.floor(lod).astype(jnp.int32)
    frac = lod - lo_l.astype(lod.dtype)

    def cube():
        return np.asarray(
            cube_trilinear_fetch(
                atlas13, tuple(coffs), tuple(csizes), lo_l, frac, face, cuv, 3
            )
        )

    monkeypatch.setenv("RENDERER_BLEND", "slice")
    ref_m, ref_c = mat(), cube()
    for mode in ("matmul", "reshape"):
        monkeypatch.setenv("RENDERER_BLEND", mode)
        np.testing.assert_allclose(mat(), ref_m, rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(cube(), ref_c, rtol=2e-6, atol=2e-6)


def test_mip_plan_arith_matches_select(monkeypatch):
    """RENDERER_MIP_PLAN=arith (dynamic-shift level math + closed-form
    offsets instead of per-level select chains) is BIT-identical to the
    unrolled select plan on both wide-row fetches — power-of-two sizes are
    exact in f32 so every per-pixel op is literally the same computation.
    Also: a non-power-of-two chain silently falls back to the select plan."""
    from renderer_rs_tpu.ops.sampling import (
        _halving_offsets,
        build_cube_trilinear_atlas,
        build_material_atlas_tri,
        cube_trilinear_fetch,
        direction_to_cube_uv,
        sample_material_atlas_tri,
    )

    rng = np.random.default_rng(17)

    # --- material atlas (16^2 -> 1 halving chain, 2 texture sets) ----------
    n_tex, s = 3, 16
    base = rng.random((n_tex, s, s, 4)).astype(np.float32)
    mips, lvl = [jnp.asarray(base)], base
    while lvl.shape[1] > 1:
        lvl = lvl.reshape(
            n_tex, lvl.shape[1] // 2, 2, lvl.shape[2] // 2, 2, 4
        ).mean(axis=(2, 4))
        mips.append(jnp.asarray(lvl))
    mips = tuple(mips)
    slots = (0, 1, 2, 3, 4)
    tex_ids = np.array([[0, 1, 2, -1, 0], [2, -1, 0, 1, -1]], np.int64)
    tri, offs_t, sizes_t = build_material_atlas_tri(mips, tex_ids, slots)
    h = w = 24
    uv = jnp.asarray(rng.random((h, w, 2)) * 1.4 - 0.2, jnp.float32)
    mid = jnp.asarray(rng.integers(0, 2, (h, w)), jnp.int32)

    def mat():
        return np.asarray(
            sample_material_atlas_tri(
                tri, tuple(offs_t), sizes_t, len(mips), (s, s), 13, mid, uv
            )
        )

    # --- cube atlas (16..2 halving + arbitrary 32^2 sky tail) --------------
    sizes_list = [16, 8, 4, 2]
    segments = [
        jnp.asarray(rng.random((6, s_, s_, 3)).astype(np.float32))
        for s_ in sizes_list
    ] + [jnp.asarray(rng.random((6, 32, 32, 3)).astype(np.float32))]
    n_pref = 4
    atlas13 = build_cube_trilinear_atlas(segments)
    csizes, coffs, off = [], [], 0
    for m in segments:
        csizes.append(m.shape[1])
        coffs.append(off)
        off += 6 * m.shape[1] * m.shape[1]
    d = rng.standard_normal((32, 32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    face, cuv = direction_to_cube_uv(jnp.asarray(d))
    lod = jnp.asarray(rng.uniform(0.0, n_pref - 1, (32, 32)).astype(np.float32))
    far = jnp.zeros((32, 32), bool).at[2, :].set(True)
    lod = jnp.where(far, float(n_pref), lod)
    lo_l = jnp.floor(lod).astype(jnp.int32)
    frac = lod - lo_l.astype(lod.dtype)

    def cube():
        return np.asarray(
            cube_trilinear_fetch(
                atlas13, tuple(coffs), tuple(csizes), lo_l, frac, face, cuv, 3
            )
        )

    monkeypatch.setenv("RENDERER_MIP_PLAN", "select")
    ref_m, ref_c = mat(), cube()
    monkeypatch.setenv("RENDERER_MIP_PLAN", "arith")
    np.testing.assert_array_equal(mat(), ref_m)
    np.testing.assert_array_equal(cube(), ref_c)

    # geometry guard: a 12x12 base is not a power-of-two halving chain
    assert _halving_offsets([0, 144], [(12, 12), (6, 6)], 2) is None
    # and mismatched offsets (wrong set multiplier pattern) also refuse
    assert _halving_offsets([0, 100], [(16, 16), (8, 8)], 2) is None


def test_merge_gather_matches_default(monkeypatch):
    """RENDERER_MERGE_GATHER=1 (PCF window row + cube trilinear row fetched
    in ONE gather from a shared padded table) renders the flagship
    combination (textured PBR + IBL fast-ambient + sun shadow) identically
    to the two-gather default: the merged table holds the same rows, the
    halo reduce masks the pad lanes, and the cube blend slices them off."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 96
    scene, layout, kwargs, _ = full_scene(w, h, tri_budget=600, textured=True)
    assert layout.has_environment and layout.has_shadow
    pipeline = GraphicsPipelineBuilder().build()

    def render():
        return np.asarray(
            forward_frame(
                scene, layout, pipeline, kwargs["shading"], w, h,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=128,
                shadow_params=kwargs.get("shadow_params"),
            )
        )

    ref = render()
    monkeypatch.setenv("RENDERER_MERGE_GATHER", "1")
    out = render()
    assert np.isfinite(out).all()
    # identical gather rows + masked reduce -> only light-sum reassociation
    # (zero-masked point/spot adds) can differ; the flagship has none live
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)


def test_fetch_flat_matches_image_form(monkeypatch):
    """RENDERER_FETCH_FLAT=1 (material-atlas + cube fetches run as [N,C]
    flat-pixel gather+blend in the gather's natural C-minor layout, LOD
    precomputed on the uv image) must render the flagship combination
    BIT-identically to the [H,W,C] image form — same gather rows, same
    blend op order, only the shapes differ."""
    from renderer_rs_tpu.app.scenes import full_scene
    from renderer_rs_tpu.renderer.passes import forward_frame
    from renderer_rs_tpu.rhi.pipeline import GraphicsPipelineBuilder

    w, h = 128, 96
    scene, layout, kwargs, _ = full_scene(w, h, tri_budget=600, textured=True)
    assert layout.has_environment and layout.has_shadow
    pipeline = GraphicsPipelineBuilder().build()

    def render():
        return np.asarray(
            forward_frame(
                scene, layout, pipeline, kwargs["shading"], w, h,
                tonemap=kwargs.get("tonemap", "aces"),
                shadow_map_size=128,
                shadow_params=kwargs.get("shadow_params"),
            )
        )

    ref = render()
    monkeypatch.setenv("RENDERER_FETCH_FLAT", "1")
    flat = render()
    np.testing.assert_array_equal(flat, ref)


def test_upsample_y_idaware_edges_and_lerp():
    """Id-aware vertical upsample: same-surface rows lerp positionally,
    silhouette rows copy the matching neighbor, orphan rows fall back to
    the lerp (ops/sampling.upsample_y_idaware)."""
    import jax.numpy as jnp

    from renderer_rs_tpu.ops.sampling import upsample_y_idaware

    w = 4
    # samples at rows 0,2,4 (factor 2); values 0, 10, 20
    s = jnp.stack(
        [jnp.full((w, 3), v, jnp.float32) for v in (0.0, 10.0, 20.0)]
    )
    # tid: rows 0-2 surface A(=1); row 3 surface B(=2); rows 4-5 A again
    tid = jnp.asarray(
        [[1] * w, [1] * w, [1] * w, [2] * w, [1] * w, [1] * w], jnp.int32
    )
    out = np.asarray(upsample_y_idaware(s, tid, 6, 2))
    np.testing.assert_allclose(out[0], 0.0)  # sample rows copy exactly
    np.testing.assert_allclose(out[2], 10.0)
    np.testing.assert_allclose(out[4], 20.0)
    # row 1: tid matches both neighbors (A) -> lerp 0..10 at t=0.5
    np.testing.assert_allclose(out[1], 5.0)
    # row 3: tid B matches NEITHER sample row (10 and 20 are A) -> lerp
    # fallback (no correct sample exists for a 1-row surface)
    np.testing.assert_allclose(out[3], 15.0)

    # silhouette: odd row's tid matches only the LOWER sample -> copies it
    tid2 = jnp.asarray(
        [[1] * w, [7] * w, [7] * w, [7] * w, [7] * w, [7] * w], jnp.int32
    )
    out2 = np.asarray(upsample_y_idaware(s, tid2, 6, 2))
    np.testing.assert_allclose(out2[1], 10.0)  # copies row-2 sample (tid 7)

    # factor 4: rows 1..3 lerp quarters between samples 0 and 10
    s4 = jnp.stack([jnp.full((w, 1), v, jnp.float32) for v in (0.0, 10.0)])
    tid4 = jnp.ones((8, w), jnp.int32)
    out4 = np.asarray(upsample_y_idaware(s4, tid4, 8, 4))
    np.testing.assert_allclose(out4[1][:, 0], 2.5)
    np.testing.assert_allclose(out4[2][:, 0], 5.0)
    np.testing.assert_allclose(out4[3][:, 0], 7.5)
