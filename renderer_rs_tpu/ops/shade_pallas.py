"""Fused Pallas shading kernel — the fragment stage over raster TILES.

The deferred shade in renderer/passes._shade_pixels runs as XLA ops over
[H,W,C] images: every stage materializes 2M-pixel intermediates and the
channel-minor layout wastes VPU lanes. This module shades the flagship
fast-ambient path (pixel/model_pbr_ibl.hlsl:200-396 with the SH9/analytic
ambient) directly on the raster kernel's TILE-MAJOR outputs:

    raster kernel -> [n_tiles, K, th, tw] varyings     (no 19-channel stitch)
    XLA           -> gathers only (PCF window rows, spec/sky atlas rows)
                     + their index math, all on [n_tiles, th, tw] planes
    shade kernel  -> PBR direct + SH9/env-BRDF ambient + shadow multiply +
                     sky/background composite + tonemap, in VMEM per tile
    one stitch    -> final [H, W, 4]

Gathers stay in XLA (Mosaic has no per-lane dynamic gather); everything
elementwise fuses into ONE kernel with full 8x128-lane utilization.

Channel-last oracles (tests assert equivalence to tolerance):
ops/pbr.pbr_direct / calculate_ibl_fast, ops/shadow.calculate_shadow,
ops/sampling.direction_to_cube_uv/_cube_atlas_fetch, ops/tonemap,
ops/skybox.pixel_ray_directions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from renderer_rs_tpu.ops.pbr import (
    _ENV_BRDF_BIAS_C,
    _ENV_BRDF_SCALE_C,
    EPSILON,
    PI,
)

# SH9 basis constants (ops/ibl.sh9_basis)
_SH_C = (0.282095, 0.488603, 0.488603, 0.488603, 1.092548, 1.092548, 0.315392, 1.092548, 0.546274)


# --- plane-form vector helpers (x, y, z as separate [...,] arrays) -----------

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _normalize3(v, eps=1e-12):
    inv = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(_dot3(v, v), 0.0)), eps)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


# --- the kernel --------------------------------------------------------------

def _make_shade_kernel(k_total: int, mat_consts, tonemap: str, clear_color, th: int, tw: int):
    """Fast-ambient fragment program over one tile (see module docstring).

    vary channel layout (fused raster contract): 0:3 world_pos, 3:6 normal,
    then only the per-material-VARYING bank columns (mat_consts[k] is None);
    scene-constant columns fold in as immediates. Bank order:
    base_color4, metallic, roughness, ao, emissive3, normal_scale.
    params (SMEM f32): 0:3 cam_pos, 3:6 sun_dir (surface->light, normalized),
    6:9 sun_radiance, 9:36 SH9 coeffs row-major [9,3].
    """
    cr, cg, cb, ca = (float(c) for c in clear_color)
    n_lanes = sum(1 for c in mat_consts if c is None)
    mat_base = k_total - n_lanes
    lane_of = {}
    li = mat_base
    for k in range(11):
        if mat_consts[k] is None:
            lane_of[k] = li
            li += 1

    def kernel(params_ref, depth_ref, tid_ref, vary_ref, shadow_ref, spec_ref, out_ref):
        def p(i):
            return params_ref[i]

        def mat(k):
            c = mat_consts[k]
            return vary_ref[lane_of[k]] if c is None else c

        depth = depth_ref[...]
        covered = tid_ref[...] >= 0
        wp = (vary_ref[0], vary_ref[1], vary_ref[2])
        n = _normalize3((vary_ref[3], vary_ref[4], vary_ref[5]))
        alb = (mat(0), mat(1), mat(2))
        alpha = mat(3)
        metallic = mat(4)
        rough = jnp.maximum(mat(5), 0.04)  # clamp_roughness
        ao = mat(6)
        emis = (mat(7), mat(8), mat(9))
        shadow = shadow_ref[...]
        spec_sky = (spec_ref[0], spec_ref[1], spec_ref[2])

        cam = (p(0), p(1), p(2))
        l = (p(3), p(4), p(5))  # sun dir, normalized host-side
        radiance = (p(6), p(7), p(8))

        v = _normalize3((cam[0] - wp[0], cam[1] - wp[1], cam[2] - wp[2]))
        ndotv = jnp.maximum(_dot3(n, v), 0.0)

        # --- Cook-Torrance sun (ops/pbr.pbr_direct; pbr.hlsli:279-329) -----
        h = _normalize3((v[0] + l[0], v[1] + l[1], v[2] + l[2]))
        f0 = tuple(0.04 + (alb[c] - 0.04) * metallic for c in range(3))
        a = rough * rough
        a2 = a * a
        ndoth = jnp.maximum(_dot3(n, h), 0.0)
        dden = ndoth * ndoth * (a2 - 1.0) + 1.0
        ndf = a2 / jnp.maximum(PI * dden * dden, EPSILON)
        kk = (rough + 1.0) * (rough + 1.0) / 8.0
        ndotl = jnp.maximum(_dot3(n, l), 0.0)
        g = (ndotv / jnp.maximum(ndotv * (1.0 - kk) + kk, EPSILON)) * (
            ndotl / jnp.maximum(ndotl * (1.0 - kk) + kk, EPSILON)
        )
        pf = _pow5(1.0 - _saturate(_dot3(h, v)))
        fr = tuple(f0[c] + (1.0 - f0[c]) * pf for c in range(3))
        spec_den = 4.0 * ndotv * ndotl + EPSILON
        ndfg = ndf * g
        lo = []
        for c in range(3):
            kd = (1.0 - fr[c]) * (1.0 - metallic)
            s = ndfg * fr[c] / spec_den
            lo.append(shadow * (kd * alb[c] / PI + s) * radiance[c] * ndotl)

        # --- fast ambient (ops/pbr.calculate_ibl_fast) ----------------------
        pfi = _pow5(1.0 - _saturate(ndotv))
        # SH9 irradiance (ops/ibl.sh9_basis/sh9_eval), clamped at 0
        x, y, z = n
        basis = (
            _SH_C[0] * jnp.ones_like(x),
            _SH_C[1] * y,
            _SH_C[2] * z,
            _SH_C[3] * x,
            _SH_C[4] * x * y,
            _SH_C[5] * y * z,
            _SH_C[6] * (3.0 * z * z - 1.0),
            _SH_C[7] * x * z,
            _SH_C[8] * (x * x - y * y),
        )
        # analytic env BRDF (ops/pbr.env_brdf_approx)
        bx = _saturate(ndotv)
        by = _saturate(rough)
        terms = []
        xi = jnp.ones_like(bx)
        for i in range(6):
            yj = xi
            for _ in range(6 - i):
                terms.append(yj)
                yj = yj * by
            xi = xi * bx
        e2 = jnp.exp2(-9.28 * bx)
        sx = jnp.sqrt(bx)
        terms += [e2, e2 * by, sx, sx * by]
        scale = _saturate(sum(c * t for c, t in zip(_ENV_BRDF_SCALE_C, terms)))
        bias = _saturate(sum(c * t for c, t in zip(_ENV_BRDF_BIAS_C, terms)))

        rgb = []
        for c in range(3):
            f90 = jnp.maximum(1.0 - rough, f0[c])
            fs = f0[c] + (f90 - f0[c]) * pfi
            kd = (1.0 - fs) * (1.0 - metallic)
            irr = jnp.maximum(
                sum(basis[b] * p(9 + 3 * b + c) for b in range(9)), 0.0
            )
            ambient = (kd * irr * alb[c] + spec_sky[c] * (f0[c] * scale + bias)) * ao
            rgb.append(ambient + lo[c] + emis[c])

        # --- composite: covered | clear | sky (renderer/passes order) ------
        far = depth >= 1.0
        out = [
            jnp.where(far, spec_sky[0], jnp.where(covered, rgb[0], cr)),
            jnp.where(far, spec_sky[1], jnp.where(covered, rgb[1], cg)),
            jnp.where(far, spec_sky[2], jnp.where(covered, rgb[2], cb)),
            jnp.where(
                far, 1.0,
                jnp.where(covered, jnp.broadcast_to(alpha, depth.shape), ca),
            ),
        ]
        if tonemap == "aces":
            for c in range(3):
                hdr = out[c]
                out[c] = jnp.clip(
                    (hdr * (2.51 * hdr + 0.03)) / (hdr * (2.43 * hdr + 0.59) + 0.14),
                    0.0, 1.0,
                )
        elif tonemap == "reinhard":
            for c in range(3):
                out[c] = out[c] / (1.0 + out[c])
        out_ref[...] = jnp.stack(out, axis=0)

    return kernel


# --- XLA prep: plane-form shadow factor + merged spec/sky fetch ---------------

def _tile_pixel_centers(nty, ntx, th, tw):
    """px/py planes [n_tiles, th, tw] matching the raster kernel's grid."""
    ty = jax.lax.broadcasted_iota(jnp.float32, (nty, ntx, th, tw), 0)
    tx = jax.lax.broadcasted_iota(jnp.float32, (nty, ntx, th, tw), 1)
    ry = jax.lax.broadcasted_iota(jnp.float32, (nty, ntx, th, tw), 2)
    rx = jax.lax.broadcasted_iota(jnp.float32, (nty, ntx, th, tw), 3)
    py = (ty * th + ry + 0.5).reshape(nty * ntx, th, tw)
    px = (tx * tw + rx + 0.5).reshape(nty * ntx, th, tw)
    return px, py


def _project_shadow_planes(m, wp):
    """Plane form of ops/shadow._project_to_shadow_uv: world -> light NDC."""
    cx = wp[0] * m[0, 0] + wp[1] * m[0, 1] + wp[2] * m[0, 2] + m[0, 3]
    cy = wp[0] * m[1, 0] + wp[1] * m[1, 1] + wp[2] * m[1, 2] + m[1, 3]
    cz = wp[0] * m[2, 0] + wp[1] * m[2, 1] + wp[2] * m[2, 2] + m[2, 3]
    w = wp[0] * m[3, 0] + wp[1] * m[3, 1] + wp[2] * m[3, 2] + m[3, 3]
    inv = 1.0 / jnp.maximum(jnp.abs(w), 1e-12) * jnp.sign(w)
    u = cx * inv * 0.5 + 0.5
    v = cy * inv * 0.5 + 0.5  # no Y-flip (see ops/shadow.py note)
    return u, v, cz * inv


def shadow_factor_planes(shadow_map, lsm, wp, n, sun_dir, params):
    """Plane form of ops/shadow.calculate_shadow over tile-major planes.

    wp/n: 3-tuples of [n_tiles, th, tw]; sun_dir: [3] (surface->light).
    Returns the lit factor with the same window-table single-gather PCF.
    """
    s = shadow_map.shape[0]
    u0, v0, z0 = _project_shadow_planes(lsm, wp)
    in_bounds = (
        (u0 >= 0.0) & (u0 <= 1.0) & (v0 >= 0.0) & (v0 <= 1.0)
        & (z0 >= 0.0) & (z0 <= 1.0)
    )
    ndotl = _dot3(n, (sun_dir[0], sun_dir[1], sun_dir[2]))
    bias = jnp.maximum(params.shadow_bias * (1.0 - ndotl), 0.0005)
    op = tuple(wp[c] + n[c] * params.normal_bias for c in range(3))
    u, v, z = _project_shadow_planes(lsm, op)
    current = z - bias
    ix = jnp.clip(jnp.floor(u * s).astype(jnp.int32), 0, s - 1)
    iy = jnp.clip(jnp.floor(v * s).astype(jnp.int32), 0, s - 1)
    if params.pcf:
        padded = jnp.pad(shadow_map, 1, mode="edge")
        window = jnp.stack(
            [
                padded[1 + dy : 1 + dy + s, 1 + dx : 1 + dx + s]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ],
            axis=-1,
        ).reshape(s * s, 9)
        taps = window[iy * s + ix]  # [n_tiles, th, tw, 9]
        shadow = jnp.mean(
            jnp.where(taps >= current[..., None], 1.0, 0.0), axis=-1
        )
    else:
        stored = shadow_map.reshape(-1)[iy * s + ix]
        shadow = jnp.where(stored >= current, 1.0, 0.0)
    lit = 1.0 + (shadow - 1.0) * params.shadow_strength
    return jnp.where(in_bounds, lit, 1.0)


def _cube_uv_planes(d):
    """Plane form of ops/sampling.direction_to_cube_uv."""
    x, y, z = d
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.maximum(jnp.where(is_x, ax, jnp.where(is_y, ay, az)), 1e-12)
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    return face, (u / ma + 1.0) * 0.5, (v / ma + 1.0) * 0.5


def _atlas_fetch_planes(atlas, offsets, sizes, level, face, u, v, c):
    """Plane form of ops/sampling._cube_atlas_fetch -> [..., c] channel-LAST.

    The bilinear lerp stays in the gather output's native minor-dim layout
    (contiguous [..., c] slices); per-channel strided extraction from the
    minor dim forces 12 relayouts of the whole image and measured ~25 ms at
    1080p — callers transpose ONCE at the end instead."""
    s = sizes[level].astype(jnp.float32)
    si = sizes[level]
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = jnp.where(x0 < 0, 0.0, x - x0)[..., None]
    fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
    x0c = jnp.clip(x0, 0, si - 1)
    y0c = jnp.clip(y0, 0, si - 1)
    idx = offsets[level] + (face * si + y0c) * si + x0c
    taps = atlas[idx]  # [..., 4c]
    t00 = taps[..., 0:c]
    t10 = taps[..., c : 2 * c]
    t01 = taps[..., 2 * c : 3 * c]
    t11 = taps[..., 3 * c : 4 * c]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def spec_sky_planes(env, n, v, rough, depth, inv_vp, px, py, width, height):
    """The merged specular-IBL / skybox fetch (renderer/passes fast-ambient
    block) in plane form: reflection dirs for covered pixels, camera rays for
    far-plane pixels, ONE pair of window-atlas gathers. Returns a 3-tuple."""
    n_pref = len(env.prefiltered_mips)
    max_lod = float(n_pref - 1)
    # reflect(-V, N) = -(V - 2(V.N)N)
    dvn = _dot3(v, n)
    r = tuple(-(v[c] - 2.0 * dvn * n[c]) for c in range(3))
    far = depth >= 1.0
    # sky ray (ops/skybox.pixel_ray_directions): two unprojections
    ndc_x = (px / width) * 2.0 - 1.0
    ndc_y = (py / height) * 2.0 - 1.0

    def unproject(zc):
        ww = ndc_x * inv_vp[3, 0] + ndc_y * inv_vp[3, 1] + zc * inv_vp[3, 2] + inv_vp[3, 3]
        ww = jnp.where(ww == 0.0, 1.0, ww)
        out = []
        for row in range(3):
            val = (
                ndc_x * inv_vp[row, 0] + ndc_y * inv_vp[row, 1]
                + zc * inv_vp[row, 2] + inv_vp[row, 3]
            )
            out.append(val / ww)
        return out

    near = unproject(0.0)
    farp = unproject(1.0)
    d = tuple(farp[c] - near[c] for c in range(3))
    dlen = jnp.maximum(jnp.sqrt(jnp.maximum(_dot3(d, d), 0.0)), 1e-12)
    sky = tuple(d[c] / dlen for c in range(3))

    dirs = tuple(jnp.where(far, sky[c], r[c]) for c in range(3))
    lod = jnp.where(far, float(n_pref), rough * max_lod)
    face, u, vv = _cube_uv_planes(dirs)
    lo_l = jnp.floor(lod).astype(jnp.int32)
    hi_l = jnp.where(far, n_pref, jnp.minimum(lo_l + 1, n_pref - 1))
    frac = lod - lo_l.astype(lod.dtype)
    c = env.skybox_mips[0].shape[-1]
    f_lo = _atlas_fetch_planes(env.atlas, env.atlas_offsets, env.atlas_sizes, lo_l, face, u, vv, c)
    f_hi = _atlas_fetch_planes(env.atlas, env.atlas_offsets, env.atlas_sizes, hi_l, face, u, vv, c)
    out = f_lo * (1.0 - frac[..., None]) + f_hi * frac[..., None]  # [...,c]
    return tuple(out[..., ch] for ch in range(3))


# --- orchestration ------------------------------------------------------------

def shade_tiles_fast_ambient(
    depth_t: jnp.ndarray,  # [n_tiles, th, tw]
    tid_t: jnp.ndarray,  # [n_tiles, th, tw] int32
    vary_t: jnp.ndarray,  # [n_tiles, K, th, tw]
    scene,
    shadow_map: jnp.ndarray | None,
    shadow_params,
    nty: int,
    ntx: int,
    height: int,
    width: int,
    tonemap: str,
    clear_color,
    material_constants: tuple = (None,) * 11,
    return_depth: bool = False,
):
    """Shade raster tiles through the fused kernel; returns [H,W,4] (and the
    stitched depth when return_depth). See module docstring for the split
    between XLA (gathers) and the kernel (all elementwise shading)."""
    from renderer_rs_tpu.mathx.vec import normalize as _nrm

    n_tiles, k_total, th, tw = vary_t.shape
    n_lanes = sum(1 for c in material_constants if c is None)
    mat_base = k_total - n_lanes
    env = scene.environment

    wp = (vary_t[:, 0], vary_t[:, 1], vary_t[:, 2])
    n = _normalize3((vary_t[:, 3], vary_t[:, 4], vary_t[:, 5]))
    cam = scene.camera.camera_position
    v = _normalize3((cam[0] - wp[0], cam[1] - wp[1], cam[2] - wp[2]))
    rough_lane = None
    li = mat_base
    for k in range(11):
        if material_constants[k] is None:
            if k == 5:
                rough_lane = li
            li += 1
    if rough_lane is not None:
        rough = jnp.maximum(vary_t[:, rough_lane], 0.04)
    else:
        rough = jnp.full_like(depth_t, max(material_constants[5], 0.04))

    sun_dir = _nrm(-scene.lights.sun_direction)
    if shadow_map is not None:
        shadow_t = shadow_factor_planes(
            shadow_map, scene.light_space_matrix, wp, n, sun_dir, shadow_params
        )
    else:
        shadow_t = jnp.ones_like(depth_t)

    px, py = _tile_pixel_centers(nty, ntx, th, tw)
    inv_vp = jnp.linalg.inv(scene.camera.view_projection)
    spec = spec_sky_planes(env, n, v, rough, depth_t, inv_vp, px, py, width, height)
    spec_t = jnp.stack(spec, axis=1)  # [n_tiles, 3, th, tw]

    params = jnp.concatenate(
        [
            cam.astype(jnp.float32),
            sun_dir.astype(jnp.float32),
            (scene.lights.sun_color * scene.lights.sun_intensity).astype(jnp.float32),
            env.irradiance_sh.astype(jnp.float32).reshape(-1),
        ]
    )  # [36]

    kernel = _make_shade_kernel(
        k_total, material_constants, tonemap, clear_color, th, tw
    )

    def wrapped(params_ref, depth_ref, tid_ref, vary_ref, shadow_ref, spec_ref, out_ref):
        kernel(
            params_ref,
            depth_ref.at[0],
            tid_ref.at[0],
            vary_ref.at[0],
            shadow_ref.at[0],
            spec_ref.at[0],
            out_ref.at[0],
        )

    tile3 = lambda nd: pl.BlockSpec(  # noqa: E731
        (1,) + nd, (lambda i: (i,) + (0,) * len(nd)), memory_space=pltpu.VMEM
    )
    out_t = pl.pallas_call(
        wrapped,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile3((th, tw)),
            tile3((th, tw)),
            tile3((k_total, th, tw)),
            tile3((th, tw)),
            tile3((3, th, tw)),
        ],
        out_specs=tile3((4, th, tw)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, th, tw), jnp.float32),
    )(params, depth_t, tid_t, vary_t, shadow_t, spec_t)

    hp, wp_ = nty * th, ntx * tw

    def stitch_c(tiles, k):
        full = tiles.reshape(nty, ntx, k, th, tw).transpose(2, 0, 3, 1, 4)
        return full.reshape(k, hp, wp_)[:, :height, :width].transpose(1, 2, 0)

    out = stitch_c(out_t, 4)
    if return_depth:
        dfull = depth_t.reshape(nty, ntx, th, tw).transpose(0, 2, 1, 3)
        return out, dfull.reshape(hp, wp_)[:height, :width]
    return out
