"""Texture sampling kernels: the software texture unit.

Gather-based nearest/bilinear/trilinear filtering with wrap modes, screen-
space derivative LOD selection, and cubemap addressing. This implements the
sampler half of the reference's stubbed Tasks 3.1/3.2 plus the sampling the
HLSL shaders assume (Texture2D.Sample / SampleLevel / cubemap Sample).

TPU notes (SURVEY.md §7 hard parts): sampling is gather-bound; keeping the
texture in fp32 [H,W,C] with lane-friendly W and letting XLA fuse the
4-gather bilinear blend is the round-1 baseline. Tile-local VMEM sampling is
the raster_pallas follow-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderer_rs_tpu.resources.texture import (
    Filter,
    MipmapMode,
    Sampler,
    WrapMode,
)


def _once(x: jnp.ndarray) -> jnp.ndarray:
    """Materialize a gathered tensor exactly once. Without the barrier XLA
    fuses a gather into EVERY downstream consumer (each channel slice /
    blend term) and re-executes it per consumer — r3 calibration measured
    a single 2M-pixel gather at ~1.5 ms but un-barriered multi-consumer
    fetch chains at 10-40 ms. Wrap every `atlas[idx]`-style wide-row
    gather whose result fans out."""
    return jax.lax.optimization_barrier((x,))[0]


def _barrier_post(which: str = "post") -> bool:
    """RENDERER_BARRIER moves a flagship fetch's barrier from the raw
    gather to the BLENDED result: under matmul blend the taps have a
    single consumer chain (weight multiply -> selection matmul), so the
    no-refetch guarantee holds with the barrier after the blend — and the
    gather's {2,1,0} output no longer needs the whole-frame {1,2,0} copy
    the pre-blend barrier pins (probe_trace copy.826 1.6 + copy.840 2.0
    ms). Values: "post" (both tables), "mat" (material atlas only),
    "cube" (cube atlas only). Measured r4: standalone post won 1.6 ms but
    LOST ~5 under clip compaction — default stays pre; the granular
    values probe which table's copy is separable. Inert under the
    "slice" blend (multi-consumer taps — the barrier must stay on the
    gather there)."""
    import os

    v = os.environ.get("RENDERER_BARRIER", "pre")
    return (
        (v == "post" or v == which)
        and _blend_mode() != "slice"
    )


def _once_pre(x: jnp.ndarray, which: str = "post") -> jnp.ndarray:
    return x if _barrier_post(which) else _once(x)


def _once_post(x: jnp.ndarray, which: str = "post") -> jnp.ndarray:
    return _once(x) if _barrier_post(which) else x


def upsample_y_idaware(
    s: jnp.ndarray, tid: jnp.ndarray, height: int, factor: int
) -> jnp.ndarray:
    """Vertical `factor`x upsample of a field sampled at rows 0, factor,
    2*factor, ... ([ceil(H/f),W,C]), guided by the FULL-RATE winner-id
    image [H,W].

    Sample rows copy s exactly. Each in-between row reconstructs from the
    two bracketing sample rows EDGE-AWARELY: positional lerp when both
    share the row's winner id (same surface — smooth interpolation), copy
    the matching neighbor when only one does (silhouette — no ghosting
    across the edge), lerp as a fallback when neither matches (a surface
    thinner than `factor` rows; no correct sample exists). Sky pixels
    participate via id -1, so sky/surface silhouettes resolve the same
    way. All ops are row-plane elementwise + one sublane interleave (the
    y-half/quarter rule: stride SUBLANES only, never lanes)."""
    h2, w = s.shape[0], s.shape[1]
    up = s  # sample row f*i
    dn = jnp.concatenate([s[1:], s[-1:]], axis=0)  # sample row f*(i+1)
    tid_s = tid[0::factor]
    tid_dn = jnp.concatenate([tid_s[1:], tid_s[-1:]], axis=0)
    rows = [up]
    for m in range(1, factor):
        t = m / factor
        tid_m = tid[m::factor]
        n_m = tid_m.shape[0]
        m_up = (tid_m == tid_s[:n_m])[..., None]
        m_dn = (tid_m == tid_dn[:n_m])[..., None]
        lerp = up * (1.0 - t) + dn * t
        val = jnp.where(
            m_up & m_dn, lerp[:n_m],
            jnp.where(
                m_up, up[:n_m], jnp.where(m_dn, dn[:n_m], lerp[:n_m])
            ),
        )
        if n_m < h2:
            val = jnp.concatenate([val, up[n_m:]], axis=0)
        rows.append(val)
    full = jnp.stack(rows, axis=1).reshape(factor * h2, w, s.shape[-1])
    return full[:height]


def upsample2x_y_idaware(
    s: jnp.ndarray, tid: jnp.ndarray, height: int
) -> jnp.ndarray:
    """Vertical 2x id-aware upsample (see upsample_y_idaware)."""
    return upsample_y_idaware(s, tid, height, 2)


def _blend_mode() -> str:
    """Window-blend strategy for the wide-row atlas fetches
    (RENDERER_BLEND): "matmul" (default — won the r3 frame A/B 61.4 vs
    62.9 ms) weights ALL lanes in one fused elementwise pass (per-window
    weights broadcast through an iota-derived select chain) and reduces
    window->channel with a constant 0/1 selection matmul (MXU); "reshape"
    reduces via [.., n_win, c] reshape + sublane sum (measured 63.5);
    "slice" restores the per-window lane-offset slices + FMA chain (each
    slice of a gathered row is a relayout pass — 8 on the material atlas,
    13 on the cube)."""
    import os

    return os.environ.get("RENDERER_BLEND", "matmul")


def _weighted_lane_reduce(taps, ws, c, mode):
    """sum_k ws[k] * taps[..., k*c:(k+1)*c] without per-window lane slices.

    taps: [..., n_win*c] f32; ws: list of n_win per-window weights shaped
    [..., 1]. One fused elementwise pass builds the per-lane weight via an
    iota select chain and multiplies; the window->channel reduction is a
    constant selection matmul ("matmul", exact f32 via HIGHEST) or a
    reshape + sum over the window axis ("reshape")."""
    import numpy as np

    n_win = len(ws)
    lanes = n_win * c
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (taps.ndim - 1) + (lanes,), taps.ndim - 1
    )
    k = lane // c
    wl = ws[-1]
    for kk in range(n_win - 2, -1, -1):
        wl = jnp.where(k == kk, ws[kk], wl)
    weighted = taps * wl
    if mode == "matmul":
        sel = np.zeros((lanes, c), np.float32)
        sel[np.arange(lanes), np.arange(lanes) % c] = 1.0
        return jnp.einsum(
            "...l,lc->...c", weighted, jnp.asarray(sel),
            precision=jax.lax.Precision.HIGHEST,
        )
    w3 = weighted.reshape(taps.shape[:-1] + (n_win, c))
    return jnp.sum(w3, axis=-2)


def _wrap_coord(x: jnp.ndarray, size: int, mode: WrapMode) -> jnp.ndarray:
    """Wrap integer texel coords per VkSamplerAddressMode semantics."""
    if mode == WrapMode.REPEAT:
        return jnp.mod(x, size)
    if mode == WrapMode.CLAMP_TO_EDGE:
        return jnp.clip(x, 0, size - 1)
    # MIRRORED_REPEAT: period 2*size, reflect the second half
    m = jnp.mod(x, 2 * size)
    return jnp.where(m < size, m, 2 * size - 1 - m)


def _gather2d(tex: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """tex[H,W,C] gathered at integer coords -> [...,C]."""
    return tex[iy, ix]


def sample_nearest(
    tex: jnp.ndarray, uv: jnp.ndarray, sampler: Sampler = Sampler.nearest()
) -> jnp.ndarray:
    """Nearest-texel sampling. uv: [...,2] in [0,1] texture space."""
    h, w = tex.shape[0], tex.shape[1]
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    ix = _wrap_coord(ix, w, sampler.wrap_u)
    iy = _wrap_coord(iy, h, sampler.wrap_v)
    return _gather2d(tex, iy, ix)


def sample_bilinear(
    tex: jnp.ndarray, uv: jnp.ndarray, sampler: Sampler = Sampler()
) -> jnp.ndarray:
    """Bilinear filtering with half-texel center convention (GPU-exact)."""
    h, w = tex.shape[0], tex.shape[1]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w = _wrap_coord(x0, w, sampler.wrap_u)
    x1w = _wrap_coord(x0 + 1, w, sampler.wrap_u)
    y0w = _wrap_coord(y0, h, sampler.wrap_v)
    y1w = _wrap_coord(y0 + 1, h, sampler.wrap_v)
    t00 = _gather2d(tex, y0w, x0w)
    t10 = _gather2d(tex, y0w, x1w)
    t01 = _gather2d(tex, y1w, x0w)
    t11 = _gather2d(tex, y1w, x1w)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def _sample_level(mips: tuple, level: int, uv: jnp.ndarray, sampler: Sampler) -> jnp.ndarray:
    # Vulkan selects mag_filter at lod <= 0 and min_filter beyond; with the
    # static level unroll, level 0 is the magnification regime and every
    # deeper mip is minification (VkSamplerCreateInfo magFilter/minFilter)
    f = sampler.mag_filter if level == 0 else sampler.min_filter
    if f == Filter.NEAREST:
        return sample_nearest(mips[level], uv, sampler)
    return sample_bilinear(mips[level], uv, sampler)


def sample_lod(
    mips: tuple, uv: jnp.ndarray, lod: jnp.ndarray, sampler: Sampler = Sampler()
) -> jnp.ndarray:
    """SampleLevel: explicit (possibly fractional, per-pixel) LOD.

    Per-pixel dynamic level over static-shape mips: evaluate each level and
    select. Cost is bounded by the mip-chain sum (~4/3 of level 0); XLA fuses
    the selects. Used by IBL prefiltered-map lookup (mip = roughness*(L-1),
    pbr.hlsli:382-466) and trilinear minification.
    """
    n = len(mips)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo.astype(lod.dtype))[..., None]
    out_lo = _sample_level(mips, 0, uv, sampler)
    out_hi = out_lo
    for lvl in range(1, n):
        s = _sample_level(mips, lvl, uv, sampler)
        out_lo = jnp.where((lo == lvl)[..., None], s, out_lo)
        out_hi = jnp.where((lo + 1 == lvl)[..., None], s, out_hi)
    if sampler.mipmap_mode == MipmapMode.NEAREST:
        return jnp.where(frac < 0.5, out_lo, out_hi)
    return out_lo * (1 - frac) + out_hi * frac


def screen_space_lod(
    uv: jnp.ndarray, tex_h: int, tex_w: int, y_parity=0
) -> jnp.ndarray:
    """Per-pixel LOD from screen-space UV derivatives.

    uv: [H,W,2] (the interpolated UVs of the deferred shading pass).

    QUAD-UNIFORM derivatives (default since r4): both pixels of a 2x2
    quad's row share ddx = uv[odd_x] - uv[even_x], both rows share
    ddy = uv[odd_y] - uv[even_y] — exactly HLSL ddx/ddy semantics (the
    reference's Texture2D.Sample implicit LOD). Besides reference parity,
    quad derivatives are BAND-STABLE: a band shard aligned to even rows
    computes bit-identical LOD to the full-frame render, whereas the old
    per-pixel forward difference read the next row across the band edge
    (r4: the sharded-flagship mismatch localized to band-final rows).
    RENDERER_LOD=fwd restores the r3 forward-difference form.

    y_parity: GLOBAL parity of this image's first row (0 or 1, may be
    traced) — a contiguous band starting at an odd framebuffer row
    passes 1 so its quad row-pairing matches the full-frame render for
    every interior row (the band's boundary rows still clamp locally —
    the same one-row residual the forward-difference form had).
    """
    import os

    fwd_x = jnp.diff(uv, axis=1, append=uv[:, -1:, :])
    fwd_y = jnp.diff(uv, axis=0, append=uv[-1:, :, :])
    if os.environ.get("RENDERER_LOD", "quad") == "fwd" or (
        uv.shape[0] < 2 or uv.shape[1] < 2
    ):
        du_dx = fwd_x * tex_w
        du_dy = fwd_y * tex_h
    else:
        # quad share: odd pixels reuse the preceding even pixel's forward
        # difference (shift-by-one + parity select — no strided slicing)
        ex = jax.lax.broadcasted_iota(jnp.int32, uv.shape[:2], 1) % 2 == 0
        ey = (
            jax.lax.broadcasted_iota(jnp.int32, uv.shape[:2], 0) + y_parity
        ) % 2 == 0
        prev_x = jnp.concatenate([fwd_x[:, :1], fwd_x[:, :-1]], axis=1)
        prev_y = jnp.concatenate([fwd_y[:1], fwd_y[:-1]], axis=0)
        du_dx = jnp.where(ex[..., None], fwd_x, prev_x) * tex_w
        du_dy = jnp.where(ey[..., None], fwd_y, prev_y) * tex_h
    rho = jnp.maximum(
        jnp.sqrt(jnp.sum(du_dx * du_dx, axis=-1)),
        jnp.sqrt(jnp.sum(du_dy * du_dy, axis=-1)),
    )
    return jnp.log2(jnp.maximum(rho, 1e-12))


def sample_textured(
    mips: tuple, uv: jnp.ndarray, sampler: Sampler = Sampler(), y_parity=0
) -> jnp.ndarray:
    """Full Texture2D.Sample for the deferred pass: implicit LOD from screen
    derivatives + trilinear (or per-sampler) filtering. uv must be [H,W,2].
    y_parity: global parity of the image's first row (band shards)."""
    if len(mips) == 1 or sampler.mipmap_mode == MipmapMode.NEAREST:
        return _sample_level(mips, 0, uv, sampler)
    lod = screen_space_lod(uv, mips[0].shape[0], mips[0].shape[1], y_parity)
    return sample_lod(mips, uv, lod, sampler)


# --- texture arrays (per-pixel texture id, the bindless-style path) -----------

def _gather_array(tex: jnp.ndarray, tid: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray):
    """tex[N,H,W,C] gathered at (tid, iy, ix) -> [...,C]."""
    return tex[tid, iy, ix]


def sample_array_bilinear(
    level: jnp.ndarray, tid: jnp.ndarray, uv: jnp.ndarray, sampler: Sampler = Sampler()
) -> jnp.ndarray:
    """Bilinear sample of a texture array level [N,H,W,C] with per-pixel ids."""
    h, w = level.shape[1], level.shape[2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w = _wrap_coord(x0, w, sampler.wrap_u)
    x1w = _wrap_coord(x0 + 1, w, sampler.wrap_u)
    y0w = _wrap_coord(y0, h, sampler.wrap_v)
    y1w = _wrap_coord(y0 + 1, h, sampler.wrap_v)
    t = jnp.maximum(tid, 0)
    t00 = _gather_array(level, t, y0w, x0w)
    t10 = _gather_array(level, t, y0w, x1w)
    t01 = _gather_array(level, t, y1w, x0w)
    t11 = _gather_array(level, t, y1w, x1w)
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def sample_array_textured(
    mips: tuple, tid: jnp.ndarray, uv: jnp.ndarray,
    sampler: Sampler = Sampler(), y_parity=0,
) -> jnp.ndarray:
    """Trilinear texture-array sampling with implicit screen-derivative LOD.

    tid/uv are [H,W]/[H,W,2] framebuffer-shaped buffers (deferred pass).
    Round-1 cost note: evaluates each mip level then selects — the mip-atlas
    single-gather layout is the planned optimization (SURVEY.md §7 texture
    hard-part).
    """
    n = len(mips)
    if n == 1:
        return sample_array_bilinear(mips[0], tid, uv, sampler)
    lod = screen_space_lod(uv, mips[0].shape[1], mips[0].shape[2], y_parity)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo.astype(lod.dtype))[..., None]
    out_lo = sample_array_bilinear(mips[0], tid, uv, sampler)
    out_hi = out_lo
    for lvl in range(1, n):
        s = sample_array_bilinear(mips[lvl], tid, uv, sampler)
        out_lo = jnp.where((lo == lvl)[..., None], s, out_lo)
        out_hi = jnp.where((lo + 1 == lvl)[..., None], s, out_hi)
    return out_lo * (1 - frac) + out_hi * frac


# --- cubemaps ----------------------------------------------------------------

def direction_to_cube_uv(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direction [...,3] -> (face [...], uv [...,2]).

    Face order +X,-X,+Y,-Y,+Z,-Z with the standard cube-face basis (the same
    6-way mapping as compute/equirect_to_cubemap.hlsl:22-105, inverted).
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)

    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)

    # (u,v) per face, standard cubemap convention
    u = jnp.where(
        is_x,
        jnp.where(x > 0, -z, z),
        jnp.where(is_y, x, jnp.where(z > 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))

    uv = jnp.stack([(u / ma + 1.0) * 0.5, (v / ma + 1.0) * 0.5], axis=-1)
    return face, uv


def sample_cubemap(
    faces: jnp.ndarray, d: jnp.ndarray, bilinear: bool = True
) -> jnp.ndarray:
    """Sample a [6,H,W,C] cubemap level along directions [...,3].

    Per-face bilinear with clamp-to-edge (no seam blending across faces).
    TPU note: the face axis is folded into the row index so each bilinear tap
    is ONE gather from a [6*H, W, C] view — not six sampled faces + selects
    (which cost 24 gathers/pixel and dominated the skybox pass).
    """
    face, uv = direction_to_cube_uv(d)
    h, w = faces.shape[1], faces.shape[2]
    c = faces.shape[3]
    row0 = face * h  # per-pixel face row offset

    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    if not bilinear:
        flat = faces.reshape(6 * h, w, c)
        # floor(u*w), the sample_nearest convention — round(u*w-0.5) would
        # banker's-round to the even neighbor at exact texel boundaries
        ix = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return flat[row0 + iy, ix]
    # Pack each texel's 2x2 neighborhood (clamp-to-edge) into channels so the
    # whole bilinear footprint is ONE row gather per pixel (the 4-gather
    # version dominated the skybox pass at 1080p).
    right = jnp.concatenate([faces[:, :, 1:], faces[:, :, -1:]], axis=2)
    down = jnp.concatenate([faces[:, 1:], faces[:, -1:]], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    window = jnp.concatenate([faces, right, down, downright], axis=-1)
    window = window.reshape(6 * h, w, 4 * c)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    # Below-edge samples (x0 == -1) clamp BOTH taps to column 0 in the
    # 4-gather form; the packed window's right-plane is column 1 there, so
    # zero the fraction to reproduce the clamp. (Above-edge needs nothing:
    # the window's edge planes already repeat the last column/row.)
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    taps = _once(window[row0 + y0c, x0c])  # [...,4C]
    t00 = taps[..., 0:c]
    t10 = taps[..., c : 2 * c]
    t01 = taps[..., 2 * c : 3 * c]
    t11 = taps[..., 3 * c : 4 * c]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


def _cube_window_flat(faces: jnp.ndarray) -> jnp.ndarray:
    """Pack a [6,S,S,C] level into a flat [6*S*S, 4C] 2x2-window table."""
    right = jnp.concatenate([faces[:, :, 1:], faces[:, :, -1:]], axis=2)
    down = jnp.concatenate([faces[:, 1:], faces[:, -1:]], axis=1)
    downright = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    window = jnp.concatenate([faces, right, down, downright], axis=-1)
    s = faces.shape[1]
    return window.reshape(6 * s * s, 4 * faces.shape[3])


def _cube_footprint(si: int, uv):
    """Edge-clamped bilinear footprint on a STATIC si x si cube face."""
    x = uv[..., 0] * si - 0.5
    y = uv[..., 1] * si - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    return jnp.clip(x0, 0, si - 1), jnp.clip(y0, 0, si - 1), fx, fy


def _cube_atlas_fetch(atlas, offsets, sizes, level, face, uv, c):
    """Bilinear fetch of one mip level from the flattened window atlas —
    ONE gather per pixel. level/face/uv are per-pixel arrays. Static
    (python-sequence) offsets/sizes unroll the level math into selects
    instead of tiny-table gathers (3 full-frame gathers saved)."""
    if isinstance(offsets, (list, tuple)):
        idx = fx = fy = None
        for l, (si, off) in enumerate(zip(sizes, offsets)):
            si = int(si)
            x0c, y0c, fx_l, fy_l = _cube_footprint(si, uv)
            idx_l = off + (face * si + y0c) * si + x0c
            if idx is None:
                idx, fx, fy = idx_l, fx_l, fy_l
            else:
                sel = level == l
                idx = jnp.where(sel, idx_l, idx)
                fx = jnp.where(sel[..., None], fx_l, fx)
                fy = jnp.where(sel[..., None], fy_l, fy)
        return _blend_window(_once(atlas[idx]), fx, fy, c)
    s = sizes[level].astype(jnp.float32)  # [...]
    si = sizes[level]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)  # edge-clamp semantics
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    x0c = jnp.clip(x0, 0, si - 1)
    y0c = jnp.clip(y0, 0, si - 1)
    idx = offsets[level] + (face * si + y0c) * si + x0c
    return _blend_window(_once(atlas[idx]), fx, fy, c)


def sample_cubemap_lod(
    mips: tuple,
    d: jnp.ndarray,
    lod: jnp.ndarray,
    atlas: jnp.ndarray | None = None,
    offsets=None,
    sizes=None,
) -> jnp.ndarray:
    """Trilinear cubemap sampling at explicit LOD (prefiltered IBL lookup).

    All levels are packed into one flat window atlas so a per-pixel dynamic
    LOD costs exactly TWO gathers (lo/hi level) instead of evaluating every
    level and selecting.

    Pass a PREBUILT (atlas, offsets, sizes) — e.g. GpuEnvironment.atlas from
    scene_build — to skip the window repack: mips are frame inputs under
    jit, so the 4x-copy concat below would otherwise re-execute every frame.
    Extra trailing segments in a prebuilt atlas (the skybox) are unreached
    because lod clamps to len(mips)-1.
    """
    n = len(mips)
    c = mips[0].shape[3]
    if atlas is None:
        atlas = jnp.concatenate([_cube_window_flat(m) for m in mips], axis=0)
        sizes_l, offsets_l, off = [], [], 0
        for m in mips:
            sizes_l.append(m.shape[1])
            offsets_l.append(off)
            off += 6 * m.shape[1] * m.shape[1]
        sizes = jnp.asarray(sizes_l, jnp.int32)
        offsets = jnp.asarray(offsets_l, jnp.int32)

    face, uv = direction_to_cube_uv(d)
    lod = jnp.clip(lod, 0.0, n - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = (lod - lo.astype(lod.dtype))[..., None]
    out_lo = _cube_atlas_fetch(atlas, offsets, sizes, lo, face, uv, c)
    out_hi = _cube_atlas_fetch(atlas, offsets, sizes, hi, face, uv, c)
    return out_lo * (1 - frac) + out_hi * frac


# --- texture-array window atlas (implicit-LOD trilinear in TWO gathers) --------

def _array_window_flat(level, wrap_u: WrapMode, wrap_v: WrapMode):
    """Pack one texture-array level [N,H,W,C] into a flat [N*H*W, 4C]
    2x2-window table honoring the wrap mode (REPEAT rolls, CLAMP repeats the
    edge), so any bilinear footprint is ONE row. Host-side numpy: a one-time
    build step (eager device ops would each pay the remote-compile hop)."""
    import numpy as np

    level = np.asarray(level)

    def shift_w(a):
        if wrap_u == WrapMode.REPEAT:
            return np.roll(a, -1, axis=2)
        return np.concatenate([a[:, :, 1:], a[:, :, -1:]], axis=2)

    def shift_h(a):
        if wrap_v == WrapMode.REPEAT:
            return np.roll(a, -1, axis=1)
        return np.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    right = shift_w(level)
    down = shift_h(level)
    downright = shift_w(down)
    window = np.concatenate([level, right, down, downright], axis=-1)
    n, h, w, c4 = window.shape
    return window.reshape(n * h * w, c4)


def build_array_atlas(
    mips: tuple, sampler: Sampler = Sampler()
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build (atlas [R,4C], offsets [L], sizes [L,2]) over a mip chain of
    texture-array levels. Done once at scene build — keeps the window
    packing out of the per-frame jit (mirrors the cubemap mip atlas,
    ops/sampling.sample_cubemap_lod)."""
    import numpy as np

    tables = [_array_window_flat(m, sampler.wrap_u, sampler.wrap_v) for m in mips]
    sizes, offsets, off = [], [], 0
    for m in mips:
        sizes.append((m.shape[1], m.shape[2]))
        offsets.append(off)
        off += m.shape[0] * m.shape[1] * m.shape[2]
    return (
        jnp.asarray(np.concatenate(tables, axis=0)),
        jnp.asarray(offsets, jnp.int32),
        jnp.asarray(sizes, jnp.int32),
    )


def _window_footprint(h: int, w: int, uv, sampler: Sampler):
    """Per-level bilinear footprint with STATIC (python int) h/w: wrapped
    anchor coords + edge-corrected fractions. Bit-matches the dynamic form."""
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    if sampler.wrap_u == WrapMode.REPEAT:
        x0w = jnp.mod(x0, w)
    else:
        # CLAMP: below-edge samples collapse both taps to column 0 — the
        # window's right-plane is column 1 there, so zero the fraction
        fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
        x0w = jnp.clip(x0, 0, w - 1)
    if sampler.wrap_v == WrapMode.REPEAT:
        y0w = jnp.mod(y0, h)
    else:
        fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
        y0w = jnp.clip(y0, 0, h - 1)
    return x0w, y0w, fx, fy


def _blend_window(taps, fx, fy, c):
    t00 = taps[..., 0:c]
    t10 = taps[..., c : 2 * c]
    t01 = taps[..., 2 * c : 3 * c]
    t11 = taps[..., 3 * c : 4 * c]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    return top * (1 - fy) + bot * fy


# --- arithmetic mip plans (select-free per-level math) -----------------------
#
# The static-geometry fetches unroll per-level footprint math into select
# chains (n_levels x ~7 operands x ~6 vector ops, all at 2M pixels — the
# dominant non-gather cost of the atlas fetches by probe_shade's stub
# deltas). When the mip chain is the exact base>>l halving of a power-of-two
# base, every per-level quantity is computable ARITHMETICALLY from the
# per-pixel level index in one pass: the level size via a dynamic right
# shift (exact — powers of two are exact in f32, so u*float(S>>lo) is the
# SAME f32 multiply the selected branch performs), REPEAT wrap via
# x & (S-1) (== jnp.mod for power-of-two S, including negative x in two's
# complement), and the atlas row offset via the closed form of the
# geometric series sum_{j<l} (h0*w0)>>2j = (4*h0*w0 - (4*h0*w0 >> 2l)) / 3
# (exact: 4^l == 1 mod 3). Bit-identical to the select chain (tests
# assert); gated by RENDERER_MIP_PLAN until the frame A/B flips it.


def _mip_plan_mode() -> str:
    """RENDERER_MIP_PLAN: "arith" computes per-level mip math from the
    per-pixel level index with dynamic shifts + closed-form offsets
    (falling back per-call when the chain is not a power-of-two halving);
    "select" restores the unrolled per-level select chains."""
    import os

    return os.environ.get("RENDERER_MIP_PLAN", "select")


def _halving_offsets(offsets, sizes, count: int) -> int | None:
    """If sizes[l] == (h0>>l, w0>>l) for l < count with power-of-two h0/w0
    (no dimension flooring to 0) and offsets match the closed-form
    geometric sum for SOME integer set-multiplier M, return M; else None.
    Host-side: offsets/sizes are python sequences (static mip geometry)."""
    dims = [
        (int(s[0]), int(s[1])) if hasattr(s, "__len__") else (int(s), int(s))
        for s in sizes[:count]
    ]
    h0, w0 = dims[0]
    if h0 <= 0 or w0 <= 0 or (h0 & (h0 - 1)) or (w0 & (w0 - 1)):
        return None
    if count > min(h0.bit_length(), w0.bit_length()):
        return None
    for l, (h, w) in enumerate(dims):
        if h != h0 >> l or w != w0 >> l:
            return None
    if int(offsets[0]) != 0:
        return None
    if count == 1:
        return 1
    m, rem = divmod(int(offsets[1]), h0 * w0)
    if rem or m <= 0:
        return None
    hw4 = 4 * h0 * w0
    for l in range(count):
        if int(offsets[l]) != m * ((hw4 - (hw4 >> (2 * l))) // 3):
            return None
    return m


def _footprint_dyn(hi_i, wi_i, uv, sampler: Sampler):
    """_window_footprint with PER-PIXEL power-of-two h/w (int32 arrays).
    Bit-matches the static form at every pixel whose level selects those
    dims: float(S) is exact, floor/clip identical, and REPEAT's mod
    becomes x & (S-1) (equal for power-of-two S, negatives included)."""
    x = uv[..., 0] * wi_i.astype(jnp.float32) - 0.5
    y = uv[..., 1] * hi_i.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    if sampler.wrap_u == WrapMode.REPEAT:
        x0w = jnp.bitwise_and(x0, wi_i - 1)
    else:
        fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
        x0w = jnp.clip(x0, 0, wi_i - 1)
    if sampler.wrap_v == WrapMode.REPEAT:
        y0w = jnp.bitwise_and(y0, hi_i - 1)
    else:
        fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
        y0w = jnp.clip(y0, 0, hi_i - 1)
    return x0w, y0w, fx, fy


def _array_atlas_fetch(atlas, offsets, sizes, level, tid, uv, c, sampler: Sampler):
    """Bilinear fetch of one (per-pixel) mip level from the flat window
    atlas — ONE gather per pixel. Bit-matches sample_array_bilinear.

    When offsets/sizes are PYTHON sequences (static mip geometry — always
    known from the mip-chain shapes), the per-level index math unrolls into
    selects instead of per-pixel gathers from the tiny offset/size tables:
    a [H,W]-shaped gather costs ~the same regardless of table size, so the
    dynamic form paid 3 extra full-frame gathers per fetch."""
    t = jnp.maximum(tid, 0)
    if isinstance(offsets, (list, tuple)):
        idx = fx = fy = None
        for l, ((h, w), off) in enumerate(zip(sizes, offsets)):
            x0w, y0w, fx_l, fy_l = _window_footprint(int(h), int(w), uv, sampler)
            idx_l = off + (t * int(h) + y0w) * int(w) + x0w
            if idx is None:
                idx, fx, fy = idx_l, fx_l, fy_l
            else:
                sel = level == l
                idx = jnp.where(sel, idx_l, idx)
                fx = jnp.where(sel[..., None], fx_l, fx)
                fy = jnp.where(sel[..., None], fy_l, fy)
        return _blend_window(_once(atlas[idx]), fx, fy, c)
    h = sizes[level, 0]
    w = sizes[level, 1]
    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    if sampler.wrap_u == WrapMode.REPEAT:
        x0w = jnp.mod(x0, w)
    else:
        fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
        x0w = jnp.clip(x0, 0, w - 1)
    if sampler.wrap_v == WrapMode.REPEAT:
        y0w = jnp.mod(y0, h)
    else:
        fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
        y0w = jnp.clip(y0, 0, h - 1)
    idx = offsets[level] + (t * h + y0w) * w + x0w
    return _blend_window(_once(atlas[idx]), fx, fy, c)


def sample_array_textured_atlas(
    atlas: jnp.ndarray,
    offsets: jnp.ndarray,
    sizes: jnp.ndarray,
    n_levels: int,
    base_hw: tuple[int, int],
    c: int,
    tid: jnp.ndarray,
    uv: jnp.ndarray,
    sampler: Sampler = Sampler(),
    y_parity=0,
) -> jnp.ndarray:
    """Trilinear texture-array sampling with implicit screen-derivative LOD
    in exactly TWO gathers (lo/hi mip), replacing sample_array_textured's
    evaluate-every-level-then-select (cost ∝ mip count per pixel)."""
    if n_levels == 1:
        return _array_atlas_fetch(
            atlas, offsets, sizes, jnp.zeros_like(tid), tid, uv, c, sampler
        )
    lod = screen_space_lod(uv, base_hw[0], base_hw[1], y_parity)
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_levels - 1)
    frac = (lod - lo.astype(lod.dtype))[..., None]
    out_lo = _array_atlas_fetch(atlas, offsets, sizes, lo, tid, uv, c, sampler)
    out_hi = _array_atlas_fetch(atlas, offsets, sizes, hi, tid, uv, c, sampler)
    return out_lo * (1 - frac) + out_hi * frac


# --- per-MATERIAL packed window atlas (all texture slots in one gather) -------

# channel fill for a material slot with no texture bound, chosen so the
# shader can apply every slot unconditionally: multiplying by 1 is exact for
# base/MR/AO/emissive, and (0.5, 0.5, 1) decodes to the flat tangent-space
# normal (TBN-mapping it reproduces the geometric normal).
_NEUTRAL_SLOT = {
    0: (1.0, 1.0, 1.0, 1.0),  # base color (+alpha)
    1: (0.5, 0.5, 1.0, 1.0),  # normal map (encoded +Z)
    2: (1.0, 1.0, 1.0, 1.0),  # metallic-roughness (G/B multipliers)
    3: (1.0, 1.0, 1.0, 1.0),  # ambient occlusion (R)
    4: (1.0, 1.0, 1.0, 1.0),  # emissive
}


def build_material_atlas(
    mips: tuple,
    tex_ids,
    slots: tuple[int, ...],
    sampler: Sampler = Sampler(),
):
    """Pack ALL of each material's texture slots into one window atlas so a
    textured fragment costs TWO gathers total (trilinear lo+hi), not two per
    slot (the reference's five Texture2D.Sample calls,
    model_pbr.hlsl:205-245, are independent texture units; a TPU gather is
    latency-bound, so slots must ride the SAME row).

    mips: the per-texture mip chain (tuple of [N,S,S,4]) — every texture
    already shares the S×S base resolution (SceneBuilder.set_textures).
    tex_ids: [M,5] int per-material texture ids (-1 = unbound -> neutral
    fill, see _NEUTRAL_SLOT). slots: which slot indices participate
    (statically-unused slots are excluded; SceneLayout.texture_slots).

    Returns (atlas [R, 4*C], offsets [L], sizes [L,2]) with C = 4*len(slots)
    channels per texel — drop-in for sample_array_textured_atlas with the
    material index as the per-pixel "texture id".
    """
    import numpy as np

    tex_ids = np.asarray(tex_ids)
    m = tex_ids.shape[0]
    mat_mips = []
    for level in np.arange(len(mips)):
        lvl = np.asarray(mips[level])  # [N,S,S,4]
        s_h, s_w = lvl.shape[1], lvl.shape[2]
        chans = []
        for slot in slots:
            ids = tex_ids[:, slot]  # [M]
            neutral = np.broadcast_to(
                np.asarray(_NEUTRAL_SLOT[slot], np.float32),
                (1, s_h, s_w, 4),
            )
            picked = np.where(
                (ids >= 0)[:, None, None, None],
                lvl[np.maximum(ids, 0)],
                neutral,
            )
            chans.append(picked)
        mat_mips.append(np.concatenate(chans, axis=-1))  # [M,S,S,4*len(slots)]
    atlas, offsets, sizes = build_array_atlas(tuple(mat_mips), sampler)
    return atlas, offsets, sizes


# --- single-gather trilinear cube atlas (child 2x2 + parent 3x3 per row) -----

def _cube_parent_window(child_s: int, parent) -> "np.ndarray":
    """For each child texel (f,y,x) of a [6,S,S,C]-level's coordinate grid,
    the PARENT level's 3x3 edge-clamped window anchored at
    (y//2 - 1, x//2 - 1) -> [6*S*S, 9C]. Together with the child 2x2 window
    this makes any trilinear footprint ONE row (see
    build_cube_trilinear_atlas). Host-side numpy: a one-time build step
    (eager device ops would each pay the remote-compile hop)."""
    import numpy as np

    parent = np.asarray(parent)
    pad = np.pad(parent, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    ky = np.arange(child_s) // 2  # anchor-1+pad == ky + r for r in 0..2
    kx = np.arange(child_s) // 2
    planes = []
    for r in range(3):
        for c in range(3):
            planes.append(pad[:, ky + r][:, :, kx + c])  # [6,S,S,C]
    window = np.concatenate(planes, axis=-1)  # [6,S,S,9C]
    return window.reshape(6 * child_s * child_s, 9 * parent.shape[3])


def build_cube_trilinear_atlas(segments: list) -> jnp.ndarray:
    """Extend the cube window atlas so implicit-LOD trilinear costs ONE
    gather: row (level, face, y, x) = [child 2x2 window (4C) | parent-level
    3x3 window (9C)]. `segments` = prefiltered levels + [skybox] (the
    merged specular/skybox layout of finalize_environment). The last
    prefiltered level and the sky segment store zero parent lanes — their
    lerp fraction is exactly 0, so the parent half is never read.

    Fetch contract (bit-identical to the lo/hi _cube_atlas_fetch pair —
    tests assert): x0_hi = floor(u*S/2 - 0.5) lands in the stored 3x3
    because x0_hi in {k-1, k} for k = x0_lo//2.
    """
    import numpy as np

    c = segments[0].shape[3]
    rows = []
    n_pref = len(segments) - 1
    for li, seg in enumerate(segments):
        seg_np = np.asarray(seg)
        right = np.concatenate([seg_np[:, :, 1:], seg_np[:, :, -1:]], axis=2)
        down = np.concatenate([seg_np[:, 1:], seg_np[:, -1:]], axis=1)
        downright = np.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
        s_ = seg_np.shape[1]
        child = np.concatenate([seg_np, right, down, downright], -1).reshape(
            6 * s_ * s_, 4 * c
        )
        if li + 1 < n_pref:
            parent = _cube_parent_window(s_, segments[li + 1])
        else:
            parent = np.zeros((child.shape[0], 9 * c), child.dtype)
        rows.append(np.concatenate([child, parent], axis=-1))
    out = np.concatenate(rows, axis=0)  # [R, 13C]
    import os

    if os.environ.get("RENDERER_CUBE_DTYPE") == "bf16":
        # half the per-pixel gather traffic of the specular/sky fetch;
        # radiance quantizes to 8 mantissa bits (<=0.4% relative — a
        # quality/speed knob, A/B-gated like the material atlas' bf16)
        return jnp.asarray(out, jnp.bfloat16)
    return jnp.asarray(out)


def cube_trilinear_plan(offsets, sizes, lo_level, face, uv):
    """The index-side half of cube_trilinear_fetch for STATIC (python-
    sequence) mip geometry: per-pixel atlas row index + blend operands
    (fx, fy, fxh, fyh, jx, jy). Exposed so callers can merge the cube
    gather with other per-pixel table gathers into one gather op, then
    finish with cube_trilinear_blend — bit-identical to the composed
    cube_trilinear_fetch."""
    n = len(sizes)
    acc = None
    for l in range(n):
        si = int(sizes[l])
        x0c_l, y0c_l, fx_l, fy_l = _cube_footprint(si, uv)
        idx_l = offsets[l] + (face * si + y0c_l) * si + x0c_l
        sh_l = int(sizes[min(l + 1, n - 1)])
        xh = uv[..., 0] * sh_l - 0.5
        yh = uv[..., 1] * sh_l - 0.5
        x0h = jnp.floor(xh).astype(jnp.int32)
        y0h = jnp.floor(yh).astype(jnp.int32)
        fxh_l = (xh - x0h)[..., None]
        fyh_l = (yh - y0h)[..., None]
        fxh_l = jnp.where((x0h < 0)[..., None], 0.0, fxh_l)
        fyh_l = jnp.where((y0h < 0)[..., None], 0.0, fyh_l)
        jx_l = jnp.where(jnp.clip(x0h, 0, sh_l - 1) < x0c_l // 2, 0, 1)
        jy_l = jnp.where(jnp.clip(y0h, 0, sh_l - 1) < y0c_l // 2, 0, 1)
        vals_l = (idx_l, fx_l, fy_l, fxh_l, fyh_l, jx_l, jy_l)
        if acc is None:
            acc = vals_l
        else:
            sel = lo_level == l
            acc = tuple(
                jnp.where(sel[..., None] if v.ndim > sel.ndim else sel, vl, v)
                for v, vl in zip(acc, vals_l)
            )
    return acc


def cube_trilinear_plan_arith(offsets, sizes, lo_level, face, uv):
    """cube_trilinear_plan with the per-level select chains replaced by
    dynamic-shift arithmetic (see the arithmetic-mip-plan block above).

    The chain prefix sizes[:-1] must be the S0>>l halving of a power-of-two
    S0 with offsets matching the 6-face geometric sum (finalize_environment
    builds exactly this); the LAST segment (the merged skybox — arbitrary
    size) keeps one static select. Parent operands at the chain tail follow
    the arithmetic S0>>(l+1) instead of the select path's wrap-to-last —
    output-identical because those rows store zero parent lanes and the
    blend's frac is 0 there (build_cube_trilinear_atlas contract).

    Returns the same 7 per-pixel operands as cube_trilinear_plan, or None
    when the geometry doesn't admit the arithmetic form (caller falls back
    to the select chain)."""
    n = len(sizes)
    if n < 2:
        return None
    chain = n - 1
    m = _halving_offsets(offsets, [(int(s), int(s)) for s in sizes], chain)
    if m is None:
        return None
    s0 = int(sizes[0])
    hw4 = 4 * s0 * s0
    lo_c = jnp.clip(lo_level, 0, chain - 1)
    si = jnp.right_shift(jnp.int32(s0), lo_c)
    off = m * ((hw4 - jnp.right_shift(jnp.int32(hw4), 2 * lo_c)) // 3)
    sf = si.astype(jnp.float32)
    x = uv[..., 0] * sf - 0.5
    y = uv[..., 1] * sf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
    fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
    x0c = jnp.clip(x0, 0, si - 1)
    y0c = jnp.clip(y0, 0, si - 1)
    idx = off + (face * si + y0c) * si + x0c
    # parent (hi-mip) operands: dynamic S0>>(l+1), floored at 1
    sh = jnp.maximum(jnp.right_shift(jnp.int32(s0), lo_c + 1), 1)
    shf = sh.astype(jnp.float32)
    xh = uv[..., 0] * shf - 0.5
    yh = uv[..., 1] * shf - 0.5
    x0h = jnp.floor(xh).astype(jnp.int32)
    y0h = jnp.floor(yh).astype(jnp.int32)
    fxh = (xh - x0h)[..., None]
    fyh = (yh - y0h)[..., None]
    fxh = jnp.where((x0h < 0)[..., None], 0.0, fxh)
    fyh = jnp.where((y0h < 0)[..., None], 0.0, fyh)
    jx = jnp.where(jnp.clip(x0h, 0, sh - 1) < x0c // 2, 0, 1)
    jy = jnp.where(jnp.clip(y0h, 0, sh - 1) < y0c // 2, 0, 1)
    # ONE static select folds in the last (arbitrary-size) segment; its
    # parent size wraps to itself exactly as the select path's
    # sizes[min(l+1, n-1)] does at l == n-1.
    s_last = int(sizes[-1])
    x0l, y0l, fxl, fyl = _cube_footprint(s_last, uv)
    idx_l = int(offsets[-1]) + (face * s_last + y0l) * s_last + x0l
    jx_l = jnp.where(x0l < x0l // 2, 0, 1)
    jy_l = jnp.where(y0l < y0l // 2, 0, 1)
    last = lo_level == chain
    lastc = last[..., None]
    return (
        jnp.where(last, idx_l, idx),
        jnp.where(lastc, fxl, fx),
        jnp.where(lastc, fyl, fy),
        jnp.where(lastc, fxl, fxh),
        jnp.where(lastc, fyl, fyh),
        jnp.where(last, jx_l, jx),
        jnp.where(last, jy_l, jy),
    )


def cube_trilinear_fetch(
    atlas13, offsets, sizes, lo_level, frac, face, uv, c
):
    """Trilinear (or sky) fetch in ONE gather from the 13C-wide atlas.

    lo_level/frac per pixel; frac==0 rows never read parent lanes'
    meaning (zeros at the chain tail are safe). Matches
    f_lo*(1-frac) + f_hi*frac of the two-gather path bit-for-bit.
    Static (python-sequence) offsets/sizes unroll the per-level index and
    footprint math into selects — no tiny-table gathers.
    """
    if isinstance(offsets, (list, tuple)):
        plan = (
            cube_trilinear_plan_arith(offsets, sizes, lo_level, face, uv)
            if _mip_plan_mode() == "arith"
            else None
        )
        if plan is None:
            plan = cube_trilinear_plan(offsets, sizes, lo_level, face, uv)
        idx, fx, fy, fxh, fyh, jx, jy = plan
        taps = _once_pre(atlas13[idx], "cube")
    else:
        s = sizes[lo_level].astype(jnp.float32)
        si = sizes[lo_level]
        x = uv[..., 0] * s - 0.5
        y = uv[..., 1] * s - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        fx = jnp.where((x0 < 0)[..., None], 0.0, fx)
        fy = jnp.where((y0 < 0)[..., None], 0.0, fy)
        x0c = jnp.clip(x0, 0, si - 1)
        y0c = jnp.clip(y0, 0, si - 1)
        sh = sizes[jnp.minimum(lo_level + 1, sizes.shape[0] - 1)]
        shf = sh.astype(jnp.float32)
        xh = uv[..., 0] * shf - 0.5
        yh = uv[..., 1] * shf - 0.5
        x0h = jnp.floor(xh).astype(jnp.int32)
        y0h = jnp.floor(yh).astype(jnp.int32)
        fxh = (xh - x0h)[..., None]
        fyh = (yh - y0h)[..., None]
        fxh = jnp.where((x0h < 0)[..., None], 0.0, fxh)
        fyh = jnp.where((y0h < 0)[..., None], 0.0, fyh)
        jx = jnp.where(jnp.clip(x0h, 0, sh - 1) < x0c // 2, 0, 1)
        jy = jnp.where(jnp.clip(y0h, 0, sh - 1) < y0c // 2, 0, 1)
        idx = offsets[lo_level] + (face * si + y0c) * si + x0c
        taps = _once_pre(atlas13[idx], "cube")  # [..., 13C]

    # RENDERER_BARRIER=post: taps were NOT barriered above (single consumer
    # chain under the matmul blend) — pin the blended result instead.
    return _once_post(
        cube_trilinear_blend(taps, fx, fy, fxh, fyh, jx, jy, frac, c), "cube"
    )


def cube_trilinear_blend(taps, fx, fy, fxh, fyh, jx, jy, frac, c):
    """Blend-side half of cube_trilinear_fetch: child 2x2 bilinear +
    parent 3x3 separable bilinear, lerped by frac. taps may carry trailing
    pad lanes beyond 13c (merged-gather tables pad to a shared width)."""
    if taps.shape[-1] > 13 * c:
        taps = taps[..., : 13 * c]
    if taps.dtype != jnp.float32:
        taps = taps.astype(jnp.float32)  # bf16 atlas: blend math stays f32
    mode = _blend_mode()
    if mode != "slice":
        # all 13 window blocks (child 2x2 + parent 3x3) weighted in ONE
        # elementwise pass, the lo/hi lerp folded into the weights
        fr0 = frac[..., None] if frac.ndim < fx.ndim else frac
        lo_w = 1.0 - fr0
        fyh1 = fyh[..., 0] if fyh.ndim > jy.ndim else fyh
        fxh1 = fxh[..., 0] if fxh.ndim > jx.ndim else fxh
        wy = [
            jnp.where(jy == r, 1.0 - fyh1, jnp.where(jy + 1 == r, fyh1, 0.0))
            for r in range(3)
        ]
        wx = [
            jnp.where(jx == cc, 1.0 - fxh1, jnp.where(jx + 1 == cc, fxh1, 0.0))
            for cc in range(3)
        ]
        ws = [
            (1.0 - fx) * (1.0 - fy) * lo_w,
            fx * (1.0 - fy) * lo_w,
            (1.0 - fx) * fy * lo_w,
            fx * fy * lo_w,
        ] + [
            (wy[r] * wx[cc])[..., None] * fr0
            for r in range(3)
            for cc in range(3)
        ]
        return _weighted_lane_reduce(taps, ws, c, mode)
    t00 = taps[..., 0:c]
    t10 = taps[..., c : 2 * c]
    t01 = taps[..., 2 * c : 3 * c]
    t11 = taps[..., 3 * c : 4 * c]
    top = t00 * (1 - fx) + t10 * fx
    bot = t01 * (1 - fx) + t11 * fx
    f_lo = top * (1 - fy) + bot * fy

    # parent (hi level) bilinear from the stored 3x3. The bilinear weight of
    # stored cell (r, cc) is SEPARABLE: wy_r * wx_cc with
    #   wy_r = (1-fyh) if r == jy else fyh if r == jy+1 else 0   (wx alike)
    # so instead of selecting 4 taps out of 9 (36 masked lane-offset slices
    # — each slice of the gathered rows is a relayout pass) the parent term
    # is one fused weighted sum over the 9 stored c-lane blocks.
    fyh1 = fyh[..., 0] if fyh.ndim > jy.ndim else fyh
    fxh1 = fxh[..., 0] if fxh.ndim > jx.ndim else fxh
    wy = [
        jnp.where(jy == r, 1.0 - fyh1, jnp.where(jy + 1 == r, fyh1, 0.0))
        for r in range(3)
    ]
    wx = [
        jnp.where(jx == cc, 1.0 - fxh1, jnp.where(jx + 1 == cc, fxh1, 0.0))
        for cc in range(3)
    ]
    f_hi = 0.0
    for r in range(3):
        for cc in range(3):
            lane0 = 4 * c + (r * 3 + cc) * c
            f_hi = f_hi + (wy[r] * wx[cc])[..., None] * taps[..., lane0 : lane0 + c]

    fr = frac[..., None] if frac.ndim < f_lo.ndim else frac
    return f_lo * (1.0 - fr) + f_hi * fr


# --- single-gather bf16 material atlas (trilinear, all slots, ONE gather) -----

# Channels of each material slot that the shader actually reads
# (model_pbr.hlsl:205-245): base RGBA, normal XYZ, MR reads G=roughness and
# B=metallic, AO reads R, emissive RGB. Packing ONLY these keeps a fully
# textured material at 13 channels, so one trilinear row (child 2x2 window +
# parent resample 2x2 window = 8C = 104 lanes) fits a single 128-lane gather.
_SLOT_CHANNELS = {0: (0, 1, 2, 3), 1: (0, 1, 2), 2: (1, 2), 3: (0,), 4: (0, 1, 2)}


def _parent_resample(parent, wrap_u: WrapMode, wrap_v: WrapMode):
    """Bilinearly resample a parent level [N,h,w,C] onto the child grid
    [N,2h,2w,C] at child texel centers (parent coord i/2 - 0.25), honoring
    the wrap mode with _window_footprint's edge semantics. Host numpy."""
    import numpy as np

    parent = np.asarray(parent)

    def along(a, axis, n, wrap):
        idx = np.arange(2 * n)
        pos = idx / 2.0 - 0.25
        i0 = np.floor(pos).astype(np.int64)
        f = pos - i0
        if wrap == WrapMode.REPEAT:
            i0m = np.mod(i0, n)
            i1m = np.mod(i0 + 1, n)
        else:
            f = np.where(i0 < 0, 0.0, f)
            i0m = np.clip(i0, 0, n - 1)
            i1m = np.clip(i0 + 1, 0, n - 1)
        t0 = np.take(a, i0m, axis=axis)
        t1 = np.take(a, i1m, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = 2 * n
        fb = f.reshape(shape)
        return t0 * (1.0 - fb) + t1 * fb

    up = along(parent, 1, parent.shape[1], wrap_v)
    return along(up, 2, parent.shape[2], wrap_u)


def build_material_atlas_tri(
    mips: tuple,
    tex_ids,
    slots: tuple[int, ...],
    sampler: Sampler = Sampler(),
):
    """Single-gather trilinear material atlas: row (level, set, y, x) =
    [child 2x2 window (4C) | parent-level resample's 2x2 window (4C)], bf16.

    The 2-gather trilinear path (build_material_atlas) moves ~5 GB/frame at
    1080p (two 80-channel f32 gathers + relayout copies — measured in the
    compiled HLO); this layout fetches the whole trilinear footprint of ALL
    slots in ONE bf16 gather of C=sum(_SLOT_CHANNELS) packed channels.

    Deviations vs the exact path (documented, tested with tolerances):
    - texels quantize to bf16 (<=0.4% relative — under 1 LSB of the 8-bit
      source data);
    - the parent (hi-mip) term is the parent bilinear RESAMPLED on the child
      grid and re-interpolated: exact at child texel centers, elsewhere a
      <=quarter-texel smoothing of the parent term (weighted by frac < 1).

    Returns (atlas [R, 8C] bf16, offsets list, sizes list) — offsets/sizes
    are python sequences (static mip geometry).
    """
    import numpy as np

    tex_ids = np.asarray(tex_ids)
    levels = []
    for lvl_i in range(len(mips)):
        lvl = np.asarray(mips[lvl_i])  # [N,h,w,4]
        s_h, s_w = lvl.shape[1], lvl.shape[2]
        chans = []
        for slot in slots:
            ids = tex_ids[:, slot]
            pick = list(_SLOT_CHANNELS[slot])
            neutral = np.asarray(_NEUTRAL_SLOT[slot], np.float32)[pick]
            picked = np.where(
                (ids >= 0)[:, None, None, None],
                lvl[np.maximum(ids, 0)][..., pick],
                np.broadcast_to(neutral, (1, s_h, s_w, len(pick))),
            )
            chans.append(picked)
        levels.append(np.concatenate(chans, axis=-1))  # [M,h,w,C]

    c = levels[0].shape[-1]
    rows, offsets, sizes, off = [], [], [], 0
    for li, lvl in enumerate(levels):
        child = _array_window_flat(lvl, sampler.wrap_u, sampler.wrap_v)
        if li + 1 < len(levels):
            pup = _parent_resample(levels[li + 1], sampler.wrap_u, sampler.wrap_v)
            parent = _array_window_flat(pup, sampler.wrap_u, sampler.wrap_v)
        else:
            # coarsest level: frac is exactly 0 there, lanes never read
            parent = np.zeros_like(child)
        rows.append(np.concatenate([child, parent], axis=-1))
        offsets.append(off)
        sizes.append((lvl.shape[1], lvl.shape[2]))
        off += lvl.shape[0] * lvl.shape[1] * lvl.shape[2]
    atlas = jnp.asarray(np.concatenate(rows, axis=0).astype(np.float32), jnp.bfloat16)
    return atlas, offsets, sizes


def sample_material_atlas_tri(
    atlas: jnp.ndarray,
    offsets,
    sizes,
    n_levels: int,
    base_hw: tuple[int, int],
    c: int,
    mid: jnp.ndarray,
    uv: jnp.ndarray,
    sampler: Sampler = Sampler(),
    lod: jnp.ndarray | None = None,
    y_parity=0,
) -> jnp.ndarray:
    """Implicit-LOD trilinear fetch of all material slots in ONE gather from
    the build_material_atlas_tri layout. Returns [...,C] f32 (see
    _SLOT_CHANNELS for the packed channel order over the used slots).

    lod: optional precomputed per-pixel LOD (screen_space_lod needs the
    [H,W,2] uv image; flat-pixel callers compute it on the image form and
    pass it in alongside flattened uv/mid)."""
    t = jnp.maximum(mid, 0)
    if n_levels == 1:
        lo = jnp.zeros(uv.shape[:-1], jnp.int32)
        frac = jnp.zeros(uv.shape[:-1], jnp.float32)
    else:
        if lod is None:
            lod = screen_space_lod(uv, base_hw[0], base_hw[1], y_parity)
        lod = jnp.clip(lod, 0.0, n_levels - 1.0)
        lo = jnp.floor(lod).astype(jnp.int32)
        frac = lod - lo.astype(lod.dtype)
    # static mip geometry: per-level footprints unroll into selects
    m_sets = (
        _halving_offsets(offsets, sizes, n_levels)
        if _mip_plan_mode() == "arith"
        else None
    )
    if m_sets is not None:
        # arithmetic plan: level size by dynamic shift, offset by the
        # closed-form geometric sum — one pass, no per-level select chain
        # (bit-identical to the unrolled loop; tests assert)
        h0, w0 = int(sizes[0][0]), int(sizes[0][1])
        hw4 = 4 * h0 * w0
        hi_i = jnp.right_shift(jnp.int32(h0), lo)
        wi_i = jnp.right_shift(jnp.int32(w0), lo)
        off = m_sets * (
            (hw4 - jnp.right_shift(jnp.int32(hw4), 2 * lo)) // 3
        )
        x0w, y0w, fx, fy = _footprint_dyn(hi_i, wi_i, uv, sampler)
        idx = off + (t * hi_i + y0w) * wi_i + x0w
    else:
        idx = fx = fy = None
        for li, ((h, w), off) in enumerate(zip(sizes, offsets)):
            x0w, y0w, fx_l, fy_l = _window_footprint(int(h), int(w), uv, sampler)
            idx_l = off + (t * int(h) + y0w) * int(w) + x0w
            if idx is None:
                idx, fx, fy = idx_l, fx_l, fy_l
            else:
                sel = lo == li
                idx = jnp.where(sel, idx_l, idx)
                fx = jnp.where(sel[..., None], fx_l, fx)
                fy = jnp.where(sel[..., None], fy_l, fy)
    taps = _once_pre(atlas[idx], "mat")  # [..., 8C] bf16 — THE one gather
    mode = _blend_mode()
    if mode != "slice":
        # fold the child/parent lerp into the per-window weights: ONE
        # elementwise pass over all 8C lanes + one window->channel reduce
        # (vs 8 lane-offset slice relayouts + the FMA chains)
        taps_f = taps.astype(jnp.float32)
        lo = (1.0 - frac)[..., None]
        hi = frac[..., None]
        w00 = (1.0 - fx) * (1.0 - fy)
        w10 = fx * (1.0 - fy)
        w01 = (1.0 - fx) * fy
        w11 = fx * fy
        ws = [w00 * lo, w10 * lo, w01 * lo, w11 * lo,
              w00 * hi, w10 * hi, w01 * hi, w11 * hi]
        return _once_post(_weighted_lane_reduce(taps_f, ws, c, mode), "mat")
    f_lo = _blend_window(taps[..., : 4 * c].astype(jnp.float32), fx, fy, c)
    f_hi = _blend_window(taps[..., 4 * c :].astype(jnp.float32), fx, fy, c)
    return f_lo * (1.0 - frac[..., None]) + f_hi * frac[..., None]
