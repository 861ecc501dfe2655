"""Cascaded shadow maps — ≙ shaders/hlsl/shadow_csm.hlsli (4 cascades).

Vectorized port with the exact reference semantics:
- CASCADE_COUNT = 4 (shadow_csm.hlsli:19)
- cascade select: compare clip-space depth against split depths, nearest
  cascade whose split exceeds the depth (SelectCascade, shadow_csm.hlsli:56-72)
- per-cascade PCF 3x3 over a [N,S,S] shadow-map array with normal-offset +
  adaptive slope bias (SampleCascadePCF, shadow_csm.hlsli:94-145)
- blended variant lerping with the next cascade inside a split-relative
  blend region (CalculateShadowCSMBlended, shadow_csm.hlsli:216-288)
- debug cascade colors R/G/B/Y (GetCascadeDebugColor, shadow_csm.hlsli:291-303)

Plus the host-side cascade *fitting* the reference leaves to its (absent)
C++ side: view-frustum splits via the standard practical split scheme and
per-cascade orthographic light boxes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from renderer_rs_tpu.mathx.vec import dot
from renderer_rs_tpu.ops.shadow import grouped_window_reduce, pcf_group

CASCADE_COUNT = 4  # ≙ shadow_csm.hlsli:19


@dataclasses.dataclass(frozen=True)
class CSMParams:
    """Static CSM configuration (≙ the CSMParams cbuffer scalars)."""

    shadow_bias: float = 0.005
    normal_bias: float = 0.02
    blend_threshold: float = 0.1
    pcf: bool = True


def select_cascade(split_depths: jnp.ndarray, clip_depth: jnp.ndarray) -> jnp.ndarray:
    """≙ SelectCascade (shadow_csm.hlsli:56-72): split_depths [C], returns
    [...] int32 cascade index (depth > split_i promotes to i+1)."""
    idx = jnp.zeros(clip_depth.shape, jnp.int32)
    for i in range(CASCADE_COUNT - 1):
        idx = jnp.where(clip_depth > split_depths[i], i + 1, idx)
    return idx


def _cascade_pcf_window(shadow_maps: jnp.ndarray) -> jnp.ndarray:
    """Pre-shift the [C,S,S] cascade array into a flat edge-clamped 3x3
    window table so a pixel's full PCF footprint is ONE row gather (the
    trick proven on the single-map path, ops/shadow.py:108-126;
    bit-identical because floor(u*S + d) == floor(u*S) + d for integer d).
    Rows pack `group` consecutive x-texels ([C*S*S/g, g*9]) to stay under
    the gather cliff; the fetch masks the sub-row block."""
    c, s, _ = shadow_maps.shape
    padded = jnp.pad(shadow_maps, ((0, 0), (1, 1), (1, 1)), mode="edge")
    window = jnp.stack(
        [
            padded[:, 1 + dy : 1 + dy + s, 1 + dx : 1 + dx + s]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        axis=-1,
    )  # [C,S,S,9]
    g = pcf_group(s)
    return window.reshape(c * s * (s // g), g * 9)


def sample_cascade_pcf(
    shadow_maps: jnp.ndarray,
    light_matrix: jnp.ndarray,
    cascade_index: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    light_dir: jnp.ndarray,
    params: CSMParams,
    pcf_window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """≙ SampleCascadePCF (shadow_csm.hlsli:94-145).

    shadow_maps: [C,S,S]; light_matrix: [...,4,4] (already gathered per
    pixel); cascade_index: [...] int32. Returns lit factor [...] in [0,1].
    pcf_window: optional precomputed _cascade_pcf_window table (callers
    sampling twice — the blended variant — build it once).
    """
    s = shadow_maps.shape[1]
    offset_pos = world_pos + normal * params.normal_bias
    # per-pixel matrix application (matrices gathered per pixel)
    p = offset_pos
    clip = jnp.einsum("...ij,...j->...i", light_matrix[..., :3, :3], p) + light_matrix[..., :3, 3]
    w = jnp.einsum("...j,...j->...", light_matrix[..., 3, :3], p) + light_matrix[..., 3, 3]
    ndc = clip / jnp.where(w == 0.0, 1.0, w)[..., None]
    u = ndc[..., 0] * 0.5 + 0.5
    # no Y-flip: sampler v == framebuffer row in this renderer (see shadow.py)
    v = ndc[..., 1] * 0.5 + 0.5
    z = ndc[..., 2]
    return _sample_pcf_uvz(
        shadow_maps, u, v, z, cascade_index, normal, light_dir, params,
        pcf_window,
    )


def project_cascades(
    cascade_matrices: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    normal_bias: float,
) -> tuple:
    """Project offset world positions through ALL cascades at once.

    cascade_matrices [C,4,4] are scene CONSTANTS: broadcasting them over
    the pixels costs pure VPU FLOPs (C small matmuls), while gathering
    `cascade_matrices[idx]` per pixel — the naive ≙ of the HLSL's
    dynamically-indexed cbuffer read — is a 16-lane-per-pixel gather
    (x2 for the blended variant), one of the two reasons the r5 bench's
    first csm_fps measured 4.2 FPS. Returns (u, v, z), each [C, ...];
    select with `select_by_cascade`."""
    p = world_pos + normal * normal_bias
    m = cascade_matrices
    lead = (CASCADE_COUNT,) + (1,) * (p.ndim - 1)
    clip = jnp.einsum("cij,...j->c...i", m[:, :3, :3], p) + m[:, :3, 3].reshape(
        lead + (3,)
    )
    w = jnp.einsum("cj,...j->c...", m[:, 3, :3], p) + m[:, 3, 3].reshape(lead)
    ndc = clip / jnp.where(w == 0.0, 1.0, w)[..., None]
    u = ndc[..., 0] * 0.5 + 0.5
    v = ndc[..., 1] * 0.5 + 0.5
    z = ndc[..., 2]
    return u, v, z


def select_by_cascade(arr_c: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr_c [C, ...] -> [...] picked per pixel by idx — C-1 selects, no
    gather (C is a static 4)."""
    out = arr_c[0]
    for c in range(1, CASCADE_COUNT):
        out = jnp.where(idx == c, arr_c[c], out)
    return out


def _sample_pcf_uvz(
    shadow_maps, u, v, z, cascade_index, normal, light_dir, params,
    pcf_window=None,
):
    """The post-projection half of SampleCascadePCF: bounds, slope bias,
    and the one-wide-row-gather 3x3 PCF (shadow_csm.hlsli:107-145)."""
    s = shadow_maps.shape[1]
    in_bounds = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (z >= 0.0) & (z <= 1.0)

    ndotl = dot(normal, light_dir)[..., 0]
    bias = jnp.maximum(params.shadow_bias * (1.0 - ndotl), 0.0005)
    current = z - bias

    ix = jnp.clip(jnp.floor(u * s).astype(jnp.int32), 0, s - 1)
    iy = jnp.clip(jnp.floor(v * s).astype(jnp.int32), 0, s - 1)
    if params.pcf:
        # all 9 taps in ONE row gather from the pre-shifted window table
        # (edge-clamped per cascade; the per-tap offsets land on the integer
        # 3x3 neighborhood, so the window row IS the PCF footprint — same
        # math as the reference's 9 SampleCmp taps, shadow_csm.hlsli:122-138)
        window = pcf_window if pcf_window is not None else _cascade_pcf_window(shadow_maps)
        g = pcf_group(s)
        rows = (cascade_index * s + iy) * (s // g) + ix // g
        wide = window[rows]  # [..., g*9] — the one (wide) gather
        if g > 1:
            shadow = grouped_window_reduce(wide, ix % g, current, g)
        else:
            shadow = jnp.mean(
                jnp.where(wide >= current[..., None], 1.0, 0.0), axis=-1
            )
    else:
        stored = shadow_maps[cascade_index, iy, ix]
        shadow = jnp.where(stored >= current, 1.0, 0.0)
    return jnp.where(in_bounds, shadow, 1.0)


def calculate_shadow_csm(
    shadow_maps: jnp.ndarray,
    cascade_matrices: jnp.ndarray,
    split_depths: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    light_dir: jnp.ndarray,
    clip_depth: jnp.ndarray,
    params: CSMParams = CSMParams(),
) -> jnp.ndarray:
    """≙ CalculateShadowCSM (shadow_csm.hlsli:163-194).

    shadow_maps [C,S,S], cascade_matrices [C,4,4], split_depths [C],
    clip_depth [...] = the fragment's own NDC z (SV_Position.z analog).
    """
    idx = select_cascade(split_depths, clip_depth)
    uc, vc, zc = project_cascades(
        cascade_matrices, world_pos, normal, params.normal_bias
    )
    return _sample_pcf_uvz(
        shadow_maps,
        select_by_cascade(uc, idx), select_by_cascade(vc, idx),
        select_by_cascade(zc, idx), idx, normal, light_dir, params,
    )


def calculate_shadow_csm_blended(
    shadow_maps: jnp.ndarray,
    cascade_matrices: jnp.ndarray,
    split_depths: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    light_dir: jnp.ndarray,
    clip_depth: jnp.ndarray,
    params: CSMParams = CSMParams(),
) -> jnp.ndarray:
    """≙ CalculateShadowCSMBlended (shadow_csm.hlsli:216-288): lerp with the
    next cascade inside blend_threshold of the split boundary."""
    idx = select_cascade(split_depths, clip_depth)
    # the window table is built ONCE for both cascade samples (2 row
    # gathers total instead of 18 pointwise gathers)
    window = _cascade_pcf_window(shadow_maps) if params.pcf else None
    # project through ALL cascades once, then pick per pixel — kills the
    # two per-pixel [4,4] matrix gathers (r5 csm_fps fix; bit-equal
    # selection: the picked cascade's projection is the same math)
    uc, vc, zc = project_cascades(
        cascade_matrices, world_pos, normal, params.normal_bias
    )
    shadow = _sample_pcf_uvz(
        shadow_maps,
        select_by_cascade(uc, idx), select_by_cascade(vc, idx),
        select_by_cascade(zc, idx), idx, normal, light_dir, params,
        pcf_window=window,
    )
    next_idx = jnp.minimum(idx + 1, CASCADE_COUNT - 1)
    next_shadow = _sample_pcf_uvz(
        shadow_maps,
        select_by_cascade(uc, next_idx), select_by_cascade(vc, next_idx),
        select_by_cascade(zc, next_idx), next_idx, normal, light_dir, params,
        pcf_window=window,
    )
    split = split_depths[idx]
    prev_split = jnp.where(idx > 0, split_depths[jnp.maximum(idx - 1, 0)], 0.0)
    blend_region = (split - prev_split) * params.blend_threshold
    dist = split - clip_depth
    blend = jnp.clip(dist / jnp.maximum(blend_region, 1e-8), 0.0, 1.0)
    do_blend = (idx < CASCADE_COUNT - 1) & (dist < blend_region) & (dist > 0.0)
    blended = next_shadow + (shadow - next_shadow) * blend  # lerp(next, cur, f)
    return jnp.where(do_blend, blended, shadow)


def cascade_debug_color(split_depths: jnp.ndarray, clip_depth: jnp.ndarray) -> jnp.ndarray:
    """≙ GetCascadeDebugColor (shadow_csm.hlsli:291-303)."""
    colors = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0], [1.0, 1.0, 0.0]],
        jnp.float32,
    )
    return colors[select_cascade(split_depths, clip_depth)]


# --- host-side cascade fitting (the C++ side the reference hasn't built) ------

def practical_split_depths(
    near: float, far: float, count: int = CASCADE_COUNT, lam: float = 0.75
) -> np.ndarray:
    """Practical split scheme (Zhang et al., the paper shadow_csm.hlsli cites):
    lerp of logarithmic and uniform splits; returned as view-space distances."""
    splits = []
    for i in range(1, count + 1):
        f = i / count
        log_d = near * (far / near) ** f
        uni_d = near + (far - near) * f
        splits.append(lam * log_d + (1 - lam) * uni_d)
    return np.asarray(splits, np.float32)


def fit_cascades(
    camera,
    sun_direction,
    count: int = CASCADE_COUNT,
    lam: float = 0.75,
    caster_margin: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit per-cascade ortho light boxes around camera-frustum slices.

    Returns (cascade_matrices [C,4,4], split_depths_ndc [C]) where split
    depths are converted to the camera's NDC z (what SV_Position.z holds,
    which SelectCascade compares against).

    caster_margin extends the light-space near side by a world-space
    distance so casters OUTSIDE the frustum slice (a tower above a near
    slice, terrain toward the sun) still land in the cascade's depth render
    — the standard near-plane extension that stands in for depth pancaking.
    Defaults to the camera's far distance, which bounds any caster the
    camera could also see; pass the scene radius for tighter fits.
    """
    from renderer_rs_tpu.mathx import look_at_rh, orthographic_rh
    from renderer_rs_tpu.mathx.mat4 import vulkan_y_flip

    proj = camera.projection
    near, far = proj.near, proj.far
    splits_view = practical_split_depths(near, far, count, lam)

    inv_vp = np.linalg.inv(np.asarray(camera.view_projection_matrix()))
    sun = np.asarray(sun_direction, np.float32)
    sun = sun / max(np.linalg.norm(sun), 1e-12)

    vp = np.asarray(camera.view_projection_matrix())
    mats, splits_ndc = [], []
    prev = near
    for i in range(count):
        d0, d1 = prev, float(splits_view[i])
        prev = d1
        # frustum-slice corners in NDC -> world
        corners = []
        for z_view in (d0, d1):
            # NDC depth of this view distance under the camera projection
            p = np.asarray(camera.projection_matrix()) @ np.array(
                [0, 0, -z_view, 1], np.float32
            )
            z_ndc = p[2] / p[3]
            for x in (-1, 1):
                for y in (-1, 1):
                    h = inv_vp @ np.array([x, y, z_ndc, 1.0], np.float32)
                    corners.append(h[:3] / h[3])
        corners = np.asarray(corners)
        center = corners.mean(axis=0)
        radius = float(np.max(np.linalg.norm(corners - center, axis=-1)))

        up = np.array([0, 0, 1], np.float32) if abs(sun[1]) > 0.99 else np.array(
            [0, 1, 0], np.float32
        )
        margin = float(far) if caster_margin is None else float(caster_margin)
        view = np.asarray(
            look_at_rh(center - sun * (2.0 * radius + margin), center, up)
        )
        ortho = np.asarray(
            vulkan_y_flip(
                orthographic_rh(
                    -radius, radius, -radius, radius, 0.1,
                    4.0 * radius + margin,
                )
            )
        )
        mats.append(ortho @ view)
        # split depth in camera NDC z for SelectCascade
        p = np.asarray(camera.projection_matrix()) @ np.array([0, 0, -d1, 1], np.float32)
        splits_ndc.append(float(p[2] / p[3]))

    return np.stack(mats).astype(np.float32), np.asarray(splits_ndc, np.float32)
