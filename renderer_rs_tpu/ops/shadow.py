"""Shadow mapping — ≙ shaders/hlsl/shadow.hlsli.

Single shadow map with:
- light-space projection + perspective divide (shadow.hlsli:57-61)
- NDC->UV with the Vulkan Y-flip (shadow.hlsli:63-67)
- out-of-bounds -> fully lit (shadow.hlsli:69-77)
- adaptive slope bias max(bias*(1-NdotL), 0.0005) (shadow.hlsli:84-86)
- normal-offset bias re-projection (shadow.hlsli:88-97)
- 3x3 PCF with hardware-comparison semantics (lit = stored >= current)
  (shadow.hlsli:100-123)
- shadow strength lerp(1, shadow, strength) (shadow.hlsli:125-128)
- hard (non-PCF) variant (shadow.hlsli:131-182)

The depth-only shadow render itself is ops/raster.rasterize_depth_only driven
by renderer/passes.py (≙ vertex/shadow.hlsl + empty pixel shader).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from renderer_rs_tpu.mathx.vec import dot


@dataclasses.dataclass(frozen=True)
class ShadowParams:
    """≙ ShadowParams cbuffer (shadow.hlsli): static configuration."""

    shadow_bias: float = 0.005
    normal_bias: float = 0.02
    shadow_strength: float = 1.0
    pcf: bool = True


def pcf_group(width: int) -> int:
    """x-texels packed per PCF window-table row (RENDERER_PCF_GROUP,
    default 32). r3 calibration: 2M-pixel gather cost is TABLE-SIZE-bound
    (1M-row tables ~11 ms, <=256k-row tables ~1.5 ms at any width), so
    grouping a 1024^2-class map under the row cliff is what makes the
    one-gather PCF fetch cheap. Frame-level sweep at 1080p/97k
    (probe_shade pcf_g*): g4 80.8, g16 56.9, g32 56.5, g64 60.1 — row
    count beats lane width down to 32k rows x 102 lanes; the 198-lane
    g64 rows cross the 128-lane register boundary and lose. 1 restores
    the flat map (width must divide by the group)."""
    import os

    group = int(os.environ.get("RENDERER_PCF_GROUP", "32"))
    return group if group > 1 and width % group == 0 else 1


def pcf_layout() -> str:
    """PCF window-table layout (RENDERER_PCF_LAYOUT): "group" packs n
    x-texels x the full 9-tap window per row (n*9 lanes); "halo" packs
    3 dy-planes x (n+2) x-texels-with-halo per row (3*(n+2) lanes — 30
    vs 72 at n=8), trading lane width for a 2-compare block select.
    Bit-identical tap sets (tests assert); A/B at frame level before
    flipping."""
    import os

    return os.environ.get("RENDERER_PCF_LAYOUT", "halo")


def build_halo_rows(shadow_map: jnp.ndarray, group: int) -> jnp.ndarray:
    """[h*(w/group), 3*(group+2)] PCF table: lane = dy*(group+2) + xh
    holds map[clamp(y+dy-1), clamp(group*k + xh - 1)] — every 3x3 tap of
    every pixel in group-row k appears exactly once (the x halo shares
    neighbor texels across the group instead of duplicating the 9-lane
    window per texel, shrinking the row 72 -> 30 lanes at group=8 and
    the table build 9 -> 3 shifted planes)."""
    h, w = shadow_map.shape[0], shadow_map.shape[1]
    padded = jnp.pad(shadow_map, 1, mode="edge")
    span = group + 2
    k = w // group
    planes = []
    for dy in range(3):
        plane = padded[dy : dy + h, :]
        # lanes 0..group-1 (xh < group) are exactly plane[:, 0:w] regrouped
        # by k — ONE reshape instead of `group` strided slices; the 2 halo
        # lanes (xh = group, group+1) stay strided slices. Same lane order
        # as the slice-per-lane form (dy-major, xh-minor; tests assert).
        main = plane[:, :w].reshape(h, k, group)
        halo0 = plane[:, group : group + (k - 1) * group + 1 : group]
        halo1 = plane[:, group + 1 : group + 1 + (k - 1) * group + 1 : group]
        planes.append(
            jnp.concatenate(
                [main, halo0[..., None], halo1[..., None]], axis=-1
            )
        )
    return jnp.concatenate(planes, axis=-1).reshape(h * k, 3 * span)


def halo_window_reduce(
    wide: jnp.ndarray, sub: jnp.ndarray, current: jnp.ndarray, group: int
) -> jnp.ndarray:
    """3x3 PCF mean from a halo row (build_halo_rows layout): compare all
    3*(group+2) lanes against `current`, select the pixel's 3-lane x-span
    per dy-plane ((lane % span) - sub in [0,3)), reduce once. Same
    full-lane mask-reduce shape as grouped_window_reduce (lane slices
    relayout; masks don't); sum of <=9 f32 ones is exact.

    `wide` may carry trailing pad lanes beyond 3*(group+2) (the merged-
    gather table pads rows to a shared width); the lane mask excludes
    them, so no pre-slice is needed."""
    span = group + 2
    lanes = wide.shape[-1]
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (wide.ndim - 1) + (lanes,), wide.ndim - 1
    )
    d = (lane % span) - sub[..., None]
    sel = (d >= 0) & (d < 3) & (lane < 3 * span)
    cmp = (wide >= current[..., None]) & sel
    return jnp.sum(cmp.astype(jnp.float32), axis=-1) * (1.0 / 9.0)


def grouped_window_reduce(
    wide: jnp.ndarray, sub: jnp.ndarray, current: jnp.ndarray, group: int
) -> jnp.ndarray:
    """3x3 PCF mean from a grouped window row: compare EVERY lane of the
    gathered [..., group*9] row against `current`, mask to the pixel's
    sub-row block [sub*9, sub*9+9), reduce once. The per-block lane slices
    this replaces (wide[..., k*9:(k+1)*9]) forced a Mosaic relayout per
    slice — the full-lane mask-reduce form measured ~4x faster at 1080p
    (r3 probe). Sum of <=9 f32 ones is exact, so this bit-matches
    taps-then-mean."""
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (wide.ndim - 1) + (group * 9,), wide.ndim - 1
    )
    sel = (lane // 9) == sub[..., None]
    cmp = (wide >= current[..., None]) & sel
    return jnp.sum(cmp.astype(jnp.float32), axis=-1) * (1.0 / 9.0)


def _project_to_shadow_uv(
    light_space_matrix: jnp.ndarray, world_pos: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """World -> light clip -> NDC -> Vulkan-flipped UV + depth.

    Returns (uv [...,2], depth [...]).
    """
    p = world_pos
    clip = (
        p @ light_space_matrix[:3, :3].T
        + light_space_matrix[:3, 3]
    )
    w = (
        jnp.sum(p * light_space_matrix[3, :3], axis=-1)
        + light_space_matrix[3, 3]
    )
    ndc = clip / jnp.maximum(jnp.abs(w), 1e-12)[..., None] * jnp.sign(w)[..., None]
    u = ndc[..., 0] * 0.5 + 0.5
    # NOTE: the reference flips v here (shadow.hlsli:67) because HLSL sampler
    # V runs opposite to the Vulkan framebuffer Y it rendered with. Our
    # software rasterizer writes shadow-map row = (ndc.y*0.5+0.5)*S, and our
    # sampler's v axis IS the row axis — so no flip: the two conventions
    # already agree. (A mirrored lookup here shadows the wrong half of the
    # scene; caught by the floor self-shadow drive.)
    v = ndc[..., 1] * 0.5 + 0.5
    return jnp.stack([u, v], axis=-1), ndc[..., 2]


def _compare_sample(
    shadow_map: jnp.ndarray, uv: jnp.ndarray, current_depth: jnp.ndarray
) -> jnp.ndarray:
    """SampleCmpLevelZero: nearest-texel depth compare; 1.0 = lit
    (stored >= current), 0.0 = in shadow."""
    h, w = shadow_map.shape[0], shadow_map.shape[1]
    ix = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    stored = shadow_map[iy, ix]
    return jnp.where(stored >= current_depth, 1.0, 0.0)


def shadow_window_plan(
    shadow_map: jnp.ndarray,
    light_space_matrix: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    light_dir: jnp.ndarray,
    params: ShadowParams = ShadowParams(),
) -> tuple:
    """The gather-side half of calculate_shadow's halo-PCF path: the halo
    window table plus per-pixel (row_id, sub, current, in_bounds). Lets the
    caller merge the window gather with OTHER per-pixel table gathers into
    one gather op (each distinct per-pixel gather pass costs ms at frame
    level — docs/tpu_cost_model.md), then finish with halo_window_reduce +
    shadow_finish. calculate_shadow composes exactly these pieces, so
    merged callers stay bit-identical. Requires pcf + group>1 + halo
    layout (the production default)."""
    h, w = shadow_map.shape[0], shadow_map.shape[1]
    group = pcf_group(w)
    assert params.pcf and group > 1 and pcf_layout() == "halo"
    uv0, z0 = _project_to_shadow_uv(light_space_matrix, world_pos)
    in_bounds = (
        (uv0[..., 0] >= 0.0)
        & (uv0[..., 0] <= 1.0)
        & (uv0[..., 1] >= 0.0)
        & (uv0[..., 1] <= 1.0)
        & (z0 >= 0.0)
        & (z0 <= 1.0)
    )
    ndotl = dot(normal, light_dir)[..., 0]
    bias = jnp.maximum(params.shadow_bias * (1.0 - ndotl), 0.0005)
    offset_pos = world_pos + normal * params.normal_bias
    uv, z = _project_to_shadow_uv(light_space_matrix, offset_pos)
    current = z - bias
    ix = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    flat = build_halo_rows(shadow_map, group)
    row_id = iy * (w // group) + ix // group
    sub = ix % group
    return flat, row_id, sub, current, in_bounds


def shadow_finish(
    shadow: jnp.ndarray, in_bounds: jnp.ndarray, params: ShadowParams
) -> jnp.ndarray:
    """Strength lerp + out-of-bounds fully-lit (shadow.hlsli:125-128)."""
    lit = 1.0 + (shadow - 1.0) * params.shadow_strength
    return jnp.where(in_bounds, lit, 1.0)


def upsample2x_bilinear(s: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear 2x upsample of a scalar field sampled at the even-pixel grid
    (s[i, j] is the value at full-res pixel (2i, 2j)); edge-clamped.

    Used by the RENDERER_PCF_RES=half shadow-term path: per-pixel gather
    cost is index-count-bound (docs/tpu_cost_model.md), so evaluating the
    PCF stack on the quarter grid and interpolating the scalar lit factor
    cuts its cost ~4x. Interleaving rides stack+reshape (minor-dim only —
    no lane->sublane reshape)."""
    # odd columns average x-neighbors (edge-clamped)
    right = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    rows = jnp.stack([s, 0.5 * (s + right)], axis=-1)
    rows = rows.reshape(s.shape[0], -1)[:, :width]  # [h, W]
    down = jnp.concatenate([rows[1:], rows[-1:]], axis=0)
    full = jnp.stack([rows, 0.5 * (rows + down)], axis=1)
    return full.reshape(-1, width)[:height]


def upsample4x_y(s: jnp.ndarray, height: int) -> jnp.ndarray:
    """Vertical-only 4x upsample of a scalar field sampled at every 4th
    row (s[i, :] is the value at full-res row 4i); edge-clamped linear in
    y. Same sublane-only striding rule as upsample2x_y (the
    RENDERER_PCF_RES=yquarter knob)."""
    down = jnp.concatenate([s[1:], s[-1:]], axis=0)
    full = jnp.stack(
        [
            s,
            s + 0.25 * (down - s),
            s + 0.5 * (down - s),
            s + 0.75 * (down - s),
        ],
        axis=1,
    )  # [h, 4, W]
    return full.reshape(-1, s.shape[1])[:height]


def upsample2x_y(s: jnp.ndarray, height: int) -> jnp.ndarray:
    """Vertical-only 2x upsample of a scalar field sampled at even rows
    (s[i, :] is the value at full-res row 2i); edge-clamped linear in y.

    The RENDERER_PCF_RES=yhalf shadow path: unlike the full half-res
    variant, the [::2] subsample strides only the SUBLANE axis (rows), so
    lanes stay 128-wide end to end — no lane relayout on either side of
    the halved-index gather. Interleave rides one [h,2,W]->[2h,W] sublane
    reshape."""
    down = jnp.concatenate([s[1:], s[-1:]], axis=0)
    full = jnp.stack([s, 0.5 * (s + down)], axis=1)  # [h, 2, W]
    return full.reshape(-1, s.shape[1])[:height]


def calculate_shadow(
    shadow_map: jnp.ndarray,
    light_space_matrix: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    light_dir: jnp.ndarray,
    params: ShadowParams = ShadowParams(),
) -> jnp.ndarray:
    """≙ CalculateShadow (shadow.hlsli:49-128). Returns [...] lit factor in
    [0,1] (1 = fully lit). light_dir points surface -> light."""
    # bounds check uses the UN-offset projection (shadow.hlsli:57-77)
    uv0, z0 = _project_to_shadow_uv(light_space_matrix, world_pos)
    in_bounds = (
        (uv0[..., 0] >= 0.0)
        & (uv0[..., 0] <= 1.0)
        & (uv0[..., 1] >= 0.0)
        & (uv0[..., 1] <= 1.0)
        & (z0 >= 0.0)
        & (z0 <= 1.0)
    )

    # adaptive slope bias (shadow.hlsli:84-86)
    ndotl = dot(normal, light_dir)[..., 0]
    bias = jnp.maximum(params.shadow_bias * (1.0 - ndotl), 0.0005)

    # normal-offset re-projection (shadow.hlsli:88-97)
    offset_pos = world_pos + normal * params.normal_bias
    uv, z = _project_to_shadow_uv(light_space_matrix, offset_pos)
    current = z - bias

    h, w = shadow_map.shape[0], shadow_map.shape[1]
    if params.pcf:
        # 3x3 PCF (shadow.hlsli:100-123). The taps at uv + (dx,dy)*texel land
        # on EXACTLY the 3x3 integer texel neighborhood (floor(u*S + d) ==
        # floor(u*S) + d for integer d), so instead of 9 separate gathers we
        # pre-shift the map into a 9-plane window (edge-clamped, matching the
        # per-tap clamp) and fetch all taps with ONE gather — bit-identical.
        # RENDERER_PCF_GROUP=n additionally packs n consecutive x-texels per
        # table row (n*9-lane rows) with an in-register sub-row select:
        # r3 calibration showed 2M-pixel gather cost is TABLE-SIZE-bound
        # (1M-row tables ~11 ms, <=256k-row tables ~1.5 ms at any width),
        # so grouping a 1024^2 map into 1024*(1024/8) rows takes the PCF
        # fetch off the gather cliff. Default 8; =1 restores the flat map.
        ix = jnp.clip(jnp.floor(uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.floor(uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        group = pcf_group(w)
        if group > 1 and pcf_layout() == "halo":
            flat, row_id, sub, current2, in_bounds2 = shadow_window_plan(
                shadow_map, light_space_matrix, world_pos, normal,
                light_dir, params,
            )
            wide = flat[row_id]  # [..., 3*(group+2)] — the one (wide) gather
            return shadow_finish(
                halo_window_reduce(wide, sub, current2, group),
                in_bounds2, params,
            )
        elif group > 1:
            padded = jnp.pad(shadow_map, 1, mode="edge")
            window = jnp.stack(
                [
                    padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ],
                axis=-1,
            )  # [H,W,9]
            rows = window.reshape(h, w // group, group * 9)
            flat = rows.reshape(h * (w // group), group * 9)
            row_id = iy * (w // group) + ix // group
            sub = ix % group
            wide = flat[row_id]  # [..., group*9] — the one (wide) gather
            # single consumer of the gather -> no optimization barrier needed
            shadow = grouped_window_reduce(wide, sub, current, group)
        else:
            padded = jnp.pad(shadow_map, 1, mode="edge")
            window = jnp.stack(
                [
                    padded[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ],
                axis=-1,
            )  # [H,W,9]
            taps = window[iy, ix]  # [...,9]
            shadow = jnp.mean(
                jnp.where(taps >= current[..., None], 1.0, 0.0), axis=-1
            )
    else:
        # hard variant (shadow.hlsli:131-182)
        shadow = _compare_sample(shadow_map, uv, current)

    # strength lerp (shadow.hlsli:125-128); out-of-bounds fully lit
    lit = 1.0 + (shadow - 1.0) * params.shadow_strength
    return jnp.where(in_bounds, lit, 1.0)


def directional_light_matrix(
    direction: jnp.ndarray,
    scene_center: jnp.ndarray,
    scene_radius: float,
) -> jnp.ndarray:
    """Build the sun's light-space view-projection: orthographic box fitted
    around the scene bounds, looking along `direction` (the standard setup the
    shadow pass needs; reference computes it host-side for vertex/shadow.hlsl).
    """
    from renderer_rs_tpu.mathx import look_at_rh, orthographic_rh
    from renderer_rs_tpu.mathx.mat4 import vulkan_y_flip

    d = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
    eye = scene_center - d * (2.0 * scene_radius)
    up = jnp.where(
        jnp.abs(d[1]) > 0.99,
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
    )
    view = look_at_rh(eye, scene_center, up)
    r = scene_radius
    proj = vulkan_y_flip(orthographic_rh(-r, r, -r, r, 0.1, 4.0 * r))
    return proj @ view
