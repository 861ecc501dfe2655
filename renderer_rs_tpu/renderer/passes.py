"""Render passes: the reference's shader pipeline as fused array passes.

Pass order follows the reference shader progression (SURVEY.md §7 step 6):
vertex MVP+TBN (vertex/model.hlsl) -> rasterize -> fragment shading
(pixel/triangle | model_full Blinn-Phong | model_pbr | model_pbr_ibl) with
sun shadow (shadow.hlsli PCF) -> skybox composite -> tonemap.

Everything here is traced into ONE XLA program per (layout, pipeline,
shading, resolution) — passes "compose" by fusion, with no host round-trips
between them (the reference needs pipeline barriers; XLA dataflow replaces
them, SURVEY.md §2.9).
"""

from __future__ import annotations

import enum
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from renderer_rs_tpu.mathx.vec import normalize
from renderer_rs_tpu.ops import blinn_phong as bp
from renderer_rs_tpu.ops import pbr as pbr_ops
from renderer_rs_tpu.ops.raster import (
    VisibilityBuffer,
    gather_triangle_clip,
    interpolate,
    perspective_bary,
    rasterize,
    rasterize_depth_only,
    rasterize_ordered,
    setup_triangles,
)
from renderer_rs_tpu.ops.raster_binned import (
    rasterize_binned,
    rasterize_depth_only_binned,
    supports_binned,
)
from renderer_rs_tpu.ops.shadow import ShadowParams, calculate_shadow
from renderer_rs_tpu.ops.skybox import skybox_pass
from renderer_rs_tpu.ops.tonemap import apply_tonemap
from renderer_rs_tpu.rhi.pipeline import (
    ColorBlendAttachment,
    GraphicsPipeline,
    GraphicsPipelineBuilder,
)
from renderer_rs_tpu.renderer.scene_build import GpuScene, SceneLayout


def _material_bank(mats) -> jnp.ndarray:
    """[M,11] packed material parameters (order consumed by _shade_pixels)."""
    return jnp.concatenate(
        [
            mats.base_color,  # 0:4
            mats.metallic[:, None],  # 4
            mats.roughness[:, None],  # 5
            mats.ao[:, None],  # 6
            mats.emissive[:, :3],  # 7:10
            mats.normal_scale[:, None],  # 10
        ],
        axis=-1,
    )


class ShadingModel(enum.Enum):
    """Which fragment shader family the frame uses (static jit key)."""

    FLAT = "flat"  # pixel/triangle.hlsl: interpolated vertex color
    BLINN_PHONG = "blinn_phong"  # pixel/model_full.hlsl
    PBR = "pbr"  # pixel/model_pbr.hlsl (hemisphere ambient)
    PBR_IBL = "pbr_ibl"  # pixel/model_pbr_ibl.hlsl (split-sum IBL ambient)


@struct.dataclass
class VertexStageOut:
    """Per-vertex outputs of the vertex stage (≙ VSOutput, vertex/model.hlsl)."""

    clip: Any  # [V,4]
    world_pos: Any  # [V,3]
    world_normal: Any  # [V,3]
    world_tangent: Any  # [V,4] (xyz transformed, w passthrough)


def _vstage_batch() -> bool:
    """RENDERER_VSTAGE=batch folds the whole draw loop into 3 MXU matmuls
    against per-object column blocks + an iota-select block pick. Measured
    frame-NEUTRAL on TPU (61.6 vs 61.57 ms at 1080p/97k/10 objects — the
    isolated vstage probe's 2.2 ms of small-op dispatches vanishes inside
    the full frame's schedule), and the wide matmul rounds ~1 ulp apart
    from the per-object form on tiny objects — so the exact loop stays
    the default."""
    import os

    return os.environ.get("RENDERER_VSTAGE", "loop") == "batch"


def _object_ids(layout: SceneLayout) -> "np.ndarray":
    """Per-vertex object index [V] — a trace-time constant of the static
    layout."""
    import numpy as np

    return np.concatenate(
        [
            np.full(nv, o, np.int32)
            for o, (v0, nv, _, _) in enumerate(layout.object_ranges)
        ]
    )


def _block_select(wide: jnp.ndarray, obj: jnp.ndarray, n_obj: int, block: int):
    """Pick each vertex's object block out of [V, n_obj*block]: reshape to
    [V, n_obj, block] + masked sum over the object axis (one nonzero term
    -> exact, adding 0.0 preserves bits)."""
    resh = wide.reshape(wide.shape[0], n_obj, block)
    sel = obj[:, None] == jnp.arange(n_obj, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(sel[..., None], resh, 0.0), axis=1)


def vertex_stage(scene: GpuScene, layout: SceneLayout) -> VertexStageOut:
    """Batched MVP + normal/tangent transform (≙ vertex/model.hlsl:36-68).

    Default: ONE [V,4] @ [4, 8*O] MXU matmul against per-object column
    blocks [model.T | (vp@model).T] + a block select, and likewise for
    normals/tangents against the 3x3 blocks — the same per-column dot
    products as the per-object loop, so results are bit-identical
    (RENDERER_VSTAGE=loop restores the unrolled draw loop). Tangent is
    transformed by the model matrix and Gram-Schmidt re-orthogonalized
    (model.hlsl:49-52).
    """
    vp = scene.camera.view_projection
    n_obj = len(layout.object_ranges)
    if _vstage_batch() and n_obj > 1:
        obj = jnp.asarray(_object_ids(layout))
        homo = jnp.concatenate(
            [scene.positions, jnp.ones_like(scene.positions[:, :1])], axis=-1
        )
        # [4, O*4] model.T column blocks; clip stays world4 @ vp.T (vp is
        # object-independent) so both products match the loop form exactly
        cols = scene.models.transpose(2, 0, 1).reshape(4, n_obj * 4)
        wide = jnp.matmul(
            homo, cols, precision=jax.lax.Precision.HIGHEST
        )  # [V, O*4]
        world4 = _block_select(wide, obj, n_obj, 4)
        clip = jnp.matmul(
            world4, vp.T, precision=jax.lax.Precision.HIGHEST
        )
        world = world4[:, :3]
        ncols = (
            scene.normal_mats[:, :3, :3].transpose(2, 0, 1).reshape(3, n_obj * 3)
        )
        n = normalize(
            _block_select(
                jnp.matmul(
                    scene.normals, ncols, precision=jax.lax.Precision.HIGHEST
                ),
                obj, n_obj, 3,
            )
        )
        tcols = scene.models[:, :3, :3].transpose(2, 0, 1).reshape(3, n_obj * 3)
        t_xyz = _block_select(
            jnp.matmul(
                scene.tangents[:, :3], tcols,
                precision=jax.lax.Precision.HIGHEST,
            ),
            obj, n_obj, 3,
        )
        t_xyz = normalize(t_xyz - n * jnp.sum(t_xyz * n, axis=-1, keepdims=True))
        return VertexStageOut(
            clip=clip,
            world_pos=world,
            world_normal=n,
            world_tangent=jnp.concatenate(
                [t_xyz, scene.tangents[:, 3:4]], axis=-1
            ),
        )
    clips, worlds, normals, tangents = [], [], [], []
    for o, (v0, nv, _, _) in enumerate(layout.object_ranges):
        pos = scene.positions[v0 : v0 + nv]
        nrm = scene.normals[v0 : v0 + nv]
        tan = scene.tangents[v0 : v0 + nv]
        model = scene.models[o]
        nmat = scene.normal_mats[o]
        homo = jnp.concatenate([pos, jnp.ones((nv, 1), pos.dtype)], axis=-1)
        world4 = homo @ model.T  # [Nv,4]
        world = world4[:, :3]
        clip = world4 @ vp.T  # viewProjection * world (model.hlsl:41-45)
        n = normalize(nrm @ nmat[:3, :3].T)  # normalMatrix3x3 (model.hlsl:48)
        t_xyz = tan[:, :3] @ model[:3, :3].T  # model3x3 * tangent (model.hlsl:49)
        # Gram-Schmidt re-orthogonalize (model.hlsl:50-52)
        t_xyz = normalize(t_xyz - n * jnp.sum(t_xyz * n, axis=-1, keepdims=True))
        clips.append(clip)
        worlds.append(world)
        normals.append(n)
        tangents.append(jnp.concatenate([t_xyz, tan[:, 3:4]], axis=-1))
    return VertexStageOut(
        clip=jnp.concatenate(clips),
        world_pos=jnp.concatenate(worlds),
        world_normal=jnp.concatenate(normals),
        world_tangent=jnp.concatenate(tangents),
    )


def shadow_vertex_stage(
    scene: GpuScene, layout: SceneLayout, light_matrix=None,
    world_pos: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Light-space positions (≙ vertex/shadow.hlsl:22-33:
    lightSpaceMatrix * model * pos).

    world_pos: optional [V,3] world positions from the forward vertex stage.
    When given, the projection is ONE [V,4] @ lsm.T matmul reusing them —
    the associativity the reference shader itself uses
    (vertex/shadow.hlsl:22-33 computes mul(lightSpaceMatrix,
    mul(model, pos)), i.e. world-then-light), vs the (lsm@model)@pos
    pre-compose of the loop below (~1 ulp apart). The model's affine last
    row makes world w exactly 1.0, so [world_pos, 1] IS the world vector.
    """
    lsm = light_matrix if light_matrix is not None else scene.light_space_matrix
    if world_pos is not None:
        homo = jnp.concatenate(
            [world_pos, jnp.ones_like(world_pos[:, :1])], axis=-1
        )
        return jnp.matmul(homo, lsm.T, precision=jax.lax.Precision.HIGHEST)
    n_obj = len(layout.object_ranges)
    if _vstage_batch() and n_obj > 1:
        # one [V,4] @ [4, O*4] matmul against (lsm@model).T column blocks +
        # block select — same dots as the per-object loop (bit-identical)
        obj = jnp.asarray(_object_ids(layout))
        homo = jnp.concatenate(
            [scene.positions, jnp.ones_like(scene.positions[:, :1])], axis=-1
        )
        # per-object [4,4] matmuls (tiny) rather than one batched einsum:
        # the batched contraction rounds differently at ~1 ulp, and the
        # shadow map must stay bit-identical to the loop form
        ms = jnp.stack(
            [lsm @ scene.models[o] for o in range(n_obj)]
        )  # [O,4,4] = lsm @ model per object
        cols = ms.transpose(2, 0, 1).reshape(4, n_obj * 4)
        wide = jnp.matmul(homo, cols, precision=jax.lax.Precision.HIGHEST)
        return _block_select(wide, obj, n_obj, 4)
    clips = []
    for o, (v0, nv, _, _) in enumerate(layout.object_ranges):
        pos = scene.positions[v0 : v0 + nv]
        m = lsm @ scene.models[o]
        homo = jnp.concatenate([pos, jnp.ones((nv, 1), pos.dtype)], axis=-1)
        clips.append(homo @ m.T)
    return jnp.concatenate(clips)


_SHADOW_PIPELINE = (
    GraphicsPipelineBuilder().build()  # depth LESS, cull back — standard shadow raster
)


def _binned_cap(
    num_triangles: int, height: int, width: int, tile_h: int = 32,
    tile_w: int = 128, skew: int = 6,
) -> int:
    """Density-aware per-bin triangle budget.

    cap ≈ 6x the average triangles-per-bin (floor/alignment scaled to the
    bin area, ceiling 16384) — covers the skewed tiles of the 100k-class
    flagship scene (peak ~1.3k vs avg ~380 per 32x128 tile at 1080p) and
    keeps low-res/dense cases (few bins, thousands of triangles each)
    un-truncated. For the Pallas two-level path pass tile_h=16: the same
    formula then budgets the [16,128] sub-bins (floor 768). Memory/gather
    traffic is n_bins*cap ≈ 6T regardless of resolution. Bins denser than
    the cap keep the first `cap` triangles in submission order
    (raster_binned.py); bench.py reports the truncation count."""
    n_tiles = max(1, -(-height // tile_h) * -(-width // tile_w))
    avg = num_triangles / n_tiles
    floor = max(256, 1536 * (tile_h * tile_w) // 4096)
    align = 512 if tile_h >= 32 else 128
    cap = max(floor, int(skew * avg))
    cap = -(-cap // align) * align
    return min(max(num_triangles, 16), cap, 16384)


def _use_pallas() -> bool:
    """Pallas raster path only on real TPUs (interpret mode elsewhere is
    slower than the XLA fallback, which is also the exactness oracle)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def _rasterize_dispatch(setup, height, width, pipeline, num_triangles,
                        depth_init=None, small_limit=None, skip_bary=False,
                        ids=None):
    """Pick the raster backend: the Pallas per-tile-count kernel on TPU, the
    XLA binned path elsewhere, the exact sequential scan for small scenes /
    blending / exotic compare ops.

    skip_bary: ids/depth-only consumers (the resolve-mode MSAA sample
    pass) skip the kernel's per-candidate barycentric reductions — the
    cheapest id-producing kernel mode. ids: optional [T] source-id
    payload the Pallas kernel writes directly (skips the per-pixel
    slot->source remap gather; only honored on the Pallas backend —
    check the return flag)."""
    if supports_binned(pipeline, num_triangles):
        if _use_pallas():
            from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas

            return rasterize_binned_pallas(
                setup, height, width, pipeline, depth_init=depth_init,
                small_limit=small_limit, skip_bary=skip_bary, ids=ids,
            ), ids is not None
        cap = _binned_cap(num_triangles, height, width)
        return rasterize_binned(
            setup, height, width, pipeline, cap=cap, depth_init=depth_init,
            small_limit=small_limit,
        ), False
    return rasterize(setup, height, width, pipeline, depth_init=depth_init), False


def _shadow_kernel_knobs() -> dict:
    """Depth-only raster knobs, env-overridable for probe-time tuning
    (RENDERER_SHADOW_TILE_H / _SUB_H / _CHUNK — no code edit between
    probe_shadow runs; light-space candidate distributions differ enough
    from screen space that the forward defaults may not be optimal).
    Default chunk=32: the shadow candidate lists are shorter than the
    forward pass's (97k tris -> ~62k (bin,tri) pairs at 1024^2), and the
    r3 probe_shadow sweep measured chunk32 at 10.8 ms cumulative vs 11.5
    for the forward default chunk=64."""
    import os

    out = {"chunk": 32}
    for env, kw in (
        ("RENDERER_SHADOW_TILE_H", "tile_h"),
        ("RENDERER_SHADOW_SUB_H", "sub_h"),
        ("RENDERER_SHADOW_CHUNK", "chunk"),
    ):
        v = os.environ.get(env)
        if v:
            out[kw] = int(v)
    return out


def _shadow_setup(clip, tris, size):
    """Triangle setup for a depth-only pass; plane form when enabled
    (RENDERER_TRI_PLANES=1 for both passes, =shadow for this pass only —
    no [T,3,4] gather/reshape chain; the full-frame variant measured a
    13 ms LOSS, the shadow pass has no clip stage so its plane form may
    behave differently)."""
    import os as _os_sp

    if _os_sp.environ.get("RENDERER_TRI_PLANES", "shadow") in ("1", "shadow"):
        from renderer_rs_tpu.ops.raster import (
            gather_triangle_planes,
            setup_triangles_planes,
        )

        return setup_triangles_planes(
            gather_triangle_planes(clip, tris), size, size, _SHADOW_PIPELINE
        )
    return setup_triangles(
        gather_triangle_clip(clip, tris), size, size, _SHADOW_PIPELINE
    )


def shadow_map_pass(
    scene: GpuScene, layout: SceneLayout, size: int, light_matrix=None,
    world_pos=None,
) -> jnp.ndarray:
    """Depth-only sun shadow render (≙ the shadow pass, depth-only pipeline)."""
    clip = shadow_vertex_stage(scene, layout, light_matrix, world_pos=world_pos)
    setup = _shadow_setup(clip, scene.tris, size)
    if supports_binned(_SHADOW_PIPELINE, layout.num_triangles):
        if _use_pallas():
            from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas

            return rasterize_binned_pallas(
                setup, size, size, _SHADOW_PIPELINE, depth_only=True,
                **_shadow_kernel_knobs(),
            )
        cap = _binned_cap(layout.num_triangles, size, size)
        return rasterize_depth_only_binned(setup, size, size, _SHADOW_PIPELINE, cap=cap)
    return rasterize_depth_only(setup, size, size, _SHADOW_PIPELINE)


def csm_shadow_pass(
    scene: GpuScene, layout: SceneLayout, size: int, world_pos=None
) -> jnp.ndarray:
    """Render the 4-cascade shadow array [C,S,S] (≙ the Texture2DArray the
    CSM shader samples, shadow_csm.hlsli:94-166).

    The cascades render as four sequential depth passes stacked (the
    reference's own submission shape). A single-launch BATCHED kernel
    (grid of 4*n_tiles steps) exists behind RENDERER_CSM_BATCH=1 —
    bit-identical (tests assert) but measured 2.1x SLOWER under the
    2026-08-20 compiler (103.9 vs 48.8 ms at 1024^2/97k; sub-linear
    scaling of the sequential form: 4 cascades cost 3.4x one), so it
    stays an A/B knob for compiler-shift recovery."""
    from renderer_rs_tpu.ops.csm import CASCADE_COUNT

    import os as _os_cb

    if (
        _os_cb.environ.get("RENDERER_CSM_BATCH", "0") == "1"
        and _use_pallas()
        and supports_binned(_SHADOW_PIPELINE, layout.num_triangles)
    ):
        from renderer_rs_tpu.ops.raster_pallas import rasterize_depth_only_batch

        setups = []
        for c in range(CASCADE_COUNT):
            clip = shadow_vertex_stage(
                scene, layout, scene.csm_matrices[c], world_pos=world_pos
            )
            setups.append(_shadow_setup(clip, scene.tris, size))
        return rasterize_depth_only_batch(
            setups, size, size, _SHADOW_PIPELINE, **_shadow_kernel_knobs()
        )
    return jnp.stack(
        [
            shadow_map_pass(
                scene, layout, size, scene.csm_matrices[c], world_pos=world_pos
            )
            for c in range(CASCADE_COUNT)
        ]
    )


def _shade_pixels(
    scene: GpuScene,
    layout: SceneLayout,
    shading: ShadingModel,
    vis,
    vs: VertexStageOut,
    bary3: jnp.ndarray,
    shadow_map: jnp.ndarray | None,
    shadow_params: ShadowParams,
    varying: jnp.ndarray | None = None,
    fused_materials: bool = False,
    fused_material_constants: tuple | None = None,
    sky_dirs: jnp.ndarray | None = None,
    fused_mid: bool = False,
    mat_id_img: jnp.ndarray | None = None,
    full_rows: bool = True,
    y_parity=0,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """The fragment stage over the visibility buffer. Returns (linear HDR
    [H,W,4], sky_rgb or None); misses contain garbage in the color — the
    caller composites by coverage. When `sky_dirs` is given (fast-ambient
    environments), the specular-IBL atlas fetch doubles as the skybox
    sample for far-plane pixels and the result rides back as sky_rgb."""
    tris = scene.tris
    if shading == ShadingModel.FLAT:
        rgb = interpolate(vis, tris, scene.colors, bary3)
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], axis=-1), None

    # --- G-buffer interpolation (varyings of pixel/model_pbr.hlsl) ----------
    # Either the raster kernel already interpolated the varyings (fused
    # pallas path) or we gather+interpolate here: ONE packed [V,K] matrix so
    # the per-pixel vertex gather happens once.
    if varying is None:
        packed = [vs.world_pos, vs.world_normal, scene.uvs]
        if layout.texture_slots[1]:
            packed.append(vs.world_tangent)
        varying = interpolate(vis, tris, jnp.concatenate(packed, axis=-1), bary3)
    # (Deferred-shading world_pos reconstruction from depth — unprojecting
    # the pixel center through inv(view_projection) to drop 3 raster lanes —
    # was implemented and A/B-measured on the flagship scene in r3:
    # UNUSABLE in f32, the ill-conditioned perspective inverse glitters
    # speculars and shifts shadow lookups; mean|HDR| 0.448 vs 0.556. The
    # 3 world_pos lanes ride the deferred winner-row gather instead.)
    world_pos = varying[..., 0:3]
    voff = 3
    normal = normalize(varying[..., voff : voff + 3])
    # uv lanes exist only when a sampler reads them (untextured fused
    # varyings pack just [wp+]normal before the material lanes)
    uv = varying[..., voff + 3 : voff + 5] if layout.has_textures else None
    tan_lo, tan_hi = voff + 5, voff + 9  # tangent frame slice (if bound)

    tid = jnp.maximum(vis.tri_id, 0)
    mats = scene.materials
    mid_from_oh = None  # set by the mat_id_img one-hot path below
    if mat_id_img is not None:
        # materials rode the id payload (source_tri | mat_id << bits): the
        # [M,11] bank re-expands per-pixel with a one-hot MXU matmul —
        # no raster lanes, no narrow per-pixel gather (r3: a 2M-pixel
        # gather is table-size-bound; the one-hot dot is ~free for M<=64)
        bank = _material_bank(mats)  # [M,11]
        n_mats_ = int(bank.shape[0])
        oh = (
            mat_id_img[..., None]
            == jnp.arange(n_mats_, dtype=jnp.int32)
        ).astype(jnp.float32)  # [H,W,M]
        if (
            layout.has_textures
            and scene.textures is not None
            and scene.textures.mat_set is not None
        ):
            # texture-set id rides the SAME one-hot matmul as a 12th bank
            # column (exact: one 1.0 per row, ids < 2^24) — kills the
            # 2M-pixel mat_set[mat_id] table gather in the sampler branches
            bank = jnp.concatenate(
                [bank, scene.textures.mat_set.astype(jnp.float32)[:, None]],
                axis=-1,
            )
        # HIGHEST: the default TPU matmul multiplies in bf16 — material
        # params would drift ~0.4% vs the gather paths and set ids above
        # 2^9 would round; exact f32 keeps this bit-equal to bank[mat_id]
        mat_px = jnp.matmul(
            oh, bank, precision=jax.lax.Precision.HIGHEST
        )  # [H,W,11(+1)]
        mid_from_oh = (
            mat_px[..., 11].astype(jnp.int32)
            if bank.shape[-1] == 12
            else None
        )
        base_color = mat_px[..., 0:4]
        metallic = mat_px[..., 4]
        roughness = mat_px[..., 5]
        ao = mat_px[..., 6]
        emissive = mat_px[..., 7:10]
        ns_col = mat_px[..., 10:11]
    elif fused_materials and fused_material_constants is not None:
        # compressed bank: only per-material-VARYING columns rode kernel
        # lanes; scene-constant columns rebuild as broadcast scalars
        # (layout.material_constants — static, exact)
        consts = fused_material_constants
        n_lanes = sum(1 for c in consts if c is None)
        li = varying.shape[-1] - n_lanes - (1 if fused_mid else 0)
        cols = []
        for k in range(11):
            if consts[k] is None:
                cols.append(varying[..., li])
                li += 1
            else:
                cols.append(
                    jnp.full(varying.shape[:-1], consts[k], jnp.float32)
                )
        base_color = jnp.stack(cols[0:4], axis=-1)
        metallic = cols[4]
        roughness = cols[5]
        ao = cols[6]
        emissive = jnp.stack(cols[7:10], axis=-1)
        ns_col = cols[10][..., None]
    else:
        if fused_materials:
            # full bank on the kernel lanes (the alpha-peel contract)
            nv = varying.shape[-1]
            mat_px = varying[..., nv - 11 :]
        else:
            # per-pixel material params via ONE packed bank gather (tri-major
            # pre-gather; see ops/raster.interpolate for the rationale)
            bank = _material_bank(mats)
            mat_px = bank[scene.tri_material][tid]  # [H,W,11]
        base_color = mat_px[..., 0:4]
        metallic = mat_px[..., 4]
        roughness = mat_px[..., 5]
        ao = mat_px[..., 6]
        emissive = mat_px[..., 7:10]
        ns_col = mat_px[..., 10:11]
    # --- texture fetches (model_pbr.hlsl:205-245, has-flags as selects) ------
    if (
        layout.has_textures
        and scene.textures is not None
        and scene.textures.mat_atlas_tri is not None
    ):
        # Fastest path: ONE bf16 gather fetches the full trilinear footprint
        # of every used slot (child 2x2 + parent-resample 2x2 windows over
        # the 13 packed _SLOT_CHANNELS). The 2-gather mat_atlas path below
        # stays as the f32 oracle (HLO showed it moving ~5 GB/frame).
        from renderer_rs_tpu.ops.sampling import (
            _SLOT_CHANNELS,
            sample_material_atlas_tri,
        )

        tex = scene.textures
        mips = tex.mips
        used = [i for i, u in enumerate(layout.texture_slots) if u]
        pos, c13 = {}, 0
        for slot in used:
            pos[slot] = c13
            c13 += len(_SLOT_CHANNELS[slot])
        if mat_id_img is not None:
            # set id came out of the one-hot bank matmul above (no gather)
            mid = mid_from_oh if mid_from_oh is not None else tex.mat_set[mat_id_img]
        elif fused_mid:
            mid = varying[..., -1].astype(jnp.int32)
        else:
            mid = tex.mat_set[scene.tri_material][tid]  # [H,W] set id
        shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in mips)
        n_sets = int(tex.mat_atlas_tri.shape[0]) // sum(h * w for h, w in shapes)
        offs, off = [], 0
        for h_, w_ in shapes:
            offs.append(off)
            off += n_sets * h_ * w_
        import os as _os_ff

        if _os_ff.environ.get("RENDERER_FETCH_FLAT", "0") != "0" and uv.ndim == 3:
            # flat-pixel fetch (A/B knob): run the gather + window blend on
            # [N,*] rows so the blend consumes the gather's natural C-minor
            # layout — the [H,W,104] image form costs a whole-frame layout
            # copy between gather and blend (probe_trace: copy.826 1.6 ms,
            # copy.840 2.0 ms); only the blended [N,13] result reshapes back.
            # LOD needs the uv IMAGE (screen derivatives) — computed here,
            # flattened with the rest.
            from renderer_rs_tpu.ops.sampling import screen_space_lod

            hh, ww = uv.shape[0], uv.shape[1]
            lod_img = (
                screen_space_lod(uv, shapes[0][0], shapes[0][1], y_parity)
                if len(mips) > 1
                else None
            )
            samp = sample_material_atlas_tri(
                tex.mat_atlas_tri, tuple(offs), shapes,
                len(mips), shapes[0], c13,
                mid.reshape(hh * ww), uv.reshape(hh * ww, 2),
                lod=None if lod_img is None else lod_img.reshape(hh * ww),
            ).reshape(hh, ww, c13)
        else:
            samp = sample_material_atlas_tri(
                tex.mat_atlas_tri, tuple(offs), shapes,
                len(mips), shapes[0], c13, mid, uv, y_parity=y_parity,
            )
        if 0 in pos:
            base_color = base_color * samp[..., pos[0] : pos[0] + 4]
        if 1 in pos:
            # TBN normal mapping (model_pbr.hlsl:168-197); packed XYZ only
            t4 = varying[..., tan_lo:tan_hi]
            t3 = normalize(t4[..., :3])
            b3 = jnp.cross(normal, t3) * t4[..., 3:4]
            n_ts = samp[..., pos[1] : pos[1] + 3] * 2.0 - 1.0
            n_ts = jnp.concatenate(
                [n_ts[..., :2] * ns_col, n_ts[..., 2:3]], axis=-1
            )
            normal = normalize(
                t3 * n_ts[..., 0:1] + b3 * n_ts[..., 1:2] + normal * n_ts[..., 2:3]
            )
        if 2 in pos:
            # packed MR channels are (G, B) = (roughness, metallic)
            roughness = roughness * samp[..., pos[2] + 0]
            metallic = metallic * samp[..., pos[2] + 1]
        if 3 in pos:
            ao = ao * samp[..., pos[3]]
        if 4 in pos:
            emissive = emissive * samp[..., pos[4] : pos[4] + 3]
    elif (
        layout.has_textures
        and scene.textures is not None
        and scene.textures.mat_atlas is not None
    ):
        # Packed per-material path: ONE trilinear lookup (2 gathers) fetches
        # every used slot's window from the same row; unbound slots carry
        # exact neutral texels, so each slot applies unconditionally
        # (build_material_atlas). ≙ the five Texture2D.Sample calls of
        # model_pbr.hlsl:205-245 collapsed into one memory transaction.
        from renderer_rs_tpu.ops.sampling import sample_array_textured_atlas

        tex = scene.textures
        mips = tex.mips
        used = [i for i, u in enumerate(layout.texture_slots) if u]
        c_all = 4 * len(used)
        pos = {slot: 4 * k for k, slot in enumerate(used)}
        if mat_id_img is not None:
            mid = mid_from_oh if mid_from_oh is not None else tex.mat_set[mat_id_img]
        elif fused_mid:
            # the texture-set id rode the raster kernel's flat lanes
            # (last channel) — zero per-pixel gathers to resolve it
            mid = varying[..., -1].astype(jnp.int32)
        else:
            # [T]-sized table compose is traced host-of-jit (cheap), so
            # the per-pixel cost is ONE gather
            mid = tex.mat_set[scene.tri_material][tid]  # [H,W] set id
        # STATIC mip geometry (known from the mip-chain shapes): per-level
        # index math unrolls into selects — no per-pixel size/offset gathers
        shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in mips)
        n_sets = int(tex.mat_atlas.shape[0]) // sum(h * w for h, w in shapes)
        offs, off = [], 0
        for h_, w_ in shapes:
            offs.append(off)
            off += n_sets * h_ * w_
        samp = sample_array_textured_atlas(
            tex.mat_atlas, tuple(offs), shapes,
            len(mips), shapes[0],
            c_all, mid, uv, y_parity=y_parity,
        )
        if 0 in pos:
            base_color = base_color * samp[..., pos[0] : pos[0] + 4]
        if 1 in pos:
            nrm_s = samp[..., pos[1] : pos[1] + 4]
            # TBN normal mapping (model_pbr.hlsl:168-197); the neutral
            # window decodes to (0,0,1) -> reproduces the geometric normal
            t4 = varying[..., tan_lo:tan_hi]
            t3 = normalize(t4[..., :3])
            b3 = jnp.cross(normal, t3) * t4[..., 3:4]
            n_ts = nrm_s[..., :3] * 2.0 - 1.0
            n_ts = jnp.concatenate(
                [n_ts[..., :2] * ns_col, n_ts[..., 2:3]], axis=-1
            )
            normal = normalize(
                t3 * n_ts[..., 0:1] + b3 * n_ts[..., 1:2] + normal * n_ts[..., 2:3]
            )
        if 2 in pos:
            metallic = metallic * samp[..., pos[2] + 2]
            roughness = roughness * samp[..., pos[2] + 1]
        if 3 in pos:
            ao = ao * samp[..., pos[3] + 0]
        if 4 in pos:
            emissive = emissive * samp[..., pos[4] : pos[4] + 3]
    elif layout.has_textures and scene.textures is not None:
        from renderer_rs_tpu.ops.sampling import (
            sample_array_textured,
            sample_array_textured_atlas,
        )

        if mat_id_img is not None:
            tex_ids = mats.tex_ids[mat_id_img]  # [M,5] table — near-free
        else:
            tex_ids = mats.tex_ids[scene.tri_material][tid]  # [H,W,5]
        tex = scene.textures
        mips = tex.mips

        shapes = tuple((int(m.shape[1]), int(m.shape[2])) for m in mips)
        n_tex = int(mips[0].shape[0])
        offs, off = [], 0
        for h_, w_ in shapes:
            offs.append(off)
            off += n_tex * h_ * w_

        def fetch(slot):
            t = tex_ids[..., slot]
            if tex.atlas is not None:
                # 2-gather implicit-LOD trilinear via the build-time window
                # atlas (vs evaluating every mip level then selecting);
                # static mip geometry: no per-pixel size/offset gathers
                s = sample_array_textured_atlas(
                    tex.atlas, tuple(offs), shapes,
                    len(mips), shapes[0],
                    mips[0].shape[-1], t, uv, y_parity=y_parity,
                )
            else:
                s = sample_array_textured(mips, t, uv, y_parity=y_parity)
            return s, (t >= 0)[..., None]

        # Unused slots are statically skipped (layout.texture_slots), so a
        # scene with only a base-color map traces one sampler, not five.
        if layout.texture_slots[0]:
            bc_s, bc_has = fetch(0)
            base_color = jnp.where(bc_has, base_color * bc_s, base_color)

        if layout.texture_slots[1]:
            nrm_s, nrm_has = fetch(1)
            # TBN normal mapping (model_pbr.hlsl:168-197)
            t4 = varying[..., tan_lo:tan_hi]
            t3 = normalize(t4[..., :3])
            b3 = jnp.cross(normal, t3) * t4[..., 3:4]  # bitangent w/ handedness
            n_ts = nrm_s[..., :3] * 2.0 - 1.0
            ns = ns_col
            n_ts = jnp.concatenate([n_ts[..., :2] * ns, n_ts[..., 2:3]], axis=-1)
            mapped = normalize(
                t3 * n_ts[..., 0:1] + b3 * n_ts[..., 1:2] + normal * n_ts[..., 2:3]
            )
            normal = jnp.where(nrm_has, mapped, normal)

        if layout.texture_slots[2]:
            mr_s, mr_has = fetch(2)
            # glTF: G=roughness, B=metallic
            metallic = jnp.where(mr_has[..., 0], metallic * mr_s[..., 2], metallic)
            roughness = jnp.where(mr_has[..., 0], roughness * mr_s[..., 1], roughness)

        if layout.texture_slots[3]:
            ao_s, ao_has = fetch(3)
            ao = jnp.where(ao_has[..., 0], ao * ao_s[..., 0], ao)

        if layout.texture_slots[4]:
            em_s, em_has = fetch(4)
            emissive = jnp.where(em_has, emissive * em_s[..., :3], emissive)

    albedo = base_color[..., :3]
    view_dir = normalize(scene.camera.camera_position - world_pos)
    lights = scene.lights

    # --- sun shadow factor (shadow.hlsli / shadow_csm.hlsli) -----------------
    sun_dir = normalize(-lights.sun_direction)  # surface -> light
    # Merged-gather plan (RENDERER_MERGE_GATHER): on the flagship path the
    # PCF window fetch and the specular/sky cube fetch both depend only on
    # post-atlas state (mapped normal, world_pos, roughness) — merging the
    # two per-pixel table gathers into ONE gather op saves a whole gather
    # pass (each distinct pass costs ms at frame level regardless of lane
    # width — docs/tpu_cost_model.md). The shadow factor is then computed
    # inside the fast-ambient branch; the sun term waits in pending_sun.
    import os as _os_mg

    splan = None
    env_mg = scene.environment
    merge_ok = (
        _os_mg.environ.get("RENDERER_MERGE_GATHER", "0") != "0"
        and shading == ShadingModel.PBR_IBL
        and sky_dirs is not None
        and layout.has_environment
        and layout.has_shadow
        and not layout.has_csm
        and shadow_map is not None
        and shadow_params.pcf
        and env_mg is not None
        and env_mg.atlas is not None
        and env_mg.atlas_tri is not None
        and env_mg.atlas_tri.dtype == jnp.float32
        and env_mg.irradiance_mips is not None
    )
    if merge_ok:
        from renderer_rs_tpu.ops.shadow import pcf_group, pcf_layout

        merge_ok = (
            pcf_group(shadow_map.shape[1]) > 1 and pcf_layout() == "halo"
        )
    if layout.has_csm and shadow_map is not None:
        # shadow_map is the [C,S,S] cascade array; fragment NDC depth selects
        # the cascade (≙ CalculateShadowCSMBlended with SV_Position.z)
        from renderer_rs_tpu.ops.csm import CSMParams, calculate_shadow_csm_blended

        cp = CSMParams(
            shadow_bias=shadow_params.shadow_bias,
            normal_bias=shadow_params.normal_bias,
            pcf=shadow_params.pcf,
        )
        _csm_res = _os_mg.environ.get("RENDERER_PCF_RES", "yquarter")
        # y-strided rate reduction, same ladder/gates as the single-map
        # PCF term below (full_rows only, >=256 rows -> y-quarter,
        # >=128 -> y-half; RENDERER_PCF_RES=full restores): the blended
        # cascade factor is as smooth over rows as the single-map lit
        # factor the pcfyquarter gate accepted, and the full-rate 2x
        # cascade stack was the other half of the r5 csm_fps = 4.2
        # pathology.
        if (
            _csm_res in ("yquarter", "yhalf")
            and full_rows
            and world_pos.ndim == 3
            and world_pos.shape[0] >= 128
        ):
            stride = 4 if (_csm_res == "yquarter" and world_pos.shape[0] >= 256) else 2
            s_q = calculate_shadow_csm_blended(
                shadow_map, scene.csm_matrices, scene.csm_splits,
                world_pos[::stride], normal[::stride],
                jnp.broadcast_to(sun_dir, world_pos[::stride].shape),
                vis.depth[::stride], cp,
            )
            from renderer_rs_tpu.ops.shadow import upsample2x_y, upsample4x_y

            up = upsample4x_y if stride == 4 else upsample2x_y
            shadow = up(s_q, world_pos.shape[0])[..., None]
        else:
            shadow = calculate_shadow_csm_blended(
                shadow_map,
                scene.csm_matrices,
                scene.csm_splits,
                world_pos,
                normal,
                jnp.broadcast_to(sun_dir, world_pos.shape),
                vis.depth,
                cp,
            )[..., None]
    elif layout.has_shadow and shadow_map is not None:
        if merge_ok:
            from renderer_rs_tpu.ops.shadow import shadow_window_plan

            splan = shadow_window_plan(
                shadow_map,
                scene.light_space_matrix,
                world_pos,
                normal,
                jnp.broadcast_to(sun_dir, world_pos.shape),
                shadow_params,
            )
            shadow = None  # resolved by the merged gather below
        elif (
            _os_mg.environ.get("RENDERER_PCF_RES", "full") == "half"
            and world_pos.ndim == 3
        ):
            # Gated quality/perf knob: evaluate the whole PCF stack
            # (projection + window gather + halo reduce) on the even-pixel
            # quarter grid and bilinearly upsample the scalar lit factor.
            # MEASURED (2026-08-19 compiler, 1080p/97k): quality gate
            # PASSES (p99 ~0, mean 1.5e-4) but the frame LOSES 3.2 ms
            # (63.9 vs 60.6) — the strided [::2,::2] subsample and the
            # interleave upsample are whole-frame relayout passes that
            # outweigh the saved gather indexes. Stays OFF; kept as a
            # compiler-sensitivity lever (docs/tpu_cost_model.md).
            from renderer_rs_tpu.ops.shadow import upsample2x_bilinear

            wp_h = world_pos[::2, ::2]
            s_h = calculate_shadow(
                shadow_map,
                scene.light_space_matrix,
                wp_h,
                normal[::2, ::2],
                jnp.broadcast_to(sun_dir, wp_h.shape),
                shadow_params,
            )
            shadow = upsample2x_bilinear(
                s_h, world_pos.shape[0], world_pos.shape[1]
            )[..., None]
        elif (
            _os_mg.environ.get("RENDERER_PCF_RES", "yquarter") == "yquarter"
            and full_rows
            and world_pos.ndim == 3
            and world_pos.shape[0] >= 256
        ):
            # y-quarter PCF (DEFAULT since r4 on frames >= 256 rows;
            # yhalf takes over at 128-255, per-pixel below): same
            # sublane-only striding as yhalf at 1/4 rate. Measured
            # 44.5 -> 41.4 ms at 1080p/97k; probe_quality pcfyquarter
            # accepts (mean 2.9e-4, p99 0.0 — penumbrae smooth over 4
            # rows). RENDERER_PCF_RES=yhalf|full restores.
            from renderer_rs_tpu.ops.shadow import upsample4x_y

            wp_q = world_pos[::4]
            s_q = calculate_shadow(
                shadow_map,
                scene.light_space_matrix,
                wp_q,
                normal[::4],
                jnp.broadcast_to(sun_dir, wp_q.shape),
                shadow_params,
            )
            shadow = upsample4x_y(s_q, world_pos.shape[0])[..., None]
        elif (
            _os_mg.environ.get("RENDERER_PCF_RES", "yhalf")
            in ("yhalf", "yquarter")
            and full_rows
            and world_pos.ndim == 3
            and world_pos.shape[0] >= 128
        ):
            # y-only half-rate PCF (DEFAULT since r3; RENDERER_PCF_RES=full
            # restores per-pixel): the "half" variant above loses to its
            # [::2, ::2] LANE-strided subsample relayout; striding only the
            # SUBLANE (row) axis keeps full 128-lane rows, halves the
            # per-pixel gather index count, and upsamples with one sublane
            # interleave (ops/shadow.upsample2x_y). Measured 56.5 -> 53.9 ms
            # at 1080p/97k; quality gate (probe_quality pcfyhalf) accepts
            # (vertical-only lerp of the scalar lit factor). Engages only on
            # full-row frames >=128 rows tall: band shards interleave global
            # rows (y-stride > 1), where row-pair interpolation would span
            # distant scanlines, and tiny frames (goldens/unit scenes) keep
            # the exact per-pixel reference semantics.
            from renderer_rs_tpu.ops.shadow import upsample2x_y

            wp_h = world_pos[::2]
            s_h = calculate_shadow(
                shadow_map,
                scene.light_space_matrix,
                wp_h,
                normal[::2],
                jnp.broadcast_to(sun_dir, wp_h.shape),
                shadow_params,
            )
            shadow = upsample2x_y(s_h, world_pos.shape[0])[..., None]
        else:
            shadow = calculate_shadow(
                shadow_map,
                scene.light_space_matrix,
                world_pos,
                normal,
                jnp.broadcast_to(sun_dir, world_pos.shape),
                shadow_params,
            )[..., None]
    else:
        shadow = 1.0

    if shading == ShadingModel.BLINN_PHONG:
        # pixel/model_full.hlsl: sun + point/spot loops + ambient
        lo = shadow * bp.directional_light(
            lights.sun_direction, lights.sun_color, lights.sun_intensity,
            normal, view_dir, albedo, roughness,
        )
        for i in range(lights.point_position.shape[0]):
            mask = (i < lights.num_point).astype(jnp.float32)
            lo = lo + mask * bp.point_light(
                lights.point_position[i], lights.point_radius[i],
                lights.point_color[i], lights.point_intensity[i],
                world_pos, normal, view_dir, albedo, roughness,
            )
        for i in range(lights.spot_position.shape[0]):
            mask = (i < lights.num_spot).astype(jnp.float32)
            lo = lo + mask * bp.spot_light(
                lights.spot_position[i], lights.spot_direction[i],
                lights.spot_color[i], lights.spot_intensity[i],
                lights.spot_inner[i], lights.spot_outer[i],
                world_pos, normal, view_dir, albedo, roughness,
            )
        ambient = scene.scene_ubo.ambient_color * albedo * ao[..., None]
        rgb = ambient + lo + emissive
    else:
        # Cook-Torrance direct (pixel/model_pbr.hlsl:278-345)
        mat = pbr_ops.PBRMaterialParams(
            albedo=albedo,
            metallic=metallic,
            roughness=pbr_ops.clamp_roughness(roughness),
            ao=ao,
            emissive=emissive,
        )
        sun_radiance = lights.sun_color * lights.sun_intensity
        sun_lo = pbr_ops.pbr_direct(
            normal, view_dir, jnp.broadcast_to(sun_dir, world_pos.shape),
            sun_radiance, mat,
        )
        if shadow is None:
            # merged-gather path: the shadow factor materializes with the
            # cube fetch below; the sun term joins lo there
            pending_sun, lo = sun_lo, jnp.zeros_like(sun_lo)
        else:
            lo = shadow * sun_lo
        for i in range(lights.point_position.shape[0]):
            mask = (i < lights.num_point).astype(jnp.float32)
            lvec = lights.point_position[i] - world_pos
            dist = jnp.sqrt(jnp.maximum(jnp.sum(lvec * lvec, -1, keepdims=True), 1e-12))
            ldir = lvec / dist
            att = bp.calculate_attenuation(dist[..., 0], lights.point_radius[i])
            radiance = lights.point_color[i] * lights.point_intensity[i] * att[..., None]
            lo = lo + mask * pbr_ops.pbr_direct(normal, view_dir, ldir, radiance, mat)
        for i in range(lights.spot_position.shape[0]):
            mask = (i < lights.num_spot).astype(jnp.float32)
            lvec = lights.spot_position[i] - world_pos
            dist = jnp.sqrt(jnp.maximum(jnp.sum(lvec * lvec, -1, keepdims=True), 1e-12))
            ldir = lvec / dist
            att = bp.calculate_attenuation(dist[..., 0], 50.0) * bp.calculate_spot_attenuation(
                ldir, normalize(lights.spot_direction[i]),
                lights.spot_inner[i], lights.spot_outer[i],
            )
            radiance = lights.spot_color[i] * lights.spot_intensity[i] * att[..., None]
            lo = lo + mask * pbr_ops.pbr_direct(normal, view_dir, ldir, radiance, mat)

        env = scene.environment
        if (
            shading == ShadingModel.PBR_IBL
            and layout.has_environment
            and env is not None
            and env.irradiance_mips is not None
        ):
            r = jnp.asarray(
                view_dir - 2.0 * jnp.sum(view_dir * normal, -1, keepdims=True) * normal
            )
            r = -r  # reflect(-V, N)
            if sky_dirs is not None and env.atlas is not None:
                # Fast ambient: SH9 diffuse + analytic BRDF + ONE merged
                # specular/skybox lookup. Covered pixels fetch the
                # prefiltered level pair at mip = roughness*max_lod;
                # far-plane pixels fetch the skybox segment (last atlas
                # segment, frac=0) — the two sets are disjoint, so the
                # skybox costs no extra gather (pixel/skybox.hlsl fused in).
                from renderer_rs_tpu.ops.sampling import (
                    _cube_atlas_fetch,
                    direction_to_cube_uv,
                )

                n_pref = len(env.prefiltered_mips)
                max_lod = float(n_pref - 1)
                far = vis.depth >= 1.0
                dirs = jnp.where(far[..., None], sky_dirs, r)
                lod = jnp.where(far, float(n_pref), mat.roughness * max_lod)
                face, uv_c = direction_to_cube_uv(dirs)
                lo_l = jnp.floor(lod).astype(jnp.int32)
                frac = lod - lo_l.astype(lod.dtype)
                c = env.skybox_mips[0].shape[-1]
                # STATIC segment geometry (prefiltered levels + skybox):
                # unrolled selects instead of per-pixel size/offset gathers
                # (RENDERER_DYNAMIC_MIP=1 flips back to the array form for
                # A/B measurement)
                import os as _os2

                seg_sizes = tuple(
                    int(m.shape[1]) for m in env.prefiltered_mips
                ) + (int(env.skybox_mips[0].shape[1]),)
                seg_offs, _off = [], 0
                for s_ in seg_sizes:
                    seg_offs.append(_off)
                    _off += 6 * s_ * s_
                seg_offs = tuple(seg_offs)
                if _os2.environ.get("RENDERER_DYNAMIC_MIP") == "1":
                    seg_offs = env.atlas_offsets
                    seg_sizes = env.atlas_sizes
                light_half = (
                    _os2.environ.get("RENDERER_LIGHT_RES", "full")
                    == "yhalf"
                    and full_rows
                    and lo_l.ndim == 2
                    and lo_l.shape[0] >= 128
                    and splan is None
                    and layout.has_shadow
                    and not layout.has_csm
                    and shadow_map is not None
                    and env.atlas_tri is not None
                    and lights.point_position.shape[0] == 0
                    and lights.spot_position.shape[0] == 0
                )
                if light_half:
                    # Unified half-rate LIGHTING block (gated, r4): the
                    # sun term (PCF shadow x Cook-Torrance) and the IBL
                    # ambient evaluate on even rows only, factored
                    # albedo-linear (ops/pbr.pbr_direct_split /
                    # calculate_ibl_fast_split) so the FULL-RATE albedo
                    # and AO texture detail multiply in at composite
                    # time; odd rows reconstruct id-awarely. The
                    # full-rate shadow/sun computed above become dead
                    # code (XLA DCE) — engagement requires an empty
                    # point/spot bank so `lo` carries only the sun term.
                    from renderer_rs_tpu.ops.sampling import (
                        cube_trilinear_fetch,
                        upsample2x_y_idaware,
                    )

                    h_full = lo_l.shape[0]
                    n_h = normal[::2]
                    v_h = view_dir[::2]
                    wp_h = world_pos[::2]
                    alb_h = albedo[::2]
                    met_h = metallic[::2]
                    rgh_h = mat.roughness[::2]
                    spec_sky_h = cube_trilinear_fetch(
                        env.atlas_tri, seg_offs, seg_sizes,
                        lo_l[::2], frac[::2], face[::2], uv_c[::2], c,
                    )[..., :3]
                    sun_b = jnp.broadcast_to(sun_dir, wp_h.shape)
                    sh_h = calculate_shadow(
                        shadow_map, scene.light_space_matrix, wp_h, n_h,
                        sun_b, shadow_params,
                    )[..., None]
                    d_sun, s_sun = pbr_ops.pbr_direct_split(
                        n_h, v_h, sun_b, sun_radiance, alb_h, met_h, rgh_h
                    )
                    d_ibl, s_ibl = pbr_ops.calculate_ibl_fast_split(
                        n_h, v_h, alb_h, met_h, rgh_h,
                        env.irradiance_sh, spec_sky_h,
                    )

                    def up(x):
                        return upsample2x_y_idaware(x, vis.tri_id, h_full)

                    aof = ao[..., None]
                    rgb = (
                        albedo * (up(sh_h * d_sun) + up(d_ibl) * aof)
                        + up(sh_h * s_sun)
                        + up(s_ibl) * aof
                        + emissive
                    )
                    sky_rgb = up(spec_sky_h)
                    return (
                        jnp.concatenate(
                            [rgb, base_color[..., 3:4]], axis=-1
                        ),
                        sky_rgb,
                    )
                if splan is not None:
                    # MERGED gather: the PCF window row and the cube
                    # trilinear row ride ONE gather from a shared padded
                    # table — one gather pass instead of two (the pass
                    # count, not the lane width, is the frame-level cost)
                    from renderer_rs_tpu.ops.sampling import (
                        _once,
                        cube_trilinear_blend,
                        cube_trilinear_plan,
                    )
                    from renderer_rs_tpu.ops.shadow import (
                        halo_window_reduce,
                        pcf_group,
                        shadow_finish,
                    )

                    cidx, cfx, cfy, cfxh, cfyh, cjx, cjy = cube_trilinear_plan(
                        seg_offs, seg_sizes, lo_l, face, uv_c
                    )
                    ptab, row_id, sub, cur, in_b = splan
                    pl, cl = ptab.shape[-1], 13 * c
                    lanes_m = max(pl, cl)
                    tm = jnp.concatenate(
                        [
                            jnp.pad(ptab, ((0, 0), (0, lanes_m - pl))),
                            jnp.pad(env.atlas_tri, ((0, 0), (0, lanes_m - cl))),
                        ],
                        axis=0,
                    )
                    idx2 = jnp.stack([row_id, ptab.shape[0] + cidx])
                    taps2 = _once(tm[idx2])  # [2, ..., lanes_m]
                    shadow = shadow_finish(
                        halo_window_reduce(
                            taps2[0], sub, cur,
                            pcf_group(shadow_map.shape[1]),
                        ),
                        in_b, shadow_params,
                    )[..., None]
                    lo = lo + shadow * pending_sun
                    spec_sky = cube_trilinear_blend(
                        taps2[1], cfx, cfy, cfxh, cfyh, cjx, cjy, frac, c
                    )[..., :3]
                elif env.atlas_tri is not None:
                    # ONE gather: child 2x2 + parent 3x3 ride the same row
                    from renderer_rs_tpu.ops.sampling import cube_trilinear_fetch

                    _cube_res = _os2.environ.get("RENDERER_CUBE_RES", "yhalf")
                    if (
                        _cube_res == "yquarter"
                        and full_rows
                        and lo_l.ndim == 2
                        and lo_l.shape[0] >= 256
                    ):
                        # y-quarter radiance fetch (gated knob — NOT
                        # default: it measured only −0.4 ms on top of
                        # y-quarter PCF, and the COMBINED defaults drift
                        # crossed the gate at p99 0.0115 vs the exact
                        # reference; the shipped combo is PCF yquarter +
                        # cube yhalf, p99-gated below 0.01): same
                        # id-aware reconstruct at 1/4 rate.
                        from renderer_rs_tpu.ops.sampling import (
                            upsample_y_idaware,
                        )

                        spec_q = cube_trilinear_fetch(
                            env.atlas_tri, seg_offs, seg_sizes,
                            lo_l[::4], frac[::4], face[::4], uv_c[::4], c,
                        )[..., :3]
                        spec_sky = upsample_y_idaware(
                            spec_q, vis.tri_id, lo_l.shape[0], 4
                        )
                    elif (
                        _cube_res in ("yhalf", "yquarter")
                        and full_rows
                        and lo_l.ndim == 2
                        and lo_l.shape[0] >= 128
                    ):
                        # y-half prefiltered-radiance fetch (DEFAULT since
                        # r4; RENDERER_CUBE_RES=full restores per-pixel —
                        # measured −2.2 ms at 1080p/97k, probe_quality
                        # accepts: mean 2.3e-4, p99 0.0046):
                        # gather cost is INDEX-COUNT-bound, so fetching the
                        # specular/sky radiance at even rows halves the
                        # 2M-index cube gather + its copy/blend chain. Only
                        # the RADIANCE is half-rate — calculate_ibl_fast's
                        # analytic BRDF term (normal/view/roughness) stays
                        # per-pixel, so normal-map specular detail survives.
                        # Odd rows reconstruct id-awarely from the winner-id
                        # image (sky id -1 included): no ghosting across
                        # silhouettes, the failure the r3 note feared for
                        # a naive y-half sky. Quality-gated via
                        # probe_quality (cubeyhalf).
                        from renderer_rs_tpu.ops.sampling import (
                            upsample2x_y_idaware,
                        )

                        spec_h = cube_trilinear_fetch(
                            env.atlas_tri, seg_offs, seg_sizes,
                            lo_l[::2], frac[::2], face[::2], uv_c[::2], c,
                        )[..., :3]
                        spec_sky = upsample2x_y_idaware(
                            spec_h, vis.tri_id, lo_l.shape[0]
                        )
                    elif (
                        _os2.environ.get("RENDERER_FETCH_FLAT", "0") != "0"
                        and lo_l.ndim == 2
                    ):
                        # flat-pixel fetch: see the material-atlas call —
                        # blend on [N,39] rows in the gather's own layout,
                        # reshape only the blended [N,3] result
                        hh, ww = lo_l.shape
                        nn = hh * ww
                        spec_sky = cube_trilinear_fetch(
                            env.atlas_tri, seg_offs, seg_sizes,
                            lo_l.reshape(nn), frac.reshape(nn),
                            face.reshape(nn), uv_c.reshape(nn, 2), c,
                        )[..., :3].reshape(hh, ww, 3)
                    else:
                        spec_sky = cube_trilinear_fetch(
                            env.atlas_tri, seg_offs, seg_sizes,
                            lo_l, frac, face, uv_c, c,
                        )[..., :3]
                else:
                    hi_l = jnp.where(
                        far, n_pref, jnp.minimum(lo_l + 1, n_pref - 1)
                    )
                    f_lo = _cube_atlas_fetch(
                        env.atlas, seg_offs, seg_sizes, lo_l,
                        face, uv_c, c,
                    )
                    f_hi = _cube_atlas_fetch(
                        env.atlas, seg_offs, seg_sizes, hi_l,
                        face, uv_c, c,
                    )
                    spec_sky = (
                        f_lo * (1.0 - frac[..., None]) + f_hi * frac[..., None]
                    )[..., :3]
                ambient = pbr_ops.calculate_ibl_fast(
                    normal, view_dir, mat, env.irradiance_sh, spec_sky
                )
                sky_rgb = spec_sky
                rgb = ambient + lo + emissive
                return jnp.concatenate([rgb, base_color[..., 3:4]], axis=-1), sky_rgb
            ambient = pbr_ops.calculate_ibl(
                normal, view_dir, r, mat,
                env.irradiance_mips,
                env.prefiltered_mips,
                env.brdf_lut,
                # reuse the prebuilt window atlas (scene_build) when bound:
                # rebuilding it in-jit re-executes the 4x-copy repack of the
                # whole prefiltered chain every frame
                prefiltered_atlas=env.atlas,
                prefiltered_atlas_offsets=env.atlas_offsets,
                prefiltered_atlas_sizes=env.atlas_sizes,
            )
        else:
            # hemisphere fallback (model_pbr.hlsl ambient, pbr.hlsli:480-490)
            ambient = pbr_ops.hemisphere_ambient(normal, albedo, ao)
        rgb = ambient + lo + emissive

    return jnp.concatenate([rgb, base_color[..., 3:4]], axis=-1), None


def _alpha_peeled_raster(
    scene: GpuScene,
    layout: SceneLayout,
    setup,
    clip_src,
    clip_bary,
    vs: VertexStageOut,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    n_raster_tris: int,
    peels: int = 4,
):
    """Alpha-cutoff (MASK) rasterization on the binned fast path via bounded
    depth peeling (≙ model_pbr.hlsl:218-221 `discard` before depth write).

    Layer 0 rasters normally; each further pass re-rasters with a strict
    per-pixel z floor at the rejected winner's depth, yielding the
    next-nearest fragment (z_floor support in raster_binned/raster_pallas).
    Pixels whose winner passes the alpha test stop peeling (their floor
    becomes +inf). After `peels` layers a still-failing pixel resolves to
    background — exact vs the scan-oracle coverage callback whenever the
    overlap depth of FAILING fragments is < `peels` (tests assert). This
    replaces the O(T)-sequential scan a single MASK material used to force.

    Returns (vis, vary_img or None, ids_are_source); vary_img present on the
    fused Pallas path with flat channels [alpha_tex_id, material bank(11)]
    appended — materials last, matching the _shade_pixels fused contract.
    ids_are_source is True when vis.tri_id already holds SOURCE triangle ids
    (the Pallas kernel's ids payload), so the caller skips the slot remap.
    """
    from renderer_rs_tpu.ops.sampling import sample_array_bilinear

    cutoff = pipeline.alpha_cutoff
    cap = _binned_cap(n_raster_tris, height, width)  # XLA-path budget only
    base_mip = scene.textures.mips[0]
    tex_of_tri = scene.materials.tex_ids[scene.tri_material][:, 0]  # [Tsrc]
    afac_of_tri = scene.materials.base_color[scene.tri_material][:, 3]

    if _use_pallas():
        from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas

        packed = [vs.world_pos, vs.world_normal, scene.uvs]
        if layout.texture_slots[1]:
            packed.append(vs.world_tangent)
        attr = jnp.concatenate(packed, axis=-1)
        tri_attr_src = attr[scene.tris]  # [Tsrc,3,K]
        flat = jnp.concatenate(
            [
                tex_of_tri[:, None].astype(jnp.float32),
                _material_bank(scene.materials)[scene.tri_material],
            ],
            axis=-1,
        )  # [Tsrc, 12]

        def raster(z_floor):
            return rasterize_binned_pallas(
                setup, height, width, pipeline,
                varyings=tri_attr_src, vary_src=clip_src, vary_bary=clip_bary,
                flat_varyings=flat, z_floor=z_floor, ids=clip_src,
                skip_bary=True,
            )

        ids_are_source = True

        def alpha_ok(vis_l, vary_l):
            nv = vary_l.shape[-1]
            uv = vary_l[..., 6:8]
            tex = vary_l[..., nv - 12].astype(jnp.int32)
            afac = vary_l[..., nv - 8]  # material base_color.a (bank col 3)
            a = sample_array_bilinear(base_mip, tex, uv)[..., 3] * afac
            return jnp.where(tex >= 0, a >= cutoff, True)

    else:
        tri_uv = scene.uvs[scene.tris]  # [Tsrc,3,2]

        ids_are_source = False

        def raster(z_floor):
            return (
                rasterize_binned(
                    setup, height, width, pipeline, cap=cap, z_floor=z_floor
                ),
                None,
            )

        def alpha_ok(vis_l, _vary_l):
            slot = jnp.maximum(vis_l.tri_id, 0)
            b3 = perspective_bary(vis_l, setup)
            b3 = jnp.einsum("hwv,hwvk->hwk", b3, clip_bary[slot])
            src = clip_src[slot]
            uv = jnp.einsum("hwv,hwvk->hwk", b3, tri_uv[src])
            tex = tex_of_tri[src]
            a = sample_array_bilinear(base_mip, tex, uv)[..., 3]
            a = a * afac_of_tri[src]
            return jnp.where(tex >= 0, a >= cutoff, True)

    vis, vary = raster(None)
    done = alpha_ok(vis, vary) | ~vis.covered
    for _ in range(peels - 1):
        z_floor = jnp.where(done, jnp.inf, vis.depth)
        vis2, vary2 = raster(z_floor)
        upd = ~done
        vis = VisibilityBuffer(
            tri_id=jnp.where(upd, vis2.tri_id, vis.tri_id),
            depth=jnp.where(upd, vis2.depth, vis.depth),
            bary=jnp.where(upd[..., None], vis2.bary, vis.bary),
        )
        if vary is not None:
            vary = jnp.where(upd[..., None], vary2, vary)
        done = done | (upd & (alpha_ok(vis, vary) | ~vis2.covered))

    # exhausted the peel budget with the winner still failing -> background
    # (depth back to the 1.0 clear the raster passes start from)
    fail = ~done
    vis = vis.replace(
        tri_id=jnp.where(fail, -1, vis.tri_id),
        depth=jnp.where(fail, 1.0, vis.depth),
    )
    # deviation telemetry: pixels whose failing-fragment stack exceeded the
    # peel budget (forward_frame(diagnostics=True) -> bench.py reports it;
    # 0 on scenes whose overlap depth of FAILING fragments is < peels)
    exhausted = jnp.sum(fail.astype(jnp.int32))
    return vis, vary, ids_are_source, exhausted


def forward_frame(
    scene: GpuScene,
    layout: SceneLayout,
    pipeline: GraphicsPipeline,
    shading: ShadingModel,
    width: int,
    height: int,
    clear_color: tuple[float, float, float, float] = (0.1, 0.1, 0.15, 1.0),
    tonemap: str = "none",
    shadow_map_size: int = 1024,
    shadow_params: ShadowParams = ShadowParams(),
    band: tuple | None = None,
    return_depth: bool = False,
    shadow_map: jnp.ndarray | None = None,
    stencil=None,
    return_stencil: bool = False,
    rendering=None,
    depth_clear: float = 1.0,
    diagnostics: bool = False,
    ids_only: bool = False,
    return_ids: bool = False,
) -> jnp.ndarray:
    """The full frame: ≙ record_commands + queue_submit fused
    (renderer.rs:452-557). Returns linear [H,W,4] ready for sRGB encode.

    stencil: optional rhi.rendering.StencilAttachment — routes the opaque
    raster through the stencil test/update state machine (two-sided via
    stencil.back); return_stencil appends the [H,W] i32 stencil buffer to
    the outputs.

    band=(y_offset, band_height): render only a horizontal slice of the
    full `height`-row framebuffer — the unit of multi-chip row sharding
    (parallel/tile_shard.py). y_offset may be a traced value.

    MSAA (pipeline.msaa_samples ∈ {2,4,8}, ≙ rasterization samples
    pipeline.rs:796-799) is realized as ordered-grid supersampling: the whole
    frame renders at 2x1 / 2x2 / 4x2 resolution and box-resolves — on a
    software rasterizer SSAA *is* the multisample pattern, and it also
    supersamples shading (better than hardware MSAA).
    """
    # Attachment configuration (≙ the dynamic-rendering begin info,
    # rendering.rs:679-911): the frame's clear color, depth clear value and
    # stencil state come FROM the RenderingConfig when one is bound — the
    # Renderer builds one from its clear_color, putting rhi/rendering.py on
    # the live path (VERDICT r2 item 10). LOAD on the color attachment
    # keeps the caller-provided clear_color contract (the "previous
    # contents" of a software framebuffer that renders every pixel each
    # frame is the background).
    if rendering is not None:
        from renderer_rs_tpu.rhi.rendering import AttachmentLoadOp

        if (rendering.width, rendering.height) != (width, height):
            raise ValueError(
                f"rendering area {rendering.width}x{rendering.height} != "
                f"framebuffer {width}x{height}"
            )
        if rendering.stencil is not None:
            if stencil is not None:
                raise ValueError("stencil given both directly and via rendering")
            stencil = rendering.stencil
        if rendering.color.load_op == AttachmentLoadOp.CLEAR:
            clear_color = tuple(rendering.color.clear_color)
        if rendering.depth is not None and rendering.depth.load_op == AttachmentLoadOp.CLEAR:
            depth_clear = float(rendering.depth.clear_depth)
        rendering = None  # consumed; recursion below forwards the extracts
    if pipeline.msaa_samples > 1:
        if diagnostics:
            raise ValueError(
                "forward_frame(diagnostics=True) does not compose with MSAA"
            )
        sx, sy = {2: (2, 1), 4: (2, 2), 8: (4, 2)}[pipeline.msaa_samples]
        import dataclasses as _dc

        sub = _dc.replace(pipeline, msaa_samples=1)
        import os as _os_ms

        if (
            _os_ms.environ.get("RENDERER_MSAA", "resolve") == "resolve"
            and band is None
            and stencil is None
            and not return_depth
            and not return_ids
        ):
            # Shade-once-per-pixel MSAA (r5 default; RENDERER_MSAA=super
            # restores full supersampling): visibility rasterizes at
            # sample rate (ids only — correct per-sample depth/coverage),
            # shading runs ONCE at pixel rate, and the resolve id-matches
            # each sample to the pixel's own / neighboring shaded color
            # (ops/msaa.py). Measured 128.4 -> see cost model; quality
            # gated by probe_quality msaa_resolve.
            from renderer_rs_tpu.ops.msaa import msaa_id_resolve

            lo, lo_ids = forward_frame(
                scene, layout, sub, shading, width, height,
                clear_color=clear_color, tonemap=tonemap,
                shadow_map_size=shadow_map_size, shadow_params=shadow_params,
                shadow_map=shadow_map, depth_clear=depth_clear,
                return_ids=True,
            )
            sample_ids = forward_frame(
                scene, layout, sub, shading, width * sx, height * sy,
                clear_color=clear_color, tonemap=tonemap,
                shadow_map_size=shadow_map_size, shadow_params=shadow_params,
                shadow_map=shadow_map, depth_clear=depth_clear,
                ids_only=True,
            )
            return msaa_id_resolve(lo, lo_ids, sample_ids, sx, sy)
        if return_ids:
            # the supersampling path has no 1x id map to return; reject
            # loudly instead of silently dropping the output
            raise ValueError(
                "return_ids does not compose with the supersampling MSAA "
                "path (RENDERER_MSAA=super / band / stencil / return_depth)"
            )
        if width * height * sx * sy > 4_000_000:
            # cost transparency (VERDICT r3 item 7): SUPERSAMPLING scales
            # the whole frame cost by the sample count (measured: msaa4 at
            # 1080p ≈ 4x the 1x frame time — docs/tpu_cost_model.md); the
            # resolve-mode branch above only pays sample-rate VISIBILITY
            import logging as _logging

            _logging.getLogger("renderer_rs_tpu.renderer.passes").warning(
                "MSAA %dx supersamples to %dx%d (%.1f MP): expect ~%dx the "
                "1-sample frame cost (RENDERER_MSAA=resolve for the "
                "shade-once path)",
                pipeline.msaa_samples, width * sx, height * sy,
                width * height * sx * sy / 1e6, sx * sy,
            )
        if band is not None:
            # Band sharding composes with MSAA by sharding the SUPERSAMPLED
            # frame: `band` is interpreted in supersampled row coordinates
            # and the UNRESOLVED [band_h, width*sx, 4] rows are returned —
            # the caller (parallel/tile_shard.render_frame_sharded)
            # box-resolves after stitching (resolve needs sy adjacent rows,
            # which one device does not own under interleaved sharding).
            return forward_frame(
                scene, layout, sub, shading, width * sx, height * sy,
                clear_color=clear_color, tonemap=tonemap,
                shadow_map_size=shadow_map_size, shadow_params=shadow_params,
                band=band, return_depth=return_depth, shadow_map=shadow_map,
                stencil=stencil, depth_clear=depth_clear,
            )
        hi = forward_frame(
            scene, layout, sub, shading, width * sx, height * sy,
            clear_color=clear_color, tonemap=tonemap,
            shadow_map_size=shadow_map_size, shadow_params=shadow_params,
            return_depth=return_depth, shadow_map=shadow_map,
            stencil=stencil, depth_clear=depth_clear,
        )
        if return_depth:
            hi, hi_depth = hi
        # box resolve (≙ vkCmdResolveImage)
        out = hi.reshape(height, sy, width, sx, 4).mean(axis=(1, 3))
        if return_depth:
            # depth resolve keeps the depth-test winner over the footprint
            # (nearest for LESS*, farthest for GREATER*)
            d = hi_depth.reshape(height, sy, width, sx)
            from renderer_rs_tpu.rhi.pipeline import CompareOp as _CmpOp

            if pipeline.depth_compare_op in (
                _CmpOp.GREATER,
                _CmpOp.GREATER_OR_EQUAL,
            ):
                return out, d.max(axis=(1, 3))
            return out, d.min(axis=(1, 3))
        return out
    # shadow_map may be precomputed by the caller (the Renderer compiles the
    # shadow and forward passes as separate jits so a resize re-specializes
    # only the forward pass — ≙ the reference's per-pipeline compiles,
    # pipeline.rs:161-268 being independent objects)
    vs = vertex_stage(scene, layout)
    if ids_only:
        shadow_map = None  # visibility-only: never render shadows
    elif shadow_map is None:
        # RENDERER_SHADOW_VSTAGE=world reuses vs.world_pos for the in-frame
        # shadow projection (one [V,4]@[4,4] instead of the per-object
        # lsm@model loop) — see shadow_vertex_stage for the associativity
        # note. Only valid here, where the forward vertex stage exists in
        # the same program.
        import os as _os_sv

        # CSM defaults to reusing the forward world positions (ONE
        # [V,4]@[4,4] per cascade instead of 4x the per-object loop — and
        # world-then-light is the reference shader's own associativity,
        # vertex/shadow.hlsl:22-33); the single-map pass keeps the exact
        # pre-composed form (A/B measured neutral there).
        _sv = _os_sv.environ.get(
            "RENDERER_SHADOW_VSTAGE", "world" if layout.has_csm else "0"
        )
        wp = vs.world_pos if _sv == "world" else None
        if layout.has_csm:
            shadow_map = csm_shadow_pass(scene, layout, shadow_map_size, world_pos=wp)
        elif layout.has_shadow:
            shadow_map = shadow_map_pass(scene, layout, shadow_map_size, world_pos=wp)

    from renderer_rs_tpu.rhi.pipeline import PrimitiveTopology

    tri_clip = gather_triangle_clip(vs.clip, scene.tris)

    if pipeline.topology in (
        PrimitiveTopology.POINT_LIST,
        PrimitiveTopology.LINE_LIST,
        PrimitiveTopology.LINE_STRIP,
    ):
        # point/line primitives (degenerate triples from
        # rhi.vertex.expand_topology): the triangle near-clipper does not
        # apply — primitives touching w<=eps drop whole (Vulkan clips
        # lines too; bounded loss only within `eps` of the near plane)
        t_n = layout.num_triangles
        clip_valid = None
        clip_overflow = None
        clip_src = jnp.arange(t_n, dtype=jnp.int32)
        clip_bary = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (t_n, 3, 3))
        clip_bary_planes = tuple(
            tuple(
                jnp.full((t_n,), float(i == j), jnp.float32) for j in range(3)
            )
            for i in range(3)
        )
        setup = setup_triangles(tri_clip, width, height, pipeline)
        n_raster_tris = t_n
        bin_small_limit = None
    else:
        # Near-plane clipping: triangles crossing w=eps are split (T -> 2T
        # slots) instead of dropped; shading maps winners back to source
        # triangles and composes barycentrics (ops/clip.py). ≙ the hardware
        # clipper stage.
        from renderer_rs_tpu.ops.clip import (
            bary_planes_to_array,
            clip_triangles_near_planes,
        )

        # Secondary-slot compaction (r4 perf, RENDERER_CLIP_COMPACT): the
        # [2T] clip layout makes every per-slot pass (setup, kernel-table
        # build, binning side list) pay for T secondary slots that are
        # ~all dead; compact them into a static cap = T/den block
        # (ops/clip.py::compact_secondary — order-stable, so results are
        # bit-identical while the valid count fits the cap; the overflow
        # counter rides diagnostics/bench like bin_overflow). Measured
        # −6.7 ms at 1080p/97k (56.48 -> 49.83, probe_frame_ab).
        import os as _os_cc

        # r5: default denominator 8 -> 16 (cap T/16, floor 128): the
        # secondary-slot table work halves again and the frame measured
        # 38.71 vs 40.23 ms at 1080p/97k (clip16, /tmp ladder 2026-08-20);
        # den=24 measured no further gain. clip_overflow telemetry guards
        # the tighter cap; RENDERER_CLIP_COMPACT=8|0 restores.
        _cc_den = int(_os_cc.environ.get("RENDERER_CLIP_COMPACT", "16"))
        clip_overflow = None
        t_prim = layout.num_triangles
        _compact_on = _cc_den > 0 and t_prim >= 1024
        _cc_cap = max(128, t_prim // max(_cc_den, 1))
        if _compact_on:
            # Trace-time transparency (ADVICE r4): the static cap bounds
            # how many near-plane-CROSSING triangles keep their clipped
            # half. A camera-inside-geometry scene exceeding it drops
            # halves (holes); the counter surfaces via
            # Renderer.frame_diagnostics / bench clip_overflow, and
            # RENDERER_CLIP_COMPACT=0 is the exact-layout escape hatch.
            import logging as _logging_cc

            _logging_cc.getLogger("renderer_rs_tpu.renderer.passes").info(
                "near-clip secondary compaction on: cap %d of %d tris "
                "(>%d clipped tris drop halves; check frame_diagnostics "
                "clip_overflow, RENDERER_CLIP_COMPACT=0 disables)",
                _cc_cap, t_prim, _cc_cap,
            )
        n_raster_tris = (
            t_prim + min(_cc_cap, t_prim) if _compact_on else 2 * t_prim
        )
        # Plane-form geometry chain (r4, RENDERER_TRI_PLANES): per-vertex
        # [T,4] gathers feed the clip and setup as flat planes — the
        # [3T,4]->[T,3,4] reshape/slice/copy chain never materializes and
        # the canonical-edge block reads the screen planes directly
        # (gated for frame A/B; bit-identical by construction).
        if _os_cc.environ.get("RENDERER_TRI_PLANES", "0") == "1":
            from renderer_rs_tpu.ops.clip import (
                clip_triangles_near_v,
                compact_secondary_v,
            )
            from renderer_rs_tpu.ops.raster import (
                gather_triangle_planes,
                setup_triangles_planes,
            )

            va_, vb_, vc_ = gather_triangle_planes(vs.clip, scene.tris)
            (
                va_, vb_, vc_, clip_valid, clip_src, clip_bary_planes,
            ) = clip_triangles_near_v(va_, vb_, vc_)
            if _compact_on:
                (
                    (va_, vb_, vc_), clip_valid, clip_src,
                    clip_bary_planes, clip_overflow,
                ) = compact_secondary_v(
                    va_, vb_, vc_, clip_valid, clip_src,
                    clip_bary_planes, _cc_cap,
                )
            setup = setup_triangles_planes(
                (va_, vb_, vc_), width, height, pipeline,
                tri_valid=clip_valid,
            )
        else:
            tri_clip, clip_valid, clip_src, clip_bary_planes = (
                clip_triangles_near_planes(tri_clip)
            )
            if _compact_on:
                from renderer_rs_tpu.ops.clip import compact_secondary

                (
                    tri_clip, clip_valid, clip_src, clip_bary_planes,
                    clip_overflow,
                ) = compact_secondary(
                    tri_clip, clip_valid, clip_src, clip_bary_planes,
                    _cc_cap,
                )
            # viewport transform always uses the FULL framebuffer extent
            setup = setup_triangles(
                tri_clip, width, height, pipeline, tri_valid=clip_valid
            )
        # array form for the scan/binned/peel consumers; XLA DCEs it on the
        # fused SoA path (RENDERER_GEOM=soa), which consumes the planes
        clip_bary = bary_planes_to_array(clip_bary_planes)
        # binning: the secondary clip block (live <1%) rides the dense side
        # list instead of the expand+sort — halves the sort size
        bin_small_limit = layout.num_triangles

    # Alpha-cutoff (MASK) materials: the coverage test samples base-color
    # alpha per candidate fragment BEFORE the depth write (model_pbr.hlsl:
    # 218-221 `discard`; SURVEY.md §7 hard part). The fast path handles it
    # with bounded depth peeling over the binned rasterizer
    # (_alpha_peeled_raster); the scan path keeps a per-fragment coverage
    # callback for band rendering / exotic compare ops / FLAT shading.
    coverage_fn = None
    peel = (
        pipeline.alpha_cutoff is not None
        and layout.has_textures
        and band is None
        and stencil is None
        and not ids_only
        and shading != ShadingModel.FLAT
        and supports_binned(pipeline, n_raster_tris, allow_alpha_cutoff=True)
    )
    if pipeline.alpha_cutoff is not None and layout.has_textures and not peel:
        from renderer_rs_tpu.ops.sampling import sample_array_bilinear

        tri_uv = scene.uvs[scene.tris]  # [T,3,2]
        tri_alpha_tex = scene.materials.tex_ids[scene.tri_material][:, 0]  # [T]
        tri_alpha_factor = scene.materials.base_color[scene.tri_material][:, 3]
        base_mip = scene.textures.mips[0]
        cutoff = pipeline.alpha_cutoff

        def coverage_fn(t, b0, b1):
            src = clip_src[t]
            bsrc = clip_bary[t]  # [3,3] clipped->source frame
            # perspective-correct source barycentrics (same math as the
            # fused kernel's varying interpolation, eps matched): the
            # reference PS receives perspective-interpolated UVs
            w = setup.w[t]  # [3] clip w of the raster slot's vertices
            inv_w = 1.0 / jnp.maximum(w, 1e-12)
            b2 = 1.0 - b0 - b1
            wb = jnp.stack([b0 * inv_w[0], b1 * inv_w[1], b2 * inv_w[2]], -1)
            denom = jnp.sum(wb, axis=-1, keepdims=True)
            bp = wb / jnp.where(denom == 0.0, 1.0, denom)
            bs = bp @ bsrc  # [H,W,3] source barycentrics
            uvs = tri_uv[src]  # [3,2]
            uv = bs @ uvs  # [H,W,2]
            tex = tri_alpha_tex[src]
            a = sample_array_bilinear(
                base_mip, jnp.broadcast_to(tex, uv.shape[:-1]), uv
            )[..., 3]
            a = a * tri_alpha_factor[src]
            return jnp.where(tex >= 0, a >= cutoff, True)

    varying_img = None
    fuse = (
        band is None
        and stencil is None
        and coverage_fn is None
        and not peel
        and not ids_only  # visibility-only render: plain raster, no lanes
        and shading != ShadingModel.FLAT
        and supports_binned(pipeline, n_raster_tris)
        and _use_pallas()
    )
    # (A fully-fused Pallas SHADE kernel was tried in r2 — tile-major
    # fragment stage after the raster kernel — and measured 24 ms SLOWER
    # than the XLA deferred shade at 1080p: the shade stage is
    # gather-dominated and XLA already fuses the elementwise math. Deleted
    # in r3; the deferred shade below is the shipping path.)

    if stencil is not None and band is not None:
        raise ValueError(
            "forward_frame: stencil and band sharding cannot combine (the "
            "stencil state machine runs on the full-frame scan path)"
        )
    y_stride = 1  # overwritten by the band branch; read by sky/env paths
    y_pair = False  # band[3]: pair-granularity interleave (quad-derivative
    # stability — ops/raster._pixel_centers y_pair)
    ids_are_source = False
    fused_materials = False
    shade_fused_mid = False
    shade_mat_id_img = None
    peel_exhausted = None
    if peel:
        vis, varying_img, ids_are_source, peel_exhausted = _alpha_peeled_raster(
            scene, layout, setup, clip_src, clip_bary, vs, height, width,
            pipeline, n_raster_tris,
        )
        # only the Pallas peel branch carries the flat material lanes; the
        # XLA branch returns no varyings (deferred materials)
        fused_materials = varying_img is not None
        out_h = height
        y_offset = 0
    elif fuse:
        # fused path: the Pallas kernel interpolates the varyings in-loop
        # (they ride the coefficient slab's pad lanes — free DMA), removing
        # the per-pixel attribute gathers and the perspective_bary pass.
        from renderer_rs_tpu.ops.raster_pallas import rasterize_binned_pallas

        # Per-pixel payload diet (r3 measured: each in-kernel varying lane
        # costs ~1.9 ms of masked chunk reductions at 1080p/97k, and the
        # deferred winner-row gather ~0.5 ms/lane of gather width — so
        # every lane removed is won twice):
        #   - world_pos reconstruction from depth (dropping its 3 lanes)
        #     was tried and DELETED: measured unusable in f32 (see the
        #     _shade_pixels comment) — the lanes ride the deferred
        #     winner-row gather, which the optimization barrier made ~free.
        #   - material parameters ride NO lanes at all when the id payload
        #     can pack (source_tri, material_id) into its 24 exact f32 bits:
        #     the shade stage re-expands them with a one-hot [H*W, M] @
        #     [M, 12] matmul (MXU — ~free vs either the r2 flat lanes or a
        #     narrow per-pixel bank gather). RENDERER_FLAT_MATS=1 forces
        #     the r2 flat-lane scheme for A/B.
        import os as _os_fm

        flat_mats = _os_fm.environ.get("RENDERER_FLAT_MATS", "0") != "0"
        n_mats = int(scene.materials.metallic.shape[0])
        src_bits = max(1, (layout.num_triangles - 1).bit_length())
        mat_bits = max(1, (n_mats - 1).bit_length())
        pack_ok = (not flat_mats) and (src_bits + mat_bits <= 24)
        # DEFAULT since r3: RENDERER_DEFER_VARY=kernel — in-kernel
        # winner-row gather resolve (tpu.dynamic_gather from the VMEM
        # slab), replacing the XLA-side per-pixel row gather + blend of
        # the deferred path; see rasterize_binned_pallas gmode. Needs the
        # arith source mapping (slot ids in col 19, material id as a flat
        # lane). Measured (1080p/97k textured frame): kernel@chunk32
        # 56.9 ms vs XLA defer 60.75 vs in-kernel masked lanes ~110.
        # "1" restores the XLA defer resolve; "0" the masked lanes.
        defer_env = _os_fm.environ.get("RENDERER_DEFER_VARY", "kernel")
        defer_on = defer_env != "0"
        defer_kernel = defer_env == "kernel" and not flat_mats
        # Arithmetic source mapping (default on the deferred path): the
        # near-clip source map is clip_src == slot % T BY CONSTRUCTION
        # (ops/clip.py emits [primary(T), secondary(T)]), so the deferred
        # ids payload is redundant — source ids come from one subtract and
        # the material id rides a flat table lane instead (an exact small
        # int, winner-selected). This frees the defer table of every
        # f32-exactness-bound column, enabling the bf16 table diet
        # (RENDERER_DEFER_DTYPE=bf16). RENDERER_PACK_IDS=1 restores the
        # packed-ids payload for A/B.
        arith_src = (
            defer_on
            and not flat_mats
            and (
                defer_kernel
                or _os_fm.environ.get("RENDERER_PACK_IDS", "0") == "0"
            )
        )
        defer_dtype = (
            "bf16"
            if (
                arith_src
                and not defer_kernel  # kernel mode reads the f32 slab
                and n_mats <= 256  # ids stay exact at 8 mantissa bits
                # compacted secondaries add a SOURCE-ID flat lane (values
                # up to T) that bf16 would quantize above 256 — the
                # arithmetic slot%T mapping the bf16 diet relied on does
                # not exist under compaction
                and clip_overflow is None
                and _os_fm.environ.get("RENDERER_DEFER_DTYPE") == "bf16"
            )
            else None
        )

        packed = [vs.world_pos, vs.world_normal]
        if layout.has_textures:
            # uv (and tangent) lanes only when a sampler will read them
            packed.append(scene.uvs)
            if layout.texture_slots[1]:
                packed.append(vs.world_tangent)
        attr = jnp.concatenate(packed, axis=-1)  # [V,K]
        # SoA geometry prep (default; RENDERER_GEOM=0 restores AoS): hand
        # the pallas prep the compact [V,K] attrs + [T,3] vertex ids +
        # [t]-plane clip frame so it never materializes a [t,3,K]-shaped
        # array (minor-dim padding) nor the 40-column table stack.
        # Bit-identical either way (tests assert at frame level). Default
        # flipped 2026-08-19: a remote-compiler update pessimized the AoS
        # stack lowering ~70 ms/frame at 1080p (probe_stages defer 26.9 ->
        # 97.8 ms with identical source); the SoA build measured 60.9 ms
        # frames on the same compiler — and was frame-neutral on the old
        # one, so it is the safe default under both.
        geom_soa = (
            defer_on and _os_fm.environ.get("RENDERER_GEOM", "soa") == "soa"
        )
        tri_attr_src = (
            None if geom_soa else attr[scene.tris]
        )  # [T,3,K] — composition with the
        # clip frame happens per column inside the kernel prep (vary_bary).
        fused_mid = False
        mat_flat = None
        if arith_src:
            # material id as a flat table lane; no ids payload at all
            ids_payload = None
            mat_flat = scene.tri_material[:, None].astype(jnp.float32)
            if clip_overflow is not None:
                # compacted secondaries break the slot%T source identity:
                # carry the source id as one more flat lane instead (the
                # [T] identity column gathers through vary_src=clip_src in
                # the table build, so the winner lane IS clip_src[slot];
                # exact in f32 for T < 2^24)
                mat_flat = jnp.concatenate(
                    [
                        mat_flat,
                        jnp.arange(
                            layout.num_triangles, dtype=jnp.float32
                        )[:, None],
                    ],
                    axis=-1,
                )
        elif pack_ok:
            # id payload = source_tri | material_id << src_bits (exact:
            # src_bits + mat_bits <= 24); unpacked right after the raster
            ids_payload = clip_src | (
                scene.tri_material[clip_src] << src_bits
            )
        else:
            ids_payload = clip_src
            # r2 flat-lane fallback: per-material-VARYING columns ride the
            # kernel's flat channels; scene-constant columns
            # (layout.material_constants) rebuild as broadcast scalars.
            mat_full = _material_bank(scene.materials)[scene.tri_material]
            var_cols = [
                k for k in range(11) if layout.material_constants[k] is None
            ]
            flat_cols = (
                [mat_full[:, jnp.asarray(var_cols, jnp.int32)]] if var_cols else []
            )
            fused_mid = (
                layout.has_textures
                and scene.textures is not None
                and scene.textures.mat_atlas is not None
            )
            if fused_mid:
                # texture-set id as the LAST flat lane (exact: ids < 2^24)
                flat_cols.append(
                    scene.textures.mat_set[scene.tri_material][:, None].astype(
                        jnp.float32
                    )
                )
            mat_flat = jnp.concatenate(flat_cols, axis=-1) if flat_cols else None
        vis, varying_img = rasterize_binned_pallas(
            setup, height, width, pipeline,
            depth_init=(
                None if depth_clear == 1.0
                else jnp.full((height, width), depth_clear, jnp.float32)
            ),
            varyings=tri_attr_src,
            varyings_soa=(attr, scene.tris) if geom_soa else None,
            vary_src=clip_src,
            vary_bary=None if geom_soa else clip_bary,
            vary_bary_planes=clip_bary_planes if geom_soa else None,
            flat_varyings=mat_flat,
            ids=ids_payload,  # kernel writes SOURCE (packed) ids directly
            skip_bary=True,  # fused consumers never read vis.bary
            small_limit=bin_small_limit,
            # deferred attribute resolve (see rasterize_binned_pallas):
            # kernel lanes cost candidate-proportional masked reductions;
            # the post-kernel wide-row gather is pixel-proportional.
            # RENDERER_DEFER_VARY=0 restores the in-kernel lanes for A/B;
            # =kernel (default) swaps the XLA gather+blend for the
            # in-kernel dynamic_gather resolve. chunk=32 measured best for
            # the resolve kernel (22.13/22.70/25.58 cum at 32/64/128 —
            # bigger chunks cost vreg pressure in the main loop; the
            # transposed slab lane-pads to 128 either way).
            defer_varyings="kernel" if defer_kernel else defer_on,
            sub_h=int(_os_fm.environ.get("RENDERER_FUSE_SUB_H", "16")),
            defer_dtype=defer_dtype,
            chunk=int(
                _os_fm.environ.get(
                    "RENDERER_FUSE_CHUNK", "32" if defer_kernel else "64"
                )
            ),
        )
        if arith_src and clip_overflow is not None:
            # compacted secondaries: material id at flat lane -2, source
            # id at the trailing lane (both exact winner-selected ints)
            mat_id_img = jnp.where(
                vis.tri_id >= 0, varying_img[..., -2].astype(jnp.int32), 0
            )
            vis = vis.replace(
                tri_id=jnp.where(
                    vis.tri_id >= 0,
                    varying_img[..., -1].astype(jnp.int32),
                    vis.tri_id,
                )
            )
        elif arith_src:
            # winner slot -> (source triangle, material id): src is slot
            # mod T by clip construction; the material id is the trailing
            # flat lane (exact winner-selected int)
            mat_id_img = jnp.where(
                vis.tri_id >= 0, varying_img[..., -1].astype(jnp.int32), 0
            )
            t0 = layout.num_triangles
            vis = vis.replace(
                tri_id=jnp.where(
                    vis.tri_id >= t0, vis.tri_id - t0, vis.tri_id
                )
            )
        elif pack_ok:
            # unpack (source_tri, material_id) from the winner payload
            mat_id_img = jnp.where(
                vis.tri_id >= 0, vis.tri_id >> src_bits, 0
            )
            vis = vis.replace(
                tri_id=jnp.where(
                    vis.tri_id >= 0,
                    vis.tri_id & ((1 << src_bits) - 1),
                    vis.tri_id,
                )
            )
        else:
            mat_id_img = None
        out_h = height
        y_offset = 0
        bary3 = None  # unused: varyings are already interpolated
        ids_are_source = True
        fused_materials = not (pack_ok or arith_src)
        shade_fused_mid = fused_mid
        shade_mat_id_img = mat_id_img
    elif stencil is not None:
        # stencil test/update state machine (scan path; ≙ the
        # StencilAttachment dynamic-rendering config, rendering.rs:537-648)
        from renderer_rs_tpu.ops.raster import rasterize_stencil

        vis, stencil_buf = rasterize_stencil(
            setup, height, width, pipeline, stencil
        )
        out_h = height
        y_offset = 0
    elif band is None and coverage_fn is None:
        vis, ids_are_source = _rasterize_dispatch(
            setup, height, width, pipeline, n_raster_tris,
            skip_bary=ids_only,  # ids+depth only: no bary reductions
            # the kernel writes SOURCE ids directly (col 19 payload) so
            # the ids-only consumer skips the 8M-index slot->source
            # remap gather at sample resolution
            ids=clip_src if ids_only else None,
            depth_init=(
                None if depth_clear == 1.0
                else jnp.full((height, width), depth_clear, jnp.float32)
            ),
            small_limit=bin_small_limit,
        )
        out_h = height
        y_offset = 0
    else:
        if band is not None:
            # (y_offset, band_h) contiguous; (y_offset, band_h, stride)
            # interleaved rows — the load-balanced multi-chip sharding
            y_offset, out_h = band[0], band[1]
            y_stride = band[2] if len(band) > 2 else 1
            y_pair = len(band) > 3 and bool(band[3])
        else:
            y_offset, out_h, y_stride = 0, height, 1
        if (
            band is not None
            and coverage_fn is None
            and supports_binned(pipeline, n_raster_tris)
        ):
            # band rendering on the FAST rasterizer (VERDICT r2 item 3):
            # bin only the band's rows (band-space tiles) and offset the
            # kernel's pixel rows — multi-chip no longer pays the O(T)
            # sequential scan per device
            band_dinit = (
                None if depth_clear == 1.0
                else jnp.full((out_h, width), depth_clear, jnp.float32)
            )
            if _use_pallas():
                from renderer_rs_tpu.ops.raster_pallas import (
                    rasterize_binned_pallas,
                )

                vis = rasterize_binned_pallas(
                    setup, out_h, width, pipeline,
                    depth_init=band_dinit,
                    y_offset=y_offset, y_stride=y_stride,
                    y_pair=y_pair,
                    small_limit=bin_small_limit,
                )
            else:
                vis = rasterize_binned(
                    setup, out_h, width, pipeline,
                    cap=_binned_cap(n_raster_tris, height, width),
                    depth_init=band_dinit,
                    y_offset=y_offset, y_stride=y_stride,
                    y_pair=y_pair,
                    small_limit=bin_small_limit,
                )
        else:
            # exact scan rasterizer: pixel-row offsets and coverage callbacks
            vis = rasterize(
                setup, out_h, width, pipeline, y_offset=y_offset,
                coverage_fn=coverage_fn, y_stride=y_stride,
                y_pair=y_pair,
                depth_init=(
                    None if depth_clear == 1.0
                    else jnp.full((out_h, width), depth_clear, jnp.float32)
                ),
            )
    if varying_img is None and not ids_only:
        bary3 = perspective_bary(vis, setup)
        # map clipped winners back to source triangles + source barycentrics
        slot = jnp.maximum(vis.tri_id, 0)
        bary3 = jnp.einsum("hwv,hwvk->hwk", bary3, clip_bary[slot])
    else:
        bary3 = None  # varyings already interpolated in-kernel
    if not ids_are_source:
        # slot -> source-triangle remap (the fused kernel already wrote
        # source ids via its `ids` payload lane, skipping this gather)
        slot = jnp.maximum(vis.tri_id, 0)
        vis = vis.replace(
            tri_id=jnp.where(vis.tri_id >= 0, clip_src[slot], vis.tri_id)
        )
    if ids_only:
        # visibility-only render (the sample-rate pass of the resolve-mode
        # MSAA): source-triangle winner ids, no shading
        return vis.tri_id

    # Fast-ambient environments: hand the per-pixel sky rays to the shading
    # stage so the skybox sample merges into the specular-IBL atlas fetch.
    sky_dirs = None
    if (
        shading == ShadingModel.PBR_IBL
        and layout.has_environment
        and scene.environment is not None
        and scene.environment.irradiance_mips is not None
        and scene.environment.atlas is not None
    ):
        from renderer_rs_tpu.ops.skybox import pixel_ray_directions

        inv_vp = jnp.linalg.inv(scene.camera.view_projection)
        sky_dirs = pixel_ray_directions(
            inv_vp, out_h, width, y_offset, height,
            y_stride if band is not None else 1,
            y_pair=y_pair,
        )

    color, sky_rgb = _shade_pixels(
        scene, layout, shading, vis, vs, bary3, shadow_map, shadow_params,
        varying=varying_img,
        fused_materials=fused_materials,
        fused_material_constants=(
            layout.material_constants if fuse and not peel else None
        ),
        sky_dirs=sky_dirs,
        fused_mid=(fuse and not peel and shade_fused_mid),
        mat_id_img=shade_mat_id_img,
        full_rows=band is None,
        # contiguous bands starting at an odd framebuffer row keep the
        # full-frame quad row-pairing for the texture-LOD derivatives
        # (interior rows; pair-interleaved shards start even by
        # construction, so their parity is 0)
        y_parity=(y_offset % 2 if (band is not None and not y_pair) else 0),
    )

    bg = jnp.broadcast_to(
        jnp.asarray(clear_color, jnp.float32), (out_h, width, 4)
    )
    out = jnp.where(vis.covered[..., None], color, bg)

    if sky_rgb is not None:
        # ≙ skybox_pass composite (far-plane pixels), sample already fetched
        sky_rgba = jnp.concatenate(
            [sky_rgb, jnp.ones_like(sky_rgb[..., :1])], axis=-1
        )
        out = jnp.where((vis.depth >= 1.0)[..., None], sky_rgba, out)
    elif layout.has_environment and scene.environment is not None:
        inv_vp = jnp.linalg.inv(scene.camera.view_projection)
        out = skybox_pass(
            out,
            vis.depth,
            inv_vp,
            scene.environment.skybox_mips[0],
            y_offset=y_offset,
            full_height=height,
            y_stride=y_stride if band is not None else 1,
            y_pair=y_pair,
        )

    if tonemap != "none":
        out = apply_tonemap(out, tonemap)
    outs = (out,)
    if return_depth:
        outs = outs + (vis.depth,)
    if return_stencil:
        outs = outs + (stencil_buf,)
    if return_ids:
        # per-pixel winner SOURCE ids (resolve-mode MSAA's 1x pass)
        outs = outs + (vis.tri_id,)
    if diagnostics:
        # deviation telemetry (VERDICT r2 item 9): scalar counters proving
        # the documented bounds did not fire this frame
        outs = outs + (
            {
                "peel_exhausted": (
                    peel_exhausted
                    if peel_exhausted is not None
                    else jnp.int32(0)
                ),
                # near-clip secondary halves beyond the compaction cap
                # (RENDERER_CLIP_COMPACT; dropped clipped halves)
                "clip_overflow": (
                    clip_overflow
                    if clip_overflow is not None
                    else jnp.int32(0)
                ),
            },
        )
    return outs if len(outs) > 1 else out


def transparent_pass(
    color: jnp.ndarray,
    depth: jnp.ndarray,
    scene: GpuScene,
    layout: SceneLayout,
    pipeline: GraphicsPipeline,
    width: int,
    height: int,
    shading: ShadingModel = ShadingModel.BLINN_PHONG,
    rendering=None,
    shadow_map: jnp.ndarray | None = None,
    shadow_params: ShadowParams = ShadowParams(),
    light_space_matrix: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sorted back-to-front alpha blending over an opaque frame.

    rendering: optional rhi.rendering.RenderingConfig. The transparent
    pass's natural attachment state is LOAD/LOAD (start from the opaque
    color and depth, ≙ VK_ATTACHMENT_LOAD_OP_LOAD under the alpha_blend
    preset); CLEAR ops replace the corresponding input with the config's
    clear values instead.

    shadow_map: optional single sun shadow map [S,S] rendered for the
    opaque pass — the reference's PBR fragment applies the PCF shadow
    factor to the directional term regardless of blend state
    (model_pbr.hlsl:278-297), so transparent surfaces receive shadows
    too. `light_space_matrix` overrides scene.light_space_matrix when the
    transparent scene was built separately from the shadow-casting one.
    (CSM cascade arrays are not accepted here — the transparent pass
    anchors to model_pbr.hlsl's single-map path.)

    ≙ the classic transparent pass the reference's alpha_blend preset
    (pipeline.rs:524-544) is built for: depth-TEST against the opaque depth
    buffer, no depth WRITE, src-over composition in view-depth order.
    Triangles sort by centroid NDC depth (descending) inside the jit, so the
    pass stays one traced program. The blend preset is shading-agnostic
    (as in the reference): `shading` picks sun Blinn-Phong + ambient or
    Cook-Torrance PBR direct + hemisphere ambient (model_pbr.hlsl under
    alpha_blend). Varyings interpolate PERSPECTIVE-correctly (the slot's
    1/w weights composed with the near-clip frame), matching the opaque
    path and the reference's default interpolation qualifiers.

    color/depth: [H,W,4]/[H,W] from the opaque pass. Returns blended color.
    """
    import dataclasses as _dc

    from renderer_rs_tpu.ops import blinn_phong as _bp

    if rendering is not None:
        from renderer_rs_tpu.rhi.rendering import AttachmentLoadOp

        if rendering.color.load_op == AttachmentLoadOp.CLEAR:
            color = jnp.broadcast_to(
                jnp.asarray(rendering.color.clear_color, jnp.float32),
                (height, width, 4),
            )
        if rendering.depth is not None and rendering.depth.load_op == AttachmentLoadOp.CLEAR:
            depth = jnp.full((height, width), rendering.depth.clear_depth, jnp.float32)

    vs = vertex_stage(scene, layout)
    tri_clip = gather_triangle_clip(vs.clip, scene.tris)
    from renderer_rs_tpu.ops.clip import clip_triangles_near

    tri_clip, clip_valid, clip_src, clip_bary = clip_triangles_near(tri_clip)

    blend_pipe = _dc.replace(
        pipeline,
        blend=ColorBlendAttachment.alpha_blend(),
        depth_write_enable=False,
    )
    setup = setup_triangles(tri_clip, width, height, blend_pipe, tri_valid=clip_valid)

    # back-to-front order by centroid NDC depth (painter's sort)
    centroid_z = jnp.mean(setup.z, axis=-1)
    order = jnp.argsort(-jnp.where(setup.valid, centroid_z, -jnp.inf))
    setup = jax.tree.map(lambda a: a[order], setup)
    src_sorted = clip_src[order]
    cb_sorted = clip_bary[order]  # [T,3,3] clipped-vertex -> source frame

    # per-triangle shading tables (material constants per sorted slot)
    tri_n = vs.world_normal[scene.tris]  # [T,3,3]
    tri_p = vs.world_pos[scene.tris]
    mats = scene.materials
    bank_rgba = mats.base_color[scene.tri_material]  # [T,4]
    bank_rough = mats.roughness[scene.tri_material]
    bank_metal = mats.metallic[scene.tri_material]
    bank_ao = mats.ao[scene.tri_material]
    bank_emis = mats.emissive[scene.tri_material][:, :3]
    bank_nscale = mats.normal_scale[scene.tri_material]
    lights = scene.lights
    cam_pos = scene.camera.camera_position
    w3 = setup.w  # sorted slots' clip w (perspective weights)

    # sun shadow over transparents (VERDICT r3 item 5): the reference's PBR
    # fragment shadows the directional term under any blend state
    # (model_pbr.hlsl:278-297); reuse the opaque pass's map.
    lsm = light_space_matrix
    if lsm is None:
        lsm = getattr(scene, "light_space_matrix", None)
    shadowed = shadow_map is not None and lsm is not None and shadow_map.ndim == 2

    # textured transparents (VERDICT r2 item 6 + r3 item 5): every bound
    # slot — base/normal/MR/AO/emissive — samples per sorted fragment
    # layer from mip 0, matching model_pbr.hlsl:205-245 under the
    # alpha_blend preset (pipeline.rs:524-544). (Transparent layer counts
    # are small; trilinear would re-derive screen LOD per layer.)
    textured = layout.has_textures and (scene.textures is not None)
    slot_on = [
        textured and layout.texture_slots[i] for i in range(5)
    ]
    if textured:
        tri_uv = scene.uvs[scene.tris]  # [T,3,2]
        tex_slot = mats.tex_ids[scene.tri_material]  # [T,5]
        base_mip0 = scene.textures.mips[0]
    if slot_on[1]:
        tri_t = vs.world_tangent[scene.tris]  # [T,3,4]

    def fragment_fn(t, bary3, mask):
        s = src_sorted[t]
        # perspective-correct barycentrics: weight by the slot's 1/w and
        # renormalize (same math as the opaque kernel's varying lanes)...
        inv_w = 1.0 / jnp.maximum(w3[t], 1e-12)  # [3]
        wb = bary3 * inv_w
        denom = jnp.sum(wb, axis=-1, keepdims=True)
        bpersp = wb / jnp.where(denom == 0.0, 1.0, denom)
        # ...then compose with the clip frame so near-plane-clipped
        # sub-triangles interpolate SOURCE-vertex attributes
        bsrc = jnp.einsum("hwv,vk->hwk", bpersp, cb_sorted[t])
        n = normalize(jnp.einsum("hwv,vk->hwk", bsrc, tri_n[s]))
        p = jnp.einsum("hwv,vk->hwk", bsrc, tri_p[s])
        view = normalize(cam_pos - p)
        albedo = bank_rgba[s][:3]
        alpha_f = bank_rgba[s][3]
        metallic = bank_metal[s]
        roughness = bank_rough[s]
        ao = bank_ao[s]
        emissive = bank_emis[s]
        if textured:
            from renderer_rs_tpu.ops.sampling import sample_array_bilinear

            uv = jnp.einsum("hwv,vk->hwk", bsrc, tri_uv[s])
            tids = tex_slot[s]  # [5]

            def smp(slot):
                return sample_array_bilinear(
                    base_mip0,
                    jnp.broadcast_to(tids[slot], uv.shape[:-1]),
                    uv,
                )

            if slot_on[0]:
                bc = smp(0)
                has = tids[0] >= 0
                albedo = jnp.where(has, albedo * bc[..., :3], albedo)
                alpha_f = jnp.where(has, alpha_f * bc[..., 3], alpha_f)
            if slot_on[1]:
                # TBN normal mapping (model_pbr.hlsl:168-197)
                t4 = jnp.einsum("hwv,vk->hwk", bsrc, tri_t[s])
                t3 = normalize(t4[..., :3])
                b3 = jnp.cross(n, t3) * t4[..., 3:4]
                n_ts = smp(1)[..., :3] * 2.0 - 1.0
                n_ts = jnp.concatenate(
                    [n_ts[..., :2] * bank_nscale[s], n_ts[..., 2:3]], axis=-1
                )
                mapped = normalize(
                    t3 * n_ts[..., 0:1]
                    + b3 * n_ts[..., 1:2]
                    + n * n_ts[..., 2:3]
                )
                n = jnp.where(tids[1] >= 0, mapped, n)
            if slot_on[2]:
                # glTF MR texture: G=roughness, B=metallic
                mr = smp(2)
                has = tids[2] >= 0
                metallic = jnp.where(has, metallic * mr[..., 2], metallic)
                roughness = jnp.where(has, roughness * mr[..., 1], roughness)
            if slot_on[3]:
                ao = jnp.where(tids[3] >= 0, ao * smp(3)[..., 0], ao)
            if slot_on[4]:
                em = smp(4)
                emissive = jnp.where(tids[4] >= 0, emissive * em[..., :3], emissive)
        sun_dir = normalize(-lights.sun_direction)
        if shadowed:
            shadow = calculate_shadow(
                shadow_map, lsm, p, n,
                jnp.broadcast_to(sun_dir, p.shape), shadow_params,
            )[..., None]
        else:
            shadow = 1.0
        if shading in (ShadingModel.PBR, ShadingModel.PBR_IBL):
            # Cook-Torrance direct + hemisphere ambient under alpha blend
            # (model_pbr.hlsl with the alpha_blend preset); sun term takes
            # the PCF factor (model_pbr.hlsl:278-297)
            mat = pbr_ops.PBRMaterialParams(
                albedo=jnp.broadcast_to(albedo, p.shape),
                metallic=jnp.broadcast_to(metallic, p.shape[:-1]),
                roughness=pbr_ops.clamp_roughness(
                    jnp.broadcast_to(roughness, p.shape[:-1])
                ),
                ao=jnp.broadcast_to(ao, p.shape[:-1]),
                emissive=jnp.broadcast_to(emissive, p.shape),
            )
            rgb = shadow * pbr_ops.pbr_direct(
                n, view, jnp.broadcast_to(sun_dir, p.shape),
                lights.sun_color * lights.sun_intensity, mat,
            )
            rgb = rgb + pbr_ops.hemisphere_ambient(n, mat.albedo, mat.ao)
            rgb = rgb + mat.emissive
        else:
            rgb = shadow * _bp.directional_light(
                lights.sun_direction, lights.sun_color, lights.sun_intensity,
                n, view, albedo, roughness,
            ) + scene.scene_ubo.ambient_color * albedo
        a = jnp.broadcast_to(alpha_f, rgb.shape[:-1])[..., None]
        return jnp.concatenate([rgb, a], axis=-1)

    blended, _ = rasterize_ordered(
        setup, height, width, blend_pipe, fragment_fn, color, depth_init=depth
    )
    return blended
