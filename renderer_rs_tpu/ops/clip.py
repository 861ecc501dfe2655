"""Near-plane clipping (Sutherland–Hodgman against w = eps).

The raster setup drops triangles with any vertex at w <= eps whole
(raster.py validity test) — fine for fully-behind geometry, wrong for
triangles CROSSING the near plane (a floor extending under the camera
vanishes). This pass runs before setup and replaces such triangles with
their clipped forms.

Static shapes: clipping one triangle against one plane yields 3 or 4
vertices (1 or 2 triangles), so the output buffer is a fixed [2T] triangle
array:
- slot t     : the (possibly clipped) primary triangle
- slot T + t : the second fan triangle when the clip produced a quad,
               else marked invalid

All arithmetic is vectorized over T with `where` case-selection (no dynamic
shapes, XLA-friendly). Winding of the clipped polygon follows the input
order, so facing/culling still work.
"""

from __future__ import annotations

import jax.numpy as jnp

NEAR_EPS = 1e-5  # > raster _W_EPS so clipped vertices survive the setup w-test


def _lerp_vertex(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Clip-space interpolation a + t*(b-a); t [T,1] broadcast over xyzw."""
    return a + t * (b - a)


def _intersect_t(wa: jnp.ndarray, wb: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Parameter where the edge a->b crosses w = eps."""
    denom = wb - wa
    return (eps - wa) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)


def clip_triangles_near_planes(
    tri_clip: jnp.ndarray, eps: float = NEAR_EPS
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, tuple]:
    """SoA variant of clip_triangles_near: identical vertices/validity, but
    the source-barycentric frame returns as 9 flat [2T] planes
    (``bary_planes[i][j][t] == bary_src[t, i, j]``).

    Why: every op over a [T,3,3]-shaped array pads its (3,3) minor dims to
    the TPU's (8,128) physical tile — ~100x wasted VPU/HBM per pass. The
    bary chain of the array form (basis selects, lerps, case wheres, concat)
    measured ~6 ms/frame at 97k tris; the same math over [T] planes is
    bit-identical (elementwise ops, same operand order) and ~free.
    """
    clipped, valid, src, planes = _clip_impl(tri_clip, eps)
    return clipped, valid, src, planes


def bary_planes_to_array(planes: tuple) -> jnp.ndarray:
    """Assemble the [2T,3,3] bary_src array from the 3x3 plane tuple."""
    return jnp.stack(
        [jnp.stack(list(row), axis=-1) for row in planes], axis=-2
    )


def clip_triangles_near(
    tri_clip: jnp.ndarray, eps: float = NEAR_EPS
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clip [T,3,4] clip-space triangles against w >= eps.

    Returns (clipped [2T,3,4], valid [2T] bool, src_index [2T] int32,
    bary_src [2T,3,3]).

    Instead of emitting new attribute sets for clipped vertices, each output
    vertex carries its barycentric coordinates w.r.t. the SOURCE triangle
    (identity for unclipped ones). Downstream, perspective-correct screen
    interpolation over the clipped triangle composed with these source
    barycentrics reproduces exact original-attribute interpolation (clip-space
    lerp of a vertex is the same lerp of its attributes).
    """
    clipped, valid, src, planes = _clip_impl(tri_clip, eps)
    return clipped, valid, src, bary_planes_to_array(planes)


def compact_secondary(
    tri_clip2: jnp.ndarray,
    valid2: jnp.ndarray,
    src2: jnp.ndarray,
    planes2: tuple,
    cap: int,
) -> tuple:
    """Compact the secondary clip half [T, 2T) into a static `cap` block.

    The [2T] layout reserves a full secondary slot per triangle although
    only near-plane-CROSSING triangles (typically <<1%) produce one — yet
    every downstream per-slot pass (setup, kernel-table build, binning
    side list) pays for all 2T slots (r4 attribution: the table build
    alone is ~7 ms/frame at 97k tris). This keeps slots [0,T) unchanged
    and gathers the valid secondaries (stable ascending order — slot ids
    stay submission-ordered, so equal-depth tie semantics are preserved)
    into slots [T, T+cap).

    Returns (tri_clip [T+cap,3,4], valid [T+cap], src [T+cap], planes
    3x3 of [T+cap], overflow scalar int32). overflow counts valid
    secondaries beyond `cap` (those drop — a hole at the near plane;
    surface the counter, size the cap generously).
    """
    (out_clip,), valid, src, planes, overflow = _compact_core(
        [tri_clip2], valid2, src2, planes2, cap
    )
    return out_clip, valid, src, planes, overflow


def _compact_core(arrays, valid2, src2, planes2, cap):
    """Shared compaction core: stable valid-first ordering of the
    secondary half, per-array [primary | gathered-secondary] concat,
    overflow count. `arrays` is any list of [2T,...]-leading arrays."""
    t = valid2.shape[0] // 2
    cap = min(cap, t)
    sec_valid = valid2[t:]
    order = jnp.argsort(~sec_valid, stable=True)[:cap].astype(jnp.int32)
    keep = sec_valid[order]

    def cc(x):
        return jnp.concatenate([x[:t], x[t + order]], axis=0)

    out_valid = jnp.concatenate([valid2[:t], keep])
    out_src = jnp.concatenate([src2[:t], src2[t + order]])
    out_planes = tuple(tuple(cc(p) for p in row) for row in planes2)
    overflow = jnp.maximum(
        jnp.sum(sec_valid.astype(jnp.int32)) - jnp.int32(cap), 0
    )
    return [cc(a) for a in arrays], out_valid, out_src, out_planes, overflow


def clip_triangles_near_v(
    v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray, eps: float = NEAR_EPS
) -> tuple:
    """Plane-form clip: per-vertex [T,4] rows in, per-vertex [2T,4] rows
    out (A, B, C), plus (valid [2T], src [2T], bary planes 3x3 of [2T]).
    Identical math to clip_triangles_near — the [2T,3,4] array is simply
    never assembled (the r4 plane-form geometry chain; the caller feeds
    setup_triangles_planes directly)."""
    va, vb, vc, i_ab, i_ac, n_behind, t_ab1, t_ac1, sel1, sel2 = _clip_core(
        v0, v1, v2, eps
    )
    t = v0.shape[0]
    one2 = (n_behind == 1)[:, None]
    two2 = (n_behind == 2)[:, None]
    # primary triangle vertices (same case selection as the array form,
    # per vertex): 1-behind -> (i_ab, B, C); 2-behind -> (A, i_ab, i_ac);
    # unclipped -> (v0, v1, v2). Secondary: (i_ab, C, i_ac).
    pa = jnp.where(one2, i_ab, jnp.where(two2, va, v0))
    pb = jnp.where(one2, vb, jnp.where(two2, i_ab, v1))
    pc = jnp.where(one2, vc, jnp.where(two2, i_ac, v2))
    out_a = jnp.concatenate([pa, i_ab], axis=0)
    out_b = jnp.concatenate([pb, vc], axis=0)
    out_c = jnp.concatenate([pc, i_ac], axis=0)
    valid = jnp.concatenate([n_behind < 3, n_behind == 1])
    src = jnp.concatenate(
        [jnp.arange(t, dtype=jnp.int32), jnp.arange(t, dtype=jnp.int32)]
    )
    planes = _bary_planes(n_behind, t_ab1, t_ac1, sel1, sel2)
    return out_a, out_b, out_c, valid, src, planes


def compact_secondary_v(
    a: jnp.ndarray,
    b: jnp.ndarray,
    c: jnp.ndarray,
    valid2: jnp.ndarray,
    src2: jnp.ndarray,
    planes2: tuple,
    cap: int,
) -> tuple:
    """compact_secondary over the plane-form clip output (per-vertex
    [2T,4] rows instead of the [2T,3,4] array). Same slot semantics."""
    outs, valid, src, planes, overflow = _compact_core(
        [a, b, c], valid2, src2, planes2, cap
    )
    return tuple(outs), valid, src, planes, overflow


def _clip_core(v0, v1, v2, eps):
    """Shared case analysis of the near clip over per-vertex [T,4] rows."""
    behind0 = v0[:, 3] < eps
    behind1 = v1[:, 3] < eps
    behind2 = v2[:, 3] < eps
    n_behind = (
        behind0.astype(jnp.int32)
        + behind1.astype(jnp.int32)
        + behind2.astype(jnp.int32)
    )

    # which vertex is "alone" on its side:
    # case 1-behind: the single behind vertex is A
    # case 2-behind: the single in-front vertex is A
    behind = jnp.stack([behind0, behind1, behind2], axis=-1)
    a_one = jnp.argmax(behind.astype(jnp.int32), axis=-1)  # first behind
    a_two = jnp.argmax((~behind).astype(jnp.int32), axis=-1)  # first in-front
    sel_a = jnp.where(n_behind == 1, a_one, a_two).astype(jnp.int32)

    # rotate (A,B,C) so A is the distinguished vertex — select between the
    # three STATIC rotations instead of a take_along_axis gather (the
    # gather + [T,3]-index basis lookup measured ~2x the whole remaining
    # clip math; two where-cascades over [T,4]/constant rows are cheap)
    sel1 = sel_a == 1  # [T]
    sel2 = sel_a == 2
    s1 = sel1[:, None]
    s2 = sel2[:, None]
    va = jnp.where(s1, v1, jnp.where(s2, v2, v0))
    vb = jnp.where(s1, v2, jnp.where(s2, v0, v1))
    vc = jnp.where(s1, v0, jnp.where(s2, v1, v2))
    wa, wb_, wc = va[:, 3], vb[:, 3], vc[:, 3]

    # intersections on edges A-B and A-C (A is the lone vertex)
    t_ab1 = _intersect_t(wa, wb_, eps)  # [T]
    t_ac1 = _intersect_t(wa, wc, eps)
    i_ab = _lerp_vertex(va, vb, t_ab1[:, None])
    i_ac = _lerp_vertex(va, vc, t_ac1[:, None])
    return va, vb, vc, i_ab, i_ac, n_behind, t_ab1, t_ac1, sel1, sel2


def _clip_impl(tri_clip: jnp.ndarray, eps: float) -> tuple:
    t = tri_clip.shape[0]
    v0, v1, v2 = tri_clip[:, 0], tri_clip[:, 1], tri_clip[:, 2]  # [T,4]
    va, vb, vc, i_ab, i_ac, n_behind, t_ab1, t_ac1, sel1, sel2 = _clip_core(
        v0, v1, v2, eps
    )

    # --- case n_behind == 1 (A behind): quad (i_ab, B, C, i_ac) ----------------
    # primary triangle (i_ab, B, C); secondary (i_ab, C, i_ac)
    quad_tri1 = jnp.stack([i_ab, vb, vc], axis=1)
    quad_tri2 = jnp.stack([i_ab, vc, i_ac], axis=1)

    # --- case n_behind == 2 (A in front): triangle (A, i_ab, i_ac) --------------
    # NOTE: with B,C behind, edges A-B and A-C cross the plane.
    tri_small = jnp.stack([va, i_ab, i_ac], axis=1)

    one3 = (n_behind == 1)[:, None, None]
    two3 = (n_behind == 2)[:, None, None]
    primary = jnp.where(one3, quad_tri1, jnp.where(two3, tri_small, tri_clip))
    primary_valid = n_behind < 3

    secondary = quad_tri2
    secondary_valid = n_behind == 1

    clipped = jnp.concatenate([primary, secondary], axis=0)  # [2T,3,4]
    valid = jnp.concatenate([primary_valid, secondary_valid], axis=0)
    src = jnp.concatenate(
        [jnp.arange(t, dtype=jnp.int32), jnp.arange(t, dtype=jnp.int32)]
    )

    return clipped, valid, src, _bary_planes(n_behind, t_ab1, t_ac1, sel1, sel2)


def _bary_planes(n_behind, t_ab1, t_ac1, sel1, sel2) -> tuple:
    """Source-barycentric frame, as flat [2T] planes.

    The rotated basis rows are one-hots of sel_a: ba = e_{sel_a},
    bb = e_{sel_a+1 mod 3}, bc = e_{sel_a+2 mod 3}; each component is a
    constant-select over [T] (same where structure as the old [T,3] array
    form — values bit-identical), and the lerps/case-selects stay [T]."""
    e0 = (1.0, 0.0, 0.0)
    e1 = (0.0, 1.0, 0.0)
    e2 = (0.0, 0.0, 1.0)
    one = n_behind == 1  # [T]
    two = n_behind == 2
    planes = []
    for i in range(3):
        row = []
        for j in range(3):
            ba_j = jnp.where(sel1, e1[j], jnp.where(sel2, e2[j], e0[j]))
            bb_j = jnp.where(sel1, e2[j], jnp.where(sel2, e0[j], e1[j]))
            bc_j = jnp.where(sel1, e0[j], jnp.where(sel2, e1[j], e2[j]))
            bi_ab_j = ba_j + t_ab1 * (bb_j - ba_j)
            bi_ac_j = ba_j + t_ac1 * (bc_j - ba_j)
            # primary rows: 1-behind -> (bi_ab, B, C); 2-behind ->
            # (A, bi_ab, bi_ac); unclipped -> identity
            if i == 0:
                prim = jnp.where(one, bi_ab_j, jnp.where(two, ba_j, float(i == j)))
                sec = bi_ab_j
            elif i == 1:
                prim = jnp.where(one, bb_j, jnp.where(two, bi_ab_j, float(i == j)))
                sec = bc_j
            else:
                prim = jnp.where(one, bc_j, jnp.where(two, bi_ac_j, float(i == j)))
                sec = bi_ac_j
            row.append(jnp.concatenate([prim, sec], axis=0))  # [2T]
        planes.append(tuple(row))
    return tuple(planes)
