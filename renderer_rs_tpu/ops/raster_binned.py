"""Tile-binned rasterizer — the fast path for large triangle counts.

The reference rides dedicated raster hardware; the scan rasterizer in
raster.py is exact but O(T) *sequential*. This module restores parallelism
the way GPU tilers do (SURVEY.md §5 "long-context" analog):

1. **Bin**: per-triangle screen AABB -> tile overlap matrix -> per-tile
   triangle lists via top_k (ascending triangle index = submission order),
   padded to a static cap.
2. **Rasterize per tile** (vmapped): scan the tile's list in chunks of C
   triangles; each chunk evaluates coverage/depth for [TH,TW,C] candidates
   and reduces with an order-aware argmin/argmax, then merges into the tile's
   carry. All chunk work is dense VPU math on (8,128)-aligned tiles.
3. **Stitch** tiles back into the full visibility buffer.

Semantics vs raster.py (the exactness reference):
- Identical coverage (same canonical edge functions / top-left rule, same
  pixel centers — computed in GLOBAL screen coordinates so e-values are
  bit-identical to the scan path).
- Depth winners identical for ALL supported compare ops: equal-depth ties
  break to the first-submitted fragment under strict compares (a later
  equal fragment fails `<`) and to the last-submitted under
  LESS_OR_EQUAL/GREATER_OR_EQUAL (it re-passes `<=` and overwrites),
  exactly as the sequential scan semantics / Vulkan prescribe.
- EQUAL/NOT_EQUAL/NEVER and blending pipelines fall back to the scan path
  (renderer/passes.py chooses).

Cost: O(n_tiles · cap · TH · TW) dense work, independent of total T beyond
binning — the knob `cap` bounds per-tile depth complexity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from renderer_rs_tpu.ops.raster import (
    TriangleSetup,
    VisibilityBuffer,
    _edge,
    _top_left,
    eval_z_plane,
    z_plane_coeffs,
    z_plane_mode,
)
from renderer_rs_tpu.rhi.pipeline import CompareOp, GraphicsPipeline

_INF = float("inf")  # python scalar: no backend init at import time

BINNED_COMPARE_OPS = (
    CompareOp.LESS,
    CompareOp.LESS_OR_EQUAL,
    CompareOp.GREATER,
    CompareOp.GREATER_OR_EQUAL,
)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _is_banded(y_offset, y_stride) -> bool:
    """Whether band addressing is active (y_offset may be traced)."""
    return y_stride != 1 or not (isinstance(y_offset, int) and y_offset == 0)


def _tile_ranges(setup, height, width, tile_h, tile_w, nty, ntx,
                 y_offset=0, y_stride=1, y_pair=False):
    """Per-triangle inclusive tile AABB ranges + liveness.

    Band mode (y_offset/y_stride, multi-chip row sharding): `height` is the
    BAND height and tiles live in band-row space — band row k covers the
    physical pixel row y_offset + k*y_stride (_pixel_centers). The mapping
    uses conservative fractional bounds, so band tile lists are supersets of
    the covering triangles; coverage math culls exactly. The non-band path
    keeps the original integer formula (bit-identical membership)."""
    if setup.planes is not None:
        # plane form: min/max over the three [T] vertex planes directly —
        # equal to the [T,3] reduce for non-NaN coords (invalid tris are
        # masked by `alive` below either way)
        (px0, py0), (px1, py1), (px2, py2) = setup.planes
        x_min = jnp.minimum(jnp.minimum(px0, px1), px2)
        x_max = jnp.maximum(jnp.maximum(px0, px1), px2)
        y_min = jnp.minimum(jnp.minimum(py0, py1), py2)
        y_max = jnp.maximum(jnp.maximum(py0, py1), py2)
    else:
        xs = setup.xy[..., 0]  # [T,3]
        ys = setup.xy[..., 1]
        x_min, x_max = jnp.min(xs, -1), jnp.max(xs, -1)
        y_min, y_max = jnp.min(ys, -1), jnp.max(ys, -1)
    tx0 = jnp.clip(jnp.floor(x_min / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(x_max / tile_w).astype(jnp.int32), 0, ntx - 1)
    if _is_banded(y_offset, y_stride):
        yo = jnp.asarray(y_offset, jnp.float32)
        ky0 = (y_min - 0.5 - yo) / y_stride  # fractional band rows
        ky1 = (y_max - 0.5 - yo) / y_stride
        if y_pair:
            # pair-interleave: global row g(j) = yo + s*j - (s-1)*(j%2),
            # so g >= yo + s*j - (s-1) -> upper local-row bound gains a
            # conservative (s-1)/s slack (membership supersets are fine;
            # coverage culls exactly)
            ky1 = ky1 + (y_stride - 1.0) / y_stride
        ty0 = jnp.clip(jnp.floor(ky0 / tile_h).astype(jnp.int32), 0, nty - 1)
        ty1 = jnp.clip(jnp.floor(ky1 / tile_h).astype(jnp.int32), 0, nty - 1)
        y_on = (ky1 >= 0.0) & (ky0 <= height)
    else:
        ty0 = jnp.clip(jnp.floor(y_min / tile_h).astype(jnp.int32), 0, nty - 1)
        ty1 = jnp.clip(jnp.floor(y_max / tile_h).astype(jnp.int32), 0, nty - 1)
        y_on = (y_max >= 0.0) & (y_min <= height)
    onscreen = (
        (x_max >= 0.0)
        & (x_min <= width)
        & y_on
    )
    alive = setup.valid & onscreen
    return tx0, tx1, ty0, ty1, alive


def bin_triangles_dense(
    setup: TriangleSetup,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    y_offset=0,
    y_stride: int = 1,
    y_pair: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Dense-overlap binning (reference implementation, O(n_tiles*T)).

    Returns (tri_idx [n_tiles, cap] int32 — padded with T, counts [n_tiles],
    nty, ntx). Truncation: tiles overlapping more than `cap` triangles keep
    the first `cap` in submission order.
    """
    t = setup.num_triangles
    nty, ntx = _cdiv(height, tile_h), _cdiv(width, tile_w)
    tx0, tx1, ty0, ty1, alive = _tile_ranges(
        setup, height, width, tile_h, tile_w, nty, ntx, y_offset, y_stride,
        y_pair,
    )

    tile_y = jnp.arange(nty, dtype=jnp.int32)
    tile_x = jnp.arange(ntx, dtype=jnp.int32)
    # [nty, ntx, T] overlap
    oy = (tile_y[:, None, None] >= ty0) & (tile_y[:, None, None] <= ty1)
    ox = (tile_x[None, :, None] >= tx0) & (tile_x[None, :, None] <= tx1)
    overlap = oy & ox & alive
    overlap = overlap.reshape(nty * ntx, t)

    counts = jnp.sum(overlap, axis=-1).astype(jnp.int32)
    # smallest-`cap` triangle indices per tile, ascending (submission order)
    keys = jnp.where(overlap, jnp.arange(t, dtype=jnp.int32), t)
    k = min(cap, t)
    neg_top, _ = jax.lax.top_k(-keys, k)  # k smallest keys, descending neg
    tri_idx = -neg_top  # ascending triangle index; padded with t
    if k < cap:
        tri_idx = jnp.pad(tri_idx, ((0, 0), (0, cap - k)), constant_values=t)
    return tri_idx, counts, nty, ntx


def bin_triangles(
    setup: TriangleSetup,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    max_span_y: int = 2,
    max_span_x: int = 2,
    cap_big: int | None = None,
    y_offset=0,
    y_stride: int = 1,
    small_limit: int | None = None,
    y_pair: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, int, int]:
    """Sort-based binning — O(T·slots·logT) instead of O(n_tiles·T).

    small_limit: only slots < small_limit ride the expand+sort small path;
    slots beyond it (the near-clip SECONDARY half, live for <1% of
    triangles) route through the dense side list instead — halving the
    sort size of clipped scenes. If live side-list candidates ever exceed
    cap_big the lax.cond falls back to exact dense binning, so membership
    is unchanged in all cases.

    Small triangles (tile span ≤ max_span_y × max_span_x — up to 2x2 tiles
    = 64x256 px at the default tile shape, which covers everything but
    floors/skyquads) expand into (tile, tri) pairs and are sorted into
    per-tile segments; larger triangles go through a dense side list of up
    to cap_big entries (default scales as max(64, T/256)) that is merged per
    tile. Lists stay sorted by triangle id, so results are identical to
    bin_triangles_dense (same membership, same order) — asserted by tests.

    Overflow safety: if more than cap_big triangles exceed the span limit
    (e.g. a close-up with many screen-filling triangles), the side list can
    no longer hold them all — in that case a `lax.cond` falls back to the
    exact O(n_tiles·T) dense binning for the whole frame, so membership is
    always identical to bin_triangles_dense (never silently dropped).
    """
    t = setup.num_triangles
    nty, ntx = _cdiv(height, tile_h), _cdiv(width, tile_w)
    n_tiles = nty * ntx
    if cap_big is None:
        # scale with T (close-ups produce big triangles in proportion) but
        # stay small: the per-tile merge sorts [cap + cap_big] rows
        cap_big = max(64, t // 256)
    tx0, tx1, ty0, ty1, alive = _tile_ranges(
        setup, height, width, tile_h, tile_w, nty, ntx, y_offset, y_stride,
        y_pair,
    )

    span_ok = ((tx1 - tx0) < max_span_x) & ((ty1 - ty0) < max_span_y)
    sl = t if small_limit is None else min(small_limit, t)
    small = alive & span_ok
    big = alive & ~span_ok
    if sl < t:
        in_small = jnp.arange(t, dtype=jnp.int32) < sl
        big = alive & (~span_ok | ~in_small)
        small = small & in_small

    # --- small path: expand -> sort -> segment extract ------------------
    sy = jnp.arange(max_span_y, dtype=jnp.int32)
    sx = jnp.arange(max_span_x, dtype=jnp.int32)
    tys = ty0[:sl, None, None] + sy[None, :, None]  # [sl, sy, 1]
    txs = tx0[:sl, None, None] + sx[None, None, :]  # [sl, 1, sx]
    slot_ok = (
        small[:sl, None, None]
        & (tys <= ty1[:sl, None, None])
        & (txs <= tx1[:sl, None, None])
    )  # [sl, sy, sx]
    tile_ids = tys * ntx + txs  # broadcasts to [sl, sy, sx]
    tile_ids = jnp.broadcast_to(tile_ids, slot_ok.shape)
    tri_ids = jnp.broadcast_to(
        jnp.arange(sl, dtype=jnp.int32)[:, None, None], slot_ok.shape
    )
    flat_tiles = jnp.where(slot_ok, tile_ids, n_tiles).reshape(-1)
    flat_tris = jnp.where(slot_ok, tri_ids, t).reshape(-1)
    if (n_tiles + 1) * (t + 1) < 2**31:
        # fused single int32 key (tile-major, tri-minor): one-key sorts are
        # ~2x the throughput of the two-operand lexsort on TPU
        key = flat_tiles * (t + 1) + flat_tris
        key = jax.lax.sort(key)
        sorted_tiles = key // (t + 1)
        sorted_tris = key - sorted_tiles * (t + 1)
    else:
        # lexicographic (tile, tri) sort keeps submission order within a tile
        sorted_tiles, sorted_tris = jax.lax.sort(
            (flat_tiles, flat_tris), num_keys=2
        )
    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sorted_tiles, tile_range, side="left")
    seg_end = jnp.searchsorted(sorted_tiles, tile_range, side="right")
    counts_small = (seg_end - seg_start).astype(jnp.int32)
    take = seg_start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    in_seg = take < seg_end[:, None]
    idx_small = jnp.where(
        in_seg, sorted_tris[jnp.minimum(take, sorted_tris.shape[0] - 1)], t
    )  # [n_tiles, cap], padded with t

    # --- big path: dense over a tiny list ------------------------------------
    big_keys = jnp.where(big, jnp.arange(t, dtype=jnp.int32), t)
    kb = min(cap_big, t)
    big_ids = -jax.lax.top_k(-big_keys, kb)[0]  # ascending, padded with t
    bsafe = jnp.minimum(big_ids, t - 1)
    b_alive = big_ids < t
    oy = (tile_range[:, None] // ntx >= ty0[bsafe][None, :]) & (
        tile_range[:, None] // ntx <= ty1[bsafe][None, :]
    )
    ox = (tile_range[:, None] % ntx >= tx0[bsafe][None, :]) & (
        tile_range[:, None] % ntx <= tx1[bsafe][None, :]
    )
    big_overlap = oy & ox & b_alive[None, :]  # [n_tiles, kb]
    idx_big = jnp.where(big_overlap, big_ids[None, :], t)

    # --- merge (both ascending by id; sort of cap+kb keeps global order) ----
    merged = jnp.sort(jnp.concatenate([idx_small, idx_big], axis=-1), axis=-1)
    sorted_idx = merged[:, :cap]
    # counts are RAW (uncapped): consumers clamp to cap; the excess is the
    # truncation telemetry bench.py reports (VERDICT r2 item 9)
    sorted_counts = counts_small + jnp.sum(big_overlap, axis=-1).astype(jnp.int32)

    # --- overflow fallback: side list full -> exact dense binning -----------
    n_big = jnp.sum(big.astype(jnp.int32))
    tri_idx, counts = jax.lax.cond(
        n_big <= kb,
        lambda: (sorted_idx, sorted_counts),
        lambda: bin_triangles_dense(
            setup, height, width, tile_h, tile_w, cap, y_offset, y_stride,
            y_pair,
        )[:2],
    )
    return tri_idx, counts, nty, ntx


def bin_triangles_compact(
    setup: TriangleSetup,
    height: int,
    width: int,
    bin_h: int,
    bin_w: int,
    small_limit: int | None = None,
    cap_big: int | None = None,
    cap_huge: int = 64,
    big_span: tuple[int, int] = (8, 4),
    y_offset=0,
    y_stride: int = 1,
    y_pair: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, int, int, jnp.ndarray]:
    """COMPACT binning: exact per-bin candidate segments, no per-bin cap.

    Three expansion classes by bin-span (each expanded against its exact
    bbox overlap, so membership equals bin_triangles_dense for EVERY
    triangle — no density truncation exists in this scheme):
      - small: span < 2x2 bins (and slot < small_limit) -> 4 slots each
      - big:   span < big_span bins -> big_span slots for the first
               cap_big such triangles (id-ascending)
      - huge:  everything else (floors, sky quads) -> n_bins slots for the
               first cap_huge such triangles
    One fused-key sort orders all (bin, tri) pairs bin-major, tri-ascending
    (submission order within a bin). Returns

      (sorted_tris [n_slots] int32 — tri ids, pads decode to t,
       seg_start [n_bins+1] int32 — bin b's candidates occupy
           sorted_tris[seg_start[b]:seg_start[b+1]],
       nby, nbx,
       overflow [2] int32 — triangles beyond cap_big/cap_huge (DROPPED;
           report via bench telemetry, keep caps generous))

    The Pallas raster kernel walks each bin's segment with dynamic trip
    counts, so compute AND slab memory are proportional to the actual
    binned pairs — the fixed [n_bins, cap] slab of the capped scheme cost
    a ~1.5M-row gather per pass at safe caps (~70M rows/s = dominant).
    """
    t = setup.num_triangles
    nby, nbx = _cdiv(height, bin_h), _cdiv(width, bin_w)
    n_bins = nby * nbx
    sl = t if small_limit is None else min(small_limit, t)
    if cap_big is None:
        # low-triangle scenes project LARGE triangles (many land in the big
        # class), high-triangle scenes small ones — a flat fraction starves
        # the former (bench smoke measured 270 dropped at 4k tris).
        # RENDERER_CAP_BIG overrides for probe-time sort-size tuning (the
        # big class contributes cap_big*big_span slots to the fused-key
        # sort; overflow telemetry catches a too-small cap).
        # r5: default cap max(2048, t//32) -> max(1024, t//96) — the big
        # class at flagship scale is far below either bound (bench
        # bin_overflow 0), and the smaller fused-key sort measured
        # -1.1 ms/frame at 1080p/97k (probe_frame_ab capbig1024 39.09 vs
        # 40.23, cap 512 no further gain; the floor keeps the low-tri
        # starvation fix).
        import os

        env = os.environ.get("RENDERER_CAP_BIG")
        cap_big = int(env) if env else max(1024, t // 96)
    tx0, tx1, ty0, ty1, alive = _tile_ranges(
        setup, height, width, bin_h, bin_w, nby, nbx, y_offset, y_stride,
        y_pair,
    )

    small_ok = ((tx1 - tx0) < 2) & ((ty1 - ty0) < 2)
    big_ok = ((tx1 - tx0) < big_span[1]) & ((ty1 - ty0) < big_span[0])
    idx = jnp.arange(t, dtype=jnp.int32)
    small = alive & small_ok & (idx < sl)
    big = alive & ~small & big_ok
    huge = alive & ~small & ~big_ok

    def expand(ids, sy_n, sx_n, bbox_exact):
        """(class ids [K] padded with t) -> fused keys [K*sy_n*sx_n]."""
        safe = jnp.minimum(ids, t - 1)
        live = ids < t
        by0, by1 = ty0[safe], ty1[safe]
        bx0, bx1 = tx0[safe], tx1[safe]
        sy = jnp.arange(sy_n, dtype=jnp.int32)
        sx = jnp.arange(sx_n, dtype=jnp.int32)
        if bbox_exact:
            bys = by0[:, None, None] + sy[None, :, None]
            bxs = bx0[:, None, None] + sx[None, None, :]
            ok = (
                live[:, None, None]
                & (bys <= by1[:, None, None])
                & (bxs <= bx1[:, None, None])
            )
        else:
            # huge: slots enumerate ALL bins; mask to the exact bbox
            bys = jnp.broadcast_to(sy[None, :, None], (ids.shape[0], sy_n, sx_n))
            bxs = jnp.broadcast_to(sx[None, None, :], (ids.shape[0], sy_n, sx_n))
            ok = (
                live[:, None, None]
                & (bys >= by0[:, None, None]) & (bys <= by1[:, None, None])
                & (bxs >= bx0[:, None, None]) & (bxs <= bx1[:, None, None])
            )
        bins = bys * nbx + bxs
        tri = jnp.broadcast_to(ids[:, None, None], ok.shape)
        key = jnp.where(ok, bins * (t + 1) + tri, n_bins * (t + 1) + t)
        return key.reshape(-1)

    if (n_bins + 1) * (t + 1) >= 2**31:
        # the segment searchsorted also rides the fused key, so unlike
        # bin_triangles there is no cheap two-key fallback here; fail with
        # the workaround instead of a bare assert (~4M tris at 1080p tiles)
        raise NotImplementedError(
            f"compact binning's fused int32 (bin, tri) key overflows at "
            f"{n_bins} bins x {t} triangles; route through rasterize_binned "
            f"(bin_triangles degrades to a two-key lexsort) or use larger "
            f"tiles"
        )
    # small class: 4-slot expansion as four FLAT [sl] planes. The former
    # [sl,2,2] array form lowered to T(2,128)-tiled ops (2-sublane tiles —
    # r4 trace: 2.0 ms/frame for 1.5 MB of payload across fwd+shadow);
    # flat planes stay fully laned. The concatenated slot order differs
    # from the [sl,2,2] reshape, but keys are unique per (bin, tri) and
    # globally sorted right after — bit-identical downstream.
    pad_key = n_bins * (t + 1) + t
    # Edge-based bin rejection (RENDERER_BIN_EDGECULL, r4 gated probe):
    # a small triangle's exact-bbox 2x2 slots include bins its EDGES
    # never enter (diagonal tris). Per slot, evaluate each sign-folded
    # canonical edge at the bin's maximizing pixel-center corner (e is
    # affine; the kernel computes the IDENTICAL expression per pixel) —
    # e_max < -1.0 proves no pixel center in the bin passes that edge,
    # so the pair can't contribute coverage and is dropped. The -1.0
    # margin dwarfs fp evaluation error at framebuffer magnitudes, so
    # OUTPUT is unchanged (candidate lists shrink; the membership-
    # equality tests vs bbox-dense run with the knob off). Full-frame
    # addressing only (band py mapping would need its own corner math).
    import os as _os_ec

    edge_cull = (
        _os_ec.environ.get("RENDERER_BIN_EDGECULL", "0") == "1"
        and not _is_banded(y_offset, y_stride)
        and not y_pair
    )
    if edge_cull:
        from renderer_rs_tpu.ops.raster_pallas import _canonical_edge_cols

        s_sign = jnp.sign(setup.area2[:sl])
        if setup.planes is not None:
            (px0, py0v), (px1, py1v), (px2, py2v) = setup.planes
            everts = (
                (px1[:sl], py1v[:sl], px2[:sl], py2v[:sl]),
                (px2[:sl], py2v[:sl], px0[:sl], py0v[:sl]),
                (px0[:sl], py0v[:sl], px1[:sl], py1v[:sl]),
            )
        else:
            xy_s = setup.xy[:sl]
            everts = tuple(
                (
                    xy_s[:, (e + 1) % 3, 0], xy_s[:, (e + 1) % 3, 1],
                    xy_s[:, (e + 2) % 3, 0], xy_s[:, (e + 2) % 3, 1],
                )
                for e in range(3)
            )
        ecols = [
            _canonical_edge_cols(ax, ay, bx, by, s_sign, None)
            for (ax, ay, bx, by) in everts
        ]

    ks = []
    for dy in (0, 1):
        for dx in (0, 1):
            by = ty0[:sl] + dy
            bx = tx0[:sl] + dx
            ok1 = small[:sl] & (by <= ty1[:sl]) & (bx <= tx1[:sl])
            if edge_cull:
                # bin pixel-center extremes for this slot
                x_lo = bx.astype(jnp.float32) * bin_w + 0.5
                x_hi = x_lo + (bin_w - 1)
                y_lo = by.astype(jnp.float32) * bin_h + 0.5
                y_hi = y_lo + (bin_h - 1)
                for cax, cay, sdx, sdy, _th in ecols:
                    # e = sdx*(py-cay) - sdy*(px-cax): maximize over the
                    # rect corner by coefficient signs
                    pxc = jnp.where(sdy > 0.0, x_lo, x_hi)
                    pyc = jnp.where(sdx > 0.0, y_hi, y_lo)
                    e_max = sdx * (pyc - cay) - sdy * (pxc - cax)
                    ok1 = ok1 & (e_max >= -1.0)
            ks.append(
                jnp.where(ok1, (by * nbx + bx) * (t + 1) + idx[:sl], pad_key)
            )
    keys_small = jnp.concatenate(ks)

    kb = min(cap_big, t)
    big_ids = -jax.lax.top_k(-jnp.where(big, idx, t), kb)[0]
    keys_big = expand(big_ids, big_span[0], big_span[1], True)
    kh = min(cap_huge, t)
    huge_ids = -jax.lax.top_k(-jnp.where(huge, idx, t), kh)[0]
    keys_huge = expand(huge_ids, nby, nbx, False)

    keys = jax.lax.sort(jnp.concatenate([keys_small, keys_big, keys_huge]))
    sorted_bins = keys // (t + 1)
    sorted_tris = (keys - sorted_bins * (t + 1)).astype(jnp.int32)
    seg_start = jnp.searchsorted(
        keys, jnp.arange(n_bins + 1, dtype=jnp.int32) * (t + 1), side="left"
    ).astype(jnp.int32)
    overflow = jnp.stack(
        [
            jnp.maximum(jnp.sum(big.astype(jnp.int32)) - kb, 0),
            jnp.maximum(jnp.sum(huge.astype(jnp.int32)) - kh, 0),
        ]
    )
    return sorted_tris, seg_start, nby, nbx, overflow


def _chunk_coverage(xy, z, valid, s, inv_area, px, py, zplane=None):
    """Coverage/depth/bary for a chunk of C triangles over a tile.

    TPU layout note: all per-candidate tensors are [C,TH,TW] — the chunk axis
    is the MAJOR axis so the minor two dims stay (sublane=TH, lane=TW=128)
    aligned; reductions over candidates are axis-0 reduces (fast), never
    lane-dim reduces or gathers.

    xy [C,3,2], z [C,3], valid [C], s/inv_area [C]; px/py [TH,TW].
    Returns cov/depth/b0/b1, each [C,TH,TW]. Uses the same canonical edge
    function as the scan path (bit-identical watertightness).
    """
    c = xy.shape[0]
    pxb = px[None]  # [1,TH,TW]
    pyb = py[None]

    def tric(k, j):  # [C] -> [C,1,1]
        return xy[:, k, j].reshape(c, 1, 1)

    x0, y0, x1, y1, x2, y2 = (
        tric(0, 0), tric(0, 1), tric(1, 0), tric(1, 1), tric(2, 0), tric(2, 1)
    )
    sb = s.reshape(c, 1, 1)
    e0 = sb * _edge(x1, y1, x2, y2, pxb, pyb)
    e1 = sb * _edge(x2, y2, x0, y0, pxb, pyb)
    e2 = sb * _edge(x0, y0, x1, y1, pxb, pyb)
    flip = sb < 0.0
    tl0 = jnp.where(flip, _top_left(x2, y2, x1, y1), _top_left(x1, y1, x2, y2))
    tl1 = jnp.where(flip, _top_left(x0, y0, x2, y2), _top_left(x2, y2, x0, y0))
    tl2 = jnp.where(flip, _top_left(x1, y1, x0, y0), _top_left(x0, y0, x1, y1))

    cov = (
        ((e0 > 0.0) | ((e0 == 0.0) & tl0))
        & ((e1 > 0.0) | ((e1 == 0.0) & tl1))
        & ((e2 > 0.0) | ((e2 == 0.0) & tl2))
        & valid.reshape(c, 1, 1)
    )
    inv = inv_area.reshape(c, 1, 1)
    b0 = e0 * inv
    b1 = e1 * inv
    if zplane is not None:
        # shared anchored depth plane (raster.z_plane_coeffs — same
        # precomputed [T] coeffs and eval op order as scan/Pallas)
        zdx, zdy, za, ax_, ay_ = (v.reshape(c, 1, 1) for v in zplane)
        depth = eval_z_plane(zdx, zdy, za, pxb - ax_, pyb - ay_)
    else:
        b2 = 1.0 - b0 - b1
        depth = b0 * z[:, 0].reshape(c, 1, 1) + b1 * z[:, 1].reshape(
            c, 1, 1
        ) + b2 * z[:, 2].reshape(c, 1, 1)
    cov = cov & (depth >= 0.0) & (depth <= 1.0)
    return cov, depth, b0, b1


def rasterize_binned(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    depth_init: jnp.ndarray | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    cap: int = 512,
    chunk: int = 32,
    z_floor: jnp.ndarray | None = None,
    y_offset=0,
    y_stride: int = 1,
    small_limit: int | None = None,
    y_pair: bool = False,
) -> VisibilityBuffer:
    """Binned visibility-buffer rasterization (see module docstring).

    z_floor: optional [H,W] per-pixel strict lower bound on candidate depth
    (coverage requires zc > z_floor). The depth-peeling primitive behind
    alpha-cutoff on the fast path (renderer/passes): pass the previously
    rejected winner's depth to raster the NEXT-nearest layer.

    y_offset/y_stride: band addressing (multi-chip row sharding) — `height`
    is then the BAND height, band row k shades physical row
    y_offset + k*y_stride; pixel centers match ops/raster._pixel_centers
    bit-exactly, so stitched bands equal the full-frame render."""
    assert pipeline.depth_compare_op in BINNED_COMPARE_OPS or not pipeline.depth_test_enable
    t = setup.num_triangles
    cap = min(cap, max(t, chunk))
    cap = _cdiv(cap, chunk) * chunk

    tri_idx, _, nty, ntx = bin_triangles(
        setup, height, width, tile_h, tile_w, cap,
        y_offset=y_offset, y_stride=y_stride, small_limit=small_limit,
        y_pair=y_pair,
    )
    n_tiles = nty * ntx

    # gather per-tile triangle data [n_tiles, cap, ...]
    safe_idx = jnp.minimum(tri_idx, t - 1)
    in_range = tri_idx < t
    xy_b = setup.xy[safe_idx]
    z_b = setup.z[safe_idx]
    valid_b = setup.valid[safe_idx] & in_range
    area_b = setup.area2[safe_idx]
    s_b = jnp.sign(area_b)
    area_abs = jnp.abs(area_b)
    inv_area_b = jnp.where(area_abs > 0.0, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
    # (full visibility path: always bary-form depth — z_plane_mode is
    # depth-only scoped, see raster.z_plane_mode / the depth variant below)

    # order-aware depth reduction setup
    greater = pipeline.depth_compare_op in (
        CompareOp.GREATER,
        CompareOp.GREATER_OR_EQUAL,
    )
    use_depth_test = pipeline.depth_test_enable

    hp, wp = nty * tile_h, ntx * tile_w
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)
    dpad = jnp.pad(
        depth_init,
        ((0, hp - height), (0, wp - width)),
        constant_values=-jnp.inf if greater else jnp.inf,
    )
    depth_tiles = dpad.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
    depth_tiles = depth_tiles.reshape(n_tiles, tile_h, tile_w)

    ty = jnp.arange(n_tiles, dtype=jnp.int32) // ntx
    tx = jnp.arange(n_tiles, dtype=jnp.int32) % ntx

    if z_floor is None:
        zfloor_tiles = jnp.full((n_tiles, tile_h, tile_w), -jnp.inf, jnp.float32)
    else:
        zf = jnp.pad(
            z_floor, ((0, hp - height), (0, wp - width)), constant_values=jnp.inf
        )
        zfloor_tiles = (
            zf.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
            .reshape(n_tiles, tile_h, tile_w)
        )

    local_py = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0) + 0.5
    local_px = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1) + 0.5

    yo_f = jnp.asarray(y_offset, jnp.float32)

    def tile_fn(tri_ids, xy, z, valid, s, inv_area, d_init, zf_t, ty_i, tx_i):
        # GLOBAL pixel coordinates — bit-identical edge values vs scan path
        # (band rows remap through y_offset + row*stride; all quantities are
        # integers < 2^24 so f32 arithmetic order cannot change the value)
        px = local_px + (tx_i * tile_w).astype(jnp.float32)
        jloc = local_py - 0.5 + (ty_i * tile_h).astype(jnp.float32)
        if y_pair:
            # pair-interleave band rows: g(j) = (j//2)*2s + j%2 (+ yo);
            # jloc is an exact integer-valued f32 < 2^24, so floor/mod give
            # the same integers as _pixel_centers' int path
            half = jnp.floor(jloc * 0.5)
            py = half * (2 * y_stride) + (jloc - 2.0 * half) + 0.5 + yo_f
        else:
            py = jloc * y_stride + 0.5 + yo_f

        def body(carry, chunk_slice):
            c_ids, c_xy, c_z, c_valid, c_s, c_inv = chunk_slice
            depth, tid, b0c, b1c = carry
            cov, zc, b0, b1 = _chunk_coverage(c_xy, c_z, c_valid, c_s, c_inv, px, py)
            cov = cov & (zc > zf_t[None])
            # order-aware reduce within chunk, gather-free: pick the best
            # depth by axis-0 min/max, break equal-depth ties in SUBMISSION
            # semantics (candidates are id-ascending): strict compares keep
            # the FIRST winner (a later equal fragment fails `<`), while
            # equality-passing compares keep the LAST (it re-passes `<=` and
            # overwrites) — matching the sequential scan oracle / Vulkan.
            # Then select that winner's values via masked sums — pure VPU
            # reduces on [C,TH,TW].
            big = _INF if not greater else -_INF
            key = jnp.where(cov, zc, big)
            z_best = jnp.max(key, axis=0) if greater else jnp.min(key, axis=0)
            cov_best = jnp.any(cov & (zc == z_best[None]), axis=0)
            slot = jax.lax.broadcasted_iota(jnp.int32, cov.shape, 0)
            winners = cov & (zc == z_best[None])
            if pipeline.depth_compare_op in (
                CompareOp.LESS_OR_EQUAL,
                CompareOp.GREATER_OR_EQUAL,
            ):
                slot_best = jnp.max(jnp.where(winners, slot, -1), axis=0)
            else:
                slot_best = jnp.min(jnp.where(winners, slot, chunk), axis=0)
            unique = winners & (slot == slot_best[None])
            uf = unique.astype(zc.dtype)
            b0_best = jnp.sum(b0 * uf, axis=0)
            b1_best = jnp.sum(b1 * uf, axis=0)
            id_best = jnp.sum(
                jnp.where(unique, c_ids.reshape(-1, 1, 1), 0), axis=0
            )
            if use_depth_test:
                if pipeline.depth_compare_op == CompareOp.LESS:
                    pass_d = z_best < depth
                elif pipeline.depth_compare_op == CompareOp.LESS_OR_EQUAL:
                    pass_d = z_best <= depth
                elif pipeline.depth_compare_op == CompareOp.GREATER:
                    pass_d = z_best > depth
                else:
                    pass_d = z_best >= depth
                accept = cov_best & pass_d
            else:
                accept = cov_best
            if pipeline.depth_write_enable:
                depth = jnp.where(accept, z_best, depth)
            tid = jnp.where(accept, id_best, tid)
            b0c = jnp.where(accept, b0_best, b0c)
            b1c = jnp.where(accept, b1_best, b1c)
            return (depth, tid, b0c, b1c), None

        n_chunks = cap // chunk
        chunks = (
            tri_ids.reshape(n_chunks, chunk),
            xy.reshape(n_chunks, chunk, 3, 2),
            z.reshape(n_chunks, chunk, 3),
            valid.reshape(n_chunks, chunk),
            s.reshape(n_chunks, chunk),
            inv_area.reshape(n_chunks, chunk),
        )
        init = (
            d_init,
            jnp.full((tile_h, tile_w), -1, jnp.int32),
            jnp.zeros((tile_h, tile_w), jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.float32),
        )
        (depth, tid, b0, b1), _ = jax.lax.scan(body, init, chunks)
        return depth, tid, b0, b1

    depth_t, tid_t, b0_t, b1_t = jax.vmap(tile_fn)(
        tri_idx, xy_b, z_b, valid_b, s_b, inv_area_b, depth_tiles,
        zfloor_tiles, ty, tx
    )

    def stitch(tiles):
        full = tiles.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return full.reshape(hp, wp)[:height, :width]

    # NOTE on depth semantics when depth_write is off: the chunk reduce
    # would pick the nearest fragment while scan/Vulkan keep the LAST
    # passing one — supports_binned routes test-on/write-off pipelines to
    # the scan path, so this function never sees them via the dispatcher.
    return VisibilityBuffer(
        tri_id=stitch(tid_t),
        depth=stitch(depth_t),
        bary=jnp.stack([stitch(b0_t), stitch(b1_t)], axis=-1),
    )


def rasterize_depth_only_binned(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    depth_init: jnp.ndarray | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    cap: int = 2048,
    chunk: int = 32,
) -> jnp.ndarray:
    """Depth-only binned pass (shadow maps): pure min (or max) reduce per
    tile — order-free and several times cheaper than the full visibility
    kernel (no winner selection at all). ≙ the depth-only shadow pipeline
    (vertex/shadow.hlsl + empty PS)."""
    assert pipeline.depth_test_enable and pipeline.depth_compare_op in (
        BINNED_COMPARE_OPS
    ), (
        "rasterize_depth_only_binned requires a min/max-reducible depth "
        f"test (got {pipeline.depth_compare_op}, "
        f"test_enable={pipeline.depth_test_enable})"
    )
    greater = pipeline.depth_compare_op in (
        CompareOp.GREATER,
        CompareOp.GREATER_OR_EQUAL,
    )
    t = setup.num_triangles
    cap = min(cap, max(t, chunk))
    cap = _cdiv(cap, chunk) * chunk

    tri_idx, _, nty, ntx = bin_triangles(setup, height, width, tile_h, tile_w, cap)
    n_tiles = nty * ntx
    safe_idx = jnp.minimum(tri_idx, t - 1)
    in_range = tri_idx < t
    xy_b = setup.xy[safe_idx]
    z_b = setup.z[safe_idx]
    valid_b = setup.valid[safe_idx] & in_range
    area_b = setup.area2[safe_idx]
    s_b = jnp.sign(area_b)
    area_abs = jnp.abs(area_b)
    inv_area_b = jnp.where(area_abs > 0.0, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
    zp_b = (
        jnp.stack(z_plane_coeffs(setup.xy, setup.z, setup.area2), -1)[safe_idx]
        if z_plane_mode()
        else None
    )
    use_zp = zp_b is not None

    hp, wp = nty * tile_h, ntx * tile_w
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)
    dpad = jnp.pad(
        depth_init,
        ((0, hp - height), (0, wp - width)),
        constant_values=-jnp.inf if greater else jnp.inf,
    )
    depth_tiles = dpad.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
    depth_tiles = depth_tiles.reshape(n_tiles, tile_h, tile_w)

    ty = jnp.arange(n_tiles, dtype=jnp.int32) // ntx
    tx = jnp.arange(n_tiles, dtype=jnp.int32) % ntx
    local_py = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0) + 0.5
    local_px = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1) + 0.5

    def tile_fn(xy, z, valid, s, inv_area, d_init, ty_i, tx_i, zp=None):
        px = local_px + (tx_i * tile_w).astype(jnp.float32)
        py = local_py + (ty_i * tile_h).astype(jnp.float32)

        def body(depth, chunk_slice):
            if use_zp:
                c_xy, c_z, c_valid, c_s, c_inv, c_zp = chunk_slice
                c_zp = tuple(c_zp[:, k] for k in range(5))
            else:
                c_xy, c_z, c_valid, c_s, c_inv = chunk_slice
                c_zp = None
            cov, zc, _, _ = _chunk_coverage(
                c_xy, c_z, c_valid, c_s, c_inv, px, py, zplane=c_zp
            )
            big = -_INF if greater else _INF
            key = jnp.where(cov, zc, big)
            zbest = jnp.max(key, axis=0) if greater else jnp.min(key, axis=0)
            depth = jnp.maximum(depth, zbest) if greater else jnp.minimum(depth, zbest)
            return depth, None

        n_chunks = cap // chunk
        chunks = (
            xy.reshape(n_chunks, chunk, 3, 2),
            z.reshape(n_chunks, chunk, 3),
            valid.reshape(n_chunks, chunk),
            s.reshape(n_chunks, chunk),
            inv_area.reshape(n_chunks, chunk),
        ) + ((zp.reshape(n_chunks, chunk, 5),) if use_zp else ())
        depth, _ = jax.lax.scan(body, d_init, chunks)
        return depth

    if use_zp:
        depth_t = jax.vmap(lambda *a: tile_fn(*a[:-1], zp=a[-1]))(
            xy_b, z_b, valid_b, s_b, inv_area_b, depth_tiles, ty, tx, zp_b
        )
    else:
        depth_t = jax.vmap(tile_fn)(
            xy_b, z_b, valid_b, s_b, inv_area_b, depth_tiles, ty, tx
        )
    full = depth_t.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
    return full.reshape(hp, wp)[:height, :width]


def supports_binned(
    pipeline: GraphicsPipeline,
    num_triangles: int,
    threshold: int = 64,
    allow_alpha_cutoff: bool = False,
) -> bool:
    """Whether the fast path applies (passes.py dispatch).

    allow_alpha_cutoff: MASK pipelines are single-pass-unsupported (the
    coverage test needs a texture sample before the depth write), but the
    depth-peeling driver in renderer/passes handles them with K binned
    passes — it asks with allow_alpha_cutoff=True."""
    if pipeline.blend.blend_enable:
        return False
    if pipeline.alpha_cutoff is not None and not allow_alpha_cutoff:
        return False
    from renderer_rs_tpu.rhi.pipeline import PolygonMode, PrimitiveTopology

    if pipeline.topology != PrimitiveTopology.TRIANGLE_LIST:
        return False  # point/line primitives rasterize on the scan path
    if pipeline.polygon_mode != PolygonMode.FILL:
        return False  # wireframe/point fill runs on the scan path
    if pipeline.depth_test_enable and pipeline.depth_compare_op not in BINNED_COMPARE_OPS:
        return False
    if not pipeline.depth_test_enable:
        # without a depth test the last-submitted triangle must win; the
        # chunk argmin picks the nearest instead -> scan path only
        return False
    if not pipeline.depth_write_enable:
        # test-on/write-off: nothing updates the depth carry, so every
        # fragment passing vs depth_init must LAST-write the id (scan /
        # Vulkan semantics); the chunk reduce would pick the nearest
        # instead -> scan path only
        return False
    return num_triangles >= threshold
