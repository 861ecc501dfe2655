"""Pallas TPU rasterization kernel — per-tile dynamic triangle counts.

The XLA binned rasterizer (raster_binned.py) must process a static `cap` of
candidates per tile, so sparse tiles burn the same work as dense ones. This
Pallas kernel keeps the same binning and the same chunk math, but each tile's
grid step loops only ceil(count/chunk) times (dynamic fori over the
scalar-prefetched per-tile counts) — work becomes proportional to the actual
binned triangles, not the cap.

Layout (pallas_guide.md rules):
- grid = (n_tiles,); per-step BlockSpecs slice one tile's binned data into
  VMEM: xyz coeffs [cap, 8], ids [cap], plus the tile's depth-init block.
- all candidate math is [chunk, TH, TW] with TW = 128 lanes / TH sublanes;
  reductions are axis-0 (major), never lane-dim; no gathers in the kernel.
- identical edge functions as the scan/XLA paths -> bit-identical coverage.

Used automatically on TPU by renderer/passes dispatch; the XLA path remains
the portable fallback (and the exactness oracle in tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from renderer_rs_tpu.ops.raster import TriangleSetup, VisibilityBuffer
from renderer_rs_tpu.ops.raster_binned import (
    _cdiv,
    bin_triangles_compact,
)
from renderer_rs_tpu.rhi.pipeline import CompareOp, GraphicsPipeline


# Smallest positive NORMAL f32: the coverage threshold for non-top-left
# edges. e >= MIN_NORMAL <=> e > 0 exactly on TPU hardware (subnormal
# arithmetic results flush to zero, so no e value exists in (0, MIN_NORMAL));
# in interpret mode a subnormal e would need cancellation to ~1e-38 of
# coordinates that are themselves pixel-scale products — outside any real
# input. Top-left edges use threshold 0 (e >= 0 <=> (e>0)|(e==0)).
_COV_MIN_NORMAL = 1.1754943508222875e-38


def _canonical_edges(xy, s, valid=None):
    """Precompute (outside the kernel) per-edge canonical anchors,
    SIGN-FOLDED deltas, and the coverage threshold, vectorized over
    [..., 3, 2] triangles.

    Returns a list of 3 dicts of [...]-shaped arrays: ax, ay (canonical
    anchor), sdx, sdy (sgn * (b - a): folding the composed orientation x
    canonical-swap sign into the deltas is EXACT — sign flips of products
    and the symmetric rounding of X-Y vs Y-X keep the kernel bit-identical
    to the scan path's sgn * _edge), and thresh (coverage test becomes ONE
    compare e >= thresh: 0 for top-left edges, the smallest normal f32 for
    strict edges, +inf for invalid/pad rows — folding the top-left rule AND
    the valid mask into the compare).
    """
    edges = []
    # edge i is opposite vertex i: (1,2), (2,0), (0,1)
    for a, b in ((1, 2), (2, 0), (0, 1)):
        ax, ay = xy[..., a, 0], xy[..., a, 1]
        bx, by = xy[..., b, 0], xy[..., b, 1]
        swap = (ay > by) | ((ay == by) & (ax > bx))
        cax = jnp.where(swap, bx, ax)
        cay = jnp.where(swap, by, ay)
        cbx = jnp.where(swap, ax, bx)
        cby = jnp.where(swap, ay, by)
        sgn = jnp.where(swap, -s, s)
        # top-left on the s-normalized LOGICAL direction d = s*(b-a)
        dx = s * (bx - ax)
        dy = s * (by - ay)
        tl = (dy < 0.0) | ((dy == 0.0) & (dx > 0.0))
        thresh = jnp.where(tl, 0.0, _COV_MIN_NORMAL).astype(jnp.float32)
        if valid is not None:
            thresh = jnp.where(valid, thresh, jnp.inf)
        edges.append(
            dict(
                ax=cax, ay=cay,
                sdx=sgn * (cbx - cax), sdy=sgn * (cby - cay),
                thresh=thresh,
            )
        )
    return edges


def _make_kernel(pipeline: GraphicsPipeline, tile_h, tile_w, chunk, depth_only, n_vary=0, n_flat=0, has_zfloor=False, skip_bary=False, sub_h=None, y_stride=1, ntx=1, gather_vary=False, y_pair=False, zplane=False):
    """Build the per-tile kernel body.

    Two-level binning (VERDICT r2 item 1): the grid step still covers a
    [tile_h, tile_w] output tile, but candidates are binned at [sub_h,
    tile_w] granularity (sub_h rows; 16 in practice — [C,8,128] op shapes
    hit a Mosaic cliff). The kernel statically unrolls the tile's sub-bins
    and runs each one's dynamic chunk loop over a [chunk, sub_h, tile_w]
    slab — candidate x pixel work shrinks vs whole-tile evaluation while
    the per-grid-step fixed costs stay amortized over the full tile.
    Candidates come from the COMPACT sorted slab (bin_triangles_compact):
    per-bin segments addressed through the scalar-prefetched seg_start
    array — exact membership, no density cap, work proportional to the
    actual binned pairs."""
    greater = pipeline.depth_compare_op in (
        CompareOp.GREATER,
        CompareOp.GREATER_OR_EQUAL,
    )
    op = pipeline.depth_compare_op
    use_depth_test = pipeline.depth_test_enable
    write_depth = pipeline.depth_write_enable
    big = float("-inf") if greater else float("inf")  # python scalar: no capture
    if sub_h is None:
        sub_h = tile_h
    assert tile_h % sub_h == 0
    n_sub = tile_h // sub_h

    def kernel(seg_ref, tilepos_ref, yoff_ref, coef_hbm, dinit_ref, *outs_and_scratch):
        *outs, coef_ref, dma_sem = outs_and_scratch
        outs = list(outs)
        if has_zfloor:
            zfloor_ref, *outs = outs
        if depth_only:
            (depth_out,) = outs
        elif skip_bary:
            if n_vary or n_flat:
                depth_out, tid_out, vary_out = outs
            else:  # pure ids+depth visibility kernel (no attribute lanes)
                depth_out, tid_out = outs
                vary_out = None
            b0_out = b1_out = None
        elif n_vary or n_flat:
            depth_out, tid_out, b0_out, b1_out, vary_out = outs
        else:
            depth_out, tid_out, b0_out, b1_out = outs
        i = pl.program_id(0)
        ty = tilepos_ref[3 * i]
        tx = tilepos_ref[3 * i + 1]
        bin_base = tilepos_ref[3 * i + 2]  # batch offset into seg_ref bins

        # COMPACT slab (bin_triangles_compact): the sorted (bin, tri) pairs
        # are gathered ONCE into [n_slots, 128] coefficient rows; each bin
        # walks its exact segment [seg[b], seg[b+1]) with double-buffered
        # [chunk, 128] DMAs. Segment starts round DOWN to the 8-row DMA
        # alignment and the tail chunk overruns into the next segment: the
        # extra rows are other bins' candidates, whose bboxes either miss
        # this bin (coverage culls them exactly) or overlap it (then the
        # row is a DUPLICATE of one inside the segment — same winner).
        # Work and slab memory are both proportional to the ACTUAL binned
        # pairs, and no per-bin density cap exists (no truncation).

        # Mosaic iota must be integer-typed; cast to f32 after
        sub_py = jax.lax.broadcasted_iota(jnp.int32, (sub_h, tile_w), 0).astype(
            jnp.float32
        )
        # loop-invariant slot iota (candidate row index within the chunk):
        # hoisted out of the per-chunk body — Mosaic does not LICM it, and
        # two fresh [chunk, sub_h, tile_w] iotas per chunk iteration are
        # measurable at 97k-pair workloads
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (chunk, sub_h, tile_w), 0
        )
        yo_f = yoff_ref[0].astype(jnp.float32)  # band origin (0 full-frame)
        px = (
            jax.lax.broadcasted_iota(jnp.int32, (sub_h, tile_w), 1).astype(jnp.float32)
            + 0.5
            + (tx * tile_w).astype(jnp.float32)
        )

        def get_dma(slot, row0):
            return pltpu.make_async_copy(
                coef_hbm.at[pl.ds(row0, chunk), :],
                coef_ref.at[slot],
                dma_sem.at[slot],
            )

        for q in range(n_sub):  # static unroll over the tile's sub-bins
            bin_id = bin_base + (ty * n_sub + q) * ntx + tx
            seg0 = seg_ref[bin_id]
            seg1 = seg_ref[bin_id + 1]
            base = (seg0 // 8) * 8  # 8-row DMA alignment (see note above)
            count = seg1 - base
            r0, r1 = q * sub_h, (q + 1) * sub_h
            # band row -> physical row: y_offset + row*stride (+0.5 center);
            # integers < 2^24, so f32 op order matches _pixel_centers exactly
            jloc = sub_py + (ty * tile_h + q * sub_h).astype(jnp.float32)
            if y_pair:
                # pair-interleave: g(j) = (j//2)*2s + j%2 (+ yo); jloc is
                # an exact integer-valued f32, so floor/mod are exact and
                # match _pixel_centers' integer path bit-for-bit
                half = jnp.floor(jloc * 0.5)
                py = half * (2.0 * y_stride) + (jloc - 2.0 * half) + 0.5 + yo_f
            else:
                py = jloc * y_stride + 0.5 + yo_f
            zf_q = zfloor_ref[r0:r1, :] if has_zfloor else None

            n_chunks = (count + chunk - 1) // chunk

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, base).start()

            # The chunk loop carries the sub-bin's accumulators as VALUES
            # (register-resident); output refs are written ONCE per sub-bin
            # after the loop. Read-modify-writing ref subviews inside the
            # loop measured ~13x slower (Mosaic round-trips the view).
            def body(
                j, carry, base=base, n_chunks=n_chunks, py=py, zf_q=zf_q,
                seg0=seg0, seg1=seg1,
            ):
                slot = jax.lax.rem(j, 2)
                # prefetch the next slab while this one computes
                @pl.when(j + 1 < n_chunks)
                def _():
                    get_dma(1 - slot, base + (j + 1) * chunk).start()

                get_dma(slot, base + j * chunk).wait()
                coefs = coef_ref[slot]  # [chunk, 128], first 20+ cols used

                def col(k):
                    return coefs[:, k : k + 1].reshape(chunk, 1, 1)

                shape = (chunk, sub_h, tile_w)

                def edge_cov(k0):
                    # columns: ax, ay, sdx, sdy, thresh — sign-folded edge
                    # (exact vs sgn * _edge) + one-compare coverage that
                    # folds the top-left rule AND the valid/pad mask
                    dyk = py[None] - col(k0 + 1)
                    dxk = px[None] - col(k0)
                    e = col(k0 + 2) * dyk - col(k0 + 3) * dxk
                    return e, e >= col(k0 + 4), dxk, dyk

                e0, c0, dx0, dy0 = edge_cov(0)
                e1, c1, _, _ = edge_cov(5)
                e2, c2, _, _ = edge_cov(10)
                cov = c0 & c1 & c2
                if zplane:
                    # RENDERER_Z_FORM=plane (depth-only): cols 15-17 =
                    # (zdx, zdy, zA) anchored at edge 0's canonical
                    # anchor — the dx0/dy0 diffs above are reused. RAW
                    # formula, no optimization_barrier: Mosaic does not
                    # lower it, and the depth-only min-reduce needs no
                    # bit pinning (tolerance contract, raster.z_plane_mode)
                    zc = (col(15) * dx0 + col(16) * dy0) + col(17)
                    if not depth_only and not gather_vary:
                        inv = col(18)
                        b0 = e0 * inv
                        b1 = e1 * inv
                else:
                    inv = col(18)
                    b0 = e0 * inv
                    b1 = e1 * inv
                    b2 = 1.0 - b0 - b1
                    zc = b0 * col(15) + b1 * col(16) + b2 * col(17)
                # one-sided viewport-z bound: the other side is implied by
                # the depth test against a clear value in [0, 1] (an
                # out-of-range winner never passes; exact equivalence)
                cov = cov & ((zc <= 1.0) if greater else (zc >= 0.0))
                if has_zfloor:
                    # depth-peeling constraint: only fragments strictly
                    # beyond the previously rejected winner are candidates
                    cov = cov & (zc > zf_q[None])
                # no explicit count mask: rows past the bin's count hold the
                # all-zero pad row (valid=0), so coverage is already false

                if not depth_only:
                    # Exact-segment mask: the aligned DMA window carries up
                    # to 7 leading rows of the PREVIOUS bin's segment and a
                    # tail overrun into the NEXT. Coverage culls foreign
                    # non-covering rows and covering ones are duplicates of
                    # in-segment rows — fine for depth — but they break the
                    # ROW-ORDER tie-break (a duplicate twin of triangle X
                    # outside [seg0, seg1) can displace the correct equal-
                    # depth winner Y). Only ONE side can do that per tie
                    # rule (r5): strict compares pick the MIN winner row,
                    # which a tail duplicate (row > its in-segment twin)
                    # can never win — only the LEADING overrun needs
                    # masking; equality compares pick the MAX row, where
                    # only the TAIL overrun can displace — mask it alone.
                    # The foreign duplicate that does win on the unmasked
                    # side carries identical row content (same triangle),
                    # so every output is unchanged. One compare+and per
                    # candidate saved; bit-identity suites assert.
                    if op in (
                        CompareOp.LESS_OR_EQUAL, CompareOp.GREATER_OR_EQUAL
                    ):
                        hi = seg1 - (base + j * chunk)
                        cov = cov & (slot_iota < hi)
                    else:
                        lo = seg0 - (base + j * chunk)
                        cov = cov & (slot_iota >= lo)
                key = jnp.where(cov, zc, big)
                z_best = jnp.max(key, axis=0) if greater else jnp.min(key, axis=0)
                if depth_only:
                    depth = carry
                    return (
                        jnp.maximum(depth, z_best)
                        if greater
                        else jnp.minimum(depth, z_best)
                    )
                if gather_vary:
                    depth, tid, vary = carry
                else:
                    depth, tid, b0c, b1c, vary = carry
                vary = list(vary)
                winners = cov & (zc == z_best[None])
                cov_best = jnp.any(winners, axis=0)
                slot_i = slot_iota  # hoisted loop-invariant
                # equal-depth tie order matches the scan oracle / Vulkan:
                # strict compares keep the FIRST submitted winner, equality-
                # passing compares the LAST (candidates are id-ascending;
                # duplicate segment rows are idempotent under either pick)
                if op in (CompareOp.LESS_OR_EQUAL, CompareOp.GREATER_OR_EQUAL):
                    slot_best = jnp.max(jnp.where(winners, slot_i, -1), axis=0)
                else:
                    slot_best = jnp.min(jnp.where(winners, slot_i, chunk), axis=0)

                if gather_vary:
                    # In-kernel winner-row GATHER resolve (r3): instead of a
                    # masked [chunk, sub_h, tile_w] reduction per channel
                    # (candidate-proportional — the reason defer_varyings
                    # exists) or the XLA-side per-pixel HBM row gather + blend
                    # (the 2 largest defer-resolve items at 1080p), fetch the
                    # winner's coefficient row from the VMEM slab with ONE
                    # tpu.dynamic_gather per channel: transpose the [chunk,
                    # 128] slab once, broadcast channel c's row across
                    # sublanes, and gather along lanes with the winner's
                    # chunk-local index. Every op here is [sub_h, tile_w]
                    # (pixel-proportional), and the slab is already in VMEM
                    # (zero extra DMA). Later chunks overwrite via `accept`,
                    # exactly like the depth/id carries.
                    if use_depth_test:
                        if op == CompareOp.LESS:
                            pass_d = z_best < depth
                        elif op == CompareOp.LESS_OR_EQUAL:
                            pass_d = z_best <= depth
                        elif op == CompareOp.GREATER:
                            pass_d = z_best > depth
                        else:
                            pass_d = z_best >= depth
                        accept = cov_best & pass_d
                    else:
                        accept = cov_best
                    idxp = jnp.clip(slot_best, 0, chunk - 1)
                    slabT = jnp.swapaxes(coefs, 0, 1)  # [128, chunk]
                    if chunk < tile_w:
                        slabT = jnp.concatenate(
                            [slabT,
                             jnp.zeros((128, tile_w - chunk), jnp.float32)],
                            axis=-1,
                        )

                    def gth(c):
                        row = slabT[c : c + 1, :]
                        return jnp.take_along_axis(
                            jnp.broadcast_to(row, (sub_h, tile_w)), idxp, axis=1
                        )

                    # winner-only edge re-evaluation: same formula (and f32
                    # op order) as the per-candidate e/b math above, applied
                    # to the gathered scalar rows -> bit-equal barycentrics
                    g_inv = gth(18)
                    e0w = gth(2) * (py - gth(1)) - gth(3) * (px - gth(0))
                    e1w = gth(7) * (py - gth(6)) - gth(8) * (px - gth(5))
                    b0w = e0w * g_inv
                    b1w = e1w * g_inv
                    b2w = 1.0 - b0w - b1w
                    if write_depth:
                        depth = jnp.where(accept, z_best, depth)
                    tid = jnp.where(
                        accept, gth(19).astype(jnp.int32), tid
                    )
                    # perspective weights: identical formula order to the
                    # fused in-kernel path (wb_i = b_i*inv_w_i; aw = wb*inv_d)
                    wb0 = b0w * gth(20)
                    wb1 = b1w * gth(21)
                    wb2 = b2w * gth(22)
                    denom = wb0 + wb1 + wb2
                    inv_d = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
                    aw0 = wb0 * inv_d
                    aw1 = wb1 * inv_d
                    aw2 = wb2 * inv_d
                    # vertex-MAJOR blocks (23 + i*K + k): the gather-mode
                    # table assembles from [t, K] block concats (no per-
                    # column stack — the compiler-pessimization-proof build)
                    for k in range(n_vary):
                        vk = (
                            aw0 * gth(23 + k)
                            + aw1 * gth(23 + n_vary + k)
                            + aw2 * gth(23 + 2 * n_vary + k)
                        )
                        vary[k] = jnp.where(accept, vk, vary[k])
                    fbase = 23 + 3 * n_vary
                    for f in range(n_flat):
                        vary[n_vary + f] = jnp.where(
                            accept, gth(fbase + f), vary[n_vary + f]
                        )
                    return depth, tid, tuple(vary)

                unique = winners & (slot_i == slot_best[None])
                uf = unique.astype(jnp.float32)
                if not skip_bary:
                    b0_best = jnp.sum(b0 * uf, axis=0)
                    b1_best = jnp.sum(b1 * uf, axis=0)
                # ids ride in the coef matrix as floats (exact below 2^24)
                ids = col(19)
                id_best = jnp.sum(ids * uf, axis=0).astype(jnp.int32)

                if use_depth_test:
                    if op == CompareOp.LESS:
                        pass_d = z_best < depth
                    elif op == CompareOp.LESS_OR_EQUAL:
                        pass_d = z_best <= depth
                    elif op == CompareOp.GREATER:
                        pass_d = z_best > depth
                    else:
                        pass_d = z_best >= depth
                    accept = cov_best & pass_d
                else:
                    accept = cov_best
                if write_depth:
                    depth = jnp.where(accept, z_best, depth)
                tid = jnp.where(accept, id_best, tid)
                if not skip_bary:
                    b0c = jnp.where(accept, b0_best, b0c)
                    b1c = jnp.where(accept, b1_best, b1c)

                if n_flat:
                    # per-triangle constants (material params): winner-
                    # select only. Column base matches the host packing:
                    # inv_w cols 24..26 and the 3K vary columns exist only
                    # when n_vary>0.
                    flat_base = 20 + (3 + 3 * n_vary if n_vary else 0)
                    for k in range(n_flat):
                        f = jnp.sum(col(flat_base + k) * uf, axis=0)
                        vary[n_vary + k] = jnp.where(
                            accept, f, vary[n_vary + k]
                        )
                if n_vary:
                    # Fused perspective-correct varyings: interpolate the
                    # winner's attributes in-kernel (they ride the free pad
                    # lanes of the coef slab — zero extra DMA traffic).
                    # columns: 20..22 = inv_w0..2; 23.. = A[vertex v][k]
                    b2 = 1.0 - b0 - b1
                    wb0 = b0 * col(20)
                    wb1 = b1 * col(21)
                    wb2 = b2 * col(22)
                    denom = wb0 + wb1 + wb2
                    inv_d = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
                    aw0 = jnp.sum(wb0 * inv_d * uf, axis=0)  # winner's weights
                    aw1 = jnp.sum(wb1 * inv_d * uf, axis=0)
                    aw2 = jnp.sum(wb2 * inv_d * uf, axis=0)
                    for k in range(n_vary):
                        a0 = jnp.sum(col(23 + 3 * k) * uf, axis=0)
                        a1 = jnp.sum(col(23 + 3 * k + 1) * uf, axis=0)
                        a2 = jnp.sum(col(23 + 3 * k + 2) * uf, axis=0)
                        vk = aw0 * a0 + aw1 * a1 + aw2 * a2
                        vary[k] = jnp.where(accept, vk, vary[k])
                return depth, tid, b0c, b1c, tuple(vary)

            if depth_only:
                init = dinit_ref[r0:r1, :]
                depth_out[r0:r1, :] = jax.lax.fori_loop(0, n_chunks, body, init)
            elif gather_vary:
                zero = jnp.zeros((sub_h, tile_w), jnp.float32)
                init = (
                    dinit_ref[r0:r1, :],
                    jnp.full((sub_h, tile_w), -1, jnp.int32),
                    tuple(zero for _ in range(n_vary + n_flat)),
                )
                depth, tid, vary = jax.lax.fori_loop(0, n_chunks, body, init)
                depth_out[r0:r1, :] = depth
                tid_out[r0:r1, :] = tid
                for k in range(n_vary + n_flat):
                    vary_out[k, r0:r1, :] = vary[k]
            else:
                zero = jnp.zeros((sub_h, tile_w), jnp.float32)
                # vary channels carry as a TUPLE of [sub_h, tile_w] planes:
                # a carried [K, sub_h, tile_w] array updated per channel
                # lowers to an unsupported in-loop scatter on Mosaic
                init = (
                    dinit_ref[r0:r1, :],
                    jnp.full((sub_h, tile_w), -1, jnp.int32),
                    zero,
                    zero,
                    tuple(zero for _ in range(n_vary + n_flat)),
                )
                depth, tid, b0c, b1c, vary = jax.lax.fori_loop(
                    0, n_chunks, body, init
                )
                depth_out[r0:r1, :] = depth
                tid_out[r0:r1, :] = tid
                if not skip_bary:
                    b0_out[r0:r1, :] = b0c
                    b1_out[r0:r1, :] = b1c
                for k in range(n_vary + n_flat):
                    vary_out[k, r0:r1, :] = vary[k]

    return kernel


_THRESH_COLS = (4, 9, 14)  # per-edge coverage-threshold columns


def _canonical_edge_cols(ax, ay, bx, by, s, valid):
    """Per-edge canonical columns (cax, cay, sdx, sdy, thresh) — the ONE
    home of the swap / sign-fold / top-left formulas for the block table
    builds (shape-generic elementwise: the [T,3] array form and the flat
    [T]-plane form call it with differently shaped operands and get
    bit-identical values). Keep in sync with raster.py::_edge/_top_left
    (CLAUDE.md architecture invariant)."""
    swap = (ay > by) | ((ay == by) & (ax > bx))
    cax = jnp.where(swap, bx, ax)
    cay = jnp.where(swap, by, ay)
    cbx = jnp.where(swap, ax, bx)
    cby = jnp.where(swap, ay, by)
    sgn = jnp.where(swap, -s, s)
    dx = s * (bx - ax)
    dy = s * (by - ay)
    tl = (dy < 0.0) | ((dy == 0.0) & (dx > 0.0))
    thresh = jnp.where(tl, 0.0, _COV_MIN_NORMAL).astype(jnp.float32)
    if valid is not None:
        thresh = jnp.where(valid, thresh, jnp.inf)
    return cax, cay, sgn * (cbx - cax), sgn * (cby - cay), thresh


def _canonical_edges_block(xy, s, valid=None):
    """_canonical_edges vectorized over the EDGE axis, returning one
    [T, 15] block (edge-major: ax, ay, sdx, sdy, thresh per edge — the
    exact column order the kernel reads). Identical elementwise formulas
    as the per-edge dict form -> bit-equal values; the payoff is the
    ASSEMBLY: one 5-field stack + reshape instead of 15 per-column
    strided writes (each [T] column stacked into a padded table is its
    own relayout pass — the defer-table einsum finding)."""
    # edge i is opposite vertex i: a = vertex (i+1)%3, b = vertex (i+2)%3
    a = jnp.roll(xy, -1, axis=1)  # [T,3,2]
    b = jnp.roll(xy, 1, axis=1)
    cols = _canonical_edge_cols(
        a[..., 0], a[..., 1], b[..., 0], b[..., 1],
        s[:, None], None if valid is None else valid[:, None],
    )
    e = jnp.stack(cols, axis=-1)  # [T, 3, 5]
    return e.reshape(xy.shape[0], 15)


def _canonical_edges_block_planes(planes, s, valid=None):
    """_canonical_edges_block over flat per-vertex screen planes
    ((sx0,sy0),(sx1,sy1),(sx2,sy2) — setup.planes). Identical formulas
    (shared _canonical_edge_cols) and output layout; the [T,3,2] xy array
    and its roll relayouts never materialize (r4 plane-form geometry)."""
    (x0, y0), (x1, y1), (x2, y2) = planes
    axs, ays = (x1, x2, x0), (y1, y2, y0)  # a = vertex (e+1)%3
    bxs, bys = (x2, x0, x1), (y2, y0, y1)  # b = vertex (e+2)%3
    per_edge = [
        _canonical_edge_cols(axs[e], ays[e], bxs[e], bys[e], s, valid)
        for e in range(3)
    ]
    e15 = jnp.stack(
        [
            jnp.stack([per_edge[e][f] for e in range(3)], axis=-1)
            for f in range(5)
        ],
        axis=-1,
    )  # [T,3,5]
    return e15.reshape(x0.shape[0], 15)


def _base_coef_table(
    setup: TriangleSetup, ids_col: jnp.ndarray, zplane: bool = False
) -> jnp.ndarray:
    """The 20-column per-slot coefficient table of the kernel contract
    (edges x 5, z x 3, inv_area, ids — see rasterize_binned_pallas), NOT
    yet lane-padded. The default assembles it from [T,k] blocks
    (vectorized edges + concat) instead of 20 per-column stacked writes —
    bit-equal values (tests assert), measured ~1.3 ms/frame faster on the
    1080p/97k textured scene (probe_frame_ab r3: 67.8 vs 69.1 ms).
    RENDERER_KTBL=stack restores the per-column build."""
    import os

    from renderer_rs_tpu.ops.raster import z_plane_coeffs

    s = jnp.sign(setup.area2)
    area_abs = jnp.abs(setup.area2)
    inv_area = jnp.where(area_abs > 0.0, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
    if zplane:
        # depth-only plane mode: cols 15-17 hold the anchored depth-plane
        # coeffs (zdx, zdy, zA) instead of the 3 vertex depths; the
        # anchor point IS edge 0's canonical anchor (cols 0-1), so the
        # kernel reuses the dx/dy it already forms for edge 0's coverage
        # — zc costs 4 vector ops per candidate instead of 9.
        zdx, zdy, za, _, _ = z_plane_coeffs(setup.xy, setup.z, setup.area2)
        zcols = jnp.stack([zdx, zdy, za], axis=-1)
    else:
        zcols = setup.z
    if os.environ.get("RENDERER_KTBL", "block") == "block":
        e15 = (
            _canonical_edges_block_planes(setup.planes, s, valid=setup.valid)
            if setup.planes is not None
            else _canonical_edges_block(setup.xy, s, valid=setup.valid)
        )
        return jnp.concatenate(
            [e15, zcols, inv_area[:, None], ids_col[:, None]], axis=-1
        )
    edges = _canonical_edges(setup.xy, s, valid=setup.valid)
    cols = []
    for e in edges:
        cols += [e["ax"], e["ay"], e["sdx"], e["sdy"], e["thresh"]]
    cols += [zcols[..., 0], zcols[..., 1], zcols[..., 2]]
    cols += [inv_area, ids_col]
    return jnp.stack(cols, axis=-1)


def _depth_coef_table(setup: TriangleSetup, t: int) -> jnp.ndarray:
    """The 20-column per-slot coefficient table of the kernel contract
    (edges/z/inv_area/id — see rasterize_binned_pallas), lane-padded to 128
    with the pad row at index t (whose thresholds are +inf -> never covers)."""
    from renderer_rs_tpu.ops.raster import z_plane_mode

    table = _base_coef_table(
        setup, jnp.arange(t, dtype=jnp.float32), zplane=z_plane_mode()
    )
    table = jnp.pad(table, ((0, 1), (0, 128 - table.shape[-1])))
    return table.at[t, jnp.asarray(_THRESH_COLS)].set(jnp.inf)


def _bin_compact(setup, height, width, tile_h, tile_w, sub_h, chunk,
                 y_offset=0, y_stride=1, small_limit=None, y_pair=False):
    """Compact-binning front end: bin at [sub_h, tile_w] granularity over
    the PADDED tile extent. Returns (slab_ids [n_slots+pad] — tri ids whose
    table gather builds the coefficient slab (pads select the inf-thresh
    row), seg [n_bins+1] segment starts, nty, ntx, overflow [2])."""
    nty, ntx = _cdiv(height, tile_h), _cdiv(width, tile_w)
    n_sub = tile_h // sub_h
    hp, wp = nty * tile_h, ntx * tile_w
    sorted_tris, seg, nby, nbx, overflow = bin_triangles_compact(
        setup, hp, wp, sub_h, tile_w,
        small_limit=small_limit, y_offset=y_offset, y_stride=y_stride,
        y_pair=y_pair,
    )
    assert (nby, nbx) == (nty * n_sub, ntx)
    t = setup.num_triangles
    # tail pad: the last segment's aligned chunk walk may read past the end
    slab_ids = jnp.concatenate(
        [sorted_tris, jnp.full((chunk + 8,), t, jnp.int32)]
    )
    return slab_ids, seg, nty, ntx, overflow


def rasterize_depth_only_batch(
    setups: list[TriangleSetup],
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    tile_h: int = 32,
    tile_w: int = 128,
    chunk: int = 64,
    sub_h: int = 16,
) -> jnp.ndarray:
    """Depth-only rasterization of N independent triangle sets (the CSM
    cascades) in ONE Pallas launch: per-cascade binning feeds a grid of
    N*n_tiles steps sharing one kernel — each grid step's math is identical
    to the single-cascade call, so outputs are bit-identical to N separate
    rasterize_binned_pallas(depth_only=True) launches (tests assert).

    ≙ batching the reference's 4 sequential shadow-pass submissions
    (VERDICT r1 item 9; shadow_csm.hlsli renders each cascade separately).
    Returns [N, height, width] depth maps.
    """
    n_batch = len(setups)
    t = setups[0].num_triangles
    assert all(s.num_triangles == t for s in setups), (
        "rasterize_depth_only_batch: all setups must share a triangle count "
        "(the per-slot coefficient tables and bin padding are sized by it)"
    )

    all_segs, all_coef = [], []
    nty = ntx = None
    row_off = 0
    n_sub = tile_h // sub_h
    for b, setup in enumerate(setups):
        slab_ids, seg, nty, ntx, _ = _bin_compact(
            setup, height, width, tile_h, tile_w, sub_h, chunk
        )
        table = _depth_coef_table(setup, t)
        all_coef.append(table[slab_ids])
        all_segs.append(seg[:-1] + row_off if b + 1 < n_batch else seg + row_off)
        row_off += slab_ids.shape[0]
    n_tiles = nty * ntx
    n_bins = n_tiles * n_sub
    # per-cascade segment arrays shifted by their slab offsets; the kernel
    # addresses cascade c's bins through tilepos's per-step bin offset
    seg = jnp.concatenate(all_segs)
    coef = jnp.concatenate(all_coef, axis=0)

    greater = pipeline.depth_compare_op in (
        CompareOp.GREATER,
        CompareOp.GREATER_OR_EQUAL,
    )
    hp, wp = nty * tile_h, ntx * tile_w
    dpad = jnp.full((hp, wp), -jnp.inf if greater else jnp.inf, jnp.float32)
    dpad = dpad.at[:height, :width].set(1.0)
    depth_tiles = (
        dpad.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
        .reshape(n_tiles, tile_h, tile_w)
    )
    depth_tiles = jnp.tile(depth_tiles, (n_batch, 1, 1))

    tp = jnp.stack(
        [jnp.arange(n_tiles, dtype=jnp.int32) // ntx,
         jnp.arange(n_tiles, dtype=jnp.int32) % ntx,
         jnp.zeros(n_tiles, jnp.int32)],
        axis=-1,
    )
    tilepos = jnp.concatenate(
        [tp.at[:, 2].set(b * n_bins) for b in range(n_batch)]
    ).reshape(-1)

    from renderer_rs_tpu.ops.raster import z_plane_mode as _zpm_b

    kernel = _make_kernel(
        pipeline, tile_h, tile_w, chunk, True, sub_h=sub_h, ntx=ntx,
        zplane=_zpm_b(),  # table via _depth_coef_table follows the same env
    )
    out_shapes = [
        jax.ShapeDtypeStruct((n_batch * n_tiles, tile_h, tile_w), jnp.float32)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_batch * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # compact slab stays in HBM
            pl.BlockSpec(
                (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def wrapped_kernel(seg_ref, tilepos_ref, yoff_ref, coef_hbm, dinit_ref, out_ref, *scratch):
        kernel(seg_ref, tilepos_ref, yoff_ref, coef_hbm, dinit_ref.at[0], out_ref.at[0], *scratch)

    (depth_t,) = pl.pallas_call(
        wrapped_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(seg, tilepos, jnp.zeros((1,), jnp.int32), coef, depth_tiles)

    full = depth_t.reshape(n_batch, nty, ntx, tile_h, tile_w).transpose(0, 1, 3, 2, 4)
    return full.reshape(n_batch, hp, wp)[:, :height, :width]


def rasterize_binned_pallas(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    depth_init: jnp.ndarray | None = None,
    tile_h: int = 32,
    tile_w: int = 128,
    chunk: int = 64,
    depth_only: bool = False,
    varyings: jnp.ndarray | None = None,
    vary_src: jnp.ndarray | None = None,
    vary_bary: jnp.ndarray | None = None,
    flat_varyings: jnp.ndarray | None = None,
    z_floor: jnp.ndarray | None = None,
    ids: jnp.ndarray | None = None,
    skip_bary: bool = False,
    sub_h: int = 16,
    y_offset=0,
    y_stride: int = 1,
    y_pair: bool = False,
    small_limit: int | None = None,
    defer_varyings: bool = False,
    defer_dtype: str | None = None,
    varyings_soa: tuple | None = None,
    vary_bary_planes: tuple | None = None,
):
    """Binned rasterization with per-tile dynamic trip counts (see module
    docstring). Returns VisibilityBuffer, or just the depth array when
    depth_only.

    ids: optional [T] int32 payload written to vis.tri_id instead of the
    raster-slot index (values must stay < 2^24 — they ride a f32 lane).
    Passing the near-clip source map here folds the post-raster
    `clip_src[slot]` per-pixel gather into the kernel for free.

    varyings: optional [Tv, 3, K] per-triangle-vertex attributes (K <= 33).
    When given, the kernel interpolates the winner's attributes
    perspective-correctly IN the raster loop and additionally returns a
    [H, W, K] image — eliminating the per-pixel attribute gathers of the
    deferred path. The attribute columns ride the coefficient slab's pad
    lanes, so DMA traffic is unchanged.

    vary_src/vary_bary: optional per-raster-slot source mapping ([T] int32)
    and barycentric frames ([T,3,3]) from near-plane clipping: the slot's
    vertex attributes are composed as A'_i = sum_j bary[i,j] * A_src[j].
    Composition happens per column here so no padded [T,3,K] intermediate is
    ever materialized (XLA lane-pads small minor dims by 128x).

    z_floor: optional [H,W] strict lower bound on candidate depth (coverage
    requires zc > z_floor) — the depth-peeling primitive behind alpha-cutoff
    on the fast path (renderer/passes).

    defer_varyings: keep the varying/flat columns in the coefficient table
    but OUT of the kernel loop. The kernel then runs the plain visibility
    form (depth/id/bary — 3 winner-select reductions instead of 3+K), and
    the winner's attributes are fetched afterwards with ONE wide-row gather
    table[winner_slot] + the same perspective interpolation in XLA —
    visibility stays bit-identical; varyings match to ulp level (XLA and
    Mosaic contract the interpolation FMAs with different rounding).
    Motivation: each kernel lane costs 3 masked
    [chunk, sub_h, tile_w] reductions PER CHUNK (candidate-count-
    proportional), while the deferred gather is pixel-proportional; r3
    frame probes measured the 20-lane raster at ~62 ms vs ~5 ms of
    deferred-side work.

    defer_dtype: "bf16" stores the DEFERRED attribute table in bfloat16,
    halving the winner-row gather traffic (the largest defer-resolve item).
    A quality/speed knob ≙ HLSL min16float interpolation qualifiers:
    attributes quantize to 8 mantissa bits (~0.4% of range; integer lanes
    like material ids stay exact up to 256). Requires ids=None (a 24-bit
    ids payload would round: the caller must map ids arithmetically or
    by lane instead).

    varyings_soa: optional (attr [V,K], vtx [T0,3] int32) SoA alternative to
    `varyings` for the DEFERRED path (RENDERER_GEOM=soa): the defer table
    builds from three [t,K] row gathers + [t]-plane clip composes + ONE
    block concat, so no [t,3,K]-shaped array (whose (3,K) minor dims pad to
    the (8,128) physical tile, ~30x HBM waste) is ever materialized and the
    40-column jnp.stack (a strided write per column) disappears.
    vary_bary_planes: the 3x3 [t]-plane clip frame from
    ops/clip.clip_triangles_near_planes, used with varyings_soa. Both are
    bit-identical to the array forms (same elementwise formulas/order)."""
    t = setup.num_triangles

    slab_ids, seg, nty, ntx, _overflow = _bin_compact(
        setup, height, width, tile_h, tile_w, sub_h, chunk,
        y_offset=y_offset, y_stride=y_stride, small_limit=small_limit,
        y_pair=y_pair,
    )
    n_tiles = nty * ntx

    # Per-SLOT coefficient table [t+1, 128] in sign-folded canonical edge
    # form so the kernel needs no swap/bool logic on tiny vectors
    # (Mosaic-friendly) and coverage is ONE compare per edge:
    #   [0..4]   edge0: ax, ay, sdx, sdy, thresh
    #   [5..9]   edge1
    #   [10..14] edge2
    #   [15..17] z0, z1, z2
    #   [18]     inv_area (positive)
    #   [19]     tri_id as f32 (exact below 2^24)
    # Built once per raster slot (O(T)) and expanded into the per-tile slab
    # by ONE contiguous row gather — not per-column [n_tiles, cap] gathers,
    # which cost ~50 gather ops over 6x more rows. Row t is the pad row
    # (thresholds +inf -> never covers), which the bin padding selects.
    if varyings_soa is not None:
        assert varyings is None and defer_varyings and not depth_only, (
            "varyings_soa is a deferred-path-only form"
        )
    defer = (
        defer_varyings
        and (varyings is not None or varyings_soa is not None)
        and not depth_only
    )
    # defer_varyings="kernel": in-KERNEL winner-row gather resolve (see
    # _make_kernel gather_vary). The attribute columns ride the 128-lane
    # kernel table's pad lanes (zero extra DMA) and the winner's row is
    # fetched per chunk with tpu.dynamic_gather — replacing BOTH the XLA
    # per-pixel HBM row gather and the blend relayouts of the deferred
    # path with [sub_h, tile_w]-shaped in-kernel ops.
    gmode = (
        defer_varyings == "kernel"
        and not depth_only
        and (varyings is not None or varyings_soa is not None)
    )
    if gmode:
        assert ids is None, (
            "gather-mode defer reports slot ids (col 19); map source ids "
            "arithmetically post-kernel (passes.py arith_src)"
        )
        assert chunk <= tile_w, "gather-mode chunk must fit the lane width"
        defer = False
    from renderer_rs_tpu.ops.raster import z_plane_mode as _zpm0

    import os as _os_sub

    # RENDERER_DEFER_SUBLANE: vertex-SUBLANE defer-table layout [t, 3, L]
    # (lane 0 = inv_w_i, lanes 1..K = clip-composed attributes, trailing
    # lanes on vertex 0 only = flats + ids). Kills BOTH relayout hotspots
    # of the flat layout: the 3+3K+Kf column jnp.stack (a strided write
    # per column) and the 3 vertex-block lane slices of the gathered
    # [H,W,3+3K+Kf] rows (each a relayout pass) — the blend becomes one
    # elementwise multiply + a 3-sublane reduce. "table" gathers from the
    # 3-D table directly; "reshape" keeps the table flat [t, 3L] and
    # reshapes the gathered rows once.
    sub_mode = (
        _os_sub.environ.get("RENDERER_DEFER_SUBLANE", "0")
        if (defer and varyings_soa is None)
        else "0"
    )
    if sub_mode not in ("0", "1", "table", "reshape"):
        sub_mode = "0"
    base_table = _base_coef_table(
        setup,
        # defer mode needs the kernel to report the winner SLOT (the table
        # row to gather); the ids payload then rides a trailing table column
        ids.astype(jnp.float32)
        if (ids is not None and not defer)
        else jnp.arange(t, dtype=jnp.float32),
        zplane=_zpm0() and depth_only,  # depth-only scoped (see kernel)
    )
    cols: list = []  # extra non-defer varying/flat columns (stacked)
    n_vary = 0
    dcols: list = []  # defer-mode columns live in their OWN compact table
    if varyings is not None and not depth_only and not gmode:
        n_vary = varyings.shape[-1]
        # In defer mode the attribute columns go to a SEPARATE [t, 3+3K]
        # table: keeping them inside the 128-lane kernel table made the
        # winner gather read 128-wide rows per pixel (XLA fuses the column
        # slice into the gather) — measured +23 ms at 1080p vs gathering a
        # compact table.
        vcols = dcols if defer else cols
        if not defer:
            assert 20 + 3 + 3 * n_vary <= 128, "too many varying channels"
        inv_w = 1.0 / jnp.maximum(setup.w, 1e-12)  # [t,3]
        vcols += [inv_w[..., 0], inv_w[..., 1], inv_w[..., 2]]  # 20..22 / 0..2
        if vary_src is not None:
            src = vary_src  # [t] raster slot -> source triangle
            cb = vary_bary  # [t,3,3]
        else:
            src = jnp.minimum(jnp.arange(t), varyings.shape[0] - 1)
            cb = None
        va = varyings[src]  # [t, 3, K]

        # K*(3) columns A_ik, composed with the clip frame per column so no
        # padded [.,3,K] intermediate survives fusion.
        # Column ORDER depends on the consumer: the in-kernel loop reads
        # channel-major triplets (23+3k+i); the DEFERRED resolve reads
        # vertex-major K-blocks (3 + i*K + k) so its post-gather blend is
        # 3 contiguous block slices + one fused FMA instead of 3K lane-
        # offset slices (each lane-offset slice of the gathered rows is a
        # relayout pass).
        order = (
            []
            if sub_mode != "0"  # sublane table builds from one einsum below
            else [(i, k) for i in range(3) for k in range(n_vary)]
            if defer
            else [(i, k) for k in range(n_vary) for i in range(3)]
        )
        for i, k in order:
            if cb is None:
                vcols.append(va[..., i, k])
            else:
                vcols.append(
                    cb[..., i, 0] * va[..., 0, k]
                    + cb[..., i, 1] * va[..., 1, k]
                    + cb[..., i, 2] * va[..., 2, k]
                )
    n_flat = 0
    if flat_varyings is not None and not depth_only and not gmode:
        n_flat = flat_varyings.shape[-1]
        fcols = dcols if defer else cols
        if not defer:
            flat_base = 20 + (3 + 3 * n_vary if n_vary else 0)
            assert flat_base + n_flat <= 128, "too many channels"
        fsrc = vary_src if vary_src is not None else jnp.minimum(
            jnp.arange(t), flat_varyings.shape[0] - 1
        )
        fva = flat_varyings[fsrc]  # [t, Kf]
        for k in range(
            n_flat if (sub_mode == "0" and varyings_soa is None) else 0
        ):
            fcols.append(fva[..., k])
    if defer and ids is not None and sub_mode == "0" and varyings_soa is None:
        dcols.append(ids.astype(jnp.float32))  # deferred source-id payload
    dtab = None
    if defer and varyings_soa is not None:
        # SoA defer-table build: three [t,K] row gathers + [t]-plane clip
        # composes + ONE block concat. Column order and per-element FMA
        # order match the dcols path exactly (bit-identical values); what
        # changes is the op shapes — no [t,3,K] array (minor-dim padding)
        # and no per-column strided stack writes.
        attr_v, vtx = varyings_soa
        n_vary = int(attr_v.shape[-1])
        inv_w = 1.0 / jnp.maximum(setup.w, 1e-12)  # [t,3]
        src = (
            vary_src
            if vary_src is not None
            else jnp.minimum(jnp.arange(t), vtx.shape[0] - 1)
        )
        tsrc = vtx[src]  # [t,3] source vertex ids
        rows = [attr_v[tsrc[:, j]] for j in range(3)]  # 3 x [t,K]
        if vary_bary_planes is not None:
            cbp = vary_bary_planes
            blocks = [
                cbp[i][0][:, None] * rows[0]
                + cbp[i][1][:, None] * rows[1]
                + cbp[i][2][:, None] * rows[2]
                for i in range(3)
            ]
        elif vary_bary is not None:
            cb_a = vary_bary
            blocks = [
                cb_a[:, i, 0, None] * rows[0]
                + cb_a[:, i, 1, None] * rows[1]
                + cb_a[:, i, 2, None] * rows[2]
                for i in range(3)
            ]
        else:
            blocks = rows
        parts = [inv_w, *blocks]
        if n_flat:
            parts.append(fva)
        if ids is not None:
            parts.append(ids.astype(jnp.float32)[:, None])
        dtab = jnp.concatenate(parts, axis=-1)  # [t, 3+3K(+Kf)(+1)]
    elif defer and sub_mode != "0":
        # [t, 3, L] (or flat [t, 3L] for "reshape"): the clip-frame compose
        # is ONE einsum into the natural vertex-major block shape — no
        # per-column stack. Trailing exact lanes (flats, ids) ride vertex 0
        # and read back with a sublane-0 slice (winner passthrough).
        awk = (
            jnp.einsum(
                "tij,tjk->tik", cb, va,
                precision=jax.lax.Precision.HIGHEST,
            )
            if cb is not None
            else va
        )
        parts = [inv_w[..., None], awk]
        trail = []
        if n_flat:
            trail.append(fva)
        if ids is not None:
            trail.append(ids.astype(jnp.float32)[:, None])
        if trail:
            tr = jnp.concatenate(trail, axis=-1)  # [t, Kt]
            parts.append(
                jnp.concatenate(
                    [tr[:, None, :], jnp.zeros((tr.shape[0], 2) + tr.shape[-1:], tr.dtype)],
                    axis=1,
                )
            )
        dtab = jnp.concatenate(parts, axis=-1)  # [t, 3, L]
        if sub_mode == "reshape":
            dtab = dtab.reshape(dtab.shape[0], -1)  # [t, 3L]
    elif defer:
        import os as _os_tbl

        if (
            _os_tbl.environ.get("RENDERER_DEFER_TBL") == "einsum"
            and n_vary
        ):
            # A/B variant: assemble the table from BLOCK ops instead of a
            # 40-column jnp.stack (each stacked [t] column is a strided
            # write pass). Same math: awk[t,i,k] = sum_j cb[t,i,j]*va[t,j,k]
            # (the 3-FMA clip-frame compose), laid out vertex-major like
            # the dcols order. HIGHEST keeps the f32 products exact on TPU.
            awk = (
                jnp.einsum(
                    "tij,tjk->tik", cb, va,
                    precision=jax.lax.Precision.HIGHEST,
                )
                if cb is not None
                else va
            )
            parts = [inv_w, awk.reshape(va.shape[0], 3 * n_vary)]
            if n_flat:
                parts.append(fva)
            if ids is not None:
                parts.append(ids.astype(jnp.float32)[:, None])
            dtab = jnp.concatenate(parts, axis=-1)
        else:
            dtab = jnp.stack(dcols, axis=-1)  # [t, 3+3K(+Kf)(+1)]
    if gmode:
        # gather-mode table: [base 20 | inv_w(3) | A0(K) | A1(K) | A2(K) |
        # flats(Kf)] — vertex-MAJOR blocks so the kernel reads channel k of
        # vertex i at column 23 + i*K + k. Assembled from [t, K] block
        # concats (no per-column jnp.stack — the strided-write build the
        # 2026-08-19 compiler update pessimized ~70 ms/frame). The clip-
        # frame compose is the same 3-FMA formula as the defer paths
        # (bit-identical values).
        if varyings_soa is not None:
            attr_v, vtx = varyings_soa
            n_vary = int(attr_v.shape[-1])
            src = (
                vary_src
                if vary_src is not None
                else jnp.minimum(jnp.arange(t), vtx.shape[0] - 1)
            )
            tsrc = vtx[src]  # [t,3]
            rows_g = [attr_v[tsrc[:, j]] for j in range(3)]  # 3 x [t,K]
            if vary_bary_planes is not None:
                cbp = vary_bary_planes
                blocks = [
                    cbp[i][0][:, None] * rows_g[0]
                    + cbp[i][1][:, None] * rows_g[1]
                    + cbp[i][2][:, None] * rows_g[2]
                    for i in range(3)
                ]
            elif vary_bary is not None:
                blocks = [
                    vary_bary[:, i, 0, None] * rows_g[0]
                    + vary_bary[:, i, 1, None] * rows_g[1]
                    + vary_bary[:, i, 2, None] * rows_g[2]
                    for i in range(3)
                ]
            else:
                blocks = rows_g
        else:
            n_vary = int(varyings.shape[-1])
            src = (
                vary_src
                if vary_src is not None
                else jnp.minimum(jnp.arange(t), varyings.shape[0] - 1)
            )
            va_g = varyings[src]  # [t,3,K]
            if vary_bary is not None:
                blocks = [
                    vary_bary[:, i, 0, None] * va_g[:, 0, :]
                    + vary_bary[:, i, 1, None] * va_g[:, 1, :]
                    + vary_bary[:, i, 2, None] * va_g[:, 2, :]
                    for i in range(3)
                ]
            else:
                blocks = [va_g[:, 0, :], va_g[:, 1, :], va_g[:, 2, :]]
        inv_w_g = 1.0 / jnp.maximum(setup.w, 1e-12)  # [t,3]
        parts = [base_table, inv_w_g, *blocks]
        if flat_varyings is not None:
            n_flat = int(flat_varyings.shape[-1])
            fsrc_g = (
                vary_src
                if vary_src is not None
                else jnp.minimum(jnp.arange(t), flat_varyings.shape[0] - 1)
            )
            parts.append(flat_varyings[fsrc_g])
        assert 23 + 3 * n_vary + n_flat <= 128, (
            "gather-mode channels exceed the 128-lane kernel table"
        )
        table = jnp.concatenate(parts, axis=-1)
    else:
        table = (
            jnp.concatenate([base_table, jnp.stack(cols, axis=-1)], axis=-1)
            if cols
            else base_table
        )  # [t, 20(+3+3K)]
    # Lane-pad to 128 and add the all-zero pad row at index t: Mosaic only
    # supports 128-wide HBM DMA slabs, and the in-kernel column extraction
    # needs candidates in SUBLANES (lane->sublane reshapes don't lower).
    table = jnp.pad(table, ((0, 1), (0, 128 - table.shape[-1])))
    table = table.at[t, jnp.asarray(_THRESH_COLS)].set(jnp.inf)  # pad row
    # ONE row gather builds the COMPACT slab: rows = the sorted (bin, tri)
    # pairs (work-proportional — the fixed [n_bins, cap] slab at safe caps
    # cost a ~1.5M-row gather per pass at ~70M rows/s, dominating the
    # kernel itself).
    n_sub = tile_h // sub_h
    coef = table[slab_ids]

    greater = pipeline.depth_compare_op in (
        CompareOp.GREATER,
        CompareOp.GREATER_OR_EQUAL,
    )
    hp, wp = nty * tile_h, ntx * tile_w
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)
    dpad = jnp.pad(
        depth_init,
        ((0, hp - height), (0, wp - width)),
        constant_values=-jnp.inf if greater else jnp.inf,
    )
    depth_tiles = (
        dpad.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3).reshape(
            n_tiles, tile_h, tile_w
        )
    )

    tilepos = jnp.stack(
        [jnp.arange(n_tiles, dtype=jnp.int32) // ntx,
         jnp.arange(n_tiles, dtype=jnp.int32) % ntx,
         jnp.zeros(n_tiles, jnp.int32)],
        axis=-1,
    ).reshape(-1)  # interleaved [ty, tx, bin_offset] per grid step

    has_zfloor = z_floor is not None
    if has_zfloor:
        zf = jnp.pad(
            z_floor, ((0, hp - height), (0, wp - width)), constant_values=jnp.inf
        )
        zfloor_tiles = (
            zf.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
            .reshape(n_tiles, tile_h, tile_w)
        )
    # kernel-facing lane counts: zero in defer mode (the kernel runs the
    # plain visibility form; attributes resolve post-kernel by gather)
    k_vary = 0 if defer else n_vary
    k_flat = 0 if defer else n_flat
    # skip_bary with no attribute lanes = the ids+depth visibility kernel
    # (the resolve-mode MSAA sample pass): b0/b1 reductions and outputs
    # are dropped entirely. The XLA defer path (defer=True) reads
    # vis.bary for its post-kernel blend, so bary stays on there.
    skip_bary = skip_bary and not depth_only and not defer
    if gmode:
        skip_bary = True  # gather mode blends in-kernel; bary never leaves
    from renderer_rs_tpu.ops.raster import z_plane_mode as _zpm

    kernel = _make_kernel(
        pipeline, tile_h, tile_w, chunk, depth_only, k_vary, k_flat,
        has_zfloor=has_zfloor, skip_bary=skip_bary, sub_h=sub_h,
        y_stride=y_stride, ntx=ntx, gather_vary=gmode, y_pair=y_pair,
        # depth-only scoped (raster.z_plane_mode): the full path's
        # winner-equality reselection breaks under the plane form's
        # context-dependent contraction
        zplane=_zpm() and depth_only,
    )

    out_shapes = [jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32)]
    if not depth_only:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32)
        )
        if not skip_bary:
            out_shapes += [
                jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            ]
        if k_vary or k_flat:
            out_shapes.append(
                jax.ShapeDtypeStruct(
                    (n_tiles, k_vary + k_flat, tile_h, tile_w), jnp.float32
                )
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seg starts, tilepos, band y-offset
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # compact slab stays in HBM
            pl.BlockSpec((1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + (
            [pl.BlockSpec((1, tile_h, tile_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)]
            if has_zfloor
            else []
        ),
        out_specs=[
            pl.BlockSpec(
                (1,) + shp.shape[1:],
                (lambda nd: lambda i, *_: (i,) + (0,) * nd)(len(shp.shape) - 1),
                memory_space=pltpu.VMEM,
            )
            for shp in out_shapes
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def wrapped_kernel(seg_ref, tilepos_ref, yoff_ref, coef_hbm, dinit_ref, *rest):
        # blocks carry a leading singleton tile dim; squeeze via views
        kernel(
            seg_ref,
            tilepos_ref,
            yoff_ref,
            coef_hbm,
            dinit_ref.at[0],
            *(r.at[0] for r in rest[: len(rest) - 2]),
            *rest[len(rest) - 2 :],
        )

    yoff = jnp.asarray(y_offset, jnp.int32).reshape(1)
    call_args = [seg, tilepos, yoff, coef, depth_tiles]
    if has_zfloor:
        call_args.append(zfloor_tiles)
    outs = pl.pallas_call(
        wrapped_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(*call_args)

    def stitch(tiles):
        full = tiles.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return full.reshape(hp, wp)[:height, :width]

    if depth_only:
        return stitch(outs[0])
    if skip_bary:
        if k_vary or k_flat:
            depth_t, tid_t, vary_t = outs
        else:
            depth_t, tid_t = outs
            vary_t = None
        b0_t = b1_t = None
    elif k_vary or k_flat:
        depth_t, tid_t, b0_t, b1_t, vary_t = outs
    else:
        depth_t, tid_t, b0_t, b1_t = outs
    vis = VisibilityBuffer(
        tri_id=stitch(tid_t),
        depth=stitch(depth_t),
        # skip_bary: the fused-varying consumers never read vis.bary — the
        # kernel neither computes nor writes it (2 chunk reductions saved)
        bary=(
            jnp.zeros((height, width, 2), jnp.float32)
            if skip_bary
            else jnp.stack([stitch(b0_t), stitch(b1_t)], axis=-1)
        ),
    )
    if defer:
        # Deferred attribute resolve: ONE wide-row gather of the winner's
        # table row + the SAME perspective math the in-kernel lanes ran
        # (masked sums only ever added zeros -> bit-identical).
        slot = jnp.maximum(vis.tri_id, 0)
        width_c = 3 + 3 * n_vary + n_flat + (1 if ids is not None else 0)
        if defer_dtype == "bf16":
            assert ids is None, (
                "bf16 defer table cannot carry an exact ids payload "
                "(24-bit ids round at 8 mantissa bits)"
            )
            dtab = dtab.astype(jnp.bfloat16)
        if sub_mode != "0":
            lanes = dtab.shape[-1] if sub_mode != "reshape" else dtab.shape[-1] // 3
            rows = dtab[slot]  # [H,W,3,L] (or [H,W,3L] for "reshape")
            (rows,) = jax.lax.optimization_barrier((rows,))
            if rows.dtype != jnp.float32:
                rows = rows.astype(jnp.float32)
            if sub_mode == "reshape":
                rows = rows.reshape(rows.shape[:-1] + (3, lanes))
            b0 = vis.bary[..., 0]
            b1 = vis.bary[..., 1]
            w3 = jnp.concatenate(
                [vis.bary, (1.0 - b0 - b1)[..., None]], axis=-1
            )  # [H,W,3]
            wb = w3 * rows[..., 0]
            denom = jnp.sum(wb, axis=-1)
            inv_d = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
            aw = wb * inv_d[..., None]  # [H,W,3]
            # one multiply + 3-sublane reduce replaces the vertex-block
            # lane slices; lane 0 (inv_w) and the vertex-0-only trailing
            # lanes blend to garbage and are ignored by the slices below
            vary_all = jnp.sum(aw[..., None] * rows, axis=-2)  # [H,W,L]
            vary_img = vary_all[..., 1 : 1 + n_vary]
            if n_flat:
                vary_img = jnp.concatenate(
                    [vary_img, rows[..., 0, 1 + n_vary : 1 + n_vary + n_flat]],
                    axis=-1,
                )
            (vary_img,) = jax.lax.optimization_barrier((vary_img,))
            if ids is not None:
                src_id = rows[..., 0, 1 + n_vary + n_flat].astype(jnp.int32)
                vis = vis.replace(
                    tri_id=jnp.where(vis.tri_id >= 0, src_id, vis.tri_id)
                )
            return vis, vary_img
        rows = dtab[slot]  # [H,W,width_c] — compact table, narrow gather
        # Materialize the gathered rows ONCE: without the barrier XLA fuses
        # the gather into every per-channel consumer below and re-runs it
        # K+ times (r3 calibration: the gather itself is ~1.5 ms, but the
        # un-barriered defer resolve measured ~40 ms — fusion duplication)
        (rows,) = jax.lax.optimization_barrier((rows,))
        if rows.dtype != jnp.float32:
            # one cast pass; the barrier held the half-width rows so both
            # the gather and its materialization ran at bf16 traffic
            rows = rows.astype(jnp.float32)
        b0 = vis.bary[..., 0]
        b1 = vis.bary[..., 1]
        b2 = 1.0 - b0 - b1
        wb0 = b0 * rows[..., 0]
        wb1 = b1 * rows[..., 1]
        wb2 = b2 * rows[..., 2]
        denom = wb0 + wb1 + wb2
        inv_d = 1.0 / jnp.where(denom == 0.0, 1.0, denom)
        aw0 = (wb0 * inv_d)[..., None]
        aw1 = (wb1 * inv_d)[..., None]
        aw2 = (wb2 * inv_d)[..., None]
        import os as _os_dm

        if _os_dm.environ.get("RENDERER_DEFER_MATMUL", "0") == "1":
            # Slice-free blend: mask each lane with its vertex-block weight
            # (one elementwise pass — no lane-offset slices, each of which
            # relayouts the [H,W,width_c] rows), then fold the three blocks
            # with a constant 0/1 selection matmul on the MXU. Same f32
            # formula per channel (3 products + 2 adds); precision=HIGHEST
            # keeps f32-accurate accumulation. Flat lanes fold into the
            # SAME matmul with weight 1 (winner-select passthrough), so no
            # post-blend concat/slice relayout remains.
            import numpy as _np_dm

            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, rows.shape[-1]), 2
            )
            in_vary = (lane >= 3) & (lane < 3 + 3 * n_vary)
            in_flat = (lane >= 3 + 3 * n_vary) & (
                lane < 3 + 3 * n_vary + n_flat
            )
            blk = (lane - 3) // max(n_vary, 1)
            wvec = jnp.where(blk == 0, aw0, jnp.where(blk == 1, aw1, aw2))
            weighted = rows * jnp.where(
                in_vary, wvec, jnp.where(in_flat, 1.0, 0.0)
            )
            sel = _np_dm.zeros(
                (rows.shape[-1], n_vary + n_flat), _np_dm.float32
            )
            for i in range(3):
                for k in range(n_vary):
                    sel[3 + i * n_vary + k, k] = 1.0
            for f in range(n_flat):
                sel[3 + 3 * n_vary + f, n_vary + f] = 1.0
            vary_img = jnp.einsum(
                "hwc,ck->hwk", weighted, jnp.asarray(sel),
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            # vertex-major K-block table order (see the packing above): the
            # blend is 3 block slices + one fused FMA over all K channels
            va_ = rows[..., 3 : 3 + n_vary]
            vb_ = rows[..., 3 + n_vary : 3 + 2 * n_vary]
            vc_ = rows[..., 3 + 2 * n_vary : 3 + 3 * n_vary]
            vary_img = aw0 * va_ + aw1 * vb_ + aw2 * vc_  # [H,W,K]
            off = 3 + 3 * n_vary
            if n_flat:
                vary_img = jnp.concatenate(
                    [vary_img, rows[..., off : off + n_flat]], axis=-1
                )
        # materialize the resolved varyings once as well: the K channels
        # fan out to many shade consumers (world_pos alone feeds the
        # shadow projection and every light term)
        (vary_img,) = jax.lax.optimization_barrier((vary_img,))
        if ids is not None:
            src_id = rows[..., width_c - 1].astype(jnp.int32)
            vis = vis.replace(
                tri_id=jnp.where(vis.tri_id >= 0, src_id, vis.tri_id)
            )
        return vis, vary_img
    if k_vary or k_flat:
        nk = k_vary + k_flat
        full = vary_t.reshape(nty, ntx, nk, tile_h, tile_w)
        full = full.transpose(2, 0, 3, 1, 4).reshape(nk, hp, wp)
        vary_img = full[:, :height, :width].transpose(1, 2, 0)  # [H,W,K]
        return vis, vary_img
    return vis
