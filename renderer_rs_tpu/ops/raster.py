"""Software rasterizer: triangle setup + visibility-buffer scan.

This is the TPU-native replacement for Vulkan's fixed-function stage
(rasterization state configured in rhi/src/pipeline.rs:161-268; executed
inside vkQueueSubmit, SURVEY.md §3.3). Design:

1. **Vertex stage** happens outside (one batched matmul,
   mathx.transform_points) producing clip-space positions.
2. **Triangle setup** (vectorized over triangles): near-plane/W validity,
   perspective divide, Vulkan viewport transform, signed area + facing,
   sign-normalized edge functions with the top-left fill rule.
3. **Rasterize** to a *visibility buffer* {tri_id, depth, screen barycentrics}
   via a `lax.scan` over triangles, applying the pipeline's depth compare op
   in submission order (exact Vulkan semantics for every CompareOp).
4. **Shading resolves** the visibility buffer afterwards: gather per-vertex
   attributes by tri_id, perspective-correct interpolate, shade all covered
   pixels at once. Depth test & blend are the only order-dependent parts, so
   only step 3 is sequential; everything else is one big fused vector program.

Conventions (match Vulkan + the reference's Y-flipped projection,
scene/src/camera.rs:117-137):
- NDC: x right, y DOWN (+1 = bottom), z in [0,1].
- Framebuffer row 0 = top. Pixel centers at (col+0.5, row+0.5).
- Facing: framebuffer-space signed area a > 0 is front for
  FrontFace.COUNTER_CLOCKWISE (Vulkan spec 25.7.1; verified against the
  Hello Triangle winding renderer.rs:242-246, which is back-facing and only
  renders because that pipeline sets CullMode::None).

Near-plane handling: setup drops whole-behind triangles; crossing triangles
are split beforehand by ops/clip.py (the renderer wires it in). Wireframe
(PolygonMode.LINE) and stencil run on this scan path only.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from renderer_rs_tpu.rhi.pipeline import (
    CompareOp,
    CullMode,
    FrontFace,
    GraphicsPipeline,
    PolygonMode,
)

_W_EPS = 1e-6


@struct.dataclass
class TriangleSetup:
    """Screen-space per-triangle data, vectorized over T triangles.

    xy:    [T,3,2] f32 framebuffer coords of the 3 vertices
    z:     [T,3]   f32 NDC depth in [0,1]
    w:     [T,3]   f32 clip-space w (for perspective correction)
    area2: [T]     f32 signed 2x area in framebuffer coords
    valid: [T]     bool survives degeneracy/near-plane/cull checks
    planes: optional ((sx0,sy0),(sx1,sy1),(sx2,sy2)) — the SAME screen
        coords as flat [T] per-vertex planes (setup_triangles_planes).
        Hot consumers (canonical-edge block, bin bboxes) read these to
        skip the [T,3,2] minor-dim relayouts; xy/z/w stay authoritative
        for everything else, and XLA DCEs whichever form a given program
        never reads. Values are bit-identical by construction.
    """

    xy: Any
    z: Any
    w: Any
    area2: Any
    valid: Any
    planes: Any = None

    @property
    def num_triangles(self) -> int:
        return self.z.shape[0]


def gather_triangle_clip(clip: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """Gather per-triangle clip coords: [V,4],[T,3] -> [T,3,4]."""
    return clip[tris]


def gather_triangle_planes(
    clip: jnp.ndarray, tris: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Plane-form gather: three [T,4] per-vertex rows (v0, v1, v2).

    Same total gather indexes as gather_triangle_clip's [3T,4] form, but
    no [T,3,4] materialization — the r4 attribution charged the
    [3T,4]→[T,3,4] reshape/slice/copy chain ~3 ms/frame across the
    forward+shadow passes (docs/tpu_cost_model.md)."""
    return clip[tris[:, 0]], clip[tris[:, 1]], clip[tris[:, 2]]


def setup_triangles(
    tri_clip: jnp.ndarray,
    width: int,
    height: int,
    pipeline: GraphicsPipeline,
    tri_valid: jnp.ndarray | None = None,
) -> TriangleSetup:
    """Triangle setup: divide, viewport transform, facing/cull, validity.

    tri_clip: [T,3,4] clip-space positions (x,y,z,w).
    tri_valid: optional [T] bool (e.g. index-padding mask).
    """
    from renderer_rs_tpu.rhi.pipeline import PrimitiveTopology

    w_clip = tri_clip[..., 3]  # [T,3]
    ok_w = jnp.all(w_clip > _W_EPS, axis=-1)  # near-plane drop (no clipping yet)

    inv_w = 1.0 / jnp.maximum(w_clip, _W_EPS)
    ndc = tri_clip[..., :3] * inv_w[..., None]  # [T,3,3]

    # Vulkan viewport transform (whole-framebuffer viewport, minDepth=0 maxDepth=1)
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (ndc[..., 1] * 0.5 + 0.5) * height
    xy = jnp.stack([sx, sy], axis=-1)  # [T,3,2]
    z = ndc[..., 2]

    # Signed 2*area in framebuffer coords: cross2(v1-v0, v2-v0).
    # Vulkan's facing rule (spec "Basic Polygon Rasterization") computes
    # a = -(1/2)·Σ(x_i·y_{i+1} − x_{i+1}·y_i) — note the NEGATED shoelace, so
    # that "counter-clockwise" keeps its GL meaning under y-down framebuffer
    # coords. Hence front-for-CCW ⇔ cross2 < 0 here. (Verified empirically:
    # model-space CCW cube faces through the Y-flipped projection land with
    # cross2 < 0 and must survive BACK culling.)
    d1 = xy[:, 1] - xy[:, 0]
    d2 = xy[:, 2] - xy[:, 0]
    area2 = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]  # [T]

    z = _biased_z(
        z, ((sx[:, 0], sy[:, 0]), (sx[:, 1], sy[:, 1]), (sx[:, 2], sy[:, 2])),
        area2, pipeline,
    )

    front = jnp.where(
        pipeline.front_face == FrontFace.COUNTER_CLOCKWISE, area2 < 0.0, area2 > 0.0
    )
    if pipeline.cull_mode == CullMode.NONE:
        cull_ok = jnp.ones_like(front)
    elif pipeline.cull_mode == CullMode.BACK:
        cull_ok = front
    elif pipeline.cull_mode == CullMode.FRONT:
        cull_ok = ~front
    else:  # FRONT_AND_BACK (pipeline.rs:349: rasterize nothing)
        cull_ok = jnp.zeros_like(front)

    if pipeline.topology in (
        PrimitiveTopology.POINT_LIST,
        PrimitiveTopology.LINE_LIST,
        PrimitiveTopology.LINE_STRIP,
    ):
        # points/lines: culling and the zero-area test are polygon-only
        # (Vulkan spec: cull mode applies to polygons; pipeline.rs:330-350).
        # Primitives ride as degenerate index triples (point: v,v,v;
        # line: a,b,b) so the [T,3] layout is shared with triangles.
        valid = ok_w
    else:
        valid = ok_w & cull_ok & (area2 != 0.0)
    if tri_valid is not None:
        valid = valid & tri_valid

    return TriangleSetup(xy=xy, z=z, w=w_clip, area2=area2, valid=valid)


def setup_triangles_planes(
    verts: tuple,
    width: int,
    height: int,
    pipeline: GraphicsPipeline,
    tri_valid: jnp.ndarray | None = None,
) -> TriangleSetup:
    """Plane-form triangle setup: verts = (v0, v1, v2), each [T,4] clip
    rows. Bit-identical to setup_triangles(stack(verts, axis=1), ...) —
    every formula is the same op on the same floats, evaluated per vertex
    plane instead of over the [T,3,·] arrays (whose 3-minor dims force
    tile-padded relayouts between ops; docs/tpu_cost_model.md r4). The
    returned setup carries BOTH forms: flat screen planes for the hot
    consumers, and the assembled xy/z/w arrays (XLA DCEs them in programs
    that only read planes)."""
    from renderer_rs_tpu.rhi.pipeline import PrimitiveTopology

    sxy = []
    zs = []
    ws = []
    ok_w = None
    for v in verts:
        w_v = v[:, 3]
        ok_w = (w_v > _W_EPS) if ok_w is None else ok_w & (w_v > _W_EPS)
        inv_w = 1.0 / jnp.maximum(w_v, _W_EPS)
        sxy.append(
            (
                (v[:, 0] * inv_w * 0.5 + 0.5) * width,
                (v[:, 1] * inv_w * 0.5 + 0.5) * height,
            )
        )
        zs.append(v[:, 2] * inv_w)
        ws.append(w_v)
    (sx0, sy0), (sx1, sy1), (sx2, sy2) = sxy
    area2 = (sx1 - sx0) * (sy2 - sy0) - (sy1 - sy0) * (sx2 - sx0)

    z_stack = _biased_z(jnp.stack(zs, axis=-1), tuple(sxy), area2, pipeline)

    front = jnp.where(
        pipeline.front_face == FrontFace.COUNTER_CLOCKWISE, area2 < 0.0, area2 > 0.0
    )
    if pipeline.cull_mode == CullMode.NONE:
        cull_ok = jnp.ones_like(front)
    elif pipeline.cull_mode == CullMode.BACK:
        cull_ok = front
    elif pipeline.cull_mode == CullMode.FRONT:
        cull_ok = ~front
    else:
        cull_ok = jnp.zeros_like(front)

    if pipeline.topology in (
        PrimitiveTopology.POINT_LIST,
        PrimitiveTopology.LINE_LIST,
        PrimitiveTopology.LINE_STRIP,
    ):
        valid = ok_w
    else:
        valid = ok_w & cull_ok & (area2 != 0.0)
    if tri_valid is not None:
        valid = valid & tri_valid

    xy = jnp.stack(
        [jnp.stack([sx, sy], axis=-1) for sx, sy in sxy], axis=1
    )  # [T,3,2] — compat form; DCEd when only planes are read
    z = z_stack
    w_clip = jnp.stack(ws, axis=-1)
    return TriangleSetup(
        xy=xy, z=z, w=w_clip, area2=area2, valid=valid, planes=tuple(sxy)
    )


def _z_gradient(x0, y0, x1, y1, x2, y2, z0, z1, z2, area2):
    """Screen-space depth-plane gradient (dz/dx, dz/dy) of a triangle —
    the ONE home of the cancellation-sensitive plane numerics, shared by
    the depth-bias slope (`_biased_z`) and the depth-only plane form
    (`z_plane_coeffs`); a precision tweak must land in both consumers."""
    inv = jnp.where(
        area2 != 0.0, 1.0 / jnp.where(area2 == 0.0, 1.0, area2), 0.0
    )
    dzdx = ((z1 - z0) * (y2 - y0) - (z2 - z0) * (y1 - y0)) * inv
    dzdy = ((z2 - z0) * (x1 - x0) - (z1 - z0) * (x2 - x0)) * inv
    return dzdx, dzdy


def _biased_z(z, planes, area2, pipeline: GraphicsPipeline):
    """Apply the pipeline's depth bias to the per-vertex NDC z.

    ≙ VkPipelineRasterizationStateCreateInfo depth bias
    (pipeline.rs:609-613, 781-789; Vulkan spec 27.7.3):

        o = m * slope_factor + r * constant_factor
        (clamped to depth_bias_clamp when clamp != 0)

    with m = max(|dz/dx|, |dz/dy|) of the triangle's screen-space depth
    plane and r = 2^-23 (the minimum resolvable difference of a float
    depth attachment — the d32_sfloat case of the spec's r definition).

    The bias lands on the PER-VERTEX z, so the three rasterizers —
    which all interpolate from `setup.z` with bit-identical schemes —
    inherit identical biased depth planes with no per-implementation
    change (the architecture-invariants contract, CLAUDE.md). The
    biased plane is NOT re-clamped (a vertex clamp would tilt the
    plane); a fragment the bias pushes past a depth bound falls to the
    rasterizers' existing z-range discard — for the shadow-caster use
    case that resolves to far plane = fully lit, the standard behavior.

    z: [T,3]; planes: ((x0,y0),(x1,y1),(x2,y2)) each [T]; area2: [T].
    """
    if not pipeline.depth_bias_enable:
        return z
    (x0, y0), (x1, y1), (x2, y2) = planes
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    dzdx, dzdy = _z_gradient(x0, y0, x1, y1, x2, y2, z0, z1, z2, area2)
    m = jnp.maximum(jnp.abs(dzdx), jnp.abs(dzdy))
    r = jnp.float32(2.0**-23)
    o = m * jnp.float32(pipeline.depth_bias_slope) + r * jnp.float32(
        pipeline.depth_bias_constant
    )
    c = pipeline.depth_bias_clamp
    if c > 0.0:
        o = jnp.minimum(o, jnp.float32(c))
    elif c < 0.0:
        o = jnp.maximum(o, jnp.float32(c))
    return z + o[..., None]


def z_plane_mode() -> bool:
    """RENDERER_Z_FORM=plane: DEPTH-ONLY rasterization (the shadow pass)
    evaluates the triangle's screen-space depth PLANE (anchored at a
    vertex) instead of blending the three vertex depths with
    barycentrics — 4 vector ops per candidate instead of 9 in the
    depth-only inner loops. Read at TRACE time (CLAUDE.md pjit caveat).

    Scope and contract: applies ONLY to depth-only paths (the Pallas
    depth kernel, the binned depth variant, the CSM batch). Depth-only
    reductions are pure min/max — no float-equality winner reselection —
    and measured plane-vs-plane agreement across implementations is a
    few ulp (6e-8 on the micro scene). The full visibility paths keep
    the bary form unconditionally: their winner selection compares zc
    for exact equality against its own reduction, and XLA's context-
    dependent FMA contraction of the plane chain broke that equality at
    scattered pixels (measured: dropped fragments — the reason this knob
    is depth-only). Plane-vs-bary depth differs by the anchored form's
    cancellation bound (~1e-4 worst case for thin/steep triangles) —
    harmless under the shadow pass's >=1e-3 bias thresholds, gated by
    probe_quality before any default flip."""
    import os

    return os.environ.get("RENDERER_Z_FORM", "bary") == "plane"


def z_plane_coeffs(xy, z, area2):
    """Screen-space depth plane per triangle, anchored at edge 0's
    CANONICAL anchor vertex (the same swap rule the canonical-edge fold
    uses, raster_pallas._canonical_edges: edge 0 = v1->v2, anchor = the
    lexicographically smaller of v1/v2 in (y, x)).

    xy [...,3,2], z [...,3], area2 [...] (signed). Returns
    (zdx, zdy, zA, ax, ay), each [...]: depth-only consumers evaluate
    z(px,py) as `eval_z_plane(zdx, zdy, zA, px-ax, py-ay)` and agree to
    the TOLERANCE contract documented in z_plane_mode (NOT bitwise —
    see the FMA-contraction note there). Anchoring at a vertex of the
    triangle keeps the evaluation a LOCAL difference (no big-coordinate
    cancellation); zA is exactly that vertex's z."""
    x0, y0 = xy[..., 0, 0], xy[..., 0, 1]
    x1, y1 = xy[..., 1, 0], xy[..., 1, 1]
    x2, y2 = xy[..., 2, 0], xy[..., 2, 1]
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    zdx, zdy = _z_gradient(x0, y0, x1, y1, x2, y2, z0, z1, z2, area2)
    swap = (y1 > y2) | ((y1 == y2) & (x1 > x2))
    ax = jnp.where(swap, x2, x1)
    ay = jnp.where(swap, y2, y1)
    za = jnp.where(swap, z2, z1)
    return zdx, zdy, za, ax, ay


def eval_z_plane(zdx, zdy, za, dxp, dyp):
    """The per-pixel depth-plane evaluation: (zdx*dx + zdy*dy) + zA.

    The optimization_barriers LIMIT (not eliminate — see z_plane_mode's
    contraction note) cross-program drift: without them, XLA's CSE and
    contraction choices depend on the surrounding graph (the edge
    functions share the px-ax/py-ay subexpressions), which measured up
    to tens of ulp between the binned and scan programs on XLA CPU. The
    Mosaic kernel cannot lower the barrier and inlines the raw chain —
    hence the depth-only scope and the tolerance contract."""
    dxp, dyp = jax.lax.optimization_barrier((dxp, dyp))
    return jax.lax.optimization_barrier((zdx * dxp + zdy * dyp) + za)


def _pixel_centers(
    height: int, width: int, y_offset=0, x_offset=0, y_stride: int = 1,
    y_pair: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Framebuffer-space pixel centers px[H,W], py[H,W].

    Offsets render a band/tile of a larger framebuffer (the multi-chip
    row-sharding path, SURVEY.md §2.9: SP/CP analog over screen tiles) —
    offsets may be traced values (e.g. derived from a mesh axis index).
    y_stride > 1 renders INTERLEAVED rows (y_offset, y_offset+stride, ...):
    the load-balanced row sharding — each device gets a representative mix
    of cheap sky rows and dense geometry rows instead of one contiguous
    band.
    y_pair: interleave at ROW-PAIR granularity — local row j maps to
    global row y_offset + (j//2)*2*y_stride + (j%2). Pairs keep the 2x2
    quad's rows on one shard, so quad-uniform screen derivatives (texture
    LOD, ops/sampling.screen_space_lod) are bit-identical to the
    full-frame render while retaining the load balancing (r4).
    """
    if y_pair:
        j = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        py = (
            ((j // 2) * (2 * y_stride) + (j % 2)).astype(jnp.float32)
            + 0.5
            + y_offset
        )
    else:
        py = (
            jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) * y_stride
            + 0.5
            + y_offset
        )
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5 + x_offset
    return px, py


def _edge(ax, ay, bx, by, px, py):
    """Edge function cross2(b-a, p-a); positive on the interior side after
    sign normalization. Evaluates to area2 at the opposite vertex.

    Watertightness: evaluated from a *canonical* anchor (lexicographic min of
    the endpoints) with an exact sign flip, so the two triangles sharing an
    edge compute bit-identical magnitudes — e(a,b,p) == -e(b,a,p) exactly,
    which makes the e==0 top-left tie-break consistent across the pair.
    """
    swap = (ay > by) | ((ay == by) & (ax > bx))
    cax = jnp.where(swap, bx, ax)
    cay = jnp.where(swap, by, ay)
    cbx = jnp.where(swap, ax, bx)
    cby = jnp.where(swap, ay, by)
    e = (cbx - cax) * (py - cay) - (cby - cay) * (px - cax)
    return jnp.where(swap, -e, e)


def _top_left(ax, ay, bx, by):
    """Top-left fill rule for a sign-normalized edge a->b (y-down coords):
    'top' edge: dy == 0 and dx > 0 (interior below); 'left' edge: dy < 0.
    Shared edges are then covered by exactly one of the two triangles."""
    dx = bx - ax
    dy = by - ay
    return (dy < 0.0) | ((dy == 0.0) & (dx > 0.0))


def depth_compare(op: CompareOp, z_new: jnp.ndarray, z_buf: jnp.ndarray) -> jnp.ndarray:
    """VkCompareOp semantics (pipeline.rs:375-409)."""
    if op == CompareOp.NEVER:
        return jnp.zeros_like(z_new, dtype=bool)
    if op == CompareOp.LESS:
        return z_new < z_buf
    if op == CompareOp.EQUAL:
        return z_new == z_buf
    if op == CompareOp.LESS_OR_EQUAL:
        return z_new <= z_buf
    if op == CompareOp.GREATER:
        return z_new > z_buf
    if op == CompareOp.NOT_EQUAL:
        return z_new != z_buf
    if op == CompareOp.GREATER_OR_EQUAL:
        return z_new >= z_buf
    return jnp.ones_like(z_new, dtype=bool)  # ALWAYS


@struct.dataclass
class VisibilityBuffer:
    """Per-pixel rasterization result.

    tri_id: [H,W] int32 triangle index (into the draw's triangle array), -1 = miss
    depth:  [H,W] f32 final depth buffer (≙ DepthBuffer, renderer/src/depth_buffer.rs)
    bary:   [H,W,2] f32 *screen-space* barycentrics (b0,b1); b2 = 1-b0-b1.
            Perspective correction happens at interpolate() with vertex w.
    """

    tri_id: Any
    depth: Any
    bary: Any

    @property
    def covered(self) -> jnp.ndarray:
        return self.tri_id >= 0


def _coverage_point(setup: TriangleSetup, t, px, py):
    """POINT_LIST coverage: a size-1.0 point covers the fragment whose
    center lies in the half-open unit square around the vertex (Vulkan spec
    "Basic Point Rasterization"; point size is 1.0 — the reference never
    writes PointSize). Encoded as the degenerate triple (v,v,v)."""
    x0, y0 = setup.xy[t, 0, 0], setup.xy[t, 0, 1]
    inside = (
        (px >= x0 - 0.5) & (px < x0 + 0.5) & (py >= y0 - 0.5) & (py < y0 + 0.5)
    ) & setup.valid[t]
    z = jnp.broadcast_to(setup.z[t, 0], px.shape)
    inside = inside & (z >= 0.0) & (z <= 1.0)
    one = jnp.ones_like(px)
    return inside, z, one, jnp.zeros_like(px)


def _coverage_line(setup: TriangleSetup, t, px, py, pipeline: GraphicsPipeline):
    """LINE_LIST/STRIP coverage: rectangle approximation of Vulkan line
    rasterization — fragments whose center is within line_width/2 of the
    segment, half-open at the end vertex so strip joints hit once (the
    spec's diamond-exit rule excludes the endpoint). Encoded as the
    degenerate triple (a,b,b); barycentrics are (1-s, s, 0) with s the
    parametric position for attribute interpolation."""
    x0, y0 = setup.xy[t, 0, 0], setup.xy[t, 0, 1]
    x1, y1 = setup.xy[t, 1, 0], setup.xy[t, 1, 1]
    dx = x1 - x0
    dy = y1 - y0
    len2 = dx * dx + dy * dy
    inv_len2 = jnp.where(len2 > 0.0, 1.0 / jnp.maximum(len2, 1e-30), 0.0)
    sp = ((px - x0) * dx + (py - y0) * dy) * inv_len2  # parametric [0,1)
    perp = jnp.abs((px - x0) * dy - (py - y0) * dx) * jnp.sqrt(inv_len2)
    hw = 0.5 * pipeline.line_width
    inside = (
        (sp >= 0.0) & (sp < 1.0) & (perp <= hw) & (len2 > 0.0) & setup.valid[t]
    )
    z = setup.z[t, 0] + (setup.z[t, 1] - setup.z[t, 0]) * sp
    inside = inside & (z >= 0.0) & (z <= 1.0)
    return inside, z, 1.0 - sp, sp


def _coverage_one(setup: TriangleSetup, t, px, py, pipeline: GraphicsPipeline | None = None):
    """Coverage + depth + barycentrics of primitive t over all pixels.

    Returns (inside [H,W] bool, z [H,W], b0, b1). Dispatches on the
    pipeline's (static) topology: triangles take the edge-function path,
    points/lines their own coverage rules.
    """
    if pipeline is not None:
        from renderer_rs_tpu.rhi.pipeline import PrimitiveTopology

        if pipeline.topology == PrimitiveTopology.POINT_LIST:
            return _coverage_point(setup, t, px, py)
        if pipeline.topology in (
            PrimitiveTopology.LINE_LIST,
            PrimitiveTopology.LINE_STRIP,
        ):
            return _coverage_line(setup, t, px, py, pipeline)
    xy = setup.xy[t]  # [3,2]
    s = jnp.sign(setup.area2[t])
    area_abs = jnp.abs(setup.area2[t])
    inv_area = jnp.where(area_abs > 0.0, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)

    x0, y0 = xy[0, 0], xy[0, 1]
    x1, y1 = xy[1, 0], xy[1, 1]
    x2, y2 = xy[2, 0], xy[2, 1]

    # Edge i is opposite vertex i: e0: v1->v2, e1: v2->v0, e2: v0->v1
    e0 = s * _edge(x1, y1, x2, y2, px, py)
    e1 = s * _edge(x2, y2, x0, y0, px, py)
    e2 = s * _edge(x0, y0, x1, y1, px, py)
    # Top-left rule on sign-normalized edge directions (flip a<->b when s<0)
    flip = s < 0.0
    tl0 = jnp.where(flip, _top_left(x2, y2, x1, y1), _top_left(x1, y1, x2, y2))
    tl1 = jnp.where(flip, _top_left(x0, y0, x2, y2), _top_left(x2, y2, x0, y0))
    tl2 = jnp.where(flip, _top_left(x1, y1, x0, y0), _top_left(x0, y0, x1, y1))

    cov0 = (e0 > 0.0) | ((e0 == 0.0) & tl0)
    cov1 = (e1 > 0.0) | ((e1 == 0.0) & tl1)
    cov2 = (e2 > 0.0) | ((e2 == 0.0) & tl2)
    inside = cov0 & cov1 & cov2 & setup.valid[t]

    if pipeline is not None and pipeline.polygon_mode == PolygonMode.LINE:
        # wireframe (≙ VK_POLYGON_MODE_LINE + wideLines, pipeline.rs:313-327):
        # keep fragments within line_width/2 of an edge; e/|edge| is the
        # pixel distance from the edge line.
        hw = 0.5 * pipeline.line_width
        d0 = e0 / jnp.maximum(
            jnp.hypot(x2 - x1, y2 - y1), 1e-12
        )
        d1 = e1 / jnp.maximum(jnp.hypot(x0 - x2, y0 - y2), 1e-12)
        d2 = e2 / jnp.maximum(jnp.hypot(x1 - x0, y1 - y0), 1e-12)
        inside = inside & (
            (d0 <= hw) | (d1 <= hw) | (d2 <= hw)
        )

    b0 = e0 * inv_area
    b1 = e1 * inv_area
    b2 = 1.0 - b0 - b1
    # Depth interpolates linearly in screen space (z_ndc is already
    # hyperbolic); Vulkan spec 25.9.
    z = b0 * setup.z[t, 0] + b1 * setup.z[t, 1] + b2 * setup.z[t, 2]
    inside = inside & (z >= 0.0) & (z <= 1.0)
    return inside, z, b0, b1


def rasterize(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    depth_init: jnp.ndarray | None = None,
    coverage_fn: Callable[..., jnp.ndarray] | None = None,
    y_offset=0,
    x_offset=0,
    y_stride: int = 1,
    y_pair: bool = False,
) -> VisibilityBuffer:
    """Rasterize all triangles into a visibility buffer.

    Sequential scan over triangles in submission order — the only part of the
    frame with an order dependency (depth test), ≙ the GPU's ROP stage.

    depth_init: [H,W] starting depth (DepthAttachment clear, default 1.0).
    coverage_fn: optional per-triangle extra coverage mask (e.g. alpha cutoff
        computed from interpolated UVs) — mask applied *before* depth write.
    y_offset/x_offset: band origin when rendering a slice of a larger
        framebuffer (multi-chip sharding); y_stride interleaves rows
        (load-balanced sharding).
    """
    px, py = _pixel_centers(height, width, y_offset, x_offset, y_stride, y_pair)
    t_count = setup.num_triangles
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)

    init = (
        jnp.full((height, width), -1, jnp.int32),
        depth_init,
        jnp.zeros((height, width, 2), jnp.float32),
    )

    def body(state, t):
        tri_id, depth, bary = state
        inside, z, b0, b1 = _coverage_one(setup, t, px, py, pipeline)
        if coverage_fn is not None:
            inside = inside & coverage_fn(t, b0, b1)
        if pipeline.depth_test_enable:
            accept = inside & depth_compare(pipeline.depth_compare_op, z, depth)
        else:
            accept = inside
        if pipeline.depth_write_enable:
            depth = jnp.where(accept, z, depth)
        tri_id = jnp.where(accept, t, tri_id)
        new_bary = jnp.stack([b0, b1], axis=-1)
        bary = jnp.where(accept[..., None], new_bary, bary)
        return (tri_id, depth, bary), None

    (tri_id, depth, bary), _ = jax.lax.scan(
        body, init, jnp.arange(t_count, dtype=jnp.int32)
    )
    return VisibilityBuffer(tri_id=tri_id, depth=depth, bary=bary)


def _stencil_apply(op, buf: jnp.ndarray, ref: int) -> jnp.ndarray:
    """One VkStencilOp on the int32 stencil plane (values live in 0..255)."""
    from renderer_rs_tpu.rhi.rendering import StencilOp

    if op == StencilOp.KEEP:
        return buf
    if op == StencilOp.ZERO:
        return jnp.zeros_like(buf)
    if op == StencilOp.REPLACE:
        return jnp.full_like(buf, ref)
    if op == StencilOp.INCREMENT_AND_CLAMP:
        return jnp.minimum(buf + 1, 255)
    if op == StencilOp.DECREMENT_AND_CLAMP:
        return jnp.maximum(buf - 1, 0)
    return (~buf) & 0xFF  # INVERT


def rasterize_stencil(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    stencil,
    depth_init: jnp.ndarray | None = None,
    stencil_init: jnp.ndarray | None = None,
) -> tuple[VisibilityBuffer, jnp.ndarray]:
    """Scan rasterization with the full stencil test/update state machine
    (≙ the StencilAttachment path, rhi/src/rendering.rs:537-648).

    stencil: rhi.rendering.StencilAttachment. Order: stencil test -> depth
    test; updates: fail_op on stencil fail, depth_fail_op on stencil pass +
    depth fail, pass_op on both passing — masked by write_mask (Vulkan
    stencil semantics). Two-sided: when stencil.back is set, back-facing
    primitives use that state (≙ VkStencilOpState front/back); both face
    paths are traced and selected per triangle by the facing rule.
    Returns (VisibilityBuffer, stencil_buffer [H,W] i32).
    """
    from renderer_rs_tpu.rhi.pipeline import FrontFace

    px, py = _pixel_centers(height, width)
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)
    if stencil_init is None:
        stencil_init = jnp.full((height, width), stencil.clear_stencil, jnp.int32)

    front_fs = stencil.front_state if hasattr(stencil, "front_state") else stencil
    back_fs = getattr(stencil, "back", None)
    # facing per triangle (same rule as setup_triangles: front-for-CCW ⇔
    # framebuffer cross2 < 0)
    tri_front = jnp.where(
        pipeline.front_face == FrontFace.COUNTER_CLOCKWISE,
        setup.area2 < 0.0,
        setup.area2 > 0.0,
    )

    init = (
        jnp.full((height, width), -1, jnp.int32),
        depth_init,
        jnp.zeros((height, width, 2), jnp.float32),
        stencil_init,
    )

    def face_step(fs, sbuf, inside, z, depth):
        """One face state's test + masked updates -> (accept, new sbuf)."""
        ref = fs.reference
        rm = fs.read_mask
        wm = fs.write_mask
        s_pass = depth_compare(
            CompareOp(fs.compare),
            jnp.full_like(sbuf, ref & rm).astype(jnp.float32),
            (sbuf & rm).astype(jnp.float32),
        )
        covered_fail = inside & ~s_pass
        after_stencil = inside & s_pass
        if pipeline.depth_test_enable:
            d_pass = depth_compare(pipeline.depth_compare_op, z, depth)
        else:
            d_pass = jnp.ones_like(inside)
        depth_fail = after_stencil & ~d_pass
        accept = after_stencil & d_pass

        def masked_write(cond, op, buf):
            newv = _stencil_apply(op, buf, ref)
            merged = (buf & ~wm) | (newv & wm)
            return jnp.where(cond, merged, buf)

        sbuf = masked_write(covered_fail, fs.fail_op, sbuf)
        sbuf = masked_write(depth_fail, fs.depth_fail_op, sbuf)
        sbuf = masked_write(accept, fs.pass_op, sbuf)
        return accept, sbuf

    def body(state, t):
        tri_id, depth, bary, sbuf = state
        inside, z, b0, b1 = _coverage_one(setup, t, px, py, pipeline)
        accept, sbuf_new = face_step(front_fs, sbuf, inside, z, depth)
        if back_fs is not None:
            accept_b, sbuf_b = face_step(back_fs, sbuf, inside, z, depth)
            is_front = tri_front[t]
            accept = jnp.where(is_front, accept, accept_b)
            sbuf_new = jnp.where(is_front, sbuf_new, sbuf_b)
        sbuf = sbuf_new

        if pipeline.depth_write_enable:
            depth = jnp.where(accept, z, depth)
        tri_id = jnp.where(accept, t, tri_id)
        bary = jnp.where(accept[..., None], jnp.stack([b0, b1], -1), bary)
        return (tri_id, depth, bary, sbuf), None

    (tri_id, depth, bary, sbuf), _ = jax.lax.scan(
        body, init, jnp.arange(setup.num_triangles, dtype=jnp.int32)
    )
    return VisibilityBuffer(tri_id=tri_id, depth=depth, bary=bary), sbuf


def rasterize_depth_only(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    depth_init: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Depth-only pass (≙ the shadow pass, shaders/hlsl/vertex/shadow.hlsl:
    depth-only light-space render with empty pixel shader).

    Order-free: for LESS/LESS_OR_EQUAL this is a pure min-reduction, so it can
    run as a commutative scan (XLA may reorder freely).
    """
    px, py = _pixel_centers(height, width)
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)

    def body(depth, t):
        inside, z, _, _ = _coverage_one(setup, t, px, py, pipeline)
        depth = jnp.where(
            inside & depth_compare(pipeline.depth_compare_op, z, depth), z, depth
        )
        return depth, None

    depth, _ = jax.lax.scan(
        body, depth_init, jnp.arange(setup.num_triangles, dtype=jnp.int32)
    )
    return depth


def perspective_bary(
    vis: VisibilityBuffer, setup: TriangleSetup
) -> jnp.ndarray:
    """Perspective-correct barycentrics [H,W,3] from the visibility buffer.

    b_i' = (b_i / w_i) / sum_j (b_j / w_j)  — standard hyperbolic correction
    (what the hardware interpolator does for non-noperspective varyings).
    Misses (tri_id < 0) get uniform weights (harmless; callers mask them).
    """
    tid = jnp.maximum(vis.tri_id, 0)
    w = setup.w[tid]  # [H,W,3]
    b0 = vis.bary[..., 0]
    b1 = vis.bary[..., 1]
    b2 = 1.0 - b0 - b1
    b = jnp.stack([b0, b1, b2], axis=-1)
    wb = b / jnp.maximum(w, _W_EPS)
    denom = jnp.sum(wb, axis=-1, keepdims=True)
    return wb / jnp.where(denom == 0.0, 1.0, denom)


def interpolate(
    vis: VisibilityBuffer,
    tris: jnp.ndarray,
    attr: jnp.ndarray,
    bary3: jnp.ndarray,
) -> jnp.ndarray:
    """Interpolate a per-vertex attribute over the framebuffer.

    tris: [T,3] vertex indices; attr: [V,K]; bary3: [H,W,3] (use
    perspective_bary for varyings, or screen bary for noperspective).
    Returns [H,W,K]; miss pixels get triangle 0's attribute (mask with
    vis.covered).

    TPU note: re-gathers to a triangle-major table [T,3,K] first (small,
    linear) so the per-pixel fetch is ONE contiguous-row gather instead of an
    index chase through tris — ~2x faster at 1080p.
    """
    tid = jnp.maximum(vis.tri_id, 0)  # [H,W]
    tri_attr = attr[tris]  # [T,3,K] — one linear pre-gather
    vals = tri_attr[tid]  # [H,W,3,K] — one row gather per pixel
    return jnp.einsum("hwv,hwvk->hwk", bary3, vals)


def shade_visibility(
    vis: VisibilityBuffer,
    color: jnp.ndarray,
    background: jnp.ndarray,
) -> jnp.ndarray:
    """Composite shaded colors over the background using coverage.

    color/background: [H,W,4]. ≙ the final attachment write after the
    fragment stage (opaque pipelines; blending is rasterize_ordered's job).
    """
    return jnp.where(vis.covered[..., None], color, background)


def rasterize_ordered(
    setup: TriangleSetup,
    height: int,
    width: int,
    pipeline: GraphicsPipeline,
    fragment_fn: Callable[..., jnp.ndarray],
    color_init: jnp.ndarray,
    depth_init: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Order-preserving rasterize+shade+blend for translucent pipelines.

    fragment_fn(t, bary3[H,W,3], mask[H,W]) -> rgba[H,W,4] is invoked per
    triangle inside the scan; the blend equation from the pipeline's
    ColorBlendAttachment composites in submission order (exact Vulkan blend
    semantics, pipeline.rs:479-544). Costlier than the visibility path — use
    only for blend_enable pipelines.

    Returns (color[H,W,4], depth[H,W]).
    """
    from renderer_rs_tpu.ops.blend import apply_blend  # local import, no cycle

    px, py = _pixel_centers(height, width)
    if depth_init is None:
        depth_init = jnp.ones((height, width), jnp.float32)

    def body(state, t):
        color, depth = state
        inside, z, b0, b1 = _coverage_one(setup, t, px, py, pipeline)
        if pipeline.depth_test_enable:
            accept = inside & depth_compare(pipeline.depth_compare_op, z, depth)
        else:
            accept = inside
        bary3 = jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)
        src = fragment_fn(t, bary3, accept)
        if pipeline.alpha_cutoff is not None:
            accept = accept & (src[..., 3] >= pipeline.alpha_cutoff)
        blended = apply_blend(pipeline.blend, src, color)
        color = jnp.where(accept[..., None], blended, color)
        if pipeline.depth_write_enable:
            depth = jnp.where(accept, z, depth)
        return (color, depth), None

    (color, depth), _ = jax.lax.scan(
        body,
        (color_init, depth_init),
        jnp.arange(setup.num_triangles, dtype=jnp.int32),
    )
    return color, depth
