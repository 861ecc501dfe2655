"""SPMD frame rendering: frame batch x framebuffer row-bands over a Mesh.

Design (the renderer's version of DP x SP, SURVEY.md §2.9):
- the scene pytree is batched over a leading 'frame' axis (stack_scenes) and
  sharded over the mesh 'frame' axis — independent frames render on
  independent device groups with zero communication (DP);
- within a frame, the framebuffer's rows are sharded over the mesh 'rows'
  axis: every device runs the full (cheap, replicated) vertex stage and
  rasterizes+shades ONLY its horizontal band (SP over screen space). The
  output [F, H, W, 4] is born sharded as P('frame', 'rows') — compositing
  is pure concatenation along sharded rows, so no collectives are needed in
  the forward path; XLA inserts gathers only if the caller requests a
  replicated result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from renderer_rs_tpu.ops.shadow import ShadowParams
from renderer_rs_tpu.renderer.passes import ShadingModel, forward_frame
from renderer_rs_tpu.renderer.scene_build import GpuScene, SceneLayout
from renderer_rs_tpu.rhi.pipeline import GraphicsPipeline


def stack_scenes(scenes: list[GpuScene]) -> GpuScene:
    """Stack per-frame scene pytrees along a new leading 'frame' axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


def render_frame_sharded(
    stacked_scene: GpuScene,
    layout: SceneLayout,
    pipeline: GraphicsPipeline,
    shading: ShadingModel,
    width: int,
    height: int,
    mesh: Mesh,
    clear_color: tuple = (0.1, 0.1, 0.15, 1.0),
    tonemap: str = "none",
    shadow_map_size: int = 256,
    shadow_params: ShadowParams = ShadowParams(),
    interleaved: bool = False,
):
    """Render a batch of frames over the mesh. Returns [F, H, W, 4] sharded
    as P('frame', 'rows'). F must equal the mesh 'frame' axis size (one
    frame per frame-group; generalize by looping batches of F).

    interleaved=True assigns each device the row PAIRS (2k, 2k+1),
    (2k+2n, 2k+2n+1), ... instead of one contiguous band — the
    LOAD-BALANCED sharding: contiguous bands skew badly (sky rows are
    cheap, geometry rows dense), interleaving gives every device a
    representative row mix. Pair granularity (r4) keeps each 2x2 quad's
    rows on one shard so quad-uniform screen derivatives (texture LOD)
    match the full-frame render. Per-row pixel math is anchored at
    absolute row indices either way, so the stitched image is
    bit-identical to the single-device EXACT-RATE render (tests assert);
    use unshard_rows() to de-interleave the output.

    Rate-reduction caveat: band shards always evaluate shadow/IBL terms
    at full per-pixel rate (the y-strided PCF / cube-radiance reductions
    interpolate across scanlines, so they engage only on full-row
    frames — passes.py gates them on full_rows). The DEFAULT env
    (RENDERER_PCF_RES=yquarter, RENDERER_CUBE_RES=yhalf) therefore makes
    a >=128-row single-device render differ slightly from its sharded
    stitch; set RENDERER_PCF_RES=full RENDERER_CUBE_RES=full on the
    single-device side for strict bit-identity (what the parity tests
    pin).
    """
    n_frames = mesh.shape["frame"]
    n_rows = mesh.shape["rows"]
    # MSAA composes with row sharding by sharding the SUPERSAMPLED frame:
    # each device renders unresolved supersampled band rows (forward_frame's
    # msaa+band contract) and the caller box-resolves after stitching with
    # resolve_msaa() — bit-identical to the single-chip SUPERSAMPLING
    # render (RENDERER_MSAA=super; the r5 shade-once resolve default is a
    # full-frame-only path, like the other full_rows accelerations).
    _, s_y = (
        {2: (2, 1), 4: (2, 2), 8: (4, 2)}[pipeline.msaa_samples]
        if pipeline.msaa_samples > 1
        else (1, 1)
    )
    shard_h = height * s_y
    if shard_h % n_rows != 0:
        raise ValueError(f"height {shard_h} not divisible by rows axis {n_rows}")
    band_h = shard_h // n_rows
    if interleaved and band_h % 2 != 0:
        raise ValueError(
            f"interleaved sharding is pair-granular: band height {band_h} "
            f"must be even (height {shard_h} over {n_rows} rows)"
        )

    @jax.shard_map(
        mesh=mesh,
        in_specs=(P("frame"),),
        out_specs=P("frame", "rows"),
        check_vma=False,
    )
    def spmd(scene_b):
        # scene_b leaves have leading dim F/n_frames == 1 on this shard
        scene = jax.tree.map(lambda x: x[0], scene_b)
        row = jax.lax.axis_index("rows")
        # Interleaving is PAIR-granular (since r4): device k renders row
        # pairs (2k, 2k+1), (2k+2n, 2k+2n+1), ... — each 2x2 quad's rows
        # stay on one shard, so quad-uniform screen derivatives (texture
        # LOD) are bit-identical to the full-frame render while the load
        # balancing is preserved (band=(y0, bh, stride, pair)).
        spec = (
            (2 * row, band_h, n_rows, True)
            if interleaved
            else (row * band_h, band_h)
        )
        band = forward_frame(
            scene,
            layout,
            pipeline,
            shading,
            width,
            height,
            clear_color=clear_color,
            tonemap=tonemap,
            shadow_map_size=shadow_map_size,
            shadow_params=shadow_params,
            band=spec,
        )
        return band[None]  # [1, band_h, W, 4] -> F and rows axes concatenate

    leaves = jax.tree.leaves(stacked_scene)
    if leaves and leaves[0].shape[0] != n_frames:
        raise ValueError(
            f"scene batch {leaves[0].shape[0]} != mesh frame axis {n_frames}"
        )
    return spmd(stacked_scene)


def shard_scene_batch(stacked_scene: GpuScene, mesh: Mesh) -> GpuScene:
    """Place a stacked scene with its leading axis sharded over 'frame'
    (device_put with NamedSharding) so rendering starts from sharded inputs."""
    sharding = NamedSharding(mesh, P("frame"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked_scene)


def resolve_msaa(frames: jnp.ndarray, msaa_samples: int) -> jnp.ndarray:
    """Box-resolve un-sharded SUPERSAMPLED frames [F, H*sy, W*sx, 4] from a
    render_frame_sharded run with an MSAA pipeline (≙ vkCmdResolveImage
    after the sharded draws). Apply AFTER unshard_rows."""
    if msaa_samples <= 1:
        return frames
    sx, sy = {2: (2, 1), 4: (2, 2), 8: (4, 2)}[msaa_samples]
    f, hs, ws, c = frames.shape
    return frames.reshape(f, hs // sy, sy, ws // sx, sx, c).mean(axis=(2, 4))


def unshard_rows(frames: jnp.ndarray, n_rows: int, interleaved: bool) -> jnp.ndarray:
    """Reassemble [F, H, W, 4] from the sharded output's row order.

    Contiguous bands concatenate in place (identity); interleaved bands
    are PAIR-granular (render_frame_sharded): device k's band rows are the
    global row pairs (2k, 2k+1), (2k+2n, 2k+2n+1), ... — de-interleave by
    a pair-axis transpose.
    """
    if not interleaved:
        return frames
    f, h, w, c = frames.shape
    band_h = h // n_rows
    return (
        frames.reshape(f, n_rows, band_h // 2, 2, w, c)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(f, h, w, c)
    )
