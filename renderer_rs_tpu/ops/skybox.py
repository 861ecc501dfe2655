"""Skybox pass — ≙ shaders/hlsl/{vertex,pixel}/skybox.hlsl.

The reference draws a fullscreen triangle at far depth (z=1) and turns each
fragment into a world ray via the inverse view-projection push constant
(vertex/skybox.hlsl:17-45), then samples a cubemap (pixel/skybox.hlsl:18-33).
In the rebuild the "fullscreen triangle" disappears: we directly generate the
per-pixel NDC grid, unproject with inv(VP), and composite where the depth
buffer is still at the far plane — same math, no rasterization needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_ray_directions(
    inv_view_proj: jnp.ndarray,
    height: int,
    width: int,
    y_offset=0,
    full_height: int | None = None,
    y_stride: int = 1,
    y_pair: bool = False,
) -> jnp.ndarray:
    """World-space ray direction per pixel [H,W,3].

    NDC at the far plane (z=1, Vulkan depth range), w=1; direction =
    normalize(world.xyz/world.w - camera) — equivalently the unprojected
    far-plane point minus the unprojected near point; the reference uses
    (invVP * float4(ndc, 1, 1)).xyz/w - cameraPos. We reconstruct via two
    unprojections so no camera position is needed.
    """
    fh = full_height if full_height is not None else height
    if y_pair:
        # pair-interleaved band rows (ops/raster._pixel_centers y_pair)
        j = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        y = (
            ((j // 2) * (2 * y_stride) + (j % 2)).astype(jnp.float32)
            + 0.5
            + y_offset
        ) / fh
    else:
        y = (
            jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) * y_stride
            + 0.5
            + y_offset
        ) / fh
    x = (jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5) / width
    ndc_x = x * 2.0 - 1.0
    ndc_y = y * 2.0 - 1.0

    def unproject(z):
        clip = jnp.stack(
            [ndc_x, ndc_y, jnp.full_like(ndc_x, z), jnp.ones_like(ndc_x)], axis=-1
        )
        world = clip @ inv_view_proj.T
        return world[..., :3] / jnp.where(world[..., 3:4] == 0.0, 1.0, world[..., 3:4])

    near = unproject(0.0)
    far = unproject(1.0)
    d = far - near
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def skybox_pass(
    color: jnp.ndarray,
    depth: jnp.ndarray,
    inv_view_proj: jnp.ndarray,
    cubemap_faces: jnp.ndarray,
    intensity: float = 1.0,
    y_offset=0,
    full_height: int | None = None,
    y_stride: int = 1,
    y_pair: bool = False,
) -> jnp.ndarray:
    """Composite the skybox into pixels still at the far plane (depth >= 1,
    ≙ the skybox's z=1 + LESS_OR_EQUAL depth test trick)."""
    from renderer_rs_tpu.ops.sampling import sample_cubemap

    h, w = depth.shape
    dirs = pixel_ray_directions(inv_view_proj, h, w, y_offset, full_height, y_stride, y_pair)
    sky = sample_cubemap(cubemap_faces, dirs)[..., :3] * intensity
    sky_rgba = jnp.concatenate([sky, jnp.ones_like(sky[..., :1])], axis=-1)
    far_mask = depth >= 1.0
    return jnp.where(far_mask[..., None], sky_rgba, color)
