"""Shade-once-per-pixel MSAA resolve (VERDICT r4 item 8).

The supersampling MSAA path (`forward_frame` msaa block) renders the
whole pipeline at sample resolution — geometry AND shading — so msaa4 at
1080p costs ~4x a 1-sample frame (measured 128 ms, docs/tpu_cost_model.md).
Hardware MSAA is cheap precisely because only VISIBILITY runs at sample
rate while the fragment shader runs once per pixel (pipeline.rs:796-799
rasterization_samples; the Vulkan spec's minSampleShading=0 default).

This module is the TPU analog of that split:

- visibility (winner triangle id per SAMPLE) rasterizes at sample rate
  through the cheap ids-only path — correct per-sample depth/coverage,
  exact silhouettes and intersections;
- shading runs ONCE per pixel (the standard 1x frame);
- the resolve maps each sample's winner id to a shaded color by
  id-matching: the pixel's own color when the sample agrees with the
  pixel center's winner, else the nearest neighbor pixel (on the
  sample's side) whose center winner matches — the same winner-id-guided
  reconstruction the y-half cube-radiance upsample uses. Samples with no
  match fall back to the pixel's own color.

The result is a quality-gated approximation: interior pixels (the vast
majority) resolve to exactly the 1x shade; edge pixels blend the true
neighboring surfaces' shaded colors with correct per-sample coverage
weights. What it gives up vs supersampling is shading-rate variation
WITHIN a surface (specular sparkle narrower than a pixel), which the
quality gate prices (probe_quality msaa_resolve).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped spatial shift: out[y, x] = a[y+dy, x+dx], |d| <= 1."""
    if dy == -1:
        a = jnp.concatenate([a[:1], a[:-1]], axis=0)
    elif dy == 1:
        a = jnp.concatenate([a[1:], a[-1:]], axis=0)
    if dx == -1:
        a = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    elif dx == 1:
        a = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    return a


def msaa_id_resolve(
    color: jnp.ndarray,
    center_ids: jnp.ndarray,
    sample_ids: jnp.ndarray,
    sx: int,
    sy: int,
) -> jnp.ndarray:
    """Resolve a 1x-shaded frame against sample-rate winner ids.

    color:      [H, W, 4] shaded at pixel centers
    center_ids: [H, W]    winner source-triangle id at pixel centers (-1 bg)
    sample_ids: [H*sy, W*sx] winner ids at the ordered-grid sample points
    Returns [H, W, 4].
    """
    h, w, _ = color.shape
    # sample (yi, xi) plane: ids at the (xi+0.5)/sx, (yi+0.5)/sy offsets
    planes = sample_ids.reshape(h, sy, w, sx)

    shifted: dict[tuple[int, int], tuple[jnp.ndarray, jnp.ndarray]] = {}

    def neighbor(dy: int, dx: int):
        if (dy, dx) not in shifted:
            shifted[(dy, dx)] = (
                _shift(center_ids, dy, dx),
                _shift(color, dy, dx),
            )
        return shifted[(dy, dx)]

    acc = jnp.zeros_like(color)
    for yi in range(sy):
        for xi in range(sx):
            sid = planes[:, yi, :, xi]
            # the sample's quadrant decides which neighbors can hold the
            # surface it saw: nearest lateral, vertical, then diagonal
            dx = 0 if sx == 1 else (-1 if (xi + 0.5) < sx / 2 else 1)
            dy = 0 if sy == 1 else (-1 if (yi + 0.5) < sy / 2 else 1)
            out = color  # fallback: own shade
            for d in ((dy, dx), (dy, 0), (0, dx)):
                if d == (0, 0):
                    continue
                nid, ncol = neighbor(*d)
                out = jnp.where((sid == nid)[..., None], ncol, out)
            # own center match wins over any neighbor (exact shade)
            out = jnp.where((sid == center_ids)[..., None], color, out)
            acc = acc + out
    return acc / (sx * sy)
