"""Tonemapping post-pass (BASELINE config 5: "tonemap post-pass").

The reference scaffolds HDR output (sRGB swapchain + HDR IBL pipeline) but
ships no tonemapper yet; the rebuild provides the standard set so the full
frame (shadow + IBL + tonemap) is expressible: Reinhard, exposure, and the
Narkowicz ACES fit (the common UE4-style filmic default).
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap_reinhard(hdr: jnp.ndarray) -> jnp.ndarray:
    """c / (1 + c)."""
    return hdr / (1.0 + hdr)


def tonemap_exposure(hdr: jnp.ndarray, exposure: float = 1.0) -> jnp.ndarray:
    """1 - exp(-c * exposure)."""
    return 1.0 - jnp.exp(-hdr * exposure)


def tonemap_aces(hdr: jnp.ndarray) -> jnp.ndarray:
    """Narkowicz ACES filmic fit: saturate((x(ax+b))/(x(cx+d)+e))."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((hdr * (a * hdr + b)) / (hdr * (c * hdr + d) + e), 0.0, 1.0)


TONEMAPPERS = {
    "none": lambda x: x,
    "reinhard": tonemap_reinhard,
    "aces": tonemap_aces,
}


def apply_tonemap(hdr_rgba: jnp.ndarray, mode: str = "aces") -> jnp.ndarray:
    """Tonemap rgb, preserve alpha."""
    rgb = TONEMAPPERS[mode](hdr_rgba[..., :3])
    return jnp.concatenate([rgb, hdr_rgba[..., 3:]], axis=-1)
