"""sRGB <-> linear transfer functions.

Two families, both needed for parity:
- pow-2.2 approximations, matching the reference's shader helpers
  (shaders/hlsl/common.hlsli LinearToSRGB/SRGBToLinear),
- the exact IEC 61966-2-1 piecewise curve, which is what real hardware applies
  when writing to a B8G8R8A8_SRGB swapchain image (the reference's preferred
  format, rhi/src/swapchain.rs:561-588) and when sampling sRGB textures.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb_pow22(c: jnp.ndarray) -> jnp.ndarray:
    """≙ common.hlsli LinearToSRGB: pow(c, 1/2.2)."""
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.2)


def srgb_to_linear_pow22(c: jnp.ndarray) -> jnp.ndarray:
    """≙ common.hlsli SRGBToLinear: pow(c, 2.2)."""
    return jnp.power(jnp.maximum(c, 0.0), 2.2)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Exact sRGB encode (what a _SRGB attachment store does)."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = c * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """Exact sRGB decode (what sampling a _SRGB texture does)."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = c / 12.92
    hi = jnp.power((c + 0.055) / 1.055, 2.4)
    return jnp.where(c <= 0.04045, lo, hi)
