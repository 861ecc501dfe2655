"""Vector helpers (broadcast over leading axes; last axis is the component axis)."""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Component dot product along the last axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit vector; guards the zero vector with eps (not NaN-propagating)."""
    return v / jnp.maximum(length(v), eps)


def normalize_or_zero(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """glam's ``normalize_or_zero``: returns 0 for (near-)zero input.

    Used by DirectionalLightUbo (resources/src/ubo.rs:285-337) so a
    zero-direction light doesn't produce NaNs.
    """
    l = length(v)
    return jnp.where(l > eps, v / jnp.maximum(l, eps), jnp.zeros_like(v))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """HLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i) * n


def saturate(x: jnp.ndarray) -> jnp.ndarray:
    """HLSL saturate: clamp to [0,1]."""
    return jnp.clip(x, 0.0, 1.0)
