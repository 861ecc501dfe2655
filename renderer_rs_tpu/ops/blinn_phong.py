"""Blinn-Phong shading + light attenuation (≙ shaders/hlsl/lights.hlsli).

All functions are vectorized over pixels: inputs are [...,3] world-space
vectors (the deferred shading pass feeds [H,W,3] buffers), constants match
the reference exactly:

- smooth inverse-square attenuation with radius falloff (lights.hlsli:62-72)
- spot cone attenuation over cutoff cosines (lights.hlsli:76-80)
- Blinn-Phong diffuse+specular with the faces-away guard (lights.hlsli:96-121)
- roughness -> shininess map 2048..2 (lights.hlsli:155-163)
- the per-light-type helpers incl. the hardcoded spot radius 50.0
  (lights.hlsli:218)
"""

from __future__ import annotations

import jax.numpy as jnp

from renderer_rs_tpu.mathx.vec import dot, normalize, saturate


def calculate_attenuation(distance: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Inverse-square with smooth radius cutoff (lights.hlsli:62-72).

    att = 1/(d²+1) · saturate(1 - d/r)²
    """
    attenuation = 1.0 / (distance * distance + 1.0)
    falloff = saturate(1.0 - distance / radius)
    return attenuation * falloff * falloff


def calculate_spot_attenuation(
    light_dir: jnp.ndarray,
    spot_dir: jnp.ndarray,
    inner_cos: jnp.ndarray,
    outer_cos: jnp.ndarray,
) -> jnp.ndarray:
    """Smooth cone falloff (lights.hlsli:76-80). light_dir points surface->light."""
    cos_angle = dot(-light_dir, spot_dir)[..., 0]
    return saturate((cos_angle - outer_cos) / (inner_cos - outer_cos))


def roughness_to_shininess(roughness: jnp.ndarray) -> jnp.ndarray:
    """roughness 0..1 -> shininess 2048..2, linear lerp (lights.hlsli:155-163)."""
    r = jnp.clip(roughness, 0.0, 1.0)
    return 2048.0 + (2.0 - 2048.0) * r


def blinn_phong(
    light_dir: jnp.ndarray,
    view_dir: jnp.ndarray,
    normal: jnp.ndarray,
    light_color: jnp.ndarray,
    albedo: jnp.ndarray,
    shininess: jnp.ndarray,
) -> jnp.ndarray:
    """Diffuse + specular (lights.hlsli:96-121). The reference's early-out for
    NdotL<=0 (no specular) becomes a where-mask."""
    ndotl = jnp.maximum(dot(normal, light_dir), 0.0)
    diffuse = ndotl * light_color * albedo
    half_dir = normalize(light_dir + view_dir)
    ndoth = jnp.maximum(dot(normal, half_dir), 0.0)
    if not isinstance(shininess, jnp.ndarray) or shininess.ndim < ndoth.ndim:
        shininess = jnp.broadcast_to(jnp.asarray(shininess), ndoth[..., 0].shape)[
            ..., None
        ]
    specular = jnp.power(jnp.maximum(ndoth, 1e-12), shininess) * light_color
    specular = jnp.where(ndotl > 0.0, specular, 0.0)
    return diffuse + specular


def directional_light(
    direction: jnp.ndarray,
    color: jnp.ndarray,
    intensity: jnp.ndarray,
    normal: jnp.ndarray,
    view_dir: jnp.ndarray,
    albedo: jnp.ndarray,
    roughness: jnp.ndarray,
) -> jnp.ndarray:
    """≙ CalculateDirectionalLight (lights.hlsli:166-179). `direction` points
    from the light (sun) toward the scene; shading uses its negation."""
    light_dir = normalize(-direction)
    light_color = color * intensity
    shininess = roughness_to_shininess(roughness)
    return blinn_phong(light_dir, view_dir, normal, light_color, albedo, shininess)


def point_light(
    position: jnp.ndarray,
    radius: jnp.ndarray,
    color: jnp.ndarray,
    intensity: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    view_dir: jnp.ndarray,
    albedo: jnp.ndarray,
    roughness: jnp.ndarray,
) -> jnp.ndarray:
    """≙ CalculatePointLight (lights.hlsli:182-199)."""
    light_vec = position - world_pos
    distance = jnp.sqrt(jnp.maximum(dot(light_vec, light_vec), 1e-12))
    light_dir = light_vec / distance
    att = calculate_attenuation(distance[..., 0], radius)[..., None]
    light_color = color * intensity * att
    shininess = roughness_to_shininess(roughness)
    return blinn_phong(light_dir, view_dir, normal, light_color, albedo, shininess)


def spot_light(
    position: jnp.ndarray,
    direction: jnp.ndarray,
    color: jnp.ndarray,
    intensity: jnp.ndarray,
    inner_cos: jnp.ndarray,
    outer_cos: jnp.ndarray,
    world_pos: jnp.ndarray,
    normal: jnp.ndarray,
    view_dir: jnp.ndarray,
    albedo: jnp.ndarray,
    roughness: jnp.ndarray,
) -> jnp.ndarray:
    """≙ CalculateSpotLight (lights.hlsli:202-231), incl. the hardcoded
    distance-attenuation radius of 50.0 (lights.hlsli:218)."""
    light_vec = position - world_pos
    distance = jnp.sqrt(jnp.maximum(dot(light_vec, light_vec), 1e-12))
    light_dir = light_vec / distance
    dist_att = calculate_attenuation(distance[..., 0], 50.0)
    spot_att = calculate_spot_attenuation(
        light_dir, normalize(direction), inner_cos, outer_cos
    )
    light_color = color * intensity * (dist_att * spot_att)[..., None]
    shininess = roughness_to_shininess(roughness)
    return blinn_phong(light_dir, view_dir, normal, light_color, albedo, shininess)
