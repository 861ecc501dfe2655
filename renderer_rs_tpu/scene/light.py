"""Light types + batched light banks.

Semantics and defaults from crates/scene/src/light.rs: DirectionalLight
(direction -Y, white, intensity 1 — light.rs:8-29), PointLight (radius 10 —
light.rs:31-52), SpotLight (inner/outer cutoff *cosines* 0.9/0.8 —
light.rs:54-90). The reference's #[repr(C)] GPU layouts become SoA *banks* —
padded [N,·] arrays with a count — because the fragment pass consumes all
lights of a type in one masked vectorized loop (the TPU form of the
structured-buffer light loops in pixel/model_full.hlsl / model_pbr.hlsl).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DirectionalLight:
    """≙ scene::DirectionalLight (light.rs:8-29)."""

    direction: Any  # [3] normalized, points FROM the light
    color: Any  # [3]
    intensity: Any  # scalar

    @staticmethod
    def create(direction=(0.0, -1.0, 0.0), color=(1.0, 1.0, 1.0), intensity=1.0):
        return DirectionalLight(
            direction=jnp.asarray(direction, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.asarray(intensity, jnp.float32),
        )


@struct.dataclass
class PointLight:
    """≙ scene::PointLight (light.rs:31-52)."""

    position: Any
    radius: Any
    color: Any
    intensity: Any

    @staticmethod
    def create(position=(0.0, 0.0, 0.0), radius=10.0, color=(1.0, 1.0, 1.0), intensity=1.0):
        return PointLight(
            position=jnp.asarray(position, jnp.float32),
            radius=jnp.asarray(radius, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.asarray(intensity, jnp.float32),
        )


@struct.dataclass
class SpotLight:
    """≙ scene::SpotLight (light.rs:54-90); cutoffs are cone-angle cosines."""

    position: Any
    direction: Any
    color: Any
    intensity: Any
    inner_cutoff: Any
    outer_cutoff: Any

    @staticmethod
    def create(
        position=(0.0, 0.0, 0.0),
        direction=(0.0, -1.0, 0.0),
        color=(1.0, 1.0, 1.0),
        intensity=1.0,
        inner_cutoff=0.9,
        outer_cutoff=0.8,
    ):
        return SpotLight(
            position=jnp.asarray(position, jnp.float32),
            direction=jnp.asarray(direction, jnp.float32),
            color=jnp.asarray(color, jnp.float32),
            intensity=jnp.asarray(intensity, jnp.float32),
            inner_cutoff=jnp.asarray(inner_cutoff, jnp.float32),
            outer_cutoff=jnp.asarray(outer_cutoff, jnp.float32),
        )


@struct.dataclass
class LightBank:
    """Padded SoA bank of all scene lights, a static-shape pytree.

    Dynamic light counts are a reference runtime feature (numPointLights UBO
    field, model_pbr.hlsl light loops); under XLA they become a padded bank
    + count so the shading loop is a fixed-trip masked fori (SURVEY.md §7
    "dynamic scene sizes vs static shapes").
    """

    # directional (the sun): kept single, like DirectionalLightUbo
    sun_direction: Any  # [3]
    sun_color: Any  # [3]
    sun_intensity: Any  # scalar
    # point lights, padded to P
    point_position: Any  # [P,3]
    point_radius: Any  # [P]
    point_color: Any  # [P,3]
    point_intensity: Any  # [P]
    num_point: Any  # scalar int32
    # spot lights, padded to S
    spot_position: Any  # [S,3]
    spot_direction: Any  # [S,3]
    spot_color: Any  # [S,3]
    spot_intensity: Any  # [S]
    spot_inner: Any  # [S]
    spot_outer: Any  # [S]
    num_spot: Any  # scalar int32

    @staticmethod
    def create(
        sun: DirectionalLight | None = None,
        points: list[PointLight] | None = None,
        spots: list[SpotLight] | None = None,
        max_point: int | None = None,
        max_spot: int | None = None,
    ) -> "LightBank":
        """Bank sizes default to the actual light counts; pass larger maxes
        to reserve headroom for dynamic add/remove without re-jit."""
        sun = sun or DirectionalLight.create()
        points = points or []
        spots = spots or []
        max_point = len(points) if max_point is None else max_point
        max_spot = len(spots) if max_spot is None else max_spot
        if len(points) > max_point or len(spots) > max_spot:
            raise ValueError("too many lights for the configured bank size")

        def pad(rows, n, k):
            arr = jnp.zeros((n, k), jnp.float32)
            for i, r in enumerate(rows):
                arr = arr.at[i].set(jnp.asarray(r, jnp.float32))
            return arr

        return LightBank(
            sun_direction=sun.direction,
            sun_color=sun.color,
            sun_intensity=sun.intensity,
            point_position=pad([p.position for p in points], max_point, 3),
            point_radius=pad([[p.radius] for p in points], max_point, 1)[:, 0],
            point_color=pad([p.color for p in points], max_point, 3),
            point_intensity=pad([[p.intensity] for p in points], max_point, 1)[:, 0],
            num_point=jnp.asarray(len(points), jnp.int32),
            spot_position=pad([s.position for s in spots], max_spot, 3),
            spot_direction=pad([s.direction for s in spots], max_spot, 3),
            spot_color=pad([s.color for s in spots], max_spot, 3),
            spot_intensity=pad([[s.intensity] for s in spots], max_spot, 1)[:, 0],
            spot_inner=pad([[s.inner_cutoff] for s in spots], max_spot, 1)[:, 0],
            spot_outer=pad([[s.outer_cutoff] for s in spots], max_spot, 1)[:, 0],
            num_spot=jnp.asarray(len(spots), jnp.int32),
        )
