"""Quaternions in glam's xyzw layout, as JAX ops.

The reference Camera stores orientation as a quaternion and needs:
from_euler(YXZ) (camera.rs:173-180), from_rotation_arc (camera.rs:160-166),
vector rotation (camera.rs:111,144-157), and matrix conversion.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


def quat_from_axis_angle(axis: jnp.ndarray, angle) -> jnp.ndarray:
    axis = jnp.asarray(axis, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([axis * s, jnp.cos(half)[None]])


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (apply b's rotation, then a's)."""
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ]
    )


def quat_from_euler_yxz(yaw, pitch, roll) -> jnp.ndarray:
    """glam `Quat::from_euler(EulerRot::YXZ, yaw, pitch, roll)` — yaw about Y,
    then pitch about X, then roll about Z (camera.rs:179: YXZ order)."""
    qy = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
    qx = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), pitch)
    qz = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), roll)
    return quat_mul(quat_mul(qy, qx), qz)


def quat_from_rotation_arc(from_v: jnp.ndarray, to_v: jnp.ndarray) -> jnp.ndarray:
    """Shortest-arc rotation taking unit vector `from_v` to unit `to_v`
    (glam `Quat::from_rotation_arc`; used by Camera::look_at, camera.rs:160-166).

    Handles the antiparallel case by rotating pi about an orthogonal axis.
    """
    from_v = jnp.asarray(from_v, jnp.float32)
    to_v = jnp.asarray(to_v, jnp.float32)
    d = jnp.dot(from_v, to_v)
    c = jnp.cross(from_v, to_v)
    # generic case
    w = 1.0 + d
    q = jnp.concatenate([c, jnp.asarray(w, jnp.float32)[None]])
    # antiparallel: pick any axis orthogonal to from_v
    ortho = jnp.where(
        jnp.abs(from_v[0]) > 0.9,
        jnp.array([0.0, 1.0, 0.0], jnp.float32),
        jnp.array([1.0, 0.0, 0.0], jnp.float32),
    )
    axis = jnp.cross(from_v, ortho)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    q_pi = jnp.concatenate([axis, jnp.zeros((1,), jnp.float32)])
    q = jnp.where(d < -0.99999, q_pi, q)
    return quat_normalize(q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q: v' = v + 2*cross(q.xyz, cross(q.xyz,v) + w*v)."""
    xyz = q[:3]
    t = 2.0 * jnp.cross(xyz, v)
    return v + q[3] * t + jnp.cross(xyz, t)


def quat_to_mat3(q: jnp.ndarray) -> jnp.ndarray:
    x, y, z, w = q[0], q[1], q[2], q[3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy]),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx]),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)]),
        ]
    )


def quat_to_mat4(q: jnp.ndarray) -> jnp.ndarray:
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(quat_to_mat3(q))
