"""4x4 matrix ops with glam-compatible semantics (column vectors, ``M @ v``).

The projection/view constructors reproduce glam's `Mat4::perspective_rh`
(Vulkan/DX [0,1] depth range), `orthographic_rh`, and `look_at_rh` exactly,
because the reference Camera builds its matrices with those and then applies
the Vulkan Y-flip (crates/scene/src/camera.rs:110-137). Bit-level parity here
is what makes the Hello Triangle golden test meaningful.
"""

from __future__ import annotations

import jax.numpy as jnp


def mat4_identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def translate_mat4(t: jnp.ndarray) -> jnp.ndarray:
    """Translation matrix from [3] vector."""
    t = jnp.asarray(t, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(t)


def scale_mat4(s: jnp.ndarray) -> jnp.ndarray:
    """Scale matrix from [3] vector."""
    s = jnp.asarray(s, jnp.float32)
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def rotate_mat4(rot3: jnp.ndarray) -> jnp.ndarray:
    """Embed a [3,3] rotation into a [4,4] homogeneous matrix."""
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(rot3)


def compose_srt(
    scale: jnp.ndarray, rot3: jnp.ndarray, translation: jnp.ndarray
) -> jnp.ndarray:
    """T * R * S — glam's from_scale_rotation_translation order, matching the
    reference Transform::local_matrix (crates/scene/src/transform.rs:119-121)."""
    rs = rot3 * jnp.asarray(scale, jnp.float32)[None, :]  # R @ diag(S)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rs)
    return m.at[:3, 3].set(jnp.asarray(translation, jnp.float32))


def look_at_rh(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Right-handed view matrix (glam `Mat4::look_at_rh`).

    The reference camera looks along its rotated -Z and calls
    look_at_rh(position, position + forward, Y) (camera.rs:110-114).
    """
    eye = jnp.asarray(eye, jnp.float32)
    f = center - eye
    f = f / jnp.maximum(jnp.linalg.norm(f), 1e-12)  # forward
    s = jnp.cross(f, up)
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-12)  # right
    u = jnp.cross(s, f)
    m = jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        ],
        axis=0,
    )
    return m.astype(jnp.float32)


def perspective_rh(
    fov_y: float, aspect: float, z_near: float, z_far: float
) -> jnp.ndarray:
    """Right-handed perspective with [0,1] depth (glam `Mat4::perspective_rh`,
    the Vulkan-appropriate variant used by Camera, camera.rs:117-125)."""
    fov_y = jnp.asarray(fov_y, jnp.float32)
    h = jnp.cos(0.5 * fov_y) / jnp.sin(0.5 * fov_y)
    w = h / aspect
    r = z_far / (z_near - z_far)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(w)
    m = m.at[1, 1].set(h)
    m = m.at[2, 2].set(r)
    m = m.at[2, 3].set(r * z_near)
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic_rh(
    left: float, right: float, bottom: float, top: float, near: float, far: float
) -> jnp.ndarray:
    """Right-handed orthographic with [0,1] depth (glam `Mat4::orthographic_rh`,
    camera.rs:126-133)."""
    rcp_w = 1.0 / (right - left)
    rcp_h = 1.0 / (top - bottom)
    r = 1.0 / (near - far)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 * rcp_w)
    m = m.at[1, 1].set(2.0 * rcp_h)
    m = m.at[2, 2].set(r)
    m = m.at[0, 3].set(-(left + right) * rcp_w)
    m = m.at[1, 3].set(-(top + bottom) * rcp_h)
    m = m.at[2, 3].set(r * near)
    m = m.at[3, 3].set(1.0)
    return m


def vulkan_y_flip(proj: jnp.ndarray) -> jnp.ndarray:
    """Negate proj[1,1] — the reference's `proj.y_axis.y *= -1` Vulkan flip
    (camera.rs:135-136). Kept as an explicit op for bit-comparability."""
    return proj.at[1, 1].multiply(-1.0)


def transform_point(m: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Transform a [3] point by a [4,4] matrix (w=1), returns [3]."""
    v = m[:3, :3] @ p + m[:3, 3]
    return v


def transform_vector(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Transform a [3] direction by a [4,4] matrix (w=0), returns [3]."""
    return m[:3, :3] @ v


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Batched homogeneous point transform: [N,3] @ M^T + t -> [N,4] clip coords.

    This is THE vertex stage primitive: one MXU matmul over all vertices
    (TPU analog of shaders/hlsl/vertex/model.hlsl:41-45).
    """
    n = pts.shape[0]
    homo = jnp.concatenate([pts, jnp.ones((n, 1), pts.dtype)], axis=-1)
    return homo @ m.T


def transform_vectors(m: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Batched direction transform (no translation): [N,3] -> [N,3]."""
    return vecs @ m[:3, :3].T


def inverse_transpose_3x3(m: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Normal matrix: inverse-transpose of the upper-left 3x3, with the
    reference's identity fallback for (near-)singular matrices
    (resources/src/ubo.rs:172-268, EPSILON=1e-6; scene/src/transform.rs:164-179).

    Returns a [4,4] with the normal matrix in the upper-left block (std140
    layout stores normal matrices as mat4, ubo.rs:190).
    """
    a = m[:3, :3]
    det = jnp.linalg.det(a)
    # adjugate / det == inverse; transpose(inverse) == adjugate^T / det
    inv = jnp.linalg.inv(jnp.where(jnp.abs(det) > eps, a, jnp.eye(3, dtype=m.dtype)))
    nm3 = jnp.where(jnp.abs(det) > eps, inv.T, jnp.eye(3, dtype=m.dtype))
    out = jnp.eye(4, dtype=m.dtype)
    return out.at[:3, :3].set(nm3)
