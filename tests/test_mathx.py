"""Math layer tests — glam-parity for the matrices the camera depends on.

Mirrors the reference's pure-logic math tests (scene camera tests
camera.rs:530-807, transform tests transform.rs:197-453): epsilon-compared
hand-computed expectations, no device needed.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from renderer_rs_tpu.mathx import (
    compose_srt,
    inverse_transpose_3x3,
    look_at_rh,
    normalize_or_zero,
    orthographic_rh,
    perspective_rh,
    quat_from_euler_yxz,
    quat_from_rotation_arc,
    quat_identity,
    quat_rotate,
    quat_to_mat3,
    transform_point,
    transform_points,
)
from renderer_rs_tpu.mathx.mat4 import vulkan_y_flip


def test_perspective_rh_vulkan_depth_range():
    """glam perspective_rh maps z=-near -> 0 and z=-far -> 1 (RH looks down -Z)."""
    near, far = 0.1, 100.0
    p = perspective_rh(jnp.pi / 3, 16 / 9, near, far)
    pn = transform_points(p, jnp.array([[0.0, 0.0, -near]]))[0]
    pf = transform_points(p, jnp.array([[0.0, 0.0, -far]]))[0]
    assert pn[2] / pn[3] == pytest.approx(0.0, abs=1e-6)
    assert pf[2] / pf[3] == pytest.approx(1.0, abs=1e-5)
    # w = -z_view
    assert pn[3] == pytest.approx(near, abs=1e-6)


def test_perspective_fov_scaling():
    """A point at the top edge of the frustum lands at ndc.y = -1 pre-flip... or +1.

    perspective_rh has +h at [1,1]: view-space +y maps to +y NDC (y up), the
    Vulkan flip then makes +y view = -y NDC (up = top of screen).
    """
    fov = jnp.pi / 2  # tan(fov/2) = 1
    p = perspective_rh(fov, 1.0, 0.1, 100.0)
    # point at y = +1, z = -1 is on the top frustum plane
    v = transform_points(p, jnp.array([[0.0, 1.0, -1.0]]))[0]
    assert v[1] / v[3] == pytest.approx(1.0, abs=1e-6)
    flipped = vulkan_y_flip(p)
    v2 = transform_points(flipped, jnp.array([[0.0, 1.0, -1.0]]))[0]
    assert v2[1] / v2[3] == pytest.approx(-1.0, abs=1e-6)


def test_orthographic_rh_corners():
    p = orthographic_rh(-2.0, 2.0, -1.0, 1.0, 0.0, 10.0)
    v = transform_points(p, jnp.array([[2.0, 1.0, -10.0]]))[0]
    np.testing.assert_allclose(np.asarray(v[:3]), [1.0, 1.0, 1.0], atol=1e-6)
    v = transform_points(p, jnp.array([[-2.0, -1.0, 0.0]]))[0]
    np.testing.assert_allclose(np.asarray(v[:3]), [-1.0, -1.0, 0.0], atol=1e-6)


def test_look_at_rh_identity_pose():
    """Camera at origin looking down -Z with Y up = identity view."""
    m = look_at_rh(
        jnp.array([0.0, 0.0, 0.0]),
        jnp.array([0.0, 0.0, -1.0]),
        jnp.array([0.0, 1.0, 0.0]),
    )
    np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-6)


def test_look_at_rh_translation():
    """Camera at (0,0,5): world origin maps to view (0,0,-5)."""
    m = look_at_rh(
        jnp.array([0.0, 0.0, 5.0]),
        jnp.array([0.0, 0.0, 0.0]),
        jnp.array([0.0, 1.0, 0.0]),
    )
    v = transform_point(m, jnp.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, -5.0], atol=1e-6)


def test_compose_srt_order():
    """T*R*S: scale applies first, then rotation, then translation
    (≙ Transform::local_matrix, transform.rs:119-121)."""
    rot90 = quat_to_mat3(
        quat_from_euler_yxz(jnp.pi / 2, 0.0, 0.0)
    )  # yaw 90° about Y
    m = compose_srt(
        jnp.array([2.0, 1.0, 1.0]), rot90, jnp.array([10.0, 0.0, 0.0])
    )
    # point (1,0,0): scale -> (2,0,0); yaw90 -> (0,0,-2); translate -> (10,0,-2)
    v = transform_point(m, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [10.0, 0.0, -2.0], atol=1e-5)


def test_quat_euler_yxz_yaw():
    q = quat_from_euler_yxz(jnp.pi / 2, 0.0, 0.0)
    v = quat_rotate(q, jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(np.asarray(v), [-1.0, 0.0, 0.0], atol=1e-6)


def test_quat_euler_yxz_pitch():
    q = quat_from_euler_yxz(0.0, jnp.pi / 2, 0.0)  # pitch up 90°
    v = quat_rotate(q, jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_rotation_arc():
    q = quat_from_rotation_arc(
        jnp.array([0.0, 0.0, -1.0]), jnp.array([1.0, 0.0, 0.0])
    )
    v = quat_rotate(q, jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(np.asarray(v), [1.0, 0.0, 0.0], atol=1e-6)


def test_quat_rotation_arc_antiparallel():
    q = quat_from_rotation_arc(
        jnp.array([0.0, 0.0, -1.0]), jnp.array([0.0, 0.0, 1.0])
    )
    v = quat_rotate(q, jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, 1.0], atol=1e-5)


def test_quat_identity_noop():
    v = quat_rotate(quat_identity(), jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(v), [1.0, 2.0, 3.0], atol=1e-6)


def test_normal_matrix_inverse_transpose():
    """Non-uniform scale: normals need inverse-transpose (ubo.rs:172-268)."""
    m = compose_srt(
        jnp.array([2.0, 1.0, 1.0]), jnp.eye(3), jnp.zeros(3)
    )
    nm = inverse_transpose_3x3(m)
    np.testing.assert_allclose(
        np.asarray(nm[:3, :3]), np.diag([0.5, 1.0, 1.0]), atol=1e-6
    )


def test_normal_matrix_singular_fallback_identity():
    """Singular matrix -> identity, matching the reference's EPSILON=1e-6
    fallback (ubo.rs:241-249, NaN-robustness tests ubo.rs:502-523)."""
    m = jnp.zeros((4, 4), jnp.float32)
    nm = inverse_transpose_3x3(m)
    np.testing.assert_allclose(np.asarray(nm), np.eye(4), atol=0)
    assert not np.any(np.isnan(np.asarray(nm)))


def test_normalize_or_zero():
    """Zero vector normalizes to zero, not NaN (ubo.rs:546-556)."""
    v = normalize_or_zero(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, 0.0])
    v = normalize_or_zero(jnp.array([3.0, 0.0, 4.0]))
    np.testing.assert_allclose(np.asarray(v), [0.6, 0.0, 0.8], atol=1e-6)
