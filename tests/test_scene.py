"""Scene layer tests — ports of the reference's camera/transform test intent
(camera.rs:530-807: 20 tests; transform.rs:197-453: 17 tests)."""

import math

import numpy as np

from renderer_rs_tpu.mathx import quat_from_euler_yxz
from renderer_rs_tpu.scene import (
    Camera,
    DirectionalLight,
    FpsController,
    LightBank,
    OrbitController,
    PointLight,
    Projection,
    SpotLight,
    Transform,
)


# --- Transform (≙ transform.rs tests) ----------------------------------------

def test_transform_default_identity():
    t = Transform()
    np.testing.assert_allclose(np.asarray(t.local_matrix()), np.eye(4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.world_matrix()), np.eye(4), atol=1e-6)


def test_transform_parent_translation():
    """Doc-test from transform.rs:131-145: child (0,5,0) under parent (10,0,0)
    lands at world (10,5,0)."""
    parent = Transform().with_position([10.0, 0.0, 0.0])
    child = Transform().with_position([0.0, 5.0, 0.0]).with_parent(parent)
    world = np.asarray(child.world_matrix())
    np.testing.assert_allclose(world[:3, 3], [10.0, 5.0, 0.0], atol=1e-5)


def test_transform_parent_is_snapshot():
    """Owned-clone semantics (transform.rs:33-42): mutating the parent after
    set_parent does NOT affect the child."""
    parent = Transform().with_position([1.0, 0.0, 0.0])
    child = Transform().with_parent(parent)
    parent.position = np.array([99.0, 0.0, 0.0], np.float32)
    world = np.asarray(child.world_matrix())
    np.testing.assert_allclose(world[:3, 3], [1.0, 0.0, 0.0], atol=1e-6)


def test_transform_srt_order():
    """Scale then rotate then translate."""
    t = (
        Transform()
        .with_position([0.0, 0.0, -5.0])
        .with_rotation(quat_from_euler_yxz(math.pi / 2, 0.0, 0.0))
        .with_scale([2.0, 2.0, 2.0])
    )
    m = np.asarray(t.world_matrix())
    p = m[:3, :3] @ np.array([1.0, 0.0, 0.0]) + m[:3, 3]
    # (1,0,0) -> scale (2,0,0) -> yaw90 (0,0,-2) -> translate (0,0,-7)
    np.testing.assert_allclose(p, [0.0, 0.0, -7.0], atol=1e-5)


def test_transform_zero_scale_normal_matrix_identity():
    """Zero scale -> singular -> identity fallback (transform.rs:251-267)."""
    t = Transform().with_scale([0.0, 0.0, 0.0])
    nm = np.asarray(t.normal_matrix())
    np.testing.assert_allclose(nm, np.eye(4))


def test_transform_directions():
    t = Transform().with_rotation(quat_from_euler_yxz(math.pi / 2, 0.0, 0.0))
    np.testing.assert_allclose(t.forward(), [-1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(t.right(), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(t.up(), [0.0, 1.0, 0.0], atol=1e-6)


# --- Camera (≙ camera.rs tests) -----------------------------------------------

def test_camera_default_view_identity():
    cam = Camera()
    np.testing.assert_allclose(np.asarray(cam.view_matrix()), np.eye(4), atol=1e-6)


def test_camera_projection_y_flip():
    """proj[1,1] must be negative after the Vulkan flip (camera.rs:135-136)."""
    cam = Camera(Projection.perspective(math.radians(60), 16 / 9, 0.1, 100.0))
    p = np.asarray(cam.projection_matrix())
    assert p[1, 1] < 0


def test_camera_pitch_clamp():
    """set_rotation clamps pitch to ±89° (camera.rs:173-180; test intent
    camera.rs:585-596)."""
    cam = Camera()
    cam.set_rotation(math.radians(120), 0.0)
    fwd = cam.forward()
    # pitch clamped to 89°: forward.y = sin(89°)
    assert abs(fwd[1] - math.sin(math.radians(89))) < 1e-5


def test_camera_look_at():
    cam = Camera()
    cam.position = np.array([0.0, 0.0, 5.0], np.float32)
    cam.look_at([0.0, 0.0, 0.0])
    np.testing.assert_allclose(cam.forward(), [0.0, 0.0, -1.0], atol=1e-5)


def test_camera_look_at_same_position_noop():
    """Zero-direction look_at leaves rotation unchanged (camera.rs:160-166)."""
    cam = Camera()
    before = cam.rotation.copy()
    cam.look_at([0.0, 0.0, 0.0])  # camera is at origin
    np.testing.assert_array_equal(cam.rotation, before)


def test_camera_relative_movement():
    cam = Camera()
    cam.set_rotation(0.0, math.pi / 2)  # yaw 90°: forward = -X... check
    cam.move_forward(2.0)
    # yaw +90° about Y rotates -Z to -X
    np.testing.assert_allclose(cam.position, [-2.0, 0.0, 0.0], atol=1e-5)
    cam.move_up(1.0)
    np.testing.assert_allclose(cam.position, [-2.0, 1.0, 0.0], atol=1e-5)


def test_view_projection_order():
    """view_projection = projection @ view (ubo precompute order, ubo.rs:118)."""
    cam = Camera(Projection.perspective(math.radians(60), 1.0, 0.1, 100.0))
    cam.position = np.array([0.0, 0.0, 5.0], np.float32)
    vp = np.asarray(cam.view_projection_matrix())
    expected = np.asarray(cam.projection_matrix()) @ np.asarray(cam.view_matrix())
    np.testing.assert_allclose(vp, expected, atol=1e-6)


# --- FpsController -------------------------------------------------------------

def test_fps_mouse_pitch_clamp_and_yaw_wrap():
    c = FpsController()
    c.process_mouse_movement(0.0, -100000.0)  # huge up-look
    assert abs(c.pitch - math.radians(89)) < 1e-6
    c.process_mouse_movement(-10000.0, 0.0)  # huge yaw
    assert -math.pi <= c.yaw < math.pi


def test_fps_movement_normalized():
    """Diagonal input moves at move_speed, not sqrt(2)x (camera.rs:314-326)."""
    cam = Camera()
    c = FpsController(move_speed=2.0)
    c.set_movement_input(forward=1.0, right=1.0, up=0.0)
    c.update_camera(cam, delta_time=1.0)
    assert abs(np.linalg.norm(cam.position) - 2.0) < 1e-5
    # forward is -Z, right is +X
    assert cam.position[0] > 0 and cam.position[2] < 0


def test_fps_sync_with_camera_roundtrip():
    cam = Camera()
    cam.set_rotation(0.3, -1.2)
    c = FpsController()
    c.sync_with_camera(cam)
    assert abs(c.pitch - 0.3) < 1e-5
    assert abs(c.yaw - (-1.2)) < 1e-5


# --- OrbitController ------------------------------------------------------------

def test_orbit_position_spherical():
    """polar=pi/2, azimuth=0 -> camera at target + (0,0,distance)
    (camera.rs:484-498)."""
    c = OrbitController(target=(1.0, 2.0, 3.0), distance=5.0)
    c.set_polar(math.pi / 2)
    c.set_azimuth(0.0)
    np.testing.assert_allclose(c.calculate_position(), [1.0, 2.0, 8.0], atol=1e-5)


def test_orbit_polar_clamp():
    c = OrbitController()
    c.process_mouse_movement(0.0, 1e9)
    assert c.polar <= math.pi - 0.1 + 1e-6
    c.process_mouse_movement(0.0, -1e9)
    assert c.polar >= 0.1 - 1e-6


def test_orbit_zoom_clamp():
    c = OrbitController(distance=5.0)
    c.process_zoom(1e9)
    assert c.distance == 0.5  # min_distance
    c.process_zoom(-1e9)
    assert c.distance == 100.0  # max_distance


def test_orbit_update_looks_at_target():
    c = OrbitController(target=(0.0, 0.0, 0.0), distance=4.0)
    cam = Camera()
    c.update_camera(cam)
    to_target = -cam.position / np.linalg.norm(cam.position)
    np.testing.assert_allclose(cam.forward(), to_target, atol=1e-5)


def test_orbit_sync_roundtrip():
    c = OrbitController()
    c.set_azimuth(0.7)
    c.set_polar(1.1)
    c.set_distance(7.0)
    cam = Camera()
    c.update_camera(cam)
    c2 = OrbitController()
    c2.sync_with_camera(cam, (0.0, 0.0, 0.0))
    assert abs(c2.azimuth - 0.7) < 1e-4
    assert abs(c2.polar - 1.1) < 1e-4
    assert abs(c2.distance - 7.0) < 1e-4


def test_orbit_pan_moves_target():
    c = OrbitController(distance=10.0)
    cam = Camera()
    c.update_camera(cam)
    before = c.target.copy()
    c.pan(5.0, 0.0, cam)
    assert not np.allclose(c.target, before)


# --- Lights ----------------------------------------------------------------------

def test_light_defaults_match_reference():
    """light.rs:20-27, 44-51, 76-89 defaults."""
    d = DirectionalLight.create()
    np.testing.assert_allclose(np.asarray(d.direction), [0.0, -1.0, 0.0])
    assert float(d.intensity) == 1.0
    p = PointLight.create()
    assert float(p.radius) == 10.0
    s = SpotLight.create()
    assert float(s.inner_cutoff) == np.float32(0.9)
    assert float(s.outer_cutoff) == np.float32(0.8)


def test_light_bank_padding_and_counts():
    bank = LightBank.create(
        points=[PointLight.create(position=(1, 2, 3))],
        spots=[],
        max_point=8,
        max_spot=4,
    )
    assert bank.point_position.shape == (8, 3)
    assert int(bank.num_point) == 1
    assert int(bank.num_spot) == 0
    np.testing.assert_allclose(np.asarray(bank.point_position[0]), [1, 2, 3])
    np.testing.assert_allclose(np.asarray(bank.point_position[1]), [0, 0, 0])
