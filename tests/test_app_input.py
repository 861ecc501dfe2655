"""Input -> controller -> camera -> frame loop, end-to-end through the app
entry point (≙ crates/app/src/main.rs:61-104 winit wiring + the camera
controllers, VERDICT round-1 item 8)."""

import hashlib
import os

from renderer_rs_tpu.app.main import apply_camera_input, inject_scripted_events, main
from renderer_rs_tpu.platform.input import InputState, MouseButton
from renderer_rs_tpu.scene.camera import Camera, OrbitController, Projection


def _hashes(outdir):
    out = []
    for name in sorted(os.listdir(outdir)):
        with open(os.path.join(outdir, name), "rb") as f:
            out.append(hashlib.sha1(f.read()).hexdigest())
    return out


def test_orbit_drives_distinct_frames(tmp_path):
    out = str(tmp_path / "frames")
    os.makedirs(out)
    rc = main(
        [
            "--scene", "blinnphong", "--width", "64", "--height", "48",
            "--frames", "3", "--orbit", "--out", out,
        ]
    )
    assert rc == 0
    h = _hashes(out)
    assert len(h) == 3
    assert len(set(h)) == 3, "orbit input must move the camera every frame"


def test_fly_drives_distinct_frames(tmp_path):
    out = str(tmp_path / "frames")
    os.makedirs(out)
    rc = main(
        [
            "--scene", "blinnphong", "--width", "64", "--height", "48",
            "--frames", "3", "--fly", "--out", out,
        ]
    )
    assert rc == 0
    h = _hashes(out)
    assert len(set(h)) == 3, "fly input must move the camera every frame"


def test_orbit_event_stream_reaches_controller():
    """The scripted stream drives OrbitController state deterministically."""
    inp = InputState()
    cam = Camera(Projection.perspective(1.0, 1.0, 0.1, 100.0))
    ctl = OrbitController(distance=5.0)
    az0, d0 = ctl.azimuth, ctl.distance
    for frame in range(20):
        inp.begin_frame()
        inject_scripted_events(inp, "orbit", frame)
        apply_camera_input(inp, "orbit", ctl, cam, 1 / 60)
    assert inp.is_mouse_pressed(MouseButton.LEFT)
    assert ctl.azimuth != az0  # dragged
    assert ctl.distance < d0  # zoomed by the scroll tick at frame 8
