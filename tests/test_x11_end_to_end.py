"""End-to-end X11 presenter test (VERDICT r4 item 4): the REAL X11Window
class — through real libX11/xcb over a Unix socket — against the scripted
X-server double. Covers connect -> create-window -> map -> XPutImage ->
scripted event pump, the full loop the reference actually runs
(platform/src/window.rs:69-86, app/src/main.rs:61-104)."""

import time

import numpy as np
import pytest

from renderer_rs_tpu.platform.x11_server_double import X11ServerDouble


def _wait(cond, timeout=5.0, what="condition"):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if cond():
            return
        time.sleep(0.01)
    raise AssertionError(f"timed out waiting for {what}")


@pytest.fixture
def x11(monkeypatch):
    try:
        import ctypes.util

        if ctypes.util.find_library("X11") is None:
            pytest.skip("libX11 not available")
    except Exception:
        pytest.skip("ctypes probe failed")
    srv = X11ServerDouble(display_num=77)
    monkeypatch.setenv("DISPLAY", srv.display)
    monkeypatch.setenv("XAUTHORITY", "/nonexistent-xauthority")
    yield srv
    srv.close()


def test_x11_window_full_loop(x11):
    from renderer_rs_tpu.platform.input import InputState, KeyCode, MouseButton
    from renderer_rs_tpu.platform.x11 import X11Window

    win = X11Window(64, 48, "double-test")
    try:
        assert x11.wait_connected(), "client never completed the handshake"
        # connect -> create -> map happened over the real wire
        _wait(lambda: x11.mapped, what="MapWindow")
        wid = x11.mapped[0]
        assert x11.windows[wid]["width"] == 64
        assert x11.windows[wid]["height"] == 48
        # XSelectInput delivered the input mask the app loop needs
        _wait(lambda: x11.event_masks.get(wid), what="ChangeWindowAttributes")
        assert x11.event_masks[wid] & 0b1111  # key+button masks
        # title + WM_DELETE_WINDOW protocol registration
        assert "WM_DELETE_WINDOW" in x11.atoms
        assert any(p["data"] == b"double-test" for p in x11.properties)

        # --- present: a real XPutImage with checkable pixels -------------
        frame = np.zeros((48, 64, 4), np.uint8)
        frame[..., 0] = 10  # R
        frame[..., 1] = 20  # G
        frame[..., 2] = 30  # B
        frame[0, 0] = [200, 100, 50, 255]
        win.present(frame)
        _wait(lambda: x11.put_images, what="PutImage")
        img = x11.put_images[0]
        assert (img["width"], img["height"]) == (64, 48)
        assert img["depth"] == 24
        # ZPixmap truecolor byte order is BGRX
        px0 = img["data"][0:4]
        assert px0 == bytes([50, 100, 200, 255])
        px1 = img["data"][4:8]
        assert px1 == bytes([30, 20, 10, 255])

        # --- scripted events through the REAL XPending/XNextEvent --------
        state = InputState()
        x11.inject_motion(11, 13)
        x11.inject_button(1, press=True, x=11, y=13)
        x11.inject_key(25, press=True)  # keycode 25 -> keysym 'w'
        x11.inject_button(4, press=True)  # scroll up
        time.sleep(0.05)  # let the bytes land in the client socket
        alive = win.pump_events(state)
        assert alive
        assert state.mouse_position == (11.0, 13.0)
        assert state.is_mouse_pressed(MouseButton.LEFT)
        assert state.is_key_pressed(KeyCode.KEY_W)
        assert state.scroll_delta == 1.0

        # --- resize notify drives the deferred-resize hook ---------------
        seen = []
        win.on_resize = lambda w, h: seen.append((w, h))
        x11.inject_configure(96, 80)
        time.sleep(0.05)
        assert win.pump_events(state)
        assert seen == [(96, 80)]
        assert (win.width, win.height) == (96, 80)

        # --- WM close -> pump returns False (app loop exit) --------------
        x11.inject_close()
        time.sleep(0.05)
        assert win.pump_events(state) is False
    finally:
        win.close()
    _wait(lambda: x11.destroyed, what="DestroyWindow")


def test_x11_window_reports_missing_display(monkeypatch):
    from renderer_rs_tpu.core.errors import WindowError
    from renderer_rs_tpu.platform.x11 import X11Window

    monkeypatch.setenv("DISPLAY", ":98")  # nothing listens there
    monkeypatch.setenv("XAUTHORITY", "/nonexistent-xauthority")
    with pytest.raises(WindowError):
        X11Window(32, 32)
