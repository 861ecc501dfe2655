"""X11 presenter (platform/x11.py): availability gating + graceful errors.

A display server is absent in CI, so these tests cover the negative paths
(the positive blit path is exercised on any machine with $DISPLAY; the app
wires it automatically — ≙ the reference's winit window, main.rs:36-59).
"""

import ctypes.util
import os

import pytest

from renderer_rs_tpu.core.errors import WindowError
from renderer_rs_tpu.platform.x11 import X11Window, display_available


def test_display_available_without_display(monkeypatch):
    monkeypatch.delenv("DISPLAY", raising=False)
    assert display_available() is False


def test_window_raises_cleanly_without_display(monkeypatch):
    if ctypes.util.find_library("X11") is None:
        monkeypatch.setenv("DISPLAY", ":99")
        with pytest.raises(WindowError):
            X11Window(64, 48)
    else:
        monkeypatch.setenv("DISPLAY", ":invalid:99")
        with pytest.raises(WindowError):
            X11Window(64, 48)


def test_app_falls_back_offscreen(monkeypatch, tmp_path):
    """main() must not require a display: with DISPLAY unset the surface is
    the offscreen sink and frames still render."""
    monkeypatch.delenv("DISPLAY", raising=False)
    from renderer_rs_tpu.app.main import main

    out = str(tmp_path / "f")
    os.makedirs(out)
    assert main(["--scene", "triangle", "--width", "64", "--height", "48",
                 "--frames", "1", "--out", out]) == 0
    assert len(os.listdir(out)) == 1


def _raw_event(etype: int, detail: int = 0, x: int = 0, y: int = 0) -> bytes:
    """Build a raw LP64 XEvent with just the fields decode_event reads."""
    raw = bytearray(192)
    raw[0:4] = etype.to_bytes(4, "little")
    raw[64:68] = x.to_bytes(4, "little", signed=True)
    raw[68:72] = y.to_bytes(4, "little", signed=True)
    raw[84:88] = detail.to_bytes(4, "little")
    return bytes(raw)


def test_decode_event_roundtrip():
    from renderer_rs_tpu.platform.x11 import decode_event

    assert decode_event(_raw_event(2, detail=25, x=-7, y=300)) == (2, 25, -7, 300)


def test_apply_event_keyboard_drives_input_state():
    """KeyPress/KeyRelease -> InputState via an injected keycode->keysym map
    (≙ winit KeyboardInput arm, app/src/main.rs:85-97)."""
    from renderer_rs_tpu.platform.input import InputState, KeyCode
    from renderer_rs_tpu.platform.x11 import apply_event, decode_event

    inp = InputState()
    keysym_of = {25: 0x0077, 50: 0xFFE1, 99: 0xABCD}.get  # W, LShift, unknown
    for raw in (_raw_event(2, detail=25), _raw_event(2, detail=50),
                _raw_event(2, detail=99)):
        apply_event(inp, *decode_event(raw), keysym_of=keysym_of)
    assert inp.is_key_pressed(KeyCode.KEY_W)
    assert inp.is_key_just_pressed(KeyCode.KEY_W)
    assert inp.is_key_pressed(KeyCode.SHIFT_LEFT)
    apply_event(inp, *decode_event(_raw_event(3, detail=25)), keysym_of=keysym_of)
    assert not inp.is_key_pressed(KeyCode.KEY_W)
    assert inp.is_key_just_released(KeyCode.KEY_W)


def test_apply_event_mouse_and_scroll():
    """Button 1/3 -> LEFT/RIGHT, buttons 4/5 -> scroll, motion -> delta
    (X11 scroll rides button events)."""
    from renderer_rs_tpu.platform.input import InputState, MouseButton
    from renderer_rs_tpu.platform.x11 import apply_event, decode_event

    inp = InputState()
    apply_event(inp, *decode_event(_raw_event(4, detail=1)))
    assert inp.is_mouse_pressed(MouseButton.LEFT)
    apply_event(inp, *decode_event(_raw_event(5, detail=1)))
    assert not inp.is_mouse_pressed(MouseButton.LEFT)
    apply_event(inp, *decode_event(_raw_event(4, detail=4)))
    apply_event(inp, *decode_event(_raw_event(4, detail=4)))
    apply_event(inp, *decode_event(_raw_event(4, detail=5)))
    assert inp.scroll_delta == 1.0  # +1 +1 -1
    # ButtonRelease of a wheel "button" must not scroll
    apply_event(inp, *decode_event(_raw_event(5, detail=4)))
    assert inp.scroll_delta == 1.0
    apply_event(inp, *decode_event(_raw_event(6, x=100, y=60)))
    apply_event(inp, *decode_event(_raw_event(6, x=110, y=55)))
    assert inp.mouse_delta == (10.0, -5.0)


def test_decode_configure():
    """ConfigureNotify width/height land at LP64 offsets 56/60."""
    from renderer_rs_tpu.platform.x11 import decode_configure

    raw = bytearray(192)
    raw[0:4] = (22).to_bytes(4, "little")
    raw[56:60] = (1024).to_bytes(4, "little", signed=True)
    raw[60:64] = (768).to_bytes(4, "little", signed=True)
    assert decode_configure(bytes(raw)) == (1024, 768)
