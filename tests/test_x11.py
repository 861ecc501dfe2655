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
