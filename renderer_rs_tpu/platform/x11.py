"""X11 window presenter — the real-display implementation of the Surface
callable sink.

≙ the reference's winit window + swapchain present path
(crates/platform/src/window.rs:69-186 creates the OS window;
crates/rhi/src/swapchain.rs:425-441 presents into it). Without a GPU
compositor, presenting a software framebuffer to X11 is one XPutImage of
the [H,W,4] uint8 array per frame — driven entirely through ctypes/libX11
so no extra dependency is needed.

Usage (app/main.py wires this automatically when $DISPLAY is set and no
--out directory was given):

    win = X11Window(width, height, title)
    window = Window(width, height, title, sink=win.present)
    ...render loop...; win.pump_events() each frame; win.close()

`pump_events()` drains the X event queue and returns False once the window
was closed (WM_DELETE_WINDOW) — the app loop's exit condition, matching the
reference's CloseRequested handling (app/src/main.rs:61-66).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging
import os

import numpy as np

from renderer_rs_tpu.core.errors import WindowError

log = logging.getLogger("renderer_rs_tpu.platform.x11")

_ZPixmap = 2
_ClientMessage = 33


def display_available() -> bool:
    """Whether an X display can plausibly be opened ($DISPLAY set and
    libX11 loadable)."""
    if not os.environ.get("DISPLAY"):
        return False
    return ctypes.util.find_library("X11") is not None


class X11Window:
    """A real X11 window whose ``present`` blits [H,W,4] uint8 frames."""

    def __init__(self, width: int, height: int, title: str = "renderer_rs_tpu"):
        libname = ctypes.util.find_library("X11")
        if libname is None:
            raise WindowError("libX11 not found (headless environment)")
        x = ctypes.CDLL(libname)
        x.XOpenDisplay.restype = ctypes.c_void_p
        x.XCreateSimpleWindow.restype = ctypes.c_ulong
        x.XCreateImage.restype = ctypes.c_void_p
        x.XInternAtom.restype = ctypes.c_ulong
        x.XDefaultGC.restype = ctypes.c_void_p
        self._x = x
        self._dpy = x.XOpenDisplay(None)
        if not self._dpy:
            raise WindowError(f"cannot open X display {os.environ.get('DISPLAY')!r}")
        self.width, self.height = int(width), int(height)
        dpy = ctypes.c_void_p(self._dpy)
        screen = x.XDefaultScreen(dpy)
        root = x.XRootWindow(dpy, screen)
        self._win = x.XCreateSimpleWindow(
            dpy, ctypes.c_ulong(root), 0, 0, self.width, self.height, 1,
            x.XBlackPixel(dpy, screen), x.XBlackPixel(dpy, screen),
        )
        x.XStoreName(dpy, ctypes.c_ulong(self._win), title.encode())
        # subscribe to close events (≙ winit CloseRequested)
        self._wm_delete = x.XInternAtom(dpy, b"WM_DELETE_WINDOW", 0)
        atom = ctypes.c_ulong(self._wm_delete)
        x.XSetWMProtocols(dpy, ctypes.c_ulong(self._win), ctypes.byref(atom), 1)
        x.XMapWindow(dpy, ctypes.c_ulong(self._win))
        x.XFlush(dpy)
        self._gc = x.XDefaultGC(dpy, screen)
        self._depth = x.XDefaultDepth(dpy, screen)
        self._visual = ctypes.c_void_p(x.XDefaultVisual(dpy, screen))
        self._closed = False
        log.info("X11 window %dx%d on %s", width, height, os.environ.get("DISPLAY"))

    def present(self, frame_u8: np.ndarray, _frame_index: int = 0) -> None:
        """Blit one frame (≙ vkQueuePresentKHR of the software swapchain)."""
        if self._closed:
            return
        h, w = frame_u8.shape[:2]
        # X11 ZPixmap on little-endian truecolor wants BGRX byte order
        bgrx = np.empty((h, w, 4), np.uint8)
        bgrx[..., 0] = frame_u8[..., 2]
        bgrx[..., 1] = frame_u8[..., 1]
        bgrx[..., 2] = frame_u8[..., 0]
        bgrx[..., 3] = 255
        buf = bgrx.tobytes()
        x, dpy = self._x, ctypes.c_void_p(self._dpy)
        img = x.XCreateImage(
            dpy, self._visual, self._depth, _ZPixmap, 0,
            ctypes.c_char_p(buf), w, h, 32, w * 4,
        )
        if not img:
            raise WindowError("XCreateImage failed")
        x.XPutImage(
            dpy, ctypes.c_ulong(self._win), ctypes.c_void_p(self._gc),
            ctypes.c_void_p(img), 0, 0, 0, 0, w, h,
        )
        x.XFlush(dpy)
        # keep Xlib from freeing the python-owned buffer: null the data
        # pointer before XDestroyImage (standard ctypes-Xlib pattern)
        ctypes.cast(
            ctypes.c_void_p(img), ctypes.POINTER(ctypes.c_void_p)
        )[2] = None
        x.XDestroyImage(ctypes.c_void_p(img))

    def pump_events(self) -> bool:
        """Drain pending X events; returns False when the window was closed
        (≙ the winit event loop's CloseRequested, app/src/main.rs:61-66)."""
        if self._closed:
            return False
        x, dpy = self._x, ctypes.c_void_p(self._dpy)
        event = (ctypes.c_char * 192)()  # XEvent is 192 bytes on LP64
        while x.XPending(dpy) > 0:
            x.XNextEvent(dpy, event)
            etype = int.from_bytes(event.raw[:4], "little")
            if etype == _ClientMessage:
                # ClientMessage data starts at offset 56 on LP64
                data0 = int.from_bytes(event.raw[56:64], "little")
                if data0 == self._wm_delete:
                    self._closed = True
                    return False
        return True

    def close(self) -> None:
        if self._dpy and not self._closed:
            self._x.XDestroyWindow(
                ctypes.c_void_p(self._dpy), ctypes.c_ulong(self._win)
            )
            self._x.XCloseDisplay(ctypes.c_void_p(self._dpy))
        self._closed = True
