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
_KeyPress = 2
_KeyRelease = 3
_ButtonPress = 4
_ButtonRelease = 5
_MotionNotify = 6
_ConfigureNotify = 22
_ClientMessage = 33

# X.h event masks — the inputs the reference's winit loop subscribes to
# (app/src/main.rs:61-104: keyboard, mouse buttons, cursor motion) plus
# structure notifies for the Resized arm (app/src/main.rs:67-75)
_INPUT_EVENT_MASK = (
    (1 << 0)   # KeyPressMask
    | (1 << 1)  # KeyReleaseMask
    | (1 << 2)  # ButtonPressMask
    | (1 << 3)  # ButtonReleaseMask
    | (1 << 6)  # PointerMotionMask
    | (1 << 17)  # StructureNotifyMask (ConfigureNotify = resize)
)

# X11 keysyms (X11/keysymdef.h) -> platform KeyCode — the keys the
# reference app handles (app/src/main.rs:85-97 winit KeyboardInput arm)
_KEYSYM_TO_KEYCODE = {
    0x0077: "KEY_W", 0x0061: "KEY_A", 0x0073: "KEY_S", 0x0064: "KEY_D",
    0x0071: "KEY_Q", 0x0065: "KEY_E", 0x0020: "SPACE",
    0xFFE1: "SHIFT_LEFT", 0xFFE3: "CONTROL_LEFT", 0xFF1B: "ESCAPE",
    0xFF52: "ARROW_UP", 0xFF54: "ARROW_DOWN",
    0xFF51: "ARROW_LEFT", 0xFF53: "ARROW_RIGHT",
}


def decode_event(raw: bytes) -> tuple[int, int, int, int]:
    """Decode the fields this backend consumes from a raw XEvent (LP64
    layout, see XKeyEvent/XButtonEvent/XMotionEvent in Xlib.h):
    returns (type, detail, x, y) where detail = keycode (Key*) or button
    number (Button*); x/y are window-relative pointer coords. Pure —
    unit-testable without a display."""
    etype = int.from_bytes(raw[0:4], "little")
    x = int.from_bytes(raw[64:68], "little", signed=True)
    y = int.from_bytes(raw[68:72], "little", signed=True)
    detail = int.from_bytes(raw[84:88], "little")
    return etype, detail, x, y


def decode_configure(raw: bytes) -> tuple[int, int]:
    """(width, height) of an XConfigureEvent (LP64: ints at offsets 56/60).
    Pure — unit-testable without a display."""
    w = int.from_bytes(raw[56:60], "little", signed=True)
    h = int.from_bytes(raw[60:64], "little", signed=True)
    return w, h


def apply_event(input_state, etype: int, detail: int, x: int, y: int,
                keysym_of=None) -> None:
    """Feed one decoded X event into an InputState (≙ the reference's
    winit -> InputState dispatch, app/src/main.rs:61-104). keysym_of maps
    a hardware keycode -> keysym (display-dependent; tests inject one)."""
    from renderer_rs_tpu.platform.input import InputState, KeyCode, MouseButton

    assert isinstance(input_state, InputState)
    if etype in (_KeyPress, _KeyRelease) and keysym_of is not None:
        name = _KEYSYM_TO_KEYCODE.get(int(keysym_of(detail)))
        if name is None:
            return
        key = KeyCode[name]
        if etype == _KeyPress:
            input_state.on_key_press(key)
        else:
            input_state.on_key_release(key)
    elif etype in (_ButtonPress, _ButtonRelease):
        if detail in (4, 5):  # scroll wheel rides button events in X11
            if etype == _ButtonPress:
                input_state.on_scroll(1.0 if detail == 4 else -1.0)
            return
        btn = {1: MouseButton.LEFT, 2: MouseButton.MIDDLE,
               3: MouseButton.RIGHT}.get(detail)
        if btn is None:
            return
        if etype == _ButtonPress:
            input_state.on_mouse_press(btn)
        else:
            input_state.on_mouse_release(btn)
    elif etype == _MotionNotify:
        input_state.on_mouse_move(float(x), float(y))


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
        # pointer/XID returns MUST be declared: ctypes' default c_int
        # restype truncates 64-bit returns (the XDefaultVisual truncation
        # segfaulted XCreateImage — caught by the scripted-server e2e test)
        x.XDefaultVisual.restype = ctypes.c_void_p
        x.XRootWindow.restype = ctypes.c_ulong
        x.XBlackPixel.restype = ctypes.c_ulong
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
        x.XSelectInput(dpy, ctypes.c_ulong(self._win), _INPUT_EVENT_MASK)
        x.XKeycodeToKeysym.restype = ctypes.c_ulong
        x.XMapWindow(dpy, ctypes.c_ulong(self._win))
        x.XFlush(dpy)
        self._gc = x.XDefaultGC(dpy, screen)
        self._depth = x.XDefaultDepth(dpy, screen)
        self._visual = ctypes.c_void_p(x.XDefaultVisual(dpy, screen))
        self._closed = False
        # invoked with (width, height) when the WM resizes the window
        # (≙ WindowEvent::Resized -> window.resize + renderer.resize,
        # app/src/main.rs:67-75); the app wires renderer.resize here
        self.on_resize = None
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

    def pump_events(self, input_state=None) -> bool:
        """Drain pending X events; returns False when the window was closed
        (≙ the winit event loop's CloseRequested, app/src/main.rs:61-66).
        When ``input_state`` is given, key/button/motion events are fed
        into it (≙ the winit KeyboardInput/MouseInput/CursorMoved arms,
        app/src/main.rs:85-97) — the app's live-input path."""
        if self._closed:
            return False
        x, dpy = self._x, ctypes.c_void_p(self._dpy)
        event = (ctypes.c_char * 192)()  # XEvent is 192 bytes on LP64
        keysym_of = lambda kc: x.XKeycodeToKeysym(dpy, kc, 0)  # noqa: E731
        while x.XPending(dpy) > 0:
            x.XNextEvent(dpy, event)
            etype, detail, ex, ey = decode_event(event.raw)
            if etype == _ClientMessage:
                # ClientMessage data starts at offset 56 on LP64
                data0 = int.from_bytes(event.raw[56:64], "little")
                if data0 == self._wm_delete:
                    self._closed = True
                    return False
            elif etype == _ConfigureNotify:
                w_, h_ = decode_configure(event.raw)
                if (w_, h_) != (self.width, self.height) and w_ > 0 and h_ > 0:
                    self.width, self.height = w_, h_
                    if self.on_resize is not None:
                        self.on_resize(w_, h_)
            elif input_state is not None:
                apply_event(input_state, etype, detail, ex, ey, keysym_of)
        return True

    def close(self) -> None:
        # _closed only means the WM asked to close (pump saw WM_DELETE) —
        # the window and display connection still exist and must be torn
        # down here (caught by the scripted-server e2e test: a WM-closed
        # window previously leaked its display connection)
        if self._dpy:
            self._x.XDestroyWindow(
                ctypes.c_void_p(self._dpy), ctypes.c_ulong(self._win)
            )
            self._x.XCloseDisplay(ctypes.c_void_p(self._dpy))
            self._dpy = None
        self._closed = True
