"""Image IO and framebuffer format conversion.

The reference's present path hands a B8G8R8A8_SRGB image to the compositor
(rhi/src/swapchain.rs:561-588); here the analog is converting the linear
[H,W,4] f32 framebuffer to sRGB-encoded uint8 and writing a PNG — which also
doubles as the golden-image mechanism the reference lacks (SURVEY.md §4.6).
"""

from __future__ import annotations

import numpy as np

from renderer_rs_tpu.core.errors import ImageError


def framebuffer_to_u8(fb, srgb_encode: bool = True) -> np.ndarray:
    """Convert a linear [H,W,3|4] float framebuffer to uint8.

    srgb_encode applies the exact IEC transfer curve — what the hardware does
    on store to an _SRGB attachment. Host-side numpy (this IS the readback
    boundary): the same formula as ops/srgb.linear_to_srgb, without paying
    per-op device dispatch on the present path.
    """
    fb = np.asarray(fb, np.float32)
    rgb = fb[..., :3]
    if srgb_encode:
        lin = np.clip(rgb, 0.0, 1.0)
        lo = lin * 12.92
        hi = 1.055 * np.power(lin, np.float32(1.0 / 2.4)) - 0.055
        rgb = np.where(lin <= 0.0031308, lo, hi).astype(np.float32)
    rgb = np.clip(rgb, 0.0, 1.0)
    if fb.shape[-1] == 4:
        a = np.clip(fb[..., 3:4], 0.0, 1.0)
        out = np.concatenate([rgb, a], axis=-1)
    else:
        out = rgb
    return np.round(out * 255.0).astype(np.uint8)


def _native_png():
    """ctypes handle to native/libimageio.so's encode_png, or None."""
    global _PNG_LIB
    if _PNG_LIB is not False:
        return _PNG_LIB
    import ctypes
    import os

    lib_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libimageio.so",
    )
    try:
        lib = ctypes.CDLL(lib_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.encode_png.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u8p, ctypes.c_int64,
        ]
        lib.encode_png.restype = ctypes.c_int64
        _PNG_LIB = lib
    except OSError:
        _PNG_LIB = None
    return _PNG_LIB


_PNG_LIB: object = False  # False = not probed yet; None = unavailable


def write_png(path: str, img_u8: np.ndarray) -> None:
    """Write an [H,W,3|4] uint8 array as PNG.

    Uses the native encoder (native/imageio.cpp via ctypes — the present
    path stays PIL-free, ≙ the reference's fully-native present); falls
    back to PIL when the library isn't built."""
    img = np.ascontiguousarray(np.asarray(img_u8))
    lib = _native_png()
    if lib is not None and img.ndim == 3 and img.shape[-1] in (3, 4):
        import ctypes

        h, w, c = img.shape
        cap = img.nbytes + img.nbytes // 2 + 4096
        out = np.empty(cap, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = lib.encode_png(
            img.ctypes.data_as(u8p), h, w, c, out.ctypes.data_as(u8p), cap
        )
        if n > 0:
            with open(path, "wb") as f:
                f.write(out[:n].tobytes())
            return
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL is baked into the image
        raise ImageError(f"PIL unavailable: {e}") from e
    Image.fromarray(img).save(path)


def read_image(path: str, dtype=np.float32, srgb_decode: bool = False) -> np.ndarray:
    """Load an image to [H,W,C] float in [0,1] (optionally linearized).

    This is the texture-loading primitive for the reference's stubbed
    Task 3.1 (rhi/src/texture.rs:5).
    """
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImageError(f"PIL unavailable: {e}") from e
    try:
        img = Image.open(path)
    except FileNotFoundError as e:
        raise ImageError(f"image not found: {path}") from e
    raw = np.asarray(img)
    if raw.dtype == np.uint8:
        arr = raw.astype(dtype) / 255.0
    elif raw.dtype == np.uint16:
        arr = raw.astype(dtype) / 65535.0
    else:
        arr = raw.astype(dtype)
    if arr.ndim == 2:
        arr = arr[..., None]
    if srgb_decode:
        lo = arr / 12.92
        hi = ((arr + 0.055) / 1.055) ** 2.4
        arr = np.where(arr <= 0.04045, lo, hi).astype(dtype)
    return arr
